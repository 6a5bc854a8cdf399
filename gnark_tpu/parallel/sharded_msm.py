"""Mesh-sharded MSM: points/scalars split over a mesh axis, partial MSMs
per chip, EC tree-reduction of the per-chip results.

TPU-native replacement for the reference's NbTasks task decomposition
(gnark-crypto MultiExpConfig{NbTasks}, used at internal/backend/bn254/
groth16/prove.go:155-241): instead of goroutines splitting Pippenger
windows across cores, the point vector is sharded across the mesh's ICI
ring, every chip runs the full windowed plan on its shard, and the tiny
per-chip Jacobian partials are all-gathered and folded.  The cross-chip
traffic is O(ndev) points — negligible vs the O(n/ndev) local work, which
is what gives the >=70% scaling-efficiency target headroom (BASELINE.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from gnark_tpu.ops.ec import CurveOps
from gnark_tpu.ops.msm import MSM, _reduce


class ShardedMSM:
    """An MSM plan sharded over one mesh axis."""

    def __init__(self, G: CurveOps, mesh: Mesh, axis: str, n: int,
                 scalar_limbs: int, c: int | None = None,
                 lanes: int | None = None, signed: bool | None = None,
                 method: str = "auto"):
        self.G = G
        self.mesh = mesh
        self.axis = axis
        ndev = mesh.shape[axis]
        assert n % ndev == 0, f"n={n} not divisible by mesh axis {ndev}"
        self.n = n
        # signed=None auto-selects per the local plan's resolved method
        # (the measured-best default — same kernels bench.py measures)
        self.local_plan = MSM(G, n // ndev, scalar_limbs, c, lanes,
                              method=method, signed=signed)

        def local(xs, ys, inf, scalars):
            partial = self.local_plan._impl(xs, ys, inf, scalars)
            # all-gather the per-chip partial points (tiny) and fold
            gathered = tuple(
                jnp.moveaxis(jax.lax.all_gather(a, axis), 0, -1)
                .reshape(a.shape[:-1] + (ndev,))
                for a in partial)
            return _reduce(G, gathered, ndev)

        spec_pts = P(None, axis)
        self._fn = jax.jit(shard_map(
            local, mesh=mesh,
            in_specs=(spec_pts, spec_pts, P(axis), spec_pts),
            out_specs=(P(), P(), P()),
            check_rep=False))

    def __call__(self, xs, ys, inf_mask, scalars):
        """Same contract as ops.msm.MSM: affine coords [L, n], inf [n],
        regular-form scalars [Ls, n] -> one Jacobian point (coords [L, 1])."""
        return self._fn(xs, ys, inf_mask, scalars)


def sharded_msm(G: CurveOps, mesh: Mesh, axis: str, xs, ys, inf_mask,
                scalars, c: int | None = None, lanes: int | None = None,
                signed: bool | None = None):
    plan = ShardedMSM(G, mesh, axis, xs.shape[-1], scalars.shape[0], c,
                      lanes, signed=signed)
    return plan(xs, ys, inf_mask, scalars)
