"""Batch fixed-base scalar multiplication (device kernel).

Setup-time workhorse (reference: gnark-crypto BatchScalarMultiplicationG1/G2
called at internal/backend/bn254/groth16/setup.go:210,245).  The design is
TPU-shaped: the per-window multiples of the base are a small host-computed
table; on device each scalar becomes nwin digit-gathers from the table plus
an nwin-step scan of mixed adds — no per-scalar doubling loops.

    result_j = sum_w  table[w][digit_w(s_j)],   table[w][d] = d * 2^{cw} * G
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gnark_tpu.ops.ec import CurveOps
from gnark_tpu.ops.msm import window_digits


class FixedBaseTable:
    """Host-precomputed window table for one base point."""

    def __init__(self, G: CurveOps, host_curve, base, scalar_bits: int,
                 c: int = 8, pack=None):
        """base: host affine point (field-specific coords); pack: host
        coord -> limb-plane converter (defaults to G.F.pack for fp)."""
        self.G = G
        self.c = c
        self.nwin = -(-scalar_bits // c)
        pack = pack or (lambda vals: G.F.pack(vals))
        rows_x, rows_y, rows_inf = [], [], []
        step = base
        for _ in range(self.nwin):
            # row: 0 (infinity sentinel), step, 2*step, ..., (2^c - 1)*step
            pts = [None, step]
            for _ in range(2, 1 << c):
                pts.append(host_curve.add(pts[-1], step))
            zero = host_curve.F.zero
            rows_x.append([zero if p is None else p[0] for p in pts])
            rows_y.append([zero if p is None else p[1] for p in pts])
            rows_inf.append([p is None for p in pts])
            for _ in range(c):
                step = host_curve.double(step)
        # device tables: [nwin, L, 2^c] coords, [nwin, 2^c] inf mask
        self.tx = jnp.stack([pack(r) for r in rows_x])
        self.ty = jnp.stack([pack(r) for r in rows_y])
        self.tinf = jnp.asarray(np.array(rows_inf))
        self._fn = jax.jit(self._run)

    def __call__(self, scalars):
        """scalars: [Ls, n] regular-form limb planes -> Jacobian point batch."""
        return self._fn(scalars)

    def _run(self, scalars):
        G = self.G
        n = scalars.shape[-1]
        digits = window_digits(scalars, self.c)[:self.nwin]  # [nwin, n]

        def body(acc, inputs):
            dig, tx, ty, tinf = inputs
            px = jnp.take(tx, dig, axis=-1)
            py = jnp.take(ty, dig, axis=-1)
            pinf = jnp.take(tinf, dig)
            return G.add_mixed(acc, (px, py), pinf), None

        acc, _ = jax.lax.scan(
            body, G.inf(n), (digits, self.tx, self.ty, self.tinf))
        return acc


def batch_scalar_mul(G: CurveOps, host_curve, base, scalars, c: int = 8,
                     pack=None):
    """One-shot batch s_j * base. scalars: [Ls, n] regular-form limb planes."""
    tbl = FixedBaseTable(G, host_curve, base, scalars.shape[0] * 16, c, pack)
    return tbl(scalars)
