"""The windowed-Pallas sort+gather stage vs its reference formulation.

The leaf kernel's inputs used to come from argsort + a minor-axis
`take` of the [L, n] limb planes; ops/msm.py:_sort_gather replaces that
with a packed-key sort + row-major point-row gather (the HBM-friendly
pattern).  This test pins byte-identity of the produced [nw, C, L, R]
blocks and the sorted digit array against the original formulation, on
CPU, with no Pallas involved (the downstream kernels are untouched).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from gnark_tpu.curves import BN254
from gnark_tpu.ops.ec import CurveOps
from gnark_tpu.ops.limbs import field_ops
from gnark_tpu.ops.msm import MSM, window_digits


def reference_sort_gather(xs, ys, infu, dg, R, C):
    """The original argsort + minor-axis take formulation."""
    nw, n_pad = dg.shape
    orders = jax.vmap(jnp.argsort)(dg)
    d_sorted = jnp.take_along_axis(dg, orders, axis=1)
    ord2 = jnp.transpose(orders.reshape(nw, R, C), (0, 2, 1))
    sx = jnp.transpose(jnp.take(xs, ord2, axis=1), (1, 2, 0, 3))
    sy = jnp.transpose(jnp.take(ys, ord2, axis=1), (1, 2, 0, 3))
    sinf = jnp.take(infu, ord2)
    sy = sy.at[:, :, 0, :].add(sinf << jnp.uint32(16))
    return sx, sy, d_sorted


def test_sort_gather_matches_reference():
    curve = BN254
    Fp = field_ops(curve.fp)
    G = CurveOps(Fp, b=curve.b)
    n = 2048
    rng = np.random.default_rng(7)

    # synthetic limb planes are fine: the stage only permutes bytes
    L = curve.fp.L
    xs = jnp.asarray(rng.integers(0, 1 << 16, (L, n), dtype=np.uint32))
    ys = jnp.asarray(rng.integers(0, 1 << 16, (L, n), dtype=np.uint32))
    inf = rng.random(n) < 0.1
    scalars = jnp.asarray(
        rng.integers(0, 1 << 16, (curve.fr.L, n), dtype=np.uint32))

    plan = MSM.__new__(MSM)
    plan.c, plan.R, plan.C = 8, 128, n // 128
    plan.n_pad = n

    digits = jnp.where(jnp.asarray(inf)[None], 0,
                       window_digits(scalars, plan.c))
    infu = jnp.asarray(inf).astype(jnp.uint32)
    nw = digits.shape[0]

    ysf = ys.at[0].add(infu << jnp.uint32(16))
    ptrows = jnp.concatenate([xs.T, ysf.T], axis=1)
    sx, sy, d_sorted = plan._sort_gather(ptrows, digits, nw)
    rx, ry, rd = reference_sort_gather(xs, ys, infu, digits, plan.R, plan.C)

    np.testing.assert_array_equal(np.asarray(d_sorted), np.asarray(rd))
    np.testing.assert_array_equal(np.asarray(sx), np.asarray(rx))
    np.testing.assert_array_equal(np.asarray(sy), np.asarray(ry))
