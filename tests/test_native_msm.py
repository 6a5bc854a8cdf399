"""Native C Pippenger MSM core vs the host python-int oracle.

The C core is the wide-field (BW6) prover path (backend/native_field.py
native_msm); this drives it directly with adversarial inputs: infinity
points, zero scalars, r-1 scalars, duplicate points (bucket doubling),
and P + (-P) cancellation inside one bucket.
"""

import random

import numpy as np
import pytest

from gnark_tpu.backend.native_field import native_msm
from gnark_tpu.curves import BW6_633, BW6_761
from gnark_tpu.native import solver_lib

pytestmark = pytest.mark.skipif(
    solver_lib() is None, reason="native core unavailable")


def planes(curve, vals):
    """ints -> [L16, n] uint32 16-bit regular-form planes."""
    L = curve.fp.L
    out = np.zeros((L, len(vals)), np.uint32)
    for i, v in enumerate(vals):
        for l in range(L):
            out[l, i] = (v >> (16 * l)) & 0xFFFF
    return out


def scalar_planes(curve, vals):
    L = curve.fr.L
    out = np.zeros((L, len(vals)), np.uint32)
    for i, v in enumerate(vals):
        for l in range(L):
            out[l, i] = (v >> (16 * l)) & 0xFFFF
    return out


@pytest.mark.parametrize("curve", [BW6_761, BW6_633],
                         ids=lambda c: c.name)
@pytest.mark.parametrize("c_win", [4, 10])
def test_native_msm_adversarial(curve, c_win):
    host = curve.host_g1
    q = curve.fr.modulus
    rng = random.Random(f"{curve.name}-{c_win}")
    n = 24
    pts = [host.scalar_mul(curve.g1_gen, rng.randrange(1, 1 << 48))
           for _ in range(n)]
    scalars = [rng.randrange(q) for _ in range(n)]
    pts[2] = None                      # infinity point
    scalars[4] = 0                     # zero scalar
    scalars[6] = q - 1                 # max scalar
    pts[8] = pts[9]                    # duplicate -> bucket doubling
    scalars[8] = scalars[9]
    # P and -P with the SAME scalar: cancellation inside one bucket
    px, py = pts[10]
    pts[11] = (px, curve.fp.modulus - py)
    scalars[11] = scalars[10]

    inf = np.array([p is None for p in pts], np.uint8)
    xs = planes(curve, [p[0] if p else 0 for p in pts])
    ys = planes(curve, [p[1] if p else 0 for p in pts])
    sc = scalar_planes(curve, scalars)
    got = native_msm(curve, xs, ys, inf, sc, c=c_win)
    want = host.msm(pts, scalars)
    assert got == want


@pytest.mark.parametrize("curve", [BW6_761], ids=lambda c: c.name)
def test_native_msm_all_cancel(curve):
    """Sum of P + (-P) pairs is the point at infinity (C core returns
    None for an all-zero accumulator)."""
    host = curve.host_g1
    q = curve.fr.modulus
    P = host.scalar_mul(curve.g1_gen, 7)
    pts = [P, (P[0], curve.fp.modulus - P[1])] * 4
    scalars = [5, 5] * 4
    inf = np.zeros(len(pts), np.uint8)
    xs = planes(curve, [p[0] for p in pts])
    ys = planes(curve, [p[1] for p in pts])
    sc = scalar_planes(curve, scalars)
    assert native_msm(curve, xs, ys, inf, sc, c=6) is None
