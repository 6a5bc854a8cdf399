"""Small-constant field multiply (FieldOps.mul_small) and the small-b3
RCB const-mul route — vs host-int arithmetic on every proving curve.

The b3 = 3b multiplies inside the complete formulas (ops/ec_complete.py)
are the MSM leaf's 2-of-13 const-muls; the small-const route replaces a
full L^2-product const-mul + REDC with L per-limb products + a cond-sub
cascade (reference semantics target: gnark-crypto's curve-specific
MulByConstant specializations)."""

import random

import numpy as np
import pytest

from gnark_tpu import curves
from gnark_tpu.ops.ec_complete import CompleteOps
from gnark_tpu.ops.limbs import field_ops
from gnark_tpu.ops.towers import Fp2Ops


@pytest.mark.parametrize("curve_name", list(curves.ALL_CURVES))
def test_mul_small_matches_host(curve_name):
    curve = curves.ALL_CURVES[curve_name]
    F = field_ops(curve.fp)
    p = curve.fp.modulus
    rng = random.Random(curve_name)
    vals = [0, 1, p - 1, p >> 1] + [rng.randrange(p) for _ in range(12)]
    a = F.pack(vals)
    for k in (0, 1, 2, 3, 9, 12, 15, 255, 4095):
        got = F.unpack(F.mul_small(a, k))
        assert got == [v * k % p for v in vals], (curve_name, k)


def test_small_b3_is_used_on_all_g1_curves():
    for curve in curves.ALL_CURVES.values():
        F = field_ops(curve.fp)
        GC = CompleteOps(F, curve.b)
        assert GC._b3_small is not None, curve.name


@pytest.mark.parametrize("curve_name",
                         ["bn254", "bls12_381", "bls12_377"])
def test_complete_add_g2_small_or_const_b3(curve_name):
    """fp2 RCB addition (doubling case) vs the host G2 group law —
    covers the small-b3 fp2 route (bls12_381: b2 = (4, 4)) and the
    zero-component const-mul fallback (bls12_377: b2 = (0, x))."""
    curve = curves.ALL_CURVES[curve_name]
    F = field_ops(curve.fp)
    F2 = Fp2Ops(F, curve.fp2_beta)
    GC = CompleteOps(F2, curve.b2)
    host = curve.host_g2
    P = curve.g2_gen
    proj = (F2.pack([P[0]]), F2.pack([P[1]]), F2.ones(1))
    S = GC.add(proj, proj)
    Xs = F2.unpack(np.asarray(S[0]))[0]
    Ys = F2.unpack(np.asarray(S[1]))[0]
    Zs = F2.unpack(np.asarray(S[2]))[0]
    zi = host.F.inv(Zs)
    got = (host.F.mul(Xs, zi), host.F.mul(Ys, zi))
    assert got == host.double(P)
