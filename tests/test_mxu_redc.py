"""MXU-REDC route (byte-conv matmuls for REDC and b3 const-muls) vs the
VPU route and host-int arithmetic — on CPU (the route is plain XLA
outside Pallas; bit-exactness is backend-independent)."""

import random

import numpy as np
import pytest

from gnark_tpu import curves
from gnark_tpu.ops import limbs as limbs_mod
from gnark_tpu.ops.ec_complete import CompleteOps
from gnark_tpu.ops.limbs import field_ops, mxu_redc


@pytest.mark.parametrize("curve_name", ["bn254", "bls12_381", "bw6_761"])
def test_mxu_mul_matches_host(curve_name):
    curve = curves.ALL_CURVES[curve_name]
    F = field_ops(curve.fp)
    p = curve.fp.modulus
    rng = random.Random(curve_name)
    vals_a = [0, 1, p - 1] + [rng.randrange(p) for _ in range(13)]
    vals_b = [p - 1, 0, 1] + [rng.randrange(p) for _ in range(13)]
    a, b = F.pack(vals_a), F.pack(vals_b)
    with mxu_redc(True):
        got = F.unpack(F.mul(a, b))
        got_sq = F.unpack(F.sqr(a))
    assert got == [x * y % p for x, y in zip(vals_a, vals_b)]
    assert got_sq == [x * x % p for x in vals_a]


def test_mxu_b3_constmul_matches_host():
    """CompleteOps RCB adds with the MXU b3 route vs host group law."""
    curve = curves.BN254
    F = field_ops(curve.fp)
    GC = CompleteOps(F, curve.b)
    host = curve.host_g1
    rng = random.Random(99)
    P = [host.scalar_mul(curve.g1_gen, rng.randrange(1, 1 << 64))
         for _ in range(8)]
    Q = [host.scalar_mul(curve.g1_gen, rng.randrange(1, 1 << 64))
         for _ in range(8)]
    Pd = GC.from_affine((F.pack([p[0] for p in P]),
                         F.pack([p[1] for p in P])))
    Qd = GC.from_affine((F.pack([q[0] for q in Q]),
                         F.pack([q[1] for q in Q])))
    with mxu_redc(True):
        S = GC.add(Pd, Qd)
        D = GC.double(Pd)
        # to_jacobian -> affine via the Jacobian ops
        from gnark_tpu.ops.ec import CurveOps
        G = CurveOps(F, b=curve.b)
        xs, ys, inf = G.to_affine(GC.to_jacobian(S))
        xd, yd, infd = G.to_affine(GC.to_jacobian(D))
    got_add = list(zip(F.unpack(xs), F.unpack(ys)))
    got_dbl = list(zip(F.unpack(xd), F.unpack(yd)))
    assert got_add == [host.add(p, q) for p, q in zip(P, Q)]
    assert got_dbl == [host.double(p) for p in P]
