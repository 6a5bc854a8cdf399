"""Device EC kernels vs host-int curve oracle (G1/fp and G2/fp2)."""

import random

import numpy as np
import pytest

from gnark_tpu.curves import BN254, BLS12_377
from gnark_tpu.ops.ec import CurveOps
from gnark_tpu.ops.limbs import field_ops
from gnark_tpu.ops.towers import fp2_ops

pytestmark = pytest.mark.slow  # compile-heavy device kernels


def host_points_g1(curve, n, seed):
    rng = random.Random(seed)
    return [curve.host_g1.scalar_mul(curve.g1_gen, rng.randrange(1, curve.fr.modulus))
            for _ in range(n)]


def pack_g1(curve, pts):
    F = field_ops(curve.fp)
    x = F.pack([p[0] for p in pts])
    y = F.pack([p[1] for p in pts])
    return (x, y, F.ones_like(x))


def unpack_g1(curve, P):
    F = field_ops(curve.fp)
    G = CurveOps(F)
    x, y, inf = G.to_affine(P)
    xs, ys = F.unpack(x), F.unpack(y)
    return [None if i else (a, b) for a, b, i in zip(xs, ys, np.asarray(inf))]


def test_g1_add_double_vs_host():
    curve = BN254
    n = 16
    P = host_points_g1(curve, n, 1)
    Q = host_points_g1(curve, n, 2)
    G = CurveOps(field_ops(curve.fp))
    dP, dQ = pack_g1(curve, P), pack_g1(curve, Q)
    got_add = unpack_g1(curve, G.add(dP, dQ))
    want_add = [curve.host_g1.add(p, q) for p, q in zip(P, Q)]
    assert got_add == want_add
    got_dbl = unpack_g1(curve, G.double(dP))
    want_dbl = [curve.host_g1.double(p) for p in P]
    assert got_dbl == want_dbl


def test_g1_add_degenerate_cases():
    curve = BN254
    gen = curve.g1_gen
    hc = curve.host_g1
    p2 = hc.double(gen)
    # lanes: P+P, P+(-P), P+inf, inf+Q, inf+inf
    P = [gen, gen, gen, None, None]
    Q = [gen, hc.neg(gen), None, p2, None]
    F = field_ops(curve.fp)
    G = CurveOps(F)

    def pack_maybe_inf(pts):
        x = F.pack([p[0] if p else 0 for p in pts])
        y = F.pack([p[1] if p else 1 for p in pts])
        z = F.select(np.array([p is None for p in pts]), F.zeros(len(pts)),
                     F.ones(len(pts)))
        return (x, y, z)

    got = unpack_g1(curve, G.add(pack_maybe_inf(P), pack_maybe_inf(Q)))
    want = [hc.add(p, q) for p, q in zip(P, Q)]
    assert got == want


def test_g1_add_mixed():
    curve = BN254
    n = 8
    P = host_points_g1(curve, n, 3)
    Q = host_points_g1(curve, n, 4)
    Q[3] = None  # affine infinity lane
    Q[5] = P[5]  # doubling lane
    F = field_ops(curve.fp)
    G = CurveOps(F)
    q_inf = np.array([q is None for q in Q])
    qx = F.pack([q[0] if q else 0 for q in Q])
    qy = F.pack([q[1] if q else 0 for q in Q])
    got = unpack_g1(curve, G.add_mixed(pack_g1(curve, P), (qx, qy), q_inf))
    want = [curve.host_g1.add(p, q) for p, q in zip(P, Q)]
    assert got == want


@pytest.mark.parametrize("curve", [BN254, BLS12_377], ids=lambda c: c.name)
def test_g2_add_vs_host(curve):
    """G2 runs the same CurveOps over fp2 limb planes (incl. beta=-5)."""
    rng = random.Random(9)
    hc = curve.host_g2
    n = 4
    P = [hc.scalar_mul(curve.g2_gen, rng.randrange(1, curve.fr.modulus)) for _ in range(n)]
    Q = [hc.scalar_mul(curve.g2_gen, rng.randrange(1, curve.fr.modulus)) for _ in range(n)]
    F2 = fp2_ops(curve.fp, curve.fp2_beta)
    G = CurveOps(F2)
    dP = (F2.pack([p[0] for p in P]), F2.pack([p[1] for p in P]),
          F2.ones(n))
    dQ = (F2.pack([q[0] for q in Q]), F2.pack([q[1] for q in Q]),
          F2.ones(n))
    R = G.add(dP, dQ)
    x, y, inf = G.to_affine(R)
    got = list(zip(F2.unpack(x), F2.unpack(y)))
    want = [hc.add(p, q) for p, q in zip(P, Q)]
    assert not np.asarray(inf).any()
    assert got == want
