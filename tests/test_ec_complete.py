"""Complete projective formulas (RCB15, a=0) vs host EC — every
degenerate case the MSM kernels rely on (ops/ec_complete.py)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from gnark_tpu.curves import BN254
from gnark_tpu.ops.ec import CurveOps
from gnark_tpu.ops.ec_complete import CompleteOps
from gnark_tpu.ops.limbs import field_ops

pytestmark = pytest.mark.slow  # compile-heavy device kernels


@pytest.fixture(scope="module")
def ctx():
    fp = field_ops(BN254.fp)
    return fp, CompleteOps(fp, BN254.b), CurveOps(fp), BN254.host_g1


def _pack_proj(fp, plist):
    xs = fp.pack([0 if p is None else p[0] for p in plist])
    ys = fp.pack([1 if p is None else p[1] for p in plist])
    zs_ints = [0 if p is None else 1 for p in plist]
    zs = fp.to_mont(jnp.asarray(
        BN254.fp.to_limbs(zs_ints, montgomery=False)))
    return (xs, ys, zs)


def _unpack(fp, G, GC, P, n):
    x, y, inf = G.to_affine(GC.to_jacobian(P))
    xs, ys = fp.unpack(x), fp.unpack(y)
    infs = np.asarray(inf)
    return [None if infs[i] else (xs[i], ys[i]) for i in range(n)]


def test_complete_add_edge_cases(ctx):
    fp, GC, G, host = ctx
    rng = random.Random(5)
    pts = [host.scalar_mul(BN254.g1_gen, rng.randrange(1, 10 ** 6))
           for _ in range(6)]
    q = BN254.fp.modulus
    P_list = [pts[0], pts[1], pts[2], None, pts[3], None]
    Q_list = [pts[4], pts[1], (pts[2][0], (-pts[2][1]) % q),
              pts[5], None, None]
    R = GC.add(_pack_proj(fp, P_list), _pack_proj(fp, Q_list))
    got = _unpack(fp, G, GC, R, len(P_list))
    for i, (P, Q) in enumerate(zip(P_list, Q_list)):
        assert got[i] == host.add(P, Q), f"case {i}"


def test_complete_mixed_and_double(ctx):
    fp, GC, G, host = ctx
    rng = random.Random(7)
    pts = [host.scalar_mul(BN254.g1_gen, rng.randrange(1, 10 ** 6))
           for _ in range(6)]
    accs = _pack_proj(fp, [pts[0], None, pts[1], pts[2]])
    mx = fp.pack([pts[3][0], pts[4][0], pts[1][0], 0])
    my = fp.pack([pts[3][1], pts[4][1], pts[1][1], 0])
    qinf = jnp.asarray(np.array([False, False, False, True]))
    R = GC.add_mixed(accs, (mx, my), qinf)
    got = _unpack(fp, G, GC, R, 4)
    wants = [host.add(pts[0], pts[3]), pts[4], host.double(pts[1]), pts[2]]
    assert got == wants

    D = GC.double(_pack_proj(fp, [pts[0], None, pts[5], pts[2]]))
    got = _unpack(fp, G, GC, D, 4)
    assert got == [host.double(p) for p in [pts[0], None, pts[5], pts[2]]]


def test_complete_fp2_g2(ctx):
    """fp2 (G2) complete formulas incl. the b3 const-mul tower branch."""
    from gnark_tpu.ops.towers import Fp2Ops

    fp = field_ops(BN254.fp)
    fp2 = Fp2Ops(fp, BN254.fp2_beta)
    GC = CompleteOps(fp2, BN254.b2)
    G = CurveOps(fp2, b=BN254.b2)
    host = BN254.host_g2
    rng = random.Random(3)
    pts = [host.scalar_mul(BN254.g2_gen, rng.randrange(1, 10 ** 9))
           for _ in range(6)]

    def pack(plist):
        xs = fp2.pack([(0, 0) if p is None else p[0] for p in plist])
        ys = fp2.pack([(1, 0) if p is None else p[1] for p in plist])
        zs = fp2.pack([(0, 0) if p is None else (1, 0) for p in plist])
        return (xs, ys, zs)

    def unpack(P, n):
        x, y, inf = G.to_affine(GC.to_jacobian(P))
        xs, ys = fp2.unpack(x), fp2.unpack(y)
        infs = np.asarray(inf)
        return [None if infs[i] else (xs[i], ys[i]) for i in range(n)]

    q = BN254.fp.modulus
    neg = lambda p: (p[0], tuple((-c) % q for c in p[1]))
    P_list = [pts[0], pts[1], pts[2], None, pts[3], None]
    Q_list = [pts[4], pts[1], neg(pts[2]), pts[5], None, None]
    got = unpack(GC.add(pack(P_list), pack(Q_list)), 6)
    for i, (P, Q) in enumerate(zip(P_list, Q_list)):
        assert got[i] == host.add(P, Q), f"case {i}"

    accs = pack([pts[0], None, pts[1], pts[2]])
    mx = fp2.pack([pts[3][0], pts[4][0], pts[1][0], (0, 0)])
    my = fp2.pack([pts[3][1], pts[4][1], pts[1][1], (0, 0)])
    qinf = jnp.asarray(np.array([False, False, False, True]))
    got = unpack(GC.add_mixed(accs, (mx, my), qinf), 4)
    assert got == [host.add(pts[0], pts[3]), pts[4],
                   host.double(pts[1]), pts[2]]

    got = unpack(GC.double(pack([pts[0], None, pts[5], pts[2]])), 4)
    assert got == [host.double(p) for p in [pts[0], None, pts[5], pts[2]]]
