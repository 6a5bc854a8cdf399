"""MSM kernel vs host-int oracle, incl. adversarial inputs."""

import random

import numpy as np
import pytest

from gnark_tpu.curves import BN254
from gnark_tpu.ops.ec import CurveOps
from gnark_tpu.ops.limbs import field_ops
from gnark_tpu.ops.msm import MSM, window_digits
from gnark_tpu.ops.towers import fp2_ops

pytestmark = pytest.mark.slow  # compile-heavy device kernels


def setup_g1(curve, n, seed, scalar_fn=None):
    rng = random.Random(seed)
    hc = curve.host_g1
    pts = [hc.scalar_mul(curve.g1_gen, rng.randrange(1, 1000)) for _ in range(n)]
    if scalar_fn is None:
        scalars = [rng.randrange(curve.fr.modulus) for _ in range(n)]
    else:
        scalars = [scalar_fn(i, rng) for i in range(n)]
    return pts, scalars


def run_device_msm(curve, pts, scalars, pad_to=32, **kw):
    """Pads every call to one (n, c, lanes) plan so the whole test module
    shares a single compiled kernel (XLA CPU compiles of the MSM graph are
    minutes-long cold; padding with infinity points is semantically free)."""
    Fp = field_ops(curve.fp)
    Fr_spec = curve.fr
    G = CurveOps(Fp)
    pts = list(pts) + [None] * (pad_to - len(pts))
    scalars = list(scalars) + [0] * (pad_to - len(scalars))
    inf = np.array([p is None for p in pts])
    xs = Fp.pack([p[0] if p else 0 for p in pts])
    ys = Fp.pack([p[1] if p else 0 for p in pts])
    s = np.asarray(
        Fr_spec.to_limbs([v % Fr_spec.modulus for v in scalars], montgomery=False))
    kw.setdefault("c", 4)
    kw.setdefault("lanes", 8)
    plan = MSM(G, pad_to, Fr_spec.L, **kw)
    R = plan(xs, ys, inf, s)
    x, y, is_inf = G.to_affine(R)
    if bool(np.asarray(is_inf)[0]):
        return None
    return (Fp.unpack(x)[0], Fp.unpack(y)[0])


def test_msm_random():
    curve = BN254
    pts, scalars = setup_g1(curve, 30, seed=30)
    got = run_device_msm(curve, pts, scalars)
    want = curve.host_g1.msm(pts, scalars)
    assert got == want


def test_msm_adversarial():
    """Zero scalars, tiny scalars, r-1, repeated points, infinity points."""
    curve = BN254
    r = curve.fr.modulus
    hc = curve.host_g1
    gen = curve.g1_gen
    pts = [gen, gen, hc.double(gen), None, gen, hc.scalar_mul(gen, 77), gen, gen]
    scalars = [0, 1, r - 1, 12345, 2, 0, 1, r - 2]
    got = run_device_msm(curve, pts, scalars)
    want = hc.msm([p for p in pts if p],
                  [s for p, s in zip(pts, scalars) if p])
    assert got == want


def test_msm_all_zero_scalars():
    curve = BN254
    pts, _ = setup_g1(curve, 10, seed=5)
    got = run_device_msm(curve, pts, [0] * 10)
    assert got is None


def test_msm_single_point():
    curve = BN254
    s = 987654321987654321
    got = run_device_msm(curve, [curve.g1_gen], [s])
    assert got == curve.host_g1.scalar_mul(curve.g1_gen, s)


def test_msm_g2():
    curve = BN254
    rng = random.Random(11)
    hc = curve.host_g2
    n = 12
    ks = [rng.randrange(1, 500) for _ in range(n)]
    pts = [hc.scalar_mul(curve.g2_gen, k) for k in ks]
    scalars = [rng.randrange(curve.fr.modulus) for _ in range(n)]
    F2 = fp2_ops(curve.fp, curve.fp2_beta)
    G = CurveOps(F2)
    xs = F2.pack([p[0] for p in pts])
    ys = F2.pack([p[1] for p in pts])
    inf = np.zeros(n, bool)
    s = np.asarray(curve.fr.to_limbs(scalars, montgomery=False))
    plan = MSM(G, n, curve.fr.L, c=4, lanes=4)
    R = plan(xs, ys, inf, s)
    x, y, is_inf = G.to_affine(R)
    got = (F2.unpack(x)[0], F2.unpack(y)[0])
    want = hc.msm(pts, scalars)
    assert got == want


def test_window_digits():
    spec = BN254.fr
    v = 0xDEADBEEF12345678
    s = np.asarray(spec.to_limbs([v], montgomery=False))
    d = np.asarray(window_digits(s, 4))
    for w in range(16):
        assert d[w, 0] == (v >> (4 * w)) & 0xF
    d13 = np.asarray(window_digits(s, 13))
    for w in range(5):
        assert d13[w, 0] == (v >> (13 * w)) & 0x1FFF
