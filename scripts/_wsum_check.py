"""Interpret-mode check of the O(nb) weighted-sum fold kernel against the
host oracle, at bucket counts that exercise the fold levels (nb = 256,
512, 2048 — the old suffix-scan path only ever saw nbp = 128 in the
small interp corpus).

Run with:
  env -u PALLAS_AXON_POOL_IPS GNARK_TPU_PALLAS_INTERPRET=1 \
      PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/_wsum_check.py
"""
import random

import jax.numpy as jnp
import numpy as np

from gnark_tpu.curves import BN254
from gnark_tpu.ops.ec import CurveOps
from gnark_tpu.ops.ec_complete import CompleteOps
from gnark_tpu.ops.limbs import field_ops
from gnark_tpu.ops.msm import MSM

curve = BN254
fp = field_ops(curve.fp)
G = CurveOps(fp, b=curve.b)
host = curve.host_g1
rng = random.Random(3)

for c, nw in ((10, 3), (11, 2), (13, 1)):
    nb = 1 << (c - 1)
    plan = MSM.__new__(MSM)
    plan.G, plan.GC, plan.nb = G, CompleteOps(fp, curve.b), nb
    # random projective bucket points: k*G with random Z-scaling is
    # overkill — use affine (Z=1) plus some identity-class entries
    ks = [rng.randrange(1, 1 << 20) if rng.random() < 0.8 else 0
          for _ in range(nb * nw)]
    pts = [host.scalar_mul(curve.g1_gen, k) if k else None for k in ks]
    xs = fp.pack([p[0] if p else 0 for p in pts])
    ys = fp.pack([p[1] if p else 1 for p in pts])
    zs = fp.pack([1 if p else 0 for p in pts])
    shape = (curve.fp.L, nw, nb)
    buckets = tuple(a.reshape(shape) for a in (xs, ys, zs))
    out = plan._weighted_sum_pallas(buckets, nw)
    for w in range(nw):
        want_k = sum((j + 1) * ks[w * nb + j] for j in range(nb))
        want = host.scalar_mul(curve.g1_gen, want_k)
        X, Y, Z = (fp.unpack(np.asarray(a[:, w]))[0] for a in out)
        p = curve.fp.modulus
        zi = pow(Z, -1, p)
        got = (X * zi % p, Y * zi % p)  # projective (X:Y:Z) -> affine
        assert got == want, (c, w, got, want)
    print(f"c={c} nb={nb} nw={nw}: weighted-sum fold == host oracle",
          flush=True)
print("ALL OK")
