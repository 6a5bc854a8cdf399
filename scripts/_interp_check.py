"""Interpret-mode drive of the full chunked windowed-Pallas MSM vs the
host python-int oracle (CPU; no TPU needed).  Covers the whole
orchestration — prep/sort+gather/leaf/lane/bucket/weighted/fold — in
both unsigned and signed-digit modes.

Run with:
  env -u PALLAS_AXON_POOL_IPS GNARK_TPU_PALLAS_INTERPRET=1 \
      PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/_interp_check.py
"""
import random
import time

import numpy as np

from gnark_tpu.backend.groth16 import ints_to_limbs
from gnark_tpu.curves import BN254
from gnark_tpu.ops.ec import CurveOps
from gnark_tpu.ops.limbs import field_ops
from gnark_tpu.ops.msm import MSM

curve = BN254
fp = field_ops(curve.fp)
G = CurveOps(fp, b=curve.b)
host = curve.host_g1
q = curve.fr.modulus
rng = random.Random(17)
n = 64
base = []
P = curve.g1_gen
for _ in range(n):
    base.append(P)
    P = host.double(P)
pts = list(base)
scalars = [rng.randrange(q) for _ in range(n)]
inf_flags = [False] * n
# adversarial rows: infinity point, zero scalar, q-1 scalar, duplicate point
inf_flags[3] = True
scalars[5] = 0
scalars[7] = q - 1
pts[11] = pts[12]
xs = fp.pack([p[0] for p in pts])
ys = fp.pack([p[1] for p in pts])
inf = np.array(inf_flags)
sc = np.asarray(ints_to_limbs(scalars, curve.fr.L))
eff = [(None if i else p, s) for p, s, i in zip(pts, scalars, inf_flags)]
want = host.msm([p for p, _ in eff], [s for _, s in eff])
for signed in (False, True):
    t0 = time.time()
    plan = MSM(G, n, curve.fr.L, c=(4 if not signed else 5), lanes=16,
               method="window_pallas", signed=signed)
    out = plan(xs, ys, inf, sc)
    x, y, is_inf = G.to_affine(out)
    got = (fp.unpack(x)[0], fp.unpack(y)[0])
    assert got == want, (signed, got, want)
    print(f"signed={signed}: chunked windowed-Pallas (interpret) == host "
          f"oracle  [{time.time() - t0:.0f}s]", flush=True)
print("ALL OK")
