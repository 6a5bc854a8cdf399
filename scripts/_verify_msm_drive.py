"""Verify drive: interpret-mode windowed MSM (both signed modes) vs
python-int arithmetic, with edge cases (zero scalar, r-1, repeated
point, infinity input).  Used by /verify after ops/msm.py changes."""
import jax.numpy as jnp
import numpy as np

from gnark_tpu.curves import BN254 as curve
from gnark_tpu.ops.ec import CurveOps
from gnark_tpu.ops.limbs import field_ops
from gnark_tpu.ops.msm import MSM

Fp = field_ops(curve.fp)
G = CurveOps(Fp, b=curve.b)
host = curve.host_g1
n = 64
rng = np.random.default_rng(5)
pts, P = [], curve.g1_gen
for _ in range(n):
    pts.append(P)
    P = host.add(P, curve.g1_gen)
scalars = [int.from_bytes(rng.bytes(31), "little") for _ in range(n)]
scalars[0] = 0                      # zero scalar
scalars[1] = curve.fr.modulus - 1   # boundary
pts[5] = pts[4]                     # repeated point
inf = np.zeros((n,), bool)
inf[7] = True                       # infinity input
xs = Fp.pack([p[0] for p in pts])
ys = Fp.pack([p[1] for p in pts])
sc = jnp.asarray(curve.fr.to_limbs(scalars, montgomery=False))
want = None
for i, (p, s) in enumerate(zip(pts, scalars)):
    if inf[i]:
        continue
    want = host.add(want, host.scalar_mul(p, s))
for signed in (True, False):
    plan = MSM(G, n, curve.fr.L, lanes=8, method="window_pallas",
               signed=signed)
    out = plan(xs, ys, jnp.asarray(inf), sc)
    X, Y, Z = (Fp.unpack(np.asarray(a))[0] for a in out)
    pm = curve.fp.modulus
    zi = pow(Z, -1, pm)
    got = (X * zi * zi % pm, Y * zi * zi * zi % pm)
    assert got == want, f"signed={signed} MISMATCH"
    print(f"signed={signed} OK (c={plan.c}, nwin={plan.nwin})", flush=True)
print("VERIFY MSM: PASS")
