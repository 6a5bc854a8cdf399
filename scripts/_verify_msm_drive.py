"""Verify drive: interpret-mode windowed MSM (both signed modes) vs
python-int arithmetic, with edge cases (zero scalar, max-width scalar,
repeated point, infinity input).  Used by /verify after ops/msm.py
changes.

Interpret mode is REQUIRED (lanes=8 fails the R % 128 Mosaic-alignment
assert otherwise) — set before gnark_tpu.ops.msm is imported.  Scalars
are 32-bit (2 limb planes): full-width 254-bit scalars give 43 signed
windows whose interpret-mode graph exhausted 86 GB / 40+ min of compile
on this host; 6 windows exercise the identical per-window pipeline
(sort+gather, leaf prefix, lane offsets, row-gather bucket extraction,
weighted sum, Horner fold) at tractable size.  Full-width coverage runs
on the TPU via bench.py's oracle and the -m slow tier."""
import os

os.environ.setdefault("GNARK_TPU_PALLAS_INTERPRET", "1")
# rolled-loop field muls: interpret mode never reaches Mosaic (whose
# lowering rejects the rolled variant's closed-over constant array), and
# the O(L) mul graphs keep the XLA-CPU compile of the unrolled-grid
# interpret program tractable — the unrolled-mul variant of this drive
# was OOM-killed at 130 GB of compile memory.  The mul internals
# themselves are differentially tested in tests/test_fields.py; this
# drive verifies the MSM pipeline logic above them.
os.environ.setdefault("GNARK_TPU_ROLLED_MUL", "1")

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
SBITS = 32                          # scalar width (2 x 16-bit limb planes)
rng = np.random.default_rng(5)
pts, P = [], curve.g1_gen
for _ in range(n):
    pts.append(P)
    P = host.add(P, curve.g1_gen)
scalars = [int(x) for x in rng.integers(1, 1 << SBITS, size=n)]
scalars[0] = 0                      # zero scalar
scalars[1] = (1 << SBITS) - 1       # boundary (all windows saturated)
pts[5] = pts[4]                     # repeated point
inf = np.zeros((n,), bool)
inf[7] = True                       # infinity input
xs = Fp.pack([p[0] for p in pts])
ys = Fp.pack([p[1] for p in pts])
sc = jnp.asarray(curve.fr.to_limbs(scalars, montgomery=False))[:SBITS // 16]
want = None
for i, (p, s) in enumerate(zip(pts, scalars)):
    if inf[i]:
        continue
    want = host.add(want, host.scalar_mul(p, s) if s else None)
for signed in (True, False):
    plan = MSM(G, n, SBITS // 16, lanes=8, method="window_pallas",
               signed=signed)
    out = plan(xs, ys, jnp.asarray(inf), sc)
    X, Y, Z = (Fp.unpack(np.asarray(a))[0] for a in out)
    pm = curve.fp.modulus
    zi = pow(Z, -1, pm)
    got = (X * zi * zi % pm, Y * zi * zi * zi % pm)
    assert got == want, f"signed={signed} MISMATCH"
    print(f"signed={signed} OK (c={plan.c}, nwin={plan.nwin})", flush=True)
print("VERIFY MSM: PASS")
