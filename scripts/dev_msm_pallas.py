"""Dev driver: validate + time the Pallas windowed MSM on the TPU.

Usage: python scripts/dev_msm_pallas.py [check|bench] [log2n] [c] [lanes]
                                        [--signed]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_compilation_cache", True)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from gnark_tpu.backend.groth16 import ints_to_limbs
from gnark_tpu.curves import BN254
from gnark_tpu.ops.ec import CurveOps
from gnark_tpu.ops.limbs import field_ops
from gnark_tpu.ops.msm import MSM


def main():
    args = [a for a in sys.argv[1:] if a != "--signed"]
    signed = "--signed" in sys.argv[1:]
    mode = args[0] if len(args) > 0 else "check"
    log2n = int(args[1]) if len(args) > 1 else 12
    c = int(args[2]) if len(args) > 2 else None
    lanes = int(args[3]) if len(args) > 3 else None

    n = 1 << log2n
    curve = BN254
    fp = field_ops(curve.fp)
    G = CurveOps(fp, b=curve.b)
    host = curve.host_g1
    q = curve.fr.modulus

    import random
    rng = random.Random(5)

    # distinct-ish points via doubling chain + a few adversarial entries
    base_pts = []
    P = curve.g1_gen
    for _ in range(64):
        base_pts.append(P)
        P = host.double(P)
    pts = [base_pts[i % 64] for i in range(n)]
    scalars = [rng.randrange(q) for _ in range(n)]
    inf_flags = [False] * n
    # adversarial: infinity points, zero scalars, q-1, tiny scalars
    if n >= 16:
        inf_flags[3] = True
        scalars[5] = 0
        scalars[7] = q - 1
        scalars[9] = 1
        pts[11] = pts[12]  # duplicate point

    xs = fp.pack([p[0] for p in pts])
    ys = fp.pack([p[1] for p in pts])
    inf = jnp.asarray(np.array(inf_flags))
    sc = jnp.asarray(ints_to_limbs(scalars, curve.fr.L))

    plan = MSM(G, n, curve.fr.L, c=c, lanes=lanes, method="window_pallas",
               signed=signed)
    print(f"plan: c={plan.c} signed={plan.signed} nwin={plan.nwin} "
          f"R={plan.R} C={plan.C} TILER={plan.TILER} wchunk={plan.wchunk}",
          flush=True)

    t0 = time.perf_counter()
    out = plan(xs, ys, inf, sc)
    np.asarray(out[0])
    print(f"compile+run: {time.perf_counter()-t0:.1f}s", flush=True)

    if mode == "check":
        x, y, is_inf = G.to_affine(out)
        got = None if bool(np.asarray(is_inf)[0]) else (
            fp.unpack(x)[0], fp.unpack(y)[0])
        eff = [(None if i else p, s)
               for p, s, i in zip(pts, scalars, inf_flags)]
        want = host.msm([p for p, _ in eff], [s for _, s in eff])
        assert got == want, f"MISMATCH\n got={got}\nwant={want}"
        print("OK: bit-exact vs host oracle", flush=True)

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        out = plan(xs, ys, inf, sc)
        np.asarray(out[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"warm: {dt*1e3:.1f} ms  ->  {n/dt:,.0f} points/s", flush=True)


if __name__ == "__main__":
    main()
