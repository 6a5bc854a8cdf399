"""Round-3 MSM lever comparison at a given size (default 2^16, BN254 G1).

Measures the full windowed-Pallas plan under the candidate round-3
configurations, each verified against a cheap host oracle (points are
64 distinct multiples of G, so the expected result is one host scalar
mul of the digit-weighted scalar sum):

  base            unsigned c=8 (round-2 default)
  signed          signed-digit c=9 windows (29 vs 32 windows)
  mxu             MXU-REDC route (REDC const-mults as bf16 matmuls)
  signed+mxu      both

Usage: python scripts/dev_r3_msm_variants.py [log2n] [variants,csv]
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
from gnark_tpu.ops.limbs import field_ops, mxu_redc
from gnark_tpu.ops.msm import MSM


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    which = (sys.argv[2].split(",") if len(sys.argv) > 2
             else ["base", "signed", "mxu", "signed+mxu"])
    n = 1 << log2n
    curve = BN254
    fp = field_ops(curve.fp)
    G = CurveOps(fp, b=curve.b)
    host = curve.host_g1

    rng = np.random.default_rng(7)
    base_pts = []
    P = curve.g1_gen
    for _ in range(64):
        base_pts.append(P)
        P = host.double(P)
    reps = n // 64
    xs = jnp.tile(fp.pack([p[0] for p in base_pts]), (1, reps))
    ys = jnp.tile(fp.pack([p[1] for p in base_pts]), (1, reps))
    inf = jnp.zeros((n,), bool)
    scalars = [int.from_bytes(rng.bytes(31), "little") for _ in range(n)]
    sc = jnp.asarray(ints_to_limbs(scalars, curve.fr.L))

    # oracle: point i is 2^(i mod 64) G -> total = (sum_i s_i 2^(i%64)) G
    r = curve.fr.modulus
    total = sum(s << (i % 64) for i, s in enumerate(scalars)) % r
    expected = host.scalar_mul(curve.g1_gen, total)

    for name in which:
        # variant syntax: [signed][+mxu][@c]  e.g. signed@11, signed+mxu@9
        cval = None
        if "@" in name:
            name, cs = name.split("@")
            cval = int(cs)
        signed = "signed" in name
        mxu = "mxu" in name
        t0 = time.perf_counter()
        with mxu_redc(mxu):
            plan = MSM(G, n, curve.fr.L, method="window_pallas",
                       signed=signed, c=cval)
            out = plan(xs, ys, inf, sc)
            np.asarray(out[0])
            t_compile = time.perf_counter() - t0
            iters = 8
            t0 = time.perf_counter()
            for _ in range(iters):
                out = plan(xs, ys, inf, sc)
            np.asarray(out[0][(0,) * out[0].ndim])  # bench.py methodology
            dt = (time.perf_counter() - t0) / iters
        X, Y, Z = (fp.unpack(np.asarray(a))[0] for a in out)
        p = curve.fp.modulus
        zi = pow(Z, -1, p)
        got = (X * zi * zi % p, Y * zi * zi * zi % p)
        ok = got == expected
        print(f"{name:12s} c={plan.c} nwin={plan.nwin} "
              f"first+compile={t_compile:7.1f}s warm={dt*1e3:8.1f} ms "
              f"{n/dt/1e3:8.1f}k pts/s exact={ok}", flush=True)
        if not ok:
            print(f"  got      {got}\n  expected {expected}", flush=True)


if __name__ == "__main__":
    main()
