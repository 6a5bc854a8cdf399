"""Benchmark entry point (driver-run, real TPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric: G1 MSM throughput (points/s) at n = 2^16 — THE Groth16
prover hot loop (SURVEY §3.2: MSM is ~75% of prove at scale;
internal/backend/bn254/groth16/prove.go:155-241).  vs_baseline is the
ratio against gnark's published-order CPU throughput (~1.7e6 points/s on
a 64-core x86 host for BN254 G1 MultiExp), the BASELINE.md north-star
config 4 proxy.

Round-2 state: the windowed Pippenger's leaf phase now runs as a
Pallas kernel with the accumulator VMEM-resident across the whole
per-lane prefix scan (ops/msm.py _leaf_prefix_pallas); bucket
extraction and the weighted suffix reduction remain XLA.  Bit-exact vs
the host oracle at every size tested (docs/PERF.md).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_compilation_cache", True)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

GNARK_CPU_MSM_POINTS_PER_S = 1.7e6  # 64-core x86 order-of-magnitude anchor


def main():
    from gnark_tpu.backend.groth16 import ints_to_limbs
    from gnark_tpu.curves import BN254
    from gnark_tpu.ops.ec import CurveOps
    from gnark_tpu.ops.limbs import field_ops
    from gnark_tpu.ops.msm import MSM

    n = 1 << 16
    curve = BN254
    fp = field_ops(curve.fp)
    G = CurveOps(fp, b=curve.b)
    host = curve.host_g1

    # points: random multiples of the generator via doubling chain (host,
    # cheap); scalars: full-width random
    rng = np.random.default_rng(7)
    base_pts = []
    P = curve.g1_gen
    for _ in range(64):
        base_pts.append(P)
        P = host.double(P)
    # tile the 64 distinct points; MSM correctness doesn't need distinctness
    xs_h = [p[0] for p in base_pts]
    ys_h = [p[1] for p in base_pts]
    reps = n // 64
    xs = jnp.tile(fp.pack(xs_h), (1, reps))
    ys = jnp.tile(fp.pack(ys_h), (1, reps))
    inf = jnp.zeros((n,), bool)
    scalars = [int.from_bytes(rng.bytes(31), "little") for _ in range(n)]
    sc = jnp.asarray(ints_to_limbs(scalars, curve.fr.L))

    # the DEFAULT plan (signed/method auto-select) — the same
    # configuration groth16.prove / kzg.commit construct, so the
    # headline number is the product's kernel, not a bench-only config
    plan = MSM(G, n, curve.fr.L)
    out = plan(xs, ys, inf, sc)  # compile + first run
    np.asarray(out[0])  # force full execution (block_until_ready is not
    # sufficient over the remote-TPU tunnel: only a device-to-host fetch
    # guarantees the computation ran to completion)

    # correctness oracle: point i is 2^(i mod 64) * G, so the expected
    # result is ONE host scalar-mul of the weighted scalar sum — a wrong
    # kernel can never post a headline number (VERDICT r3 weak #9)
    r_mod = curve.fr.modulus
    total = sum(s << (i % 64) for i, s in enumerate(scalars)) % r_mod
    expected = host.scalar_mul(curve.g1_gen, total)
    X, Y, Z = (fp.unpack(np.asarray(a))[0] for a in out)
    p_mod = curve.fp.modulus
    zi = pow(Z, -1, p_mod)
    got = (X * zi * zi % p_mod, Y * zi * zi * zi % p_mod)
    assert got == expected, f"MSM MISMATCH: {got} != {expected}"

    # dispatch iters back-to-back and fetch ONE element of the LAST
    # output only: the device stream executes in order, so the last
    # result completing implies all did — this amortizes the ~32 ms
    # dispatch+fetch round-trip of the remote-TPU tunnel (measured by
    # scripts/dev_msm_phases.py measure_null) instead of paying it per
    # iteration, which would understate kernel throughput ~30%.
    #
    # Measured (round 5, /tmp/bench_bisect): the FIRST 8-iteration batch
    # after a single warm-up run posts ~128 ms/iter; every later batch
    # posts ~70 ms/iter — one executable run does not fully warm the
    # remote-TPU path.  So: one full warm-up BATCH, then min-of-3 timed
    # batches (min is also robust to transient host contention — this
    # 1-core host starves the dispatch thread under any concurrent load,
    # the round-4 467k/528k skews).
    iters, batches = 8, 3

    def timed_batch():
        t0 = time.perf_counter()
        for _ in range(iters):
            out = plan(xs, ys, inf, sc)
        np.asarray(out[0][(0,) * out[0].ndim])
        return (time.perf_counter() - t0) / iters

    timed_batch()  # warm-up batch (first-batch slow path, see above)
    dt = min(timed_batch() for _ in range(batches))

    pts_per_s = n / dt
    print(json.dumps({
        "metric": "msm_g1_bn254_2e16_points_per_s",
        "value": round(pts_per_s),
        "unit": "points/s",
        "vs_baseline": round(pts_per_s / GNARK_CPU_MSM_POINTS_PER_S, 4),
    }))


if __name__ == "__main__":
    sys.exit(main())
