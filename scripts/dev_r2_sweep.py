"""Round-2 TPU measurement sweep (run unattended when the tunnel is up).

Measures, in one process (per-config compiles are unavoidable; the axon
tunnel does not load the persistent cache across processes):
  1. G1 windowed MSM at 2^16: unsigned vs signed x MXU-REDC off/on
  2. winner config across sizes 2^12..2^20
  3. fp2 G2 windowed trial at 2^16 (payload-cap check) vs ladder

Every step is fenced with try/except and flushes results immediately —
a late failure keeps earlier numbers.  Usage:
  nohup python -u scripts/dev_r2_sweep.py > /tmp/r2_sweep.log 2>&1 &
"""

import os
import time
import traceback

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
from gnark_tpu.ops.towers import fp2_ops


def make_inputs(curve, n, seed=5, g2=False):
    import random
    rng = random.Random(seed)
    if g2:
        F = fp2_ops(curve.fp, curve.fp2_beta)
        host = curve.host_g2
        gen = curve.g2_gen
    else:
        F = field_ops(curve.fp)
        host = curve.host_g1
        gen = curve.g1_gen
    base = []
    P = gen
    for _ in range(64):
        base.append(P)
        P = host.double(P)
    xs = jnp.tile(F.pack([p[0] for p in base]), (1, n // 64))
    ys = jnp.tile(F.pack([p[1] for p in base]), (1, n // 64))
    inf = jnp.zeros((n,), bool)
    scalars = [rng.randrange(curve.fr.modulus) for _ in range(n)]
    sc = jnp.asarray(ints_to_limbs(scalars, curve.fr.L))
    return F, xs, ys, inf, sc


def bench_plan(plan, xs, ys, inf, sc, iters=3):
    t0 = time.perf_counter()
    out = plan(xs, ys, inf, sc)
    np.asarray(out[0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = plan(xs, ys, inf, sc)
        np.asarray(out[0])
    warm = (time.perf_counter() - t0) / iters
    return compile_s, warm


def step(label, fn):
    print(f"=== {label}", flush=True)
    try:
        fn()
    except Exception:
        print(f"FAILED {label}", flush=True)
        traceback.print_exc()


def main():
    print("devices:", jax.devices(), flush=True)
    curve = BN254
    fp = field_ops(curve.fp)
    G = CurveOps(fp, b=curve.b)
    n16 = 1 << 16
    _, xs, ys, inf, sc = make_inputs(curve, n16)

    # correctness first: windowed (unsigned + signed) vs host oracle at
    # n = 8192 with adversarial entries — the whole sweep is meaningless
    # if these fail, and a pass validates the chunked orchestration +
    # signed recoding on real hardware
    def check(signed):
        import random
        rng = random.Random(3)
        n = 8192
        host = curve.host_g1
        q = curve.fr.modulus
        base = []
        P = curve.g1_gen
        for _ in range(64):
            base.append(P)
            P = host.double(P)
        pts = [base[i % 64] for i in range(n)]
        scalars = [rng.randrange(q) for _ in range(n)]
        inf_flags = [False] * n
        inf_flags[3] = True
        scalars[5] = 0
        scalars[7] = q - 1
        pts[11] = pts[12]
        cxs = fp.pack([p[0] for p in pts])
        cys = fp.pack([p[1] for p in pts])
        cinf = jnp.asarray(np.array(inf_flags))
        csc = jnp.asarray(ints_to_limbs(scalars, curve.fr.L))
        plan = MSM(G, n, curve.fr.L, method="window_pallas", signed=signed)
        out = plan(cxs, cys, cinf, csc)
        x, y, is_inf = G.to_affine(out)
        got = (fp.unpack(x)[0], fp.unpack(y)[0])
        eff = [(None if i else p, s)
               for p, s, i in zip(pts, scalars, inf_flags)]
        want = host.msm([p for p, _ in eff], [s for _, s in eff])
        assert got == want, (signed, got, want)
        print(f"CHECK signed={signed}: bit-exact vs host oracle", flush=True)

    step("check unsigned", lambda: check(False))
    step("check signed", lambda: check(True))

    results = {}

    def ab(signed, mxu):
        key = f"2^16 signed={signed} mxu={mxu}"

        def run():
            with mxu_redc(mxu):
                plan = MSM(G, n16, curve.fr.L, method="window_pallas",
                           signed=signed)
                comp, warm = bench_plan(plan, xs, ys, inf, sc)
            results[key] = warm
            print(f"{key}: compile {comp:.0f}s warm {warm*1e3:.1f} ms "
                  f"-> {n16/warm:,.0f} pts/s", flush=True)
        step(key, run)

    ab(False, False)      # baseline config (r2 shipped)
    ab(False, True)
    ab(True, False)
    ab(True, True)

    # winner across sizes
    def sweep():
        best = min(results, key=results.get) if results else None
        print("winner:", best, flush=True)
        signed = "signed=True" in (best or "")
        mxu = "mxu=True" in (best or "")
        for lg in (12, 14, 18, 20):
            n = 1 << lg
            _, xs2, ys2, inf2, sc2 = make_inputs(curve, n)
            with mxu_redc(mxu):
                plan = MSM(G, n, curve.fr.L, method="window_pallas",
                           signed=signed)
                comp, warm = bench_plan(plan, xs2, ys2, inf2, sc2)
            print(f"2^{lg}: warm {warm*1e3:.1f} ms -> {n/warm:,.0f} pts/s "
                  f"(compile {comp:.0f}s)", flush=True)
    step("size sweep", sweep)

    # fp2 G2 windowed trial (payload-cap check) vs ladder
    def g2trial():
        F2, xs2, ys2, inf2, sc2 = make_inputs(curve, n16, g2=True)
        G2 = CurveOps(F2, b=curve.b2)
        plan = MSM(G2, n16, curve.fr.L, method="window_pallas")
        comp, warm = bench_plan(plan, xs2, ys2, inf2, sc2)
        print(f"G2 windowed 2^16: compile {comp:.0f}s warm {warm*1e3:.1f} ms "
              f"-> {n16/warm:,.0f} pts/s", flush=True)
    step("G2 windowed trial", g2trial)

    def g2ladder():
        F2, xs2, ys2, inf2, sc2 = make_inputs(curve, n16, g2=True)
        G2 = CurveOps(F2, b=curve.b2)
        plan = MSM(G2, n16, curve.fr.L, method="ladder_pallas")
        comp, warm = bench_plan(plan, xs2, ys2, inf2, sc2)
        print(f"G2 ladder 2^16: warm {warm*1e3:.1f} ms "
              f"-> {n16/warm:,.0f} pts/s", flush=True)
    step("G2 ladder reference", g2ladder)

    print("SWEEP DONE", flush=True)


if __name__ == "__main__":
    main()
