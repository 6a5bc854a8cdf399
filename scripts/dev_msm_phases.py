"""Phase-level timing of the Pallas windowed MSM at a given size."""

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
from gnark_tpu.ops import msm as msm_mod
from gnark_tpu.ops.msm import MSM, window_digits, _roll_scan, _reduce


def _force(out):
    """Force completion WITHOUT fetching whole arrays: a 1-element slice
    depends on the full buffer, so fetching 4 bytes blocks until the
    computation ran (block_until_ready alone is not sufficient over the
    remote-TPU tunnel, and full np.asarray fetches of 268 MB
    intermediates measure the tunnel, not the kernel)."""
    def one(a):
        if hasattr(a, "shape"):
            np.asarray(a[(0,) * a.ndim])
        return a
    jax.tree_util.tree_map(one, out)


_NULL_MS = 0.0


def timeit(label, fn, *args, iters=8):
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _force(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:28s} {dt*1e3:8.1f} ms   (-null: {dt*1e3-_NULL_MS:7.1f})",
          flush=True)
    return out


def measure_null():
    """Dispatch + 1-element-fetch floor over the remote tunnel."""
    global _NULL_MS
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8, 128), jnp.uint32)
    _force(f(x))
    t0 = time.perf_counter()
    for _ in range(8):
        _force(f(x))
    _NULL_MS = (time.perf_counter() - t0) / 8 * 1e3
    print(f"{'null dispatch+fetch':28s} {_NULL_MS:8.1f} ms", flush=True)


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    c = int(sys.argv[2]) if len(sys.argv) > 2 else None
    lanes = int(sys.argv[3]) if len(sys.argv) > 3 else None
    signed = bool(int(sys.argv[4])) if len(sys.argv) > 4 else True
    n = 1 << log2n
    curve = BN254
    fp = field_ops(curve.fp)
    G = CurveOps(fp, b=curve.b)
    host = curve.host_g1

    import random
    rng = random.Random(5)
    base_pts = []
    P = curve.g1_gen
    for _ in range(64):
        base_pts.append(P)
        P = host.double(P)
    xs = jnp.tile(fp.pack([p[0] for p in base_pts]), (1, n // 64))
    ys = jnp.tile(fp.pack([p[1] for p in base_pts]), (1, n // 64))
    inf = jnp.zeros((n,), bool)
    scalars = [rng.randrange(curve.fr.modulus) for _ in range(n)]
    sc = jnp.asarray(ints_to_limbs(scalars, curve.fr.L))

    measure_null()
    plan = MSM(G, n, curve.fr.L, c=c, lanes=lanes, method="window_pallas",
               signed=signed)
    print(f"plan: c={plan.c} nwin={plan.nwin} R={plan.R} C={plan.C} "
          f"signed={plan.signed} nb={plan.nb}")
    timeit("FULL plan (chunked)", lambda *a: plan(*a), xs, ys, inf, sc)
    cc, R, C, nwin = plan.c, plan.R, plan.C, plan.nwin
    n_pad = plan.n_pad
    nb = plan.nb
    L = curve.fp.L

    prep = jax.jit(plan._prep_window)
    ptrows, digits, dsigns = timeit("prep (digits + row mirror)",
                                    prep, xs, ys, inf, sc)

    nw = plan.wchunk
    if plan.signed:
        sg_fn = jax.jit(lambda rows, dg, sg: plan._sort_gather(
            rows, dg, nw, sg))
        sx, sy, d_sorted = timeit("sort+gather (packed key)", sg_fn,
                                  ptrows, digits[:nw], dsigns[:nw])
    else:
        sg_fn = jax.jit(lambda rows, dg: plan._sort_gather(rows, dg, nw))
        sx, sy, d_sorted = timeit("sort+gather (packed key)", sg_fn,
                                  ptrows, digits[:nw])
    nwin = nw  # phase timings below are per-chunk

    leaf = jax.jit(lambda a, b: plan._leaf_prefix_pallas(a, b, nwin))
    rows = timeit("leaf kernel (pallas)", leaf, sx, sy)

    @jax.jit
    def lane_fn(rows):
        totals = plan.split_rows(rows[:, (C - 1) * R:, :])
        return plan._lane_offsets_pallas(totals, nwin)

    offs = timeit("lane-offset scan (pallas)", lane_fn, rows)

    bvals = jnp.arange(1, nb + 1, dtype=jnp.int32)

    @jax.jit
    def bounds_fn(d_sorted):
        ends = jax.vmap(lambda d: jnp.searchsorted(d, bvals, side="right"))(d_sorted) - 1
        starts = jax.vmap(lambda d: jnp.searchsorted(d, bvals, side="left"))(d_sorted) - 1
        return ends, starts

    ends, starts = timeit("searchsorted", bounds_fn, d_sorted)

    GC = plan.GC

    @jax.jit
    def bucket_fn(rows, ox, oy, oz, ends, starts):
        offs = (ox, oy, oz)
        orows = jnp.transpose(jnp.concatenate(offs, axis=0), (1, 2, 0))

        def prefix_total(i):
            gi = jnp.maximum(i, 0)
            j = (gi % C) * R + gi // C
            Pp = plan.split_rows(
                jax.vmap(lambda r, e: jnp.take(r, e, axis=0))(rows, j))
            O = plan.split_rows(
                jax.vmap(lambda r, e: jnp.take(r, e, axis=0))(
                    orows, gi // C))
            T = GC.add(Pp, O)
            valid = (i >= 0)[None]
            return (jnp.where(valid, T[0], 0), T[1],
                    jnp.where(valid, T[2], 0))

        return GC.add(prefix_total(ends), GC.neg(prefix_total(starts)))

    buckets = timeit("bucket extraction", bucket_fn, rows, *offs, ends, starts)

    wsum = jax.jit(lambda bx, by, bz: plan._weighted_sum_pallas(
        (bx, by, bz), nwin))
    S = timeit("weighted sum (pallas)", wsum, *buckets)

    fold = jax.jit(lambda sx_, sy_, sz_: plan._horner_fold_pallas(
        (sx_, sy_, sz_)))
    timeit("horner fold (pallas)", fold, *S)


if __name__ == "__main__":
    main()
