"""Cumulative-prefix phase profiling of the windowed-Pallas MSM.

Per-phase isolation timing over the remote-TPU tunnel is unreliable
(each isolated jit pays its own dispatch/layout/fetch overheads: at
2^16 the isolated phases sum to ~3x the full plan).  This measures the
pipeline PREFIXES instead — prep; prep+sort; prep+sort+leaf; ... — each
as one jit, timed with back-to-back dispatches and a single one-element
fetch (the bench.py methodology).  Marginal phase cost = difference of
adjacent prefixes, all overheads common-mode.

Usage: python scripts/dev_msm_cumulative.py [log2n] [c] [signed]
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


def timeit(label, fn, args, prev_ms=0.0, iters=8):
    out = fn(*args)          # compile + first run
    jax.tree_util.tree_map(
        lambda a: np.asarray(a[(0,) * a.ndim]) if hasattr(a, "shape") else a,
        out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaves = [a for a in jax.tree_util.tree_leaves(out) if hasattr(a, "shape")]
    np.asarray(leaves[-1][(0,) * leaves[-1].ndim])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:34s} {dt:8.1f} ms   (marginal: {dt - prev_ms:+8.1f})",
          flush=True)
    return dt


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    c = int(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2] != "-" else None
    signed = bool(int(sys.argv[3])) if len(sys.argv) > 3 else True
    n = 1 << log2n
    curve = BN254
    fp = field_ops(curve.fp)
    G = CurveOps(fp, b=curve.b)
    host = curve.host_g1

    rng = np.random.default_rng(7)
    base_pts, P = [], curve.g1_gen
    for _ in range(64):
        base_pts.append(P)
        P = host.double(P)
    xs = jnp.tile(fp.pack([p[0] for p in base_pts]), (1, n // 64))
    ys = jnp.tile(fp.pack([p[1] for p in base_pts]), (1, n // 64))
    inf = jnp.zeros((n,), bool)
    scalars = [int.from_bytes(rng.bytes(31), "little") for _ in range(n)]
    sc = jnp.asarray(ints_to_limbs(scalars, curve.fr.L))

    plan = MSM(G, n, curve.fr.L, c=c, method="window_pallas", signed=signed)
    print(f"plan: c={plan.c} nwin={plan.nwin} R={plan.R} C={plan.C} "
          f"signed={plan.signed} nb={plan.nb} wchunk={plan.wchunk}",
          flush=True)
    nw = plan.wchunk
    L = curve.fp.L
    R, C = plan.R, plan.C

    def prep(x, y, i, s):
        return plan._prep_window(x, y, i, s)

    def upto_sort(x, y, i, s):
        ptrows, dg, sg = plan._prep_window(x, y, i, s)
        return plan._sort_gather(ptrows, dg[:nw], nw,
                                 sg[:nw] if plan.signed else None)

    def split_rows(g):
        t = jnp.transpose(g, (2, 0, 1))
        return (t[:L], t[L:2 * L], t[2 * L:])

    def upto_leaf(x, y, i, s):
        sx, sy, d_sorted = upto_sort(x, y, i, s)
        return plan._leaf_prefix_pallas(sx, sy, nw), d_sorted

    def upto_lane(x, y, i, s):
        rows, d_sorted = upto_leaf(x, y, i, s)
        totals = split_rows(rows[:, (C - 1) * R:, :])
        return rows, plan._lane_offsets_pallas(totals, nw), d_sorted

    def upto_buckets(x, y, i, s):
        rows, offs, d_sorted = upto_lane(x, y, i, s)
        orows = jnp.transpose(jnp.concatenate(offs, axis=0), (1, 2, 0))
        bvals = jnp.arange(0, plan.nb + 1, dtype=jnp.int32)
        ends = jax.vmap(
            lambda d: jnp.searchsorted(d, bvals, side="right"))(d_sorted) - 1

        def prefix_total(idx):
            gi = jnp.maximum(idx, 0)
            j = (gi % C) * R + gi // C
            Pp = split_rows(
                jax.vmap(lambda r, e: jnp.take(r, e, axis=0))(rows, j))
            O = split_rows(
                jax.vmap(lambda r, e: jnp.take(r, e, axis=0))(
                    orows, gi // C))
            T = plan.GC.add(Pp, O)
            valid = (idx >= 0)[None]
            return (jnp.where(valid, T[0], 0), T[1],
                    jnp.where(valid, T[2], 0))

        PE = prefix_total(ends)
        return plan.GC.add(
            tuple(a[:, :, 1:] for a in PE),
            plan.GC.neg(tuple(a[:, :, :-1] for a in PE)))

    def upto_wsum(x, y, i, s):
        return plan._weighted_sum_pallas(upto_buckets(x, y, i, s), nw)

    args = (xs, ys, inf, sc)
    t = timeit("prep (digits + row mirror)", jax.jit(prep), args)
    t = timeit("+ sort+gather", jax.jit(upto_sort), args, t)
    t = timeit("+ leaf prefix (pallas)", jax.jit(upto_leaf), args, t)
    t = timeit("+ lane offsets (pallas)", jax.jit(upto_lane), args, t)
    t = timeit("+ bucket extraction", jax.jit(upto_buckets), args, t)
    t = timeit("+ weighted sum (pallas)", jax.jit(upto_wsum), args, t)
    t = timeit("FULL plan (chunked jits)", lambda *a: plan(*a), args, t)

    # oracle
    r = curve.fr.modulus
    total = sum(s << (i % 64) for i, s in enumerate(scalars)) % r
    expected = host.scalar_mul(curve.g1_gen, total)
    out = plan(*args)
    X, Y, Z = (fp.unpack(np.asarray(a))[0] for a in out)
    p = curve.fp.modulus
    zi = pow(Z, -1, p)
    got = (X * zi * zi % p, Y * zi * zi * zi % p)
    print("exact:", got == expected, flush=True)


if __name__ == "__main__":
    main()
