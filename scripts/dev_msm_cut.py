"""Exact MSM phase attribution: time truncated prefixes of the REAL
chunk pipeline (one jit per cut), dispatch 8x with ONE trailing
1-element fetch (in-order device stream => all iterations completed).
Adjacent differences = true phase costs including the fusion context —
isolated per-phase jits overestimate (they lose fusion and pay the
~32 ms tunnel round-trip per call; see measure_null).

Usage: python scripts/dev_msm_cut.py [log2n] [signed01]
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


def timed(label, fn, args, iters=8):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:42s} {dt:8.1f} ms", flush=True)
    return dt


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    signed = bool(int(sys.argv[2])) if len(sys.argv) > 2 else False
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
    xs = jnp.tile(fp.pack([p[0] for p in base_pts]), (1, n // 64))
    ys = jnp.tile(fp.pack([p[1] for p in base_pts]), (1, n // 64))
    inf = jnp.zeros((n,), bool)
    scalars = [int.from_bytes(rng.bytes(31), "little") for _ in range(n)]
    sc = jnp.asarray(ints_to_limbs(scalars, curve.fr.L))

    plan = MSM(G, n, curve.fr.L, method="window_pallas", signed=signed)
    print(f"plan: c={plan.c} nwin={plan.nwin} R={plan.R} C={plan.C} "
          f"wchunk={plan.wchunk} signed={plan.signed}", flush=True)
    L, R, C = fp.L, plan.R, plan.C
    nw = plan.wchunk
    nb = plan.nb

    # cuts of ONE chunk's pipeline (window chunk 0)
    def prep(xs, ys, inf, sc):
        return plan._prep_window(xs, ys, inf, sc)

    ptrows, digits, dsigns = jax.jit(prep)(xs, ys, inf, sc)
    dg = digits[:nw]
    sg = dsigns[:nw] if plan.signed else None

    def cut_sort(ptrows, dg, sg=None):
        return plan._sort_gather(ptrows, dg, nw, sg)

    def cut_leaf(ptrows, dg, sg=None):
        sx, sy, d_sorted = plan._sort_gather(ptrows, dg, nw, sg)
        return plan._leaf_prefix_pallas(sx, sy, nw)

    def cut_lane(ptrows, dg, sg=None):
        sx, sy, d_sorted = plan._sort_gather(ptrows, dg, nw, sg)
        rows = plan._leaf_prefix_pallas(sx, sy, nw)
        totals = plan.split_rows(rows[:, (C - 1) * R:, :])
        return plan._lane_offsets_pallas(totals, nw)

    def cut_buckets(ptrows, dg, sg=None):
        sx, sy, d_sorted = plan._sort_gather(ptrows, dg, nw, sg)
        rows = plan._leaf_prefix_pallas(sx, sy, nw)
        totals = plan.split_rows(rows[:, (C - 1) * R:, :])
        offs = plan._lane_offsets_pallas(totals, nw)
        orows = jnp.transpose(jnp.concatenate(offs, axis=0), (1, 2, 0))
        bvals = jnp.arange(0, nb + 1, dtype=jnp.int32)
        ends = jax.vmap(
            lambda d: jnp.searchsorted(d, bvals, side="right"))(
                d_sorted) - 1

        def prefix_total(i):
            gi = jnp.maximum(i, 0)
            j = (gi % C) * R + gi // C
            Pp = plan.split_rows(
                jax.vmap(lambda r, e: jnp.take(r, e, axis=0))(rows, j))
            O = plan.split_rows(
                jax.vmap(lambda r, e: jnp.take(r, e, axis=0))(
                    orows, gi // C))
            T = plan.GC.add(Pp, O)
            valid = (i >= 0)[None]
            return (jnp.where(valid, T[0], 0), T[1],
                    jnp.where(valid, T[2], 0))

        PE = prefix_total(ends)
        return plan.GC.add(tuple(a[:, :, 1:] for a in PE),
                           plan.GC.neg(tuple(a[:, :, :-1] for a in PE)))

    def cut_wsum(ptrows, dg, sg=None):
        return plan._window_chunk(ptrows, dg, sg)

    args = (ptrows, dg) + ((sg,) if plan.signed else ())
    prev = 0.0
    for label, fn in [("sort+gather", cut_sort), ("+leaf", cut_leaf),
                      ("+lane offsets", cut_lane),
                      ("+bucket extraction", cut_buckets),
                      ("+weighted sum (full chunk)", cut_wsum)]:
        dt = timed(label, jax.jit(fn), args)
        print(f"{'':42s} delta {dt - prev:8.1f} ms", flush=True)
        prev = dt

    timed("prep (separate)", jax.jit(prep), (xs, ys, inf, sc))
    timed("FULL plan (all chunks + fold)",
          lambda *a: plan(*a), (xs, ys, inf, sc))


if __name__ == "__main__":
    main()
