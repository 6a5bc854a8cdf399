"""Micro-benchmark: boundary-prefix extraction formulations.

The round-4 cumulative profile pinned ~36 ms of the 2^16 MSM on the
bucket-boundary gathers (take_along_axis along the MINOR axis of the
[nw, L, C*R] prefix arrays + the lane-offset gather).  This measures
candidate replacements in isolation:

  taa        take_along_axis on the minor axis (current)
  onehot     chunked one-hot f32 matmul (compare + dot over CR chunks)
  twostage   minor-gather [C,R] axis split: gather R then C
  rowmajor   row-gather from a [nw, CR, 3L] mirror (major-ish axis)

Usage: python scripts/dev_gather_micro.py [log2n] [variants,csv]
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


def timeit(label, fn, *args, iters=8):
    out = fn(*args)
    leaves = [a for a in jax.tree_util.tree_leaves(out) if hasattr(a, "shape")]
    np.asarray(leaves[-1][(0,) * leaves[-1].ndim])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaves = [a for a in jax.tree_util.tree_leaves(out) if hasattr(a, "shape")]
    np.asarray(leaves[-1][(0,) * leaves[-1].ndim])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:28s} {dt:8.2f} ms", flush=True)
    return out


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    which = (sys.argv[2].split(",")
             if len(sys.argv) > 2 else ["taa", "onehot", "twostage"])
    CR = 1 << log2n
    nw, L, nb = 24, 16, 1024
    C, R = 128, CR // 128
    rng = np.random.default_rng(3)

    flat = tuple(
        jnp.asarray(rng.integers(0, 1 << 16, size=(nw, L, CR), dtype=np.uint32))
        for _ in range(3))
    # sorted boundary indices per window (monotone like real ends)
    ends = np.sort(rng.integers(0, CR, size=(nw, nb + 1)), axis=1)
    ends = jnp.asarray(ends.astype(np.int32))

    def ref_vals():
        out = np.stack([np.take_along_axis(
            np.asarray(a), np.asarray(ends)[:, None, :], axis=2)
            for a in flat])
        return out

    want = ref_vals()

    def check(got):
        got = np.stack([np.asarray(a) for a in got])
        if got.shape != want.shape:
            got = got.reshape(want.shape)
        assert (got == want).all(), "gather mismatch"

    if "taa" in which:
        def taa(flat, ends):
            idx = jnp.broadcast_to(ends[:, None, :], (nw, L, nb + 1))
            return tuple(jnp.take_along_axis(a, idx, axis=2) for a in flat)

        out = timeit("take_along_axis (minor)", jax.jit(taa), flat, ends)
        check(out)

    if "onehot" in which:
        CH = 512

        def onehot(flat, ends):
            # out[w, l, k] = sum_j flat[w, l, j] * (j == ends[w, k])
            # chunked over j so the one-hot tile stays small; f32 exact
            # for 16-bit limb values
            acc = jnp.zeros((nw, L, nb + 1), jnp.float32)
            accs = [acc, acc, acc]
            iota = jax.lax.broadcasted_iota(jnp.int32, (nw, CH, nb + 1), 1)
            for j0 in range(0, CR, CH):
                oh = (ends[:, None, :] == (iota + j0)).astype(jnp.float32)
                for t in range(3):
                    chunk = jax.lax.convert_element_type(
                        flat[t][:, :, j0:j0 + CH].astype(jnp.int32),
                        jnp.float32)
                    accs[t] = accs[t] + jax.lax.dot_general(
                        chunk, oh, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
            return tuple(a.astype(jnp.int32).astype(jnp.uint32) for a in accs)

        out = timeit("one-hot f32 dot (chunked)", jax.jit(onehot), flat, ends)
        check(out)

    if "twostage" in which:
        def twostage(flat, ends):
            # j = cstep*R + r; stage 1 gathers the R axis (minor, width R)
            # giving [nw, L, C, nb+1]; stage 2 gathers C (now an index per
            # output element on the second-minor axis)
            rr = ends % R
            cc = ends // R
            f4 = tuple(a.reshape(nw, L, C, R) for a in flat)
            i_r = jnp.broadcast_to(rr[:, None, None, :], (nw, L, C, nb + 1))
            g1 = tuple(jnp.take_along_axis(a, i_r, axis=3) for a in f4)
            i_c = jnp.broadcast_to(cc[:, None, None, :], (nw, L, 1, nb + 1))
            g2 = tuple(jnp.take_along_axis(a, i_c, axis=2)[:, :, 0]
                       for a in g1)
            return g2

        out = timeit("two-stage (R then C)", jax.jit(twostage), flat, ends)
        check(out)

    if "rowmajor" in which:
        rows = jnp.concatenate(
            [jnp.transpose(a, (0, 2, 1)) for a in flat], axis=2)  # [nw,CR,3L]

        def rowm(rows, ends):
            g = jax.vmap(lambda r, e: jnp.take(r, e, axis=0))(rows, ends)
            return g  # [nw, nb+1, 3L]

        out = timeit("row gather [nw,CR,3L]", jax.jit(rowm), rows, ends)
        g = np.asarray(out)
        got = np.stack([np.transpose(g[:, :, t * L:(t + 1) * L], (0, 2, 1))
                        for t in range(3)])
        assert (got == want).all(), "rowmajor mismatch"


if __name__ == "__main__":
    main()
