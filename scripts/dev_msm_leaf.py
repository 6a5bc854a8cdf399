"""Time ONLY the Pallas leaf kernel + lane/bucket phases at 2^16."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_enable_compilation_cache", True)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from gnark_tpu.curves import BN254
from gnark_tpu.ops.ec import CurveOps
from gnark_tpu.ops.limbs import field_ops
from gnark_tpu.ops.msm import MSM, _roll_scan, _reduce

which = sys.argv[1] if len(sys.argv) > 1 else "leaf"
log2n = int(sys.argv[2]) if len(sys.argv) > 2 else 16
n = 1 << log2n
fp = field_ops(BN254.fp)
G = CurveOps(fp, b=curve.b)
plan = MSM(G, n, BN254.fr.L, method="window_pallas")
cc, R, C, nwin, L = plan.c, plan.R, plan.C, plan.nwin, BN254.fp.L
print(f"plan c={cc} nwin={nwin} R={R} C={C}", flush=True)
rng = np.random.default_rng(0)

def fetch_tiny(out):
    # device->host fetch of ONE element per output: forces completion
    # over the remote tunnel without shipping the full buffers back
    for a in jax.tree_util.tree_leaves(out):
        np.asarray(a[tuple([slice(0, 1)] * a.ndim)])

def timeit(label, fn, *args, iters=3):
    out = fn(*args)
    fetch_tiny(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        fetch_tiny(out)
    print(f"{label}: {(time.perf_counter()-t0)/iters*1e3:.1f} ms", flush=True)

if which == "leaf":
    sx = jnp.asarray(rng.integers(0, 1<<16, (nwin, C, L, R), dtype=np.uint32))
    sy = jnp.asarray(rng.integers(0, 1<<16, (nwin, C, L, R), dtype=np.uint32))
    leaf = jax.jit(lambda a, b: plan._leaf_prefix_pallas(a, b, nwin))
    timeit("leaf_kernel", leaf, sx, sy)
elif which == "lane":
    T = tuple(jnp.asarray(rng.integers(0, 1<<16, (L, nwin, R), dtype=np.uint32)) for _ in range(3))
    lane = jax.jit(lambda x, y, z: _roll_scan(G, (x, y, z), R))
    timeit("lane_scan", lane, *T)
elif which == "wsum":
    nb = (1 << cc) - 1
    B = tuple(jnp.asarray(rng.integers(0, 1<<16, (L, nwin, nb), dtype=np.uint32)) for _ in range(3))
    wsum = jax.jit(lambda x, y, z: _reduce(G, _roll_scan(G, (x, y, z), nb, reverse=True), nb))
    timeit("wsum", wsum, *B)
elif which == "sortgather":
    xs = jnp.asarray(rng.integers(0, 1<<16, (L, n), dtype=np.uint32))
    digits = jnp.asarray(rng.integers(0, 1<<cc, (nwin, n), dtype=np.int32))
    @jax.jit
    def sg(dg, xs):
        orders = jax.vmap(jnp.argsort)(dg)
        ord2 = jnp.transpose(orders.reshape(nwin, R, C), (0, 2, 1))
        sx = jnp.transpose(jnp.take(xs, ord2, axis=1), (1, 2, 0, 3))
        return jnp.take_along_axis(dg, orders, axis=1), sx
    timeit("sort+1gather", sg, digits, xs)
