"""MSM scaling-efficiency harness (BASELINE.md: report >= 70% MSM scaling
at 2 hosts; 1 chip / 1 host / N hosts).

Only one physical TPU chip is attached in this environment, so by default
this measures strong scaling of the sharded MSM over a virtual CPU device
mesh (algorithmic/communication overhead only — NOT absolute perf; the
per-chip kernel numbers live in bench.py / docs/PERF.md).  On a real
multi-chip slice the same code path measures true ICI scaling: run with
JAX_PLATFORMS=tpu on the slice.

Usage: python bench_scaling.py [n_points_log2]
Prints one JSON line per mesh size with points/s and efficiency vs 1 dev.
"""

import json
import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS") and \
        os.environ.get("_GNARK_SCALING_REEXEC") != "1":
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    env["_GNARK_SCALING_REEXEC"] = "1"
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from gnark_tpu.backend.groth16 import ints_to_limbs
from gnark_tpu.curves import BN254
from gnark_tpu.ops.ec import CurveOps
from gnark_tpu.ops.limbs import field_ops
from gnark_tpu.parallel.sharded_msm import ShardedMSM


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    # CPU mesh: this harness measures the COMMUNICATION structure
    # (shard_map + all-gather fold) — scaling efficiency, not absolute
    # throughput (bench.py owns that).  Real-width BN254 graphs are
    # >30-min single-core XLA CPU compiles even on the ladder path
    # (measured round 4), so the CPU-mesh run uses the 4-limb
    # Goldilocks field: identical sharding/collective graph, 16x
    # smaller kernels.  On a real TPU slice (JAX_PLATFORMS=tpu) the
    # production BN254 windowed plan is used.
    on_cpu = jax.default_backend() == "cpu"
    method = "ladder" if on_cpu else "auto"
    n = 1 << logn
    if on_cpu:
        from gnark_tpu import fields
        gl = fields.FieldSpec(
            name="goldilocks", modulus=(1 << 64) - (1 << 32) + 1,
            multiplicative_generator=7)
        fp = field_ops(gl)
        G = CurveOps(fp)
        rng = np.random.default_rng(1)
        q = gl.modulus

        def rand_ints(k):
            return [int.from_bytes(rng.bytes(8), "little") % q
                    for _ in range(k)]

        xs = fp.pack(rand_ints(n))
        ys = fp.pack(rand_ints(n))
        inf = jnp.zeros((n,), bool)
        sc = jnp.asarray(ints_to_limbs(rand_ints(n), gl.L))
        fr_L = gl.L
        field_tag = "goldilocks"
    else:
        curve = BN254
        fp = field_ops(curve.fp)
        G = CurveOps(fp)
        host = curve.host_g1

        pts = []
        P = curve.g1_gen
        for _ in range(64):
            pts.append(P)
            P = host.double(P)
        xs = jnp.tile(fp.pack([p[0] for p in pts]), (1, n // 64))
        ys = jnp.tile(fp.pack([p[1] for p in pts]), (1, n // 64))
        inf = jnp.zeros((n,), bool)
        rng = np.random.default_rng(1)
        sc = jnp.asarray(ints_to_limbs(
            [int.from_bytes(rng.bytes(31), "little") for _ in range(n)],
            curve.fr.L))
        fr_L = curve.fr.L
        field_tag = "bn254"

    devices = jax.devices()
    base = None
    for ndev in (1, 2, 4, 8):
        if ndev > len(devices):
            break
        mesh = Mesh(np.array(devices[:ndev]).reshape(-1), ("shard",))
        plan = ShardedMSM(G, mesh, "shard", n, fr_L, method=method)
        out = plan(xs, ys, inf, sc)
        np.asarray(out[0])  # force
        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters):
            out = plan(xs, ys, inf, sc)
        np.asarray(out[0][(0,) * out[0].ndim])
        dt = (time.perf_counter() - t0) / iters
        pps = n / dt
        if base is None:
            base = pps
        print(json.dumps({
            "metric":
                f"sharded_msm_{field_tag}_2e{logn}_ndev{ndev}_points_per_s",
            "value": round(pps),
            "unit": "points/s",
            "scaling_efficiency_vs_1dev": round(pps / (base * ndev), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
