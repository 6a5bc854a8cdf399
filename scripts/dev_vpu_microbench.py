"""VPU throughput microbenchmarks: u32 mul vs add vs f32 FMA inside one
Pallas kernel — establishes the integer-multiply ceiling that bounds the
limb-arithmetic design (16-bit limbs in u32 lanes vs float-limb
alternatives)."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_enable_compilation_cache", True)

REPS = 512          # ops per element per kernel pass
SHAPE = (256, 512)  # block


def make(op):
    def kernel(x_ref, y_ref, o_ref):
        x = x_ref[:]
        y = y_ref[:]
        # 4 independent chains so latency doesn't bound throughput
        if op == "fma_f32":
            accs = [x + float(i) for i in range(4)]
        else:
            accs = [x + jnp.uint32(i) for i in range(4)]
        for _ in range(REPS // 4):
            for i in range(4):
                if op == "mul_u32":
                    accs[i] = accs[i] * y
                elif op == "add_u32":
                    accs[i] = accs[i] + y
                elif op == "fma_f32":
                    accs[i] = accs[i] * y + y
                elif op == "mul16_u32":
                    accs[i] = (accs[i] & jnp.uint32(0xFFFF)) * \
                        (y & jnp.uint32(0xFFFF))
        o_ref[:] = accs[0] + accs[1] + accs[2] + accs[3]

    dtype = jnp.float32 if op == "fma_f32" else jnp.uint32

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(SHAPE, dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    CHAIN = 64

    @jax.jit
    def run(x, y):
        # chain CHAIN kernel invocations in ONE dispatch so the remote
        # tunnel's ~1ms per-call latency amortizes away
        return jax.lax.fori_loop(0, CHAIN, lambda i, a: call(a, y), x)

    return run, dtype


def main():
    rng = np.random.default_rng(0)
    for op in ("mul_u32", "mul16_u32", "add_u32", "fma_f32"):
        run, dtype = make(op)
        if dtype == jnp.float32:
            x = jnp.asarray(rng.random(SHAPE, np.float32))
            y = jnp.asarray(rng.random(SHAPE, np.float32))
        else:
            x = jnp.asarray(rng.integers(0, 1 << 16, SHAPE, dtype=np.uint32))
            y = jnp.asarray(rng.integers(0, 1 << 16, SHAPE, dtype=np.uint32))
        out = run(x, y)
        np.asarray(out[:1, :1])
        iters = 30
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run(x, y)
        np.asarray(out[:1, :1])
        dt = (time.perf_counter() - t0) / iters
        ops = 64 * REPS * SHAPE[0] * SHAPE[1] * (2 if op == "fma_f32" else 1)
        print(f"{op:10s}: {dt*1e6:8.1f} us -> {ops/dt/1e12:.2f} Tops/s",
              flush=True)


if __name__ == "__main__":
    main()
