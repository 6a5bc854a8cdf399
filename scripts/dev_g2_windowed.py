"""Validate + time the WINDOWED fp2 G2 MSM on TPU (VERDICT r4 task 4).

The fp2 windowed plan per-chunk jit ships <=8 windows/module (under the
remote-compile payload cap); this measures it against the Pallas ladder
it would replace (the ~4 s dominant term of the 2^16 e2e prove) and
verifies both against the weighted-scalar-sum host oracle.

Usage: python scripts/dev_g2_windowed.py [log2n] [ladder|windowed|both]
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

from gnark_tpu.backend.groth16 import _CurveKernels, ints_to_limbs
from gnark_tpu.curves import BN254
from gnark_tpu.ops.msm import MSM


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    which = sys.argv[2] if len(sys.argv) > 2 else "both"
    n = 1 << log2n
    curve = BN254
    K = _CurveKernels(curve)
    host2 = curve.host_g2
    fp2 = K.fp2

    rng = np.random.default_rng(11)
    base_pts, P = [], curve.g2_gen
    for _ in range(64):
        base_pts.append(P)
        P = host2.double(P)
    xs = jnp.tile(fp2.pack([p[0] for p in base_pts]), (1, n // 64))
    ys = jnp.tile(fp2.pack([p[1] for p in base_pts]), (1, n // 64))
    inf = jnp.zeros((n,), bool)
    scalars = [int.from_bytes(rng.bytes(31), "little") for _ in range(n)]
    sc = jnp.asarray(ints_to_limbs(scalars, curve.fr.L))

    r = curve.fr.modulus
    total = sum(s << (i % 64) for i, s in enumerate(scalars)) % r
    expected = host2.scalar_mul(curve.g2_gen, total)

    def check(out):
        X, Y, Z = (fp2.unpack(np.asarray(a))[0] for a in out)
        # identity result (Z = 0) first — inv(0) raises
        if Z == host2.F.zero:
            return expected is None
        # fp2 Jacobian -> affine on host ints
        inv = host2.F.inv(Z)
        i2 = host2.F.mul(inv, inv)
        got = (host2.F.mul(X, i2), host2.F.mul(Y, host2.F.mul(i2, inv)))
        return got == expected

    variants = []
    if which in ("ladder", "both"):
        variants.append(("ladder_pallas", "ladder_pallas"))
    if which in ("windowed", "both"):
        variants.append(("window_pallas", "window_pallas"))

    for label, method in variants:
        t0 = time.perf_counter()
        plan = MSM(K.g2, n, curve.fr.L, method=method)
        out = plan(xs, ys, inf, sc)
        np.asarray(out[0])
        t_cold = time.perf_counter() - t0
        ok = check(out)
        iters = 4
        t0 = time.perf_counter()
        for _ in range(iters):
            out = plan(xs, ys, inf, sc)
        np.asarray(out[0][(0,) * out[0].ndim])
        dt = (time.perf_counter() - t0) / iters
        extra = ""
        if method == "window_pallas":
            extra = (f" c={plan.c} nwin={plan.nwin} signed={plan.signed}"
                     f" wchunk={plan.wchunk}")
        print(f"{label:16s} cold {t_cold:7.1f}s  warm {dt * 1e3:8.1f} ms  "
              f"({n / dt / 1e3:.1f}k pts/s)  exact={ok}{extra}", flush=True)
        assert ok, f"G2 MSM MISMATCH on {label}"


if __name__ == "__main__":
    main()
