"""Device-path PLONK e2e benchmark (BASELINE config 3 at scale): square
-chain circuit over BN254, KZG + Fiat-Shamir, device prover (4n coset
quotient NTTs + device KZG commit MSMs, C-core Z/linearization passes).

Usage: python scripts/dev_plonk_e2e.py [log2_n]  (default 16)
"""

import os
import pickle
import random
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

jax.config.update("jax_enable_compilation_cache", True)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from gnark_tpu.backend import kzg, plonk
from gnark_tpu.curves import BN254
from gnark_tpu.frontend.compile import compile_circuit
from gnark_tpu.frontend.schema import Circuit, Public, Secret


def main():
    nlog = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    curve = BN254
    n_sq = (1 << nlog) - 4  # stay under 2^nlog rows incl. PI row

    class SquareChain(Circuit):
        x = Secret()
        y = Public()

        def define(self, api):
            v = self.x
            for _ in range(n_sq):
                v = api.mul(v, v)
            api.assert_is_equal(v, self.y)

    t0 = time.perf_counter()
    cs = compile_circuit(SquareChain(), curve, scheme="plonk")
    print(f"[compile] {time.perf_counter() - t0:.1f}s — "
          f"{cs.nb_constraints} gates", flush=True)

    cache = f"/tmp/plonk_sq_bn254_{nlog}.pk"
    if os.path.exists(cache):
        t0 = time.perf_counter()
        with open(cache, "rb") as f:
            pk, vk = pickle.load(f)
        print(f"[setup]   {time.perf_counter() - t0:.1f}s (pickle cache)",
              flush=True)
    else:
        t0 = time.perf_counter()
        pk, vk = plonk.setup(cs, curve, rng=random.Random(42))
        print(f"[setup]   {time.perf_counter() - t0:.1f}s", flush=True)
        with open(cache, "wb") as f:
            pickle.dump((pk, vk), f)

    q = curve.fr.modulus
    x0 = 3
    y = x0
    for _ in range(n_sq):
        y = y * y % q

    for label in ("cold", "warm", "warm2"):
        t0 = time.perf_counter()
        proof = plonk.prove(cs, pk, [y, x0], rng=random.Random(7))
        print(f"[prove {label}] {time.perf_counter() - t0:.2f}s", flush=True)

    t0 = time.perf_counter()
    ok = plonk.verify(proof, vk, [y])
    print(f"[verify]  {time.perf_counter() - t0:.2f}s -> {ok}", flush=True)
    assert ok
    assert not plonk.verify(proof, vk, [(y + 1) % q])
    print(f"PLONK E2E OK: 2^{nlog} bn254 device prove verified", flush=True)


if __name__ == "__main__":
    main()
