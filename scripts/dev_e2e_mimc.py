"""BASELINE config 2 artifact: Groth16 BN254 over a ~2^16-constraint
MiMC-chain preimage circuit, device prover (Pallas windowed MSM), proof
verified; per-phase wall clock printed for docs/PERF.md.

Usage: python scripts/dev_e2e_mimc.py [n_hashes]
"""

import os
import random
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import numpy as np

jax.config.update("jax_enable_compilation_cache", True)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from gnark_tpu.backend import groth16
from gnark_tpu.curves import BN254
from gnark_tpu.frontend.compile import compile_circuit
from gnark_tpu.frontend.schema import Circuit, Public, Secret
from gnark_tpu.std.mimc import MiMC, MiMCHost
from gnark_tpu.utils import profiling


def main():
    n_hashes = int(sys.argv[1]) if len(sys.argv) > 1 else 178
    # each MiMC sum() over one message = ~366 constraints (110 rounds x
    # 3 + overhead); 178 chained hashes ~ 2^16 constraints

    class MiMCChain(Circuit):
        pre = Secret()
        digest = Public()

        def define(self, api):
            acc = self.pre
            for _ in range(n_hashes):
                h = MiMC(api)
                h.write(acc)
                acc = h.sum()
            api.assert_is_equal(acc, self.digest)

    t0 = time.perf_counter()
    cs = compile_circuit(MiMCChain(), BN254)
    t_compile = time.perf_counter() - t0
    print(f"[compile] {t_compile:.1f}s — {cs.nb_constraints} constraints "
          f"(2^{cs.nb_constraints.bit_length() - 1})", flush=True)

    # Cache the (deterministic, rng=42) keys via key_io so reruns skip
    # setup — this also exercises pk serialization at real scale.
    import pickle

    from gnark_tpu.backend import key_io
    cache = f"/tmp/e2e_mimc_keys_{n_hashes}"
    if os.path.exists(cache + ".npz"):
        t0 = time.perf_counter()
        pk = key_io.groth16_pk_read(cache + ".npz")
        with open(cache + ".vk", "rb") as f:
            vk = pickle.load(f)
        print(f"[setup]   {time.perf_counter() - t0:.1f}s "
              "(loaded from key_io cache)", flush=True)
    else:
        t0 = time.perf_counter()
        pk, vk = groth16.setup(cs, BN254, rng=random.Random(42))
        t_setup = time.perf_counter() - t0
        print(f"[setup]   {t_setup:.1f}s (native QAP + device fixed-base "
              "keys)", flush=True)
        key_io.groth16_pk_write(pk, cache + ".npz")
        with open(cache + ".vk", "wb") as f:
            pickle.dump(vk, f)

    pre = 12345
    acc = pre
    for _ in range(n_hashes):
        host = MiMCHost(BN254)
        host.write(acc)
        acc = host.sum()

    for label in ("cold", "warm"):
        t0 = time.perf_counter()
        proof = groth16.prove(cs, pk, [acc, pre], rng=random.Random(7))
        dt = time.perf_counter() - t0
        print(f"[prove {label}] {dt:.2f}s", flush=True)

    t0 = time.perf_counter()
    ok = groth16.verify(proof, vk, [acc])
    print(f"[verify]  {time.perf_counter() - t0:.2f}s -> {ok}", flush=True)
    assert ok
    assert not groth16.verify(proof, vk, [acc + 1])
    print("E2E OK: device prover (Pallas windowed MSM) proof verified",
          flush=True)


if __name__ == "__main__":
    main()
