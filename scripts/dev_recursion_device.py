"""One-layer recursion, for real: produce + verify the OUTER BW6-761
Groth16 proof of the in-circuit BLS12-377 verifier (the deliverable of
std/groth16_bls12377/verifier_test.go:164).

Device path: BW6-761 MSM/NTT kernels (fp = 48 limbs, fr = 24 limbs);
witness solve on the C core; QAP setup on the native field core.
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

sys.path.insert(0, "/root/repo/tests")

from gnark_tpu.curves import BLS12_377, BW6_761
from gnark_tpu.frontend.compile import compile_circuit
from gnark_tpu.backend import groth16
from gnark_tpu.frontend import schema as schema_mod
import test_recursion as tr


def main():
    t_all = time.perf_counter()
    cs_in = compile_circuit(tr._InnerCubic(), BLS12_377)
    pk_in, vk_in = groth16.setup(cs_in, BLS12_377, rng=random.Random(7),
                                 host=True)
    proof_in = groth16.prove(cs_in, pk_in, [35, 3], rng=random.Random(8))
    assert groth16.verify(proof_in, vk_in, [35])
    print("[1] inner BLS12-377 proof OK", flush=True)

    tr.RecursionCircuit.vk = vk_in
    t0 = time.perf_counter()
    cs = compile_circuit(tr.RecursionCircuit(), BW6_761)
    print(f"[2] outer compile {time.perf_counter()-t0:.0f}s: "
          f"{cs.nb_constraints} constraints", flush=True)

    t0 = time.perf_counter()
    pk, vk = groth16.setup(cs, BW6_761, rng=random.Random(11))
    print(f"[3] outer setup (device fixed-base): "
          f"{time.perf_counter()-t0:.0f}s", flush=True)

    a = tr._assignment(vk_in, proof_in, 35)
    pub = schema_mod.collect_values(a, "public")
    sec = schema_mod.collect_values(a, "secret")

    t0 = time.perf_counter()
    proof = groth16.prove(cs, pk, pub + sec, rng=random.Random(12))
    print(f"[4] outer prove (cold): {time.perf_counter()-t0:.0f}s",
          flush=True)

    t0 = time.perf_counter()
    ok = groth16.verify(proof, vk, pub)
    print(f"[5] outer verify: {time.perf_counter()-t0:.1f}s -> {ok}",
          flush=True)
    assert ok
    assert not groth16.verify(proof, vk, [36])

    t0 = time.perf_counter()
    proof2 = groth16.prove(cs, pk, pub + sec, rng=random.Random(13))
    warm = time.perf_counter() - t0
    assert groth16.verify(proof2, vk, pub)
    print(f"[6] outer prove (warm): {warm:.1f}s", flush=True)
    print(f"TOTAL {time.perf_counter()-t_all:.0f}s — RECURSION OUTER "
          f"PROOF VERIFIED", flush=True)


if __name__ == "__main__":
    main()
