"""BASELINE configs 1/4 artifact: Groth16 over a synthetic 2^20-constraint
x <- x^2 chain (the reference's benchmark circuit shape,
internal/backend/bn254/groth16/groth16_test.go:57), device prover, proof
verified; per-phase wall clock printed for docs/PERF.md.

Usage: python scripts/dev_e2e_2e20.py [log2_n] [curve]
  log2_n: chain length exponent (default 20)
  curve:  bn254 | bls12_381 | bls12_377 (default bn254)
"""

import os
import random
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

jax.config.update("jax_enable_compilation_cache", True)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from gnark_tpu import curves
from gnark_tpu.backend import groth16, key_io
from gnark_tpu.frontend.compile import compile_circuit
from gnark_tpu.frontend.schema import Circuit, Public, Secret


def main():
    nlog = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    curve_name = sys.argv[2] if len(sys.argv) > 2 else "bn254"
    curve = {"bn254": curves.BN254, "bls12_381": curves.BLS12_381,
             "bls12_377": curves.BLS12_377}[curve_name]
    # one constraint per squaring plus the final assert; stay under 2^nlog
    # so the NTT domain is exactly 2^nlog
    n_sq = (1 << nlog) - 2

    class SquareChain(Circuit):
        x = Secret()
        y = Public()

        def define(self, api):
            v = self.x
            for _ in range(n_sq):
                v = api.mul(v, v)
            api.assert_is_equal(v, self.y)

    t0 = time.perf_counter()
    cs = compile_circuit(SquareChain(), curve)
    print(f"[compile] {time.perf_counter() - t0:.1f}s — "
          f"{cs.nb_constraints} constraints", flush=True)

    import pickle
    os.makedirs("/root/repo/.cache", exist_ok=True)
    cache = f"/root/repo/.cache/e2e_sq_{curve_name}_{nlog}"
    if os.path.exists(cache + ".npz"):
        t0 = time.perf_counter()
        pk = key_io.groth16_pk_read(cache + ".npz")
        with open(cache + ".vk", "rb") as f:
            vk = pickle.load(f)
        print(f"[setup]   {time.perf_counter() - t0:.1f}s "
              "(loaded from key_io cache)", flush=True)
    else:
        t0 = time.perf_counter()
        # host=True + pk_to_device (the dryrun_multichip pattern): the
        # native-C fixed-base core builds the key, pure packing moves it
        # to device.  The device fixed-base route's to_affine/batch_inv
        # graph at 2^20 width OOM-kills the remote compile helper
        # (SIGKILL, measured round 5); the prove path — the artifact's
        # headline — is unaffected.
        pk, vk = groth16.setup(cs, curve, rng=random.Random(42), host=True)
        pk = groth16.pk_to_device(pk)
        print(f"[setup]   {time.perf_counter() - t0:.1f}s (native QAP + "
              "native-C fixed-base keys, packed to device)", flush=True)
        t0 = time.perf_counter()
        key_io.groth16_pk_write(pk, cache + ".npz")
        with open(cache + ".vk", "wb") as f:
            pickle.dump(vk, f)
        print(f"[pk save] {time.perf_counter() - t0:.1f}s", flush=True)

    q = curve.fr.modulus
    x0 = 3
    t0 = time.perf_counter()
    y = x0
    for _ in range(n_sq):
        y = y * y % q
    print(f"[host witness] {time.perf_counter() - t0:.1f}s", flush=True)

    for label in ("cold", "warm", "warm2"):
        t0 = time.perf_counter()
        proof = groth16.prove(cs, pk, [y, x0], rng=random.Random(7))
        print(f"[prove {label}] {time.perf_counter() - t0:.2f}s", flush=True)

    t0 = time.perf_counter()
    ok = groth16.verify(proof, vk, [y])
    print(f"[verify]  {time.perf_counter() - t0:.2f}s -> {ok}", flush=True)
    assert ok
    assert not groth16.verify(proof, vk, [(y + 1) % q])
    print(f"E2E OK: 2^{nlog} {curve_name} device prove verified", flush=True)


if __name__ == "__main__":
    main()
