"""gnark_tpu — a TPU-native zk-SNARK framework.

A from-scratch reimagining of gnark (circuit frontend + Groth16/PLONK
provers) where the cryptographic hot loops — Montgomery limb-plane field
arithmetic, radix-2 coset NTT, Pippenger multi-scalar multiplication, KZG —
run as JAX/XLA/Pallas programs on TPU, sharded over device meshes.

Layer map (cf. reference SURVEY.md §1):
  frontend/   circuit eDSL -> R1CS / sparse-R1CS IR (L4)
  backend/    Groth16 & PLONK setup/prove/verify + witness (L2-L3)
  std/        gadget standard library (L5)
  fields/     FieldSpec registry (replaces per-curve codegen)
  ops/        device kernels: limb field ops, NTT, EC, MSM (L1)
  curves/     curve specs + host-side EC / pairing
  parallel/   mesh sharding: distributed MSM/NTT over ICI
  utils/      logging, conversion helpers
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: the limb-plane kernels are expensive to
# compile (tens of seconds per shape); every entry point shares this cache.
_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.join(_os.path.dirname(_os.path.dirname(__file__)), ".jax_cache"))


def _enable_compilation_cache():
    if _os.environ.get("GNARK_TPU_NO_COMPILE_CACHE"):
        # CPU executables of the limb kernels are huge; serializing them
        # into the persistent cache can OOM the 1-CPU test host, and the
        # CPU AOT reload path often recompiles anyway (machine-feature
        # mismatch).  Tests opt out (tests/conftest.py).
        return
    import jax

    jax.config.update("jax_enable_compilation_cache", True)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


_enable_compilation_cache()
