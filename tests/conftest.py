"""Test configuration: run on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py / __graft_entry__.py; tests
must be hermetic and validate multi-chip sharding on host devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8).
"""

import os

# hard override: the ambient environment points JAX at the axon TPU tunnel
# (JAX_PLATFORMS=axon); tests must run on the local CPU platform
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402

jax.config.update("jax_enable_compilation_cache", True)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
