"""Test configuration: run on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py / __graft_entry__.py; tests
must be hermetic and validate multi-chip sharding on host devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8).
"""

import os
import sys

# The ambient environment points JAX at the axon TPU tunnel
# (JAX_PLATFORMS=axon) and its sitecustomize registers the PJRT plugin at
# interpreter start — before conftest runs — which breaks
# --xla_force_host_platform_device_count.  Re-exec once with a clean env
# so the virtual 8-device CPU mesh is available.
if os.environ.get("PALLAS_AXON_POOL_IPS") and \
        os.environ.get("_GNARK_TPU_TEST_REEXEC") != "1":
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # disables the sitecustomize hook
    env["JAX_PLATFORMS"] = "cpu"
    env["_GNARK_TPU_TEST_REEXEC"] = "1"
    # re-exec via the pytest __main__ path loses cwd from sys.path
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

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
