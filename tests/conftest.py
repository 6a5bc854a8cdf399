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
    env["GNARK_TPU_NO_COMPILE_CACHE"] = "1"  # cache writes can OOM (huge
    # CPU executables); reloads rarely hit anyway (feature mismatch)
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

# NOTE: no persistent compilation cache for tests — serializing the huge
# CPU executables of the limb kernels can exhaust memory (observed LLVM
# "Cannot allocate memory" + segfault in the cache write path), and the
# CPU AOT reload usually recompiles anyway due to machine-feature
# mismatch.  GNARK_TPU_NO_COMPILE_CACHE (set in the re-exec env above)
# makes gnark_tpu skip enabling it.
os.environ.setdefault("GNARK_TPU_NO_COMPILE_CACHE", "1")

import jax  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_kernels_between_modules():
    """Compiled executables of the limb kernels are huge; holding every
    module's kernels alive exhausts the 125GB host by mid-suite (observed
    LLVM 'Cannot allocate memory' + segfault).  Drop them per module."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()
