"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding tests run anywhere (the driver separately validates the TPU path).
Must set the env vars before jax initializes."""
import os
import sys

# The session env points JAX at the 'axon' TPU tunnel platform; tests run on a
# virtual CPU mesh instead (and must set this before jax initializes).
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon sitecustomize pins the platform after env is read; force CPU here
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# persistent compilation cache: the suite's cost is dominated by XLA:CPU
# compiles of near-identical step programs; cache them across processes
os.makedirs("/tmp/jax_test_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


import pytest

# Build the native C++ helper on a fresh checkout so the native-path tests
# run instead of skipping (csrc/Makefile; best-effort — the ctypes loader
# has Python fallbacks when no toolchain is available).
_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_so = os.path.join(_root, "edyn_tpu", "native", "libedyn_native.so")
_src = os.path.join(_root, "csrc", "edyn_native.cpp")
if not os.path.exists(_so) or (os.path.exists(_src) and
                               os.path.getmtime(_src) > os.path.getmtime(_so)):
    import subprocess
    try:
        subprocess.run(["make", "-C", os.path.join(_root, "csrc")],
                       capture_output=True, timeout=120, check=False)
    except Exception:
        pass


@pytest.fixture(autouse=True, scope="module")
def _bound_jit_cache():
    """Clear jit caches between test modules: a long pytest process otherwise
    accumulates ~100 compiled executables and the XLA CPU compiler has been
    observed to segfault (likely OOM) late in the run."""
    yield
    jax.clear_caches()
