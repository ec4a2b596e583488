"""Test configuration: force JAX onto CPU with 8 virtual devices.

This is the JAX-idiomatic way to exercise multi-device sharding (pjit /
shard_map / collectives) without real TPU hardware; see SURVEY.md §4.
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if not os.environ.get("SCSFM_TEST_FULL_OPT") and \
        "llvm_disable_expensive_passes" not in _flags:
    # ~20% faster XLA:CPU compiles of the big train-step programs with
    # identical test semantics (LLVM codegen optimization only; warm step
    # time is irrelevant at test shapes). NOTE: --xla_backend_optimization
    # _level=0 was measured 3.5x SLOWER to compile (less fusion = more
    # kernels to codegen) — do not add it.
    _flags += " --xla_llvm_disable_expensive_passes"
os.environ["XLA_FLAGS"] = _flags

# Persistent compilation cache: repeated test runs skip recompiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# Compile-time lever for the big train-step programs: XLA's backend
# optimization pipeline costs ~330s per train-step compile on 1 CPU and
# ~40s without it, with identical test semantics at these tiny shapes
# (measured: same loss to 1e-5, warm step time unchanged). Set as an env
# var (not jax.config) so the CLI-driving subprocess tests inherit it.
# Opt out with SCSFM_TEST_FULL_OPT=1 to run under full XLA optimization.
if not os.environ.get("SCSFM_TEST_FULL_OPT"):
    os.environ["JAX_DISABLE_MOST_OPTIMIZATIONS"] = "1"

# In this environment jax may already be imported at interpreter startup, in
# which case the env vars above were read too early — force via config (the
# backend itself is still uninitialized at conftest time).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", (
    "tests must run on CPU with virtual devices; got "
    f"{jax.devices()}"
)
if not os.environ.get("SCSFM_TEST_FULL_OPT"):
    # Belt and braces with the env var above (jax may have been imported
    # by a site customization before conftest ran).
    jax.config.update("jax_disable_most_optimizations", True)


import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _fullopt_marker(request):
    """Tests marked ``fullopt`` compile under XLA's full optimization
    pipeline: executing GSPMD mesh-sharded programs compiled with
    jax_disable_most_optimizations makes XLA:CPU abort (SIGABRT)."""
    if request.node.get_closest_marker("fullopt") is None:
        yield
        return
    jax.config.update("jax_disable_most_optimizations", False)
    yield
    if not os.environ.get("SCSFM_TEST_FULL_OPT"):
        jax.config.update("jax_disable_most_optimizations", True)
