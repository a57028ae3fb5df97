"""Test config: run the suite on the CPU backend with 8 virtual devices so
multi-chip sharding is exercised without TPU hardware (improvement over the
reference, whose TP tests require a real multi-socket host —
SURVEY.md §4 / tests/model-test/run_tp.sh)."""

import os

# Force CPU regardless of inherited JAX_PLATFORMS (the dev box exports
# JAX_PLATFORMS=axon for the real-TPU tunnel; tests must not use it).
os.environ["JAX_PLATFORMS"] = os.environ.get("NST_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone is NOT enough: the dev image's sitecustomize registers
# and pre-initializes the axon TPU plugin before conftest runs, so the
# platform must be forced at the config level too.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

jax.config.update("jax_enable_x64", False)
# The CPU backend's default matmul precision emulates TPU bf16 passes
# (~7e-2 abs error on f32 matmuls); tests compare exact math.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: XLA-on-CPU compiles here are ~0.5s per tiny
# executable; caching them makes repeat test runs fast.
_cache = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
