"""Test configuration: force CPU with 8 virtual devices for sharding tests.

Must run before jax is imported anywhere in the test process.
"""

import os

# Force CPU even when the environment pins JAX_PLATFORMS (e.g. to a TPU
# tunnel): unit tests must be hermetic and fast. Override with
# OVERCOOKED_TEST_PLATFORM. The site config may import jax before this
# conftest runs, so set the config directly too (backend init is lazy, so
# this works as long as no devices were touched yet).
_platform = os.environ.get("OVERCOOKED_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)
# Persistent compile cache: the interpret-mode pallas parity programs take
# ~30-90 s each to compile on CPU; cache them across test runs.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", os.path.expanduser("~/.jax_cache")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
