"""Test configuration: force CPU with 8 virtual devices for sharding tests.

Must run before jax is imported anywhere in the test process.
"""

import os

# Force CPU even when the environment pins JAX_PLATFORMS (e.g. to a TPU
# tunnel): unit tests must be hermetic and fast. Override with
# OVERCOOKED_TEST_PLATFORM. The site config may import jax before this
# conftest runs, so set the config directly too (backend init is lazy, so
# this works as long as no devices were touched yet).
#
# Accelerator runs (OVERCOOKED_TPU_TESTS=1) AUTODETECT the device: real
# TPU stacks may register under experimental platform names (e.g. "axon"
# for a tunneled v5e), so any of OVERCOOKED_TEST_PLATFORM=device/tpu/""
# -- or just OVERCOOKED_TPU_TESTS=1 with no platform var at all -- clears
# the pin and lets jax pick the accelerator, failing fast if none exists.
_tpu_tests = os.environ.get("OVERCOOKED_TPU_TESTS") == "1"
_platform = os.environ.get("OVERCOOKED_TEST_PLATFORM")
if _platform is None:
    _platform = "device" if _tpu_tests else "cpu"
_autodetect = _platform in ("device", "tpu", "accelerator", "")

if _autodetect:
    os.environ.pop("JAX_PLATFORMS", None)

    import jax  # noqa: E402

    try:
        jax.config.update("jax_platforms", None)
    except Exception:
        pass
    _backend = jax.default_backend()
    if _tpu_tests and _backend == "cpu":
        raise RuntimeError(
            "OVERCOOKED_TPU_TESTS=1 but jax found no accelerator "
            f"(default backend: {_backend!r}). These tests need a real "
            "TPU; check the device tunnel / JAX install."
        )
else:
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
