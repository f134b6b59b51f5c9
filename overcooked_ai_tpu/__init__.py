"""overcooked_ai_tpu: a TPU-native Overcooked-AI framework (JAX/XLA).

Enables the persistent compilation cache on import: the remote-compile
path of the TPU tunnel used in CI takes minutes for large fused programs,
and caching makes every subsequent process start free.
"""

import os

import jax

_cache_dir = os.environ.get(
    "OVERCOOKED_TPU_COMPILE_CACHE", os.path.expanduser("~/.jax_cache")
)
if _cache_dir and _cache_dir != "0":
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

__version__ = "0.1.0"
