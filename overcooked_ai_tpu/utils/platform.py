"""Platform selection helper.

Site configs may import jax and pin JAX_PLATFORMS (e.g. to a remote TPU
tunnel) before user code runs. Interactive tools (demo server, notebooks)
usually want the local CPU: backend init is lazy, so flipping the config
before the first device use still works.
"""

import os


def force_platform(name: str = "cpu"):
    os.environ["JAX_PLATFORMS"] = name
    import jax

    try:
        jax.config.update("jax_platforms", name)
    except Exception:  # pragma: no cover - backend already initialized
        pass
