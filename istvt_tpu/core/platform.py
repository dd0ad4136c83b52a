"""Platform selection honoring the JAX_PLATFORMS env var.

Some environments force-register an accelerator plugin at interpreter
startup via jax.config.update("jax_platforms", ...), which silently
overrides the JAX_PLATFORMS environment variable. CLI entry points call
`honor_env()` so an explicit `JAX_PLATFORMS=cpu python -m istvt_tpu...`
does what it says (e.g. the 8-device virtual CPU mesh for tests)."""
from __future__ import annotations

import os


def honor_env():
    env = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    if not env:
        enable_compilation_cache()
        return
    import jax
    try:
        current = jax.config.jax_platforms
    except AttributeError:
        current = None
    if current != env:
        jax.config.update("jax_platforms", env)
    enable_compilation_cache()


def enable_compilation_cache(path: str = ""):
    """Persistent XLA compilation cache — first compile of the full
    300x300 model takes 60-90s; cached recompiles are near-instant.
    Opt out with ISTVT_NO_COMPILE_CACHE=1."""
    if os.environ.get("ISTVT_NO_COMPILE_CACHE"):
        return
    import jax
    path = path or os.environ.get("ISTVT_COMPILE_CACHE",
                                  os.path.expanduser("~/.cache/istvt_tpu_xla"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
