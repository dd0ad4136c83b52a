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
        return
    import jax
    try:
        current = jax.config.jax_platforms
    except AttributeError:
        current = None
    if current != env:
        jax.config.update("jax_platforms", env)
