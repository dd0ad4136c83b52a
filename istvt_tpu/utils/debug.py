"""NaN / finiteness debugging (SURVEY.md §5.2).

The reference's closest analog is scattered NaN guards in losses
(reference loss_fn.py:212-215,224-231,256-259). Here:

  * `debug_nans()` — context manager enabling jax's debug_nans mode
    (every primitive output checked; errors point at the producing op);
  * `assert_finite(tree, name)` — jittable finiteness check over a pytree
    via equinox-free checkify-less jnp.isfinite reduction, raising on
    host fetch.
"""
from __future__ import annotations

import contextlib
from typing import Any


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    import jax
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def finite_fraction(tree: Any):
    """Jittable: fraction of finite scalars across all leaves."""
    import jax
    import jax.numpy as jnp
    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)]
    if not leaves:
        return jnp.asarray(1.0)
    total = sum(l.size for l in leaves)
    finite = sum(jnp.sum(jnp.isfinite(l)) for l in leaves)
    return finite / total


def assert_finite(tree: Any, name: str = "tree"):
    """Host-side assertion (fetches one scalar)."""
    frac = float(finite_fraction(tree))
    if frac < 1.0:
        raise FloatingPointError(
            f"{name}: {100 * (1 - frac):.4f}% non-finite values")
    return True
