"""Pytree parameter utilities (count, cast, flatten-by-path)."""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def count_params(tree: Any) -> int:
    """Total number of scalar parameters (reference network/utils.py:36-42)."""
    leaves = jax.tree_util.tree_leaves(tree)
    return int(sum(np.prod(l.shape) for l in leaves if hasattr(l, "shape")))


def cast(tree: Any, dtype) -> Any:
    """Cast all floating-point leaves to `dtype` (e.g. bf16 compute copies)."""
    def _c(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(_c, tree)


def flatten_with_paths(tree: Any, prefix: str = "") -> Dict[str, Any]:
    """Flatten a nested dict/list pytree to {'a.b.0.c': leaf} —
    the shape used by the torch<->jax weight converters in compat/."""
    out: Dict[str, Any] = {}

    def rec(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, f"{path}.{k}" if path else str(k))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                rec(v, f"{path}.{i}" if path else str(i))
        else:
            out[path] = node

    rec(tree, prefix)
    return out


def tree_size_bytes(tree: Any) -> int:
    leaves = jax.tree_util.tree_leaves(tree)
    return int(sum(l.size * l.dtype.itemsize for l in leaves if hasattr(l, "size")))
