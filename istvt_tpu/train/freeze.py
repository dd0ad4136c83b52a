"""Parameter freezing — the TransferModel.set_trainable_up_to equivalent
(reference network/models.py:186-224: boolean switches freeze the backbone
below a chosen layer, training only the head / later stages).

Functional form: a path-predicate produces an optax mask; frozen leaves
get zero updates (optax.set_to_zero), trainable leaves the real optimizer.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import optax


def path_string(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return ".".join(parts)


def trainable_mask(params: Any,
                   trainable_if: Callable[[str], bool]) -> Any:
    """Pytree of bools: True = train, False = freeze."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: bool(trainable_if(path_string(path))), params)


def freeze_except_prefixes(params: Any, prefixes: Sequence[str]) -> Any:
    """Train only leaves whose path starts with one of `prefixes`
    (e.g. ('vit.mlp_head', 'xcep.fc') trains just the heads — the
    analog of set_trainable_up_to's boolean ladder)."""
    return trainable_mask(
        params, lambda p: any(p.startswith(pre) for pre in prefixes))


def freeze_prefixes(params: Any, prefixes: Sequence[str]) -> Any:
    """Freeze leaves under `prefixes`, train everything else."""
    return trainable_mask(
        params, lambda p: not any(p.startswith(pre) for pre in prefixes))


def masked_optimizer(optimizer: optax.GradientTransformation,
                     mask: Any) -> optax.GradientTransformation:
    """Apply `optimizer` where mask is True, zero updates elsewhere."""
    return optax.multi_transform(
        {"train": optimizer, "freeze": optax.set_to_zero()},
        jax.tree_util.tree_map(lambda t: "train" if t else "freeze", mask))
