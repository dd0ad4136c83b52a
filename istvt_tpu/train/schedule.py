"""Learning-rate schedules.

The reference creates a CosineAnnealingLR but never steps it
(reference train_CNN.py:202,995) and instead overrides lr per epoch with a
manual linear-warmup / power-decay rule (train_CNN.py:209-211):

    lr(e) = (e + 1) * base_lr      if e < warmup_epochs (20)
          = e ** -1.5              otherwise

Both that rule and a proper cosine schedule are provided as optax
step-indexed schedules (epoch length in steps is supplied by the caller).
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import optax


def reference_epoch_schedule(base_lr: float = 5e-4, warmup_epochs: int = 20,
                             steps_per_epoch: int = 1000):
    """The reference's manual per-epoch rule (train_CNN.py:209-211),
    expressed per optimizer step."""

    def schedule(step):
        e = step // steps_per_epoch
        warm = (e + 1).astype(jnp.float32) * base_lr
        decay = jnp.power(jnp.maximum(e.astype(jnp.float32), 1.0), -1.5)
        return jnp.where(e < warmup_epochs, warm, decay)

    return schedule


def cosine_schedule(base_lr: float, total_steps: int,
                    warmup_steps: int = 0, min_lr: float = 0.0):
    """Warmup + cosine decay — the schedule the reference constructed but
    never used (train_CNN.py:202,995); the TPU build makes it real."""
    if warmup_steps > 0:
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=base_lr,
            warmup_steps=warmup_steps,
            decay_steps=max(total_steps, warmup_steps + 1),
            end_value=min_lr)
    return optax.cosine_decay_schedule(base_lr, max(total_steps, 1),
                                       alpha=min_lr / max(base_lr, 1e-12))


def constant_schedule(lr: float):
    return optax.constant_schedule(lr)
