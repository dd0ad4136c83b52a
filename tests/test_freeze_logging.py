"""Freezing (set_trainable_up_to equivalent) + metrics logging tests."""
import json
import os

import numpy as np

import jax
import jax.numpy as jnp
import optax

from istvt_tpu.train.freeze import (
    freeze_except_prefixes,
    freeze_prefixes,
    masked_optimizer,
    trainable_mask,
)
from istvt_tpu.train.logging import MetricsLogger


def test_freeze_masks_and_updates():
    params = {"xcep": {"conv1": {"w": jnp.ones((2, 2))}},
              "vit": {"mlp_head": {"fc": {"w": jnp.ones((2, 2))}}}}
    mask = freeze_except_prefixes(params, ("vit.mlp_head",))
    assert mask["vit"]["mlp_head"]["fc"]["w"] is True
    assert mask["xcep"]["conv1"]["w"] is False

    opt = masked_optimizer(optax.sgd(1.0), mask)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    state = opt.init(params)
    updates, _ = opt.update(grads, state, params)
    # frozen leaf: zero update; trainable leaf: -lr * grad
    assert float(jnp.abs(updates["xcep"]["conv1"]["w"]).max()) == 0.0
    assert float(jnp.abs(updates["vit"]["mlp_head"]["fc"]["w"]).max()) == 1.0

    mask2 = freeze_prefixes(params, ("xcep",))
    assert mask2["xcep"]["conv1"]["w"] is False
    assert mask2["vit"]["mlp_head"]["fc"]["w"] is True


def test_metrics_logger(tmp_path):
    logger = MetricsLogger(str(tmp_path), use_tensorboard=False)
    logger.log(1, {"loss": 0.5, "accuracy": 0.9})
    logger.log(2, {"loss": jnp.asarray(0.25)}, prefix="val/")
    logger.close()
    lines = [json.loads(l) for l in open(logger.path)]
    assert lines[0]["loss"] == 0.5
    assert lines[1]["val/loss"] == 0.25
