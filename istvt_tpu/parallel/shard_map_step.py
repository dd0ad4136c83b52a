"""Explicit-collective data-parallel train step via shard_map.

The default path (train/step.py) lets jit's SPMD partitioner insert the
gradient all-reduce from shardings. This module is the explicit form —
per-device closures with hand-placed `lax.pmean` over the 'data' axis —
useful when the collective schedule must be controlled (e.g. overlapping
the gradient reduce with the optimizer, or adding quantized/grouped
all-reduces later). Functionally equivalent to DataParallel's
scatter/replicate/gather (reference train_CNN.py:185-186) done SPMD.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from istvt_tpu.parallel.tp import shard_map_compat

from istvt_tpu.core.mesh import DATA_AXIS
from istvt_tpu.train import losses, metrics
from istvt_tpu.train.step import TrainState


def make_shard_map_train_step(model, optimizer, mesh: Mesh,
                              loss_fn: Callable = None):
    """Returns step(ts, batch, rng) with batch sharded over 'data' and
    params/opt state replicated; grads pmean over the data axis."""
    loss_fn = loss_fn or (lambda logits, batch:
                          losses.bce_with_logits(logits, batch["labels"]))

    def per_device_step(ts: TrainState, batch, rng):
        # identical rng per replica for dropout parity with the jit path
        def compute_loss(params, model_state):
            x = batch.get("clips", batch.get("images"))
            logits, new_state = model.apply(params, model_state, x,
                                            train=True, rng=rng)
            return loss_fn(logits, batch), (new_state, logits)

        (loss, (new_state, logits)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(ts.params, ts.model_state)
        # THE collective: average gradients/loss over the data axis (ICI)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        acc = jax.lax.pmean(
            metrics.accuracy(logits, batch["labels"]), DATA_AXIS)
        # cross-replica BN stats (SURVEY.md §7 'BatchNorm under DP'):
        # running stats average over replicas -> sync-BN semantics
        new_state = jax.lax.pmean(new_state, DATA_AXIS)
        updates, opt_state = optimizer.update(grads, ts.opt_state,
                                              ts.params)
        params = optax.apply_updates(ts.params, updates)
        new_ts = TrainState(params=params, model_state=new_state,
                            opt_state=opt_state, step=ts.step + 1)
        return new_ts, {"loss": loss, "accuracy": acc}

    replicated = P()
    batch_spec = P(DATA_AXIS)
    sharded = shard_map_compat(
        per_device_step, mesh,
        in_specs=(replicated, batch_spec, replicated),
        out_specs=(replicated, replicated),
    )
    return jax.jit(sharded)
