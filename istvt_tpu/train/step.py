"""Training / evaluation steps as pure jittable functions.

One train step replaces the reference's per-iteration body
(reference train_CNN.py:495-549): forward, BCE-with-logits loss, backward,
optimizer update, running metrics — compiled as a single XLA program over
the device mesh. Gradients reduce over the 'data' axis automatically via
sharding propagation (the SPMD analog of DataParallel's gather,
train_CNN.py:185-186).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from istvt_tpu.core.config import TrainConfig
from istvt_tpu.train import losses, metrics


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    model_state: Any          # batchnorm running stats etc.
    opt_state: Any
    step: jax.Array


def make_optimizer(tc: TrainConfig, schedule) -> optax.GradientTransformation:
    """AdamW or SGD(+momentum), matching reference train_CNN.py:198-202."""
    if tc.optimizer == "adamw":
        return optax.adamw(schedule, weight_decay=tc.weight_decay)
    if tc.optimizer == "sgd":
        return optax.sgd(schedule, momentum=tc.momentum)
    raise ValueError(f"unknown optimizer {tc.optimizer}")


def create_train_state(model, rng, optimizer) -> TrainState:
    params, mstate = model.init(rng)
    return TrainState(params=params, model_state=mstate,
                      opt_state=optimizer.init(params),
                      step=jnp.zeros((), jnp.int32))


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    loss_fn: Callable = None,
    donate: bool = True,
    compute_dtype=None,
    mesh=None,
    microbatches=None,
    grad_accum: int = 1,
):
    """Returns jitted step(ts, batch, rng) -> (ts, metrics_dict).

    batch: {'clips': (B,T,H,W,3) or 'images': (B,H,W,3), 'labels': (B,)}.
    compute_dtype=jnp.bfloat16 runs the forward/backward in bf16 against
    f32 master params (the cast is inside the differentiated function, so
    gradients come back f32); losses/metrics stay f32.

    mesh: pass the (data, model[, pipe]) mesh when training tensor- or
    pipeline-parallel — the step body traces inside parallel/tp and
    parallel/pp scopes, so the Pallas attention kernels dispatch to
    their shard_map'd forms (model>1) and the ST layer stack runs as a
    GPipe pipeline (pipe>1). `microbatches` sets the pipeline's
    microbatch count (default: the stage count).

    grad_accum=k > 1 splits the batch into k microbatches and runs
    forward+backward per microbatch under one `lax.scan`, averaging
    gradients into a single optimizer update. Backward activation
    memory shrinks by ~k with no recompute tax — the route to large
    effective batches when the whole-batch backward exceeds HBM (the
    documented B=32 limit, BASELINE.md). Gradients are the exact
    full-batch mean for BN-free models (mean losses are microbatch-
    affine); with BatchNorm, running stats thread through microbatches
    sequentially and batch statistics are per-microbatch — the standard
    grad-accumulation semantics (same as k sequential torch steps).
    """
    from istvt_tpu.parallel import pp, tp

    loss_fn = loss_fn or (lambda logits, batch:
                          losses.bce_with_logits(logits, batch["labels"]))

    # attention-transfer losses (losses.make_distill_loss attn_weight)
    # declare needs_attn: run the forward with return_attn=True and hand
    # the maps to the loss. Incompatible with pipeline parallelism (the
    # PP layer stack drops per-layer attention outputs).
    needs_attn = getattr(loss_fn, "needs_attn", False)

    def compute_loss(params, model_state, batch, rng):
        x = batch.get("clips", batch.get("images"))
        if compute_dtype is not None:
            from istvt_tpu.core import tree as _tree
            params = _tree.cast(params, compute_dtype)
            x = x.astype(compute_dtype)
        if needs_attn:
            (logits, attns), new_state = model.apply(
                params, model_state, x, train=True, rng=rng,
                return_attn=True)
            loss = loss_fn(logits, batch, attns=attns)
        else:
            logits, new_state = model.apply(params, model_state, x,
                                            train=True, rng=rng)
            loss = loss_fn(logits, batch)
        return loss, (new_state, logits)

    def step(ts: TrainState, batch, rng):
        with tp.scope(mesh), pp.scope(mesh, microbatches):
            return _step(ts, batch, rng)

    def _accumulate(ts: TrainState, batch, rng):
        x = batch.get("clips", batch.get("images"))
        b = x.shape[0]
        assert b % grad_accum == 0, \
            f"batch {b} not divisible by grad_accum={grad_accum}"
        chunks = jax.tree_util.tree_map(
            lambda v: v.reshape(grad_accum, b // grad_accum, *v.shape[1:]),
            batch)
        rngs = jax.random.split(rng, grad_accum)

        def body(carry, xs):
            mstate, gsum, lsum, asum = carry
            mb, r = xs
            (loss, (mstate, logits)), g = jax.value_and_grad(
                compute_loss, has_aux=True)(ts.params, mstate, mb, r)
            gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
            return (mstate, gsum, lsum + loss,
                    asum + metrics.accuracy(logits, mb["labels"])), None

        zero_g = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), ts.params)
        zero = jnp.zeros((), jnp.float32)
        (new_state, gsum, lsum, asum), _ = jax.lax.scan(
            body, (ts.model_state, zero_g, zero, zero), (chunks, rngs))
        grads = jax.tree_util.tree_map(lambda g: g / grad_accum, gsum)
        return (lsum / grad_accum, asum / grad_accum), new_state, grads

    def _step(ts: TrainState, batch, rng):
        if grad_accum > 1:
            (loss, acc), new_state, grads = _accumulate(ts, batch, rng)
        else:
            (loss, (new_state, logits)), grads = jax.value_and_grad(
                compute_loss, has_aux=True)(ts.params, ts.model_state,
                                            batch, rng)
            acc = metrics.accuracy(logits, batch["labels"])
        updates, opt_state = optimizer.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        m = {
            "loss": loss,
            "accuracy": acc,
            "grad_norm": optax.global_norm(grads),
        }
        return TrainState(params=params, model_state=new_state,
                          opt_state=opt_state, step=ts.step + 1), m

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def recalibrate_bn(model, params, model_state, batches, rng=None,
                   mesh=None, microbatches=None):
    """Replace BatchNorm running statistics with the ACTUAL activation
    statistics under the current params (averaged over `batches`).

    Pass mesh= when params/batches live on a model- or pipe-parallel
    mesh — like every step builder, the probe traces inside
    tp.scope/pp.scope so the Pallas kernels dispatch to their shard_map'd
    forms (plain jit on TP-sharded params cannot partition a
    pallas_call).

    Running stats converge at momentum 0.1 per step, so short runs keep
    an O(0.9^steps) residual of the init stats (var=1) — enough to
    collapse eval-mode logits while train-mode separates perfectly (the
    reference never hits this because it trains for epochs over real
    datasets, train_CNN.py:209; short-horizon users and the e2e
    capability test do).

    Mechanism: in train mode the forward never READS the running stats,
    so per state leaf one apply is affine in the old value,
    new = c*old + d (c = (1-m)^k for a BN slot updated k times — Meso4
    reuses bn1/bn2 at TWO call sites, reference mesonet.py:44, so k=2
    there). Two probe passes (old=0 gives d, old=1 gives c+d) recover
    the map, and the installed value is its fixed point d/(1-c) — what
    infinite training on this batch would converge to (== the exact
    batch stats when k=1). Leaves an apply never touches (c=1) keep
    their original value. Results are averaged across `batches`.

    Leave rng=None for calibration-clean statistics: dropout layers
    no-op on a None key, so the pass is train-mode for BN only."""
    from istvt_tpu.parallel import pp, tp

    zeros = jax.tree_util.tree_map(jnp.zeros_like, model_state)
    ones = jax.tree_util.tree_map(jnp.ones_like, model_state)

    @jax.jit
    def _probe(params, st0, st1, x):
        # jitted: ONE partitioned program instead of hundreds of eager
        # dispatches (eager multi-device ops rendezvous per op and crawl
        # on a >1-device mesh)
        with tp.scope(mesh), pp.scope(mesh, microbatches):
            _, n0 = model.apply(params, st0, x, train=True, rng=rng)
            _, n1 = model.apply(params, st1, x, train=True, rng=rng)
        return n0, n1

    stats = []
    for b in batches:
        x = b.get("clips", b.get("images"))
        n0, n1 = _probe(params, zeros, ones, x)

        def fixpoint(d, cd, orig):
            # c = (1-m)^k is in (0, 1] so 1-c >= 0.1 for any updated
            # leaf and == 0 for untouched ones (keep those as-is)
            one_minus_c = 1.0 - (cd - d)
            return jnp.where(one_minus_c > 1e-3,
                             d / jnp.maximum(one_minus_c, 1e-3), orig)

        stats.append(jax.tree_util.tree_map(fixpoint, n0, n1, model_state))
    n = float(len(stats))
    return jax.tree_util.tree_map(lambda *vs: sum(vs) / n, *stats)


def make_eval_step(model, mesh=None, microbatches=None):
    """jitted eval(params, model_state, batch) -> per-batch sufficient stats
    (reference eval loop train_CNN.py:837-984, no_grad threshold-at-0)."""
    from istvt_tpu.parallel import pp, tp

    def step(params, model_state, batch):
        with tp.scope(mesh), pp.scope(mesh, microbatches):
            x = batch.get("clips", batch.get("images"))
            logits, _ = model.apply(params, model_state, x, train=False)
        if logits.ndim == 2 and logits.shape[-1] == 2:
            # 2-class heads (the reference's num_out_classes=2 models,
            # train_CNN.py:944 torch.max preds): collapse to one
            # threshold-at-0 score, logit(fake) - logit(real) —
            # argmax-equivalent predictions, AUC-valid ranking
            logits = logits[:, 1] - logits[:, 0]
        flat = logits.reshape(-1)
        labels = batch["labels"].reshape(-1)
        out = {
            "logits": flat,
            "labels": labels,
            "correct": (metrics.binary_predictions(flat)
                        == labels.astype(jnp.int32)).astype(jnp.float32),
        }
        out.update(metrics.confusion_counts(flat, labels))
        return out

    return jax.jit(step)
