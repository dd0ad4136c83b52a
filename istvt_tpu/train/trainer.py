"""Training driver: epoch loop + eval + checkpointing.

One typed-config loop replacing the reference's 1058-line `train_CNN.py`
(per-model branches :236-828, eval :837-984, ckpt :986-1011). Model-specific
behavior lives in the model/loss objects, not in the loop.
"""
from __future__ import annotations

import time
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from istvt_tpu.core.checkpoint import CheckpointManager
from istvt_tpu.core.config import DataConfig, TrainConfig
from istvt_tpu.core.mesh import make_mesh
from istvt_tpu.data.loader import ClipLoader, device_feed
from istvt_tpu.parallel import sharding as shd
from istvt_tpu.train import metrics as M
from istvt_tpu.train import step as S
from istvt_tpu.train.schedule import cosine_schedule, reference_epoch_schedule


def criterion_for(model_name: str, lambda_triplet: float = 0.3):
    """Per-model criterion dispatch (reference train_CNN.py:72-148):
    returns (loss_callable_or_None, uses_triplet_items). None means the
    default BCE path; triplet/quad/adversarial criteria feed the
    specialized steps in train/branches.py with the matching losses."""
    from istvt_tpu.train import losses as L

    table = {
        "tripunet_efficientnet_add": (L.total_loss, True),
        "tripunet_efficientnet_mul": (L.total_loss, True),
        "unetplus_efficientnet": (L.total_loss, True),
        "unet_resnet": (L.total_loss, True),
        "triplet_efficientnet": (
            lambda c, f, y: L.cla_triplet_loss(c, f, y, lambda_triplet),
            True),
        "triplet_efficientnet_cdc": (
            lambda c, f, y: L.cla_triplet_loss(c, f, y, lambda_triplet),
            True),
        "quadplet_efficientnet": (
            lambda f, c, y: L.quadplet_cla_loss(f, c, y,
                                                lam_t=lambda_triplet),
            True),
        "quadnet": (lambda g, i, c, y: L.quad_loss(g, i, c, y,
                                                   lambda_triplet), True),
        "quadnet_full": (lambda g, i, c, y: L.quad_loss(
            g, i, c, y, lambda_triplet), True),
        "quadnet_conv": (lambda g, i, c, y: L.quad_loss(
            g, i, c, y, lambda_triplet), True),
        "quadnet_dfc": (lambda g, i, c, y: L.quad_loss(
            g, i, c, y, lambda_triplet), True),
        "quadnet_decoder": (lambda g, i, c, y: L.quad_loss(
            g, i, c, y, lambda_triplet), True),
        "trip_multi_en": (
            lambda f, c, y: L.multi_trip_loss(f, c, y, lam=lambda_triplet),
            True),
        "jigsaw_multi_xcep_adv": (L.jigsaw_loss, False),
        "jigsaw_multi_xcep_adv_pair": (L.jigsaw_loss, False),
        "jigsaw_multi_en": (L.jigsaw_loss, False),
    }
    return table.get(model_name, (None, False))


def evaluate(model, params, model_state, loader, mesh=None,
             compute_acer: bool = False,
             num_fake_types: int = 5) -> Dict[str, float]:
    """Eval pass: accuracy, AUC, optional ACER + per-manipulation accuracy
    (reference train_CNN.py:837-984; AUC added per BASELINE.md)."""
    eval_fn = S.make_eval_step(model, mesh=mesh)
    logits, labels, ftypes = [], [], []
    # Pad partial final batches to the full batch size so every batch is
    # shardable over the 'data' axis (and compiles to one shape); padded
    # rows are dropped host-side via the 'valid' mask before metrics.
    # Under a host-sliced loader each host pads its LOCAL slice (the
    # loader contract guarantees equal slices across hosts). Plain
    # iterables (no batch_size attribute) stay supported when mesh=None.
    if mesh is not None:
        bs = getattr(loader, "batch_size", None)
        local_bs = (bs // getattr(loader, "host_count", 1)) if bs else None
        feed = device_feed(loader, mesh, pad_to_batch=local_bs)
    else:
        feed = iter(loader)
    for batch in feed:
        out = eval_fn(params, model_state,
                      {k: batch[k] for k in ("clips", "images", "labels")
                       if k in batch})
        if jax.process_count() > 1:
            # per-batch outputs are 'data'-sharded across hosts; gather
            # them so every host computes identical global metrics
            # (np.asarray on a non-addressable array would raise)
            from jax.experimental import multihost_utils
            gather = {k: out[k] for k in ("logits", "labels")}
            for k in ("valid", "fake_types"):
                if k in batch:
                    gather[k] = batch[k]
            gather = multihost_utils.process_allgather(gather, tiled=True)
            out = dict(out, **{k: gather[k] for k in ("logits", "labels")})
            batch = dict(batch)
            for k in ("valid", "fake_types"):
                if k in gather:
                    batch[k] = gather[k]
        valid = np.asarray(batch["valid"]).reshape(-1).astype(bool) \
            if "valid" in batch else np.ones(
                np.asarray(out["labels"]).size, bool)
        logits.append(np.asarray(out["logits"])[valid])
        labels.append(np.asarray(out["labels"])[valid])
        if "fake_types" in batch:
            ftypes.append(np.asarray(batch["fake_types"]).reshape(-1)[valid])
    logits = np.concatenate(logits)
    labels = np.concatenate(labels)
    preds = (logits > 0).astype(np.int32)
    result = {
        "accuracy": float((preds == labels).mean()),
        "auc": float(M.auc(jnp.asarray(logits), jnp.asarray(labels))),
        "n": int(labels.size),
    }
    if compute_acer:
        c = M.confusion_counts(jnp.asarray(logits), jnp.asarray(labels))
        result.update({k: float(v) for k, v in M.acer(c).items()})
    if ftypes:
        ft = np.concatenate(ftypes)
        acc_t, cnt = M.per_type_accuracy(
            jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(ft),
            num_types=num_fake_types)
        for i in range(num_fake_types):
            if float(cnt[i]) > 0:
                result[f"acc_type_{i}"] = float(acc_t[i])
    return result


class Trainer:
    """Epoch-driven trainer over a (data, model[, pipe]) mesh."""

    def __init__(self, model, tc: TrainConfig, dc: DataConfig,
                 mesh=None, loss_fn: Optional[Callable] = None,
                 steps_per_epoch: Optional[int] = None,
                 use_reference_schedule: bool = False,
                 log_fn: Callable[[str], None] = print,
                 step_hook: Optional[Callable[[int, Dict], None]] = None,
                 microbatches: Optional[int] = None,
                 grad_accum: int = 1,
                 recal_bn_batches: int = 0,
                 batch_hook: Optional[Callable[[Dict], Dict]] = None):
        # recal_bn_batches > 0: after the final epoch, replace BN running
        # stats with exact activation statistics over that many train
        # batches (S.recalibrate_bn). Short runs leave an O(0.9^steps)
        # residual of the init stats that collapses eval-mode logits —
        # the reference never hits this (epochs over real data) but
        # short-horizon / fine-tune users do.
        self.recal_bn_batches = recal_bn_batches
        self.model = model
        self.tc = tc
        self.dc = dc
        self.mesh = mesh if mesh is not None else make_mesh(model=1)
        self.log = log_fn
        # per-iteration observer of (step, metrics) — e.g. the attention
        # .npy dumper (train/attn_dump.py, reference train_CNN.py:396-401)
        self.step_hook = step_hook
        # per-batch transform applied after device_feed, before the step —
        # e.g. train/distill.augment_with_teacher injecting teacher logits
        self.batch_hook = batch_hook
        if tc.debug_nans:
            # jax-native NaN trap (SURVEY.md §5.2): every jitted program
            # re-runs un-jitted on NaN and raises at the producing op
            jax.config.update("jax_debug_nans", True)
            self.log("debug_nans: jax_debug_nans enabled")
        spe = steps_per_epoch or 1000
        if use_reference_schedule:
            sched = reference_epoch_schedule(tc.base_lr, tc.warmup_epochs, spe)
        else:
            sched = cosine_schedule(tc.base_lr, spe * tc.num_epochs,
                                    warmup_steps=spe * min(tc.warmup_epochs, 1))
        self.optimizer = S.make_optimizer(tc, sched)
        compute_dtype = jnp.bfloat16 if tc.compute_dtype == "bfloat16" \
            else None
        self.step_fn = S.make_train_step(self.model, self.optimizer,
                                         loss_fn=loss_fn,
                                         compute_dtype=compute_dtype,
                                         mesh=self.mesh,
                                         microbatches=microbatches,
                                         grad_accum=grad_accum)
        # async_save: epoch-end checkpoint writes commit on a background
        # thread, overlapping the next epoch's compute (the state passed
        # is a device_get'd host copy, so later donation can't mutate it)
        self.ckpt = CheckpointManager(tc.checkpoint_dir, async_save=True) \
            if tc.checkpoint_dir else None
        self.best_metric = -float("inf")
        self.metrics = None
        if tc.checkpoint_dir:
            from istvt_tpu.train.logging import MetricsLogger
            self.metrics = MetricsLogger(tc.checkpoint_dir)

    def init_state(self, seed: Optional[int] = None) -> S.TrainState:
        rng = jax.random.PRNGKey(self.tc.seed if seed is None else seed)
        ts = S.create_train_state(self.model, rng, self.optimizer)
        pshard = shd.param_shardings(ts.params, self.mesh)
        return S.TrainState(
            params=shd.place(ts.params, pshard),
            model_state=shd.place(
                ts.model_state,
                shd.replicated_shardings(ts.model_state, self.mesh)),
            opt_state=jax.device_put(ts.opt_state),
            step=ts.step,
        )

    def restore(self, ts: S.TrainState) -> S.TrainState:
        if self.ckpt and self.ckpt.latest_step() is not None:
            restored = self.ckpt.restore(template=ts)
            self.log(f"resumed from step {self.ckpt.latest_step()}")
            return restored
        return ts

    def fit(self, train_loader: ClipLoader, val_loader=None,
            ts: Optional[S.TrainState] = None,
            eval_every_epoch: bool = True) -> S.TrainState:
        ts = ts if ts is not None else self.restore(self.init_state())
        rng = jax.random.PRNGKey(self.tc.seed + 1)

        # A partial final batch is not shardable over a >1 'data' axis
        # (and padding would contaminate gradients), so drop it.
        if dict(self.mesh.shape).get("data", 1) > 1 and \
                not train_loader.drop_last:
            self.log("mesh data axis > 1: enabling drop_last on the "
                     "train loader (partial batches are not shardable)")
            train_loader.drop_last = True

        # preemption safety (SURVEY.md §5.3: the reference is restartable
        # only by hand) — SIGTERM/SIGINT snapshots the full train state
        # before exiting, so --continue_train resumes exactly
        import signal
        state_box = {"ts": ts}

        def _save_and_exit(signum, frame):
            if self.ckpt is not None:
                step = int(state_box["ts"].step)
                self.log(f"signal {signum}: checkpointing step {step} "
                         f"before exit")
                self.ckpt.wait()  # commit any in-flight async epoch save
                if self.ckpt.latest_step() != step:
                    # orbax refuses same-step overwrites; when the signal
                    # lands right after an epoch-end save of this exact
                    # step, that save already holds the state
                    self.ckpt.save(step, jax.device_get(state_box["ts"]),
                                   wait=True)
            raise SystemExit(128 + signum)

        prev_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                prev_handlers[sig] = signal.signal(sig, _save_and_exit)
            except ValueError:  # non-main thread
                pass
        for epoch in range(self.tc.num_epochs):
            train_loader.set_epoch(epoch)
            t0 = time.time()
            run_loss, run_acc, seen = M.Welford(), M.Welford(), 0
            for batch in device_feed(train_loader, self.mesh):
                if self.batch_hook is not None:
                    batch = self.batch_hook(batch)
                rng, srng = jax.random.split(rng)
                ts, m = self.step_fn(ts, batch, srng)
                state_box["ts"] = ts
                if self.step_hook is not None:
                    self.step_hook(int(ts.step), m)
                bs = batch["clips"].shape[0] if "clips" in batch \
                    else batch["images"].shape[0]
                run_loss.update(float(m["loss"]), bs)
                run_acc.update(float(m["accuracy"]), bs)
                seen += bs
                if seen % (self.tc.log_every * bs) < bs:
                    self.log(f"epoch {epoch} seen {seen}: "
                             f"loss {run_loss.mean:.4f} acc {run_acc.mean:.4f}")
            dt = time.time() - t0
            self.log(f"epoch {epoch}: train loss {run_loss.mean:.4f} "
                     f"acc {run_acc.mean:.4f} ({seen / max(dt, 1e-9):.1f} clips/s)")
            metric = run_acc.mean
            if self.metrics:
                self.metrics.log(int(ts.step),
                                 {"loss": run_loss.mean,
                                  "accuracy": run_acc.mean,
                                  "clips_per_sec": seen / max(dt, 1e-9)},
                                 prefix="train/")
            if val_loader is not None and eval_every_epoch:
                ev = evaluate(self.model, ts.params, ts.model_state,
                              val_loader, self.mesh,
                              compute_acer=self.dc.dataset == "oulu")
                self.log(f"epoch {epoch}: val {ev}")
                metric = ev["accuracy"]
                if self.metrics:
                    self.metrics.log(int(ts.step),
                                     {k: v for k, v in ev.items()
                                      if isinstance(v, float)},
                                     prefix="val/")
            if self.ckpt:
                self.ckpt.save(int(ts.step), jax.device_get(ts), metric=metric)
                if metric > self.best_metric:
                    self.best_metric = metric
        for sig, handler in prev_handlers.items():
            signal.signal(sig, handler)
        if self.recal_bn_batches > 0:
            batches = []
            train_loader.set_epoch(self.tc.num_epochs)  # fresh order
            for batch in device_feed(train_loader, self.mesh):
                # calibration must see what the step saw — under
                # cross-geometry distillation the hook downscales clips
                # to the student's size
                if self.batch_hook is not None:
                    batch = self.batch_hook(batch)
                batches.append(batch)
                if len(batches) >= self.recal_bn_batches:
                    break
            # rng=None: dropout layers no-op on a None key, so the
            # calibration statistics are clean (train-mode BN, eval-mode
            # everything else — the standard BN-recalibration recipe)
            ts = S.TrainState(
                params=ts.params,
                model_state=S.recalibrate_bn(self.model, ts.params,
                                             ts.model_state, batches,
                                             mesh=self.mesh),
                opt_state=ts.opt_state, step=ts.step)
            self.log(f"recalibrated BN stats over {len(batches)} batches")
            if self.ckpt:
                # step+1: orbax refuses to overwrite the final epoch's
                # already-saved step; the +1 marks the calibration pass
                self.ckpt.save(int(ts.step) + 1, jax.device_get(ts),
                               metric=self.best_metric, wait=True)
        if self.ckpt:
            self.ckpt.wait()  # commit the last async epoch save
        return ts
