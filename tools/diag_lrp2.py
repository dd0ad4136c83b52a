"""Diagnostic 2: teacher LRP localization vs logit saturation.

diag_lrp.py showed the 300^2/d12 teacher's raw CLS attention localizes
the artifact at 3.7-3.9x uniform while every gradient-weighted readout
(transformer_attribution, full eps-LRP) is diffuse (~0.26-0.40) — the
fake logits sit at ~9.4 and d logit / d A has saturated away from the
evidence. Here: train teachers on (a) fixed-amp and (b) graded-amp
train sets and trace {mean |fake logit|, val AUC, ta_rollout ratio,
attn_cls_mean ratio} across epochs to find the non-saturated regime
where the reference's attribution method works at full geometry."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo root (PYTHONPATH breaks the axon plugin; CLAUDE.md)

import time

import numpy as np

import jax
import jax.numpy as jnp

from istvt_tpu.core.config import ISTVTConfig, TrainConfig
from istvt_tpu.data import SyntheticVideoDataset
from istvt_tpu.interpret.lrp import (_head_agg, _rollout,
                                     attention_maps_and_grads)
from istvt_tpu.models.istvt import infer_feat_hw
from istvt_tpu.models.registry import model_selection
from istvt_tpu.train import step as S
from istvt_tpu.train.certify import _batches, _spatial_ratios
from istvt_tpu.train.metrics import auc
from istvt_tpu.train.schedule import cosine_schedule

SIZE, DEPTH, T, PS = 300, 12, 6, 100
CHUNK = 2
N_FAKES = 6
PROBE_EPOCHS = (1, 2, 3, 4, 6, 9, 12, 15)

cfg = ISTVTConfig(num_frames=T, image_size=SIZE,
                  feat_hw=infer_feat_hw(SIZE), depth=DEPTH)
model = model_selection("istvt", num_out_classes=1, cfg=cfg)

val = SyntheticVideoDataset(num_clips=32, seq_len=T, size=SIZE, seed=999,
                            static_patch=True, patch_size=PS,
                            amp_range=(0.5, 1.5))
val_items, _ = _batches(val, 32)
vb = {"clips": jnp.asarray(np.stack([it["clips"] for it in val_items])),
      "labels": jnp.asarray(np.stack([it["labels"] for it in val_items]))}
fakes = sorted([it for it in val_items if it["labels"] == 1],
               key=lambda it: -float(it["amp"]))[:N_FAKES]
clips_f = jnp.asarray(np.stack([f["clips"] for f in fakes]))


@jax.jit
def cams2(p, st, x):
    attns, grads, logits = attention_maps_and_grads(p, st, x, cfg, 0)
    abars = [_head_agg(a, g) for a, g in zip(attns["s"], grads["s"])]
    per = [jnp.mean(a[:, :, 1:, 0, 1:].astype(jnp.float32), axis=1)
           for a in attns["s"]]
    return (_rollout(abars)[:, 1:, 0, 1:], sum(per) / len(per), logits)


eval_step = S.make_eval_step(model)


def probe(params, mstate, batches):
    ms = S.recalibrate_bn(model, params, mstate, batches)
    logits = np.asarray(eval_step(params, ms, vb)["logits"]).reshape(-1)
    a = float(auc(jnp.asarray(logits), vb["labels"]))
    rs_ta, rs_at, flg = [], [], []
    for i in range(0, N_FAKES, CHUNK):
        ta, at, lg = cams2(params, ms, clips_f[i:i + CHUNK])
        rs_ta.append(np.asarray(ta))
        rs_at.append(np.asarray(at))
        flg.append(np.asarray(lg).reshape(-1))
    r_ta = _spatial_ratios(np.concatenate(rs_ta), fakes, 1.0, SIZE,
                           cfg.feat_hw, PS)
    r_at = _spatial_ratios(np.concatenate(rs_at), fakes, 1.0, SIZE,
                           cfg.feat_hw, PS)
    return a, float(np.mean(np.concatenate(flg))), np.mean(r_ta), np.mean(r_at)


for tag, amp_rng in (("graded-amp", (0.3, 1.5)), ("fixed-amp", None)):
    train_ds = SyntheticVideoDataset(num_clips=48, seq_len=T, size=SIZE,
                                     seed=0, static_patch=True,
                                     patch_size=PS, amp_range=amp_rng)
    _, batches = _batches(train_ds, 8)
    opt = S.make_optimizer(TrainConfig(optimizer="adamw"),
                           cosine_schedule(3e-4, 10_000))
    ts = S.create_train_state(model, jax.random.PRNGKey(0), opt)
    step = S.make_train_step(model, opt)
    rng = jax.random.PRNGKey(1)
    for e in range(1, max(PROBE_EPOCHS) + 1):
        t0, ls = time.time(), []
        for b in batches:
            rng, srng = jax.random.split(rng)
            ts, m = step(ts, b, srng)
            ls.append(float(m["loss"]))
        if e in PROBE_EPOCHS:
            a, flogit, r_ta, r_at = probe(ts.params, ts.model_state,
                                          batches)
            print(f"[{tag}] ep {e:2d} loss {np.mean(ls):.4f} "
                  f"val_auc {a:.3f} fake_logit {flogit:5.2f} "
                  f"ta_ratio {r_ta:4.2f} attn_ratio {r_at:4.2f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
