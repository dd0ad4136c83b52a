"""Diagnostic: which saliency readout localizes for the 300^2/d12 teacher?

Loads the teacher saved by cli.certify --teacher_ckpt and scores spatial
localization ratios (artifact-cell mass vs uniform, certify._spatial_ratios)
under: transformer-attribution rollout (generate_lrp default), last-layer,
late/early-half truncated rollouts, the layer-mean CLS attention row (the
attention-transfer readout), and the full eps-rule engine (generate_full_lrp,
the cli.visualize --mode lrp path). Run from /root/repo (axon)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo root (PYTHONPATH breaks the axon plugin; CLAUDE.md)

import numpy as np
from functools import partial

import jax
import jax.numpy as jnp

from istvt_tpu.core.checkpoint import load_pytree
from istvt_tpu.core.config import ISTVTConfig
from istvt_tpu.data import SyntheticVideoDataset
from istvt_tpu.interpret.lrp import (_head_agg, _rollout,
                                     attention_maps_and_grads)
from istvt_tpu.models.istvt import infer_feat_hw
from istvt_tpu.models.registry import model_selection
from istvt_tpu.train.certify import _spatial_ratios

SIZE, DEPTH, T, PS = 300, 12, 6, 100
CHUNK = 2
N_FAKES = 6

cfg = ISTVTConfig(num_frames=T, image_size=SIZE,
                  feat_hw=infer_feat_hw(SIZE), depth=DEPTH)
model = model_selection("istvt", num_out_classes=1, cfg=cfg)
tpl_p, tpl_s = model.init(jax.random.PRNGKey(0))
blob = load_pytree("/tmp/cert_teacher_300d12",
                   {"params": tpl_p, "model_state": tpl_s})
p, st = blob["params"], blob["model_state"]
print("teacher restored", flush=True)

val = SyntheticVideoDataset(num_clips=32, seq_len=T, size=SIZE, seed=999,
                            static_patch=True, patch_size=PS,
                            amp_range=(0.5, 1.5))
items = [val[i] for i in range(32)]
fakes = sorted([it for it in items if it["labels"] == 1],
               key=lambda it: -float(it["amp"]))[:N_FAKES]
clips = np.stack([f["clips"] for f in fakes])


@jax.jit
def cams_variants(p, st, x):
    attns, grads, logits = attention_maps_and_grads(p, st, x, cfg, 0)
    abars = [_head_agg(a, g) for a, g in zip(attns["s"], grads["s"])]
    out = {
        "ta_rollout": _rollout(abars)[:, 1:, 0, 1:],
        "last_layer": abars[-1][:, 1:, 0, 1:],
        "late_half": _rollout(abars[DEPTH // 2:])[:, 1:, 0, 1:],
        "early_half": _rollout(abars[:DEPTH // 2])[:, 1:, 0, 1:],
        # per-layer grad-weighted CLS rows, layer-mean (no rollout)
        "abar_cls_mean": sum(a[:, 1:, 0, 1:] for a in abars) / len(abars),
    }
    per = [jnp.mean(a[:, :, 1:, 0, 1:].astype(jnp.float32), axis=1)
           for a in attns["s"]]
    out["attn_cls_mean"] = sum(per) / len(per)   # the AT-loss readout
    return out, logits


def chunked(fn, x):
    parts = [fn(p, st, jnp.asarray(x[i:i + CHUNK]))
             for i in range(0, x.shape[0], CHUNK)]
    if isinstance(parts[0], tuple) and isinstance(parts[0][0], dict):
        keys = parts[0][0].keys()
        return ({k: np.concatenate([np.asarray(pt[0][k]) for pt in parts])
                 for k in keys},
                np.concatenate([np.asarray(pt[1]) for pt in parts]))
    return tuple(np.concatenate([np.asarray(pt[j]) for pt in parts])
                 for j in range(len(parts[0])))


cams, logits = chunked(cams_variants, clips)
print("fake logits:", np.round(logits.reshape(-1), 2), flush=True)
for name, cam in cams.items():
    r = _spatial_ratios(np.maximum(np.asarray(cam, np.float64), 0.0),
                        fakes, 1.0, SIZE, cfg.feat_hw, PS)
    print(f"{name:16s} min {min(r):5.2f} mean {np.mean(r):5.2f}", flush=True)

from istvt_tpu.interpret.full_lrp import generate_full_lrp


@jax.jit
def full_cams(p, st, x):
    return generate_full_lrp(p, st, x, cfg, 0)


cam_s_f, cam_t_f = chunked(full_cams, clips)
r = _spatial_ratios(cam_s_f, fakes, 1.0, SIZE, cfg.feat_hw, PS)
print(f"{'full_eps_lrp':16s} min {min(r):5.2f} mean {np.mean(r):5.2f}",
      flush=True)
