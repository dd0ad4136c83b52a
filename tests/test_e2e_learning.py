"""End-to-end capability test: a tiny ISTVT must LEARN the synthetic
temporal artifact (the exact signal the self-subtract attention targets,
reference module.py:193) — overfitting a small fixed set to high
accuracy through the full data -> loader -> train-step path."""
import numpy as np

import jax
import jax.numpy as jnp

from istvt_tpu.core.config import ISTVTConfig, TrainConfig
from istvt_tpu.data import ClipLoader, SyntheticVideoDataset
from istvt_tpu.models.registry import model_selection
from istvt_tpu.train import step as S
from istvt_tpu.train.metrics import auc
from istvt_tpu.train.schedule import cosine_schedule


def test_istvt_learns_synthetic_temporal_artifact():
    cfg = ISTVTConfig(num_frames=3, image_size=72, feat_hw=5, depth=1)
    model = model_selection("istvt", num_out_classes=1, cfg=cfg)
    tc = TrainConfig(optimizer="adamw")
    opt = S.make_optimizer(tc, cosine_schedule(3e-4, 10_000))
    ts = S.create_train_state(model, jax.random.PRNGKey(0), opt)
    step = S.make_train_step(model, opt, donate=False)

    ds = SyntheticVideoDataset(num_clips=16, seq_len=3, size=72, seed=0)
    loader = ClipLoader(ds, batch_size=16, shuffle=False, num_workers=2)
    batch = next(iter(loader))
    batch = {"clips": jnp.asarray(batch["clips"]),
             "labels": jnp.asarray(batch["labels"])}

    rng = jax.random.PRNGKey(1)
    first_loss = None
    for i in range(25):
        rng, srng = jax.random.split(rng)
        ts, m = step(ts, batch, srng)
        if first_loss is None:
            first_loss = float(m["loss"])
    final_loss = float(m["loss"])
    assert final_loss < first_loss * 0.7, (first_loss, final_loss)

    eval_fn = S.make_eval_step(model)
    out = eval_fn(ts.params, ts.model_state, batch)
    train_auc = float(auc(out["logits"], out["labels"]))
    assert train_auc > 0.9, train_auc
