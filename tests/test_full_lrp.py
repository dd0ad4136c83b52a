"""Full ε-rule LRP (interpret/full_lrp): conservation unit tests for each
relprop rule + integration checks (VERDICT r2 #3).

The torch-side golden for the full method lives in test_lrp_golden.py
(test_full_lrp_matches_torch_relprop) next to the rollout golden."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from istvt_tpu.core.config import ISTVTConfig
from istvt_tpu.interpret.full_lrp import (
    _ln_detached,
    dsttr_full_lrp,
    generate_full_lrp,
    zrule,
)
from istvt_tpu.models import istvt
from istvt_tpu.nn.layers import linear


def test_zrule_linear_conserves():
    """ε-rule through a bias-free Linear: Σ R_in == Σ R_out exactly."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 16), jnp.float32)
    w = jnp.asarray(rng.randn(16, 8), jnp.float32)
    r_out = jnp.asarray(np.abs(rng.randn(4, 8)), jnp.float32)
    r_in = zrule(lambda u: u @ w, (x,), r_out)
    np.testing.assert_allclose(float(r_in.sum()), float(r_out.sum()),
                               rtol=1e-5)


def test_zrule_add_conserves_and_splits_proportionally():
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.rand(5, 7) + 0.5, jnp.float32)
    b = jnp.asarray(rng.rand(5, 7) + 0.5, jnp.float32)
    r_out = jnp.asarray(rng.rand(5, 7), jnp.float32)
    r_a, r_b = zrule(lambda u, v: u + v, (a, b), r_out)
    np.testing.assert_allclose(np.asarray(r_a + r_b), np.asarray(r_out),
                               rtol=1e-5)
    # proportional to contribution
    np.testing.assert_allclose(np.asarray(r_a / r_out),
                               np.asarray(a / (a + b)), rtol=1e-4)


def test_zrule_bilinear_split_conserves():
    """attention PV-style product with split=True:
    Σ R_A + Σ R_V == Σ R_out."""
    rng = np.random.RandomState(2)
    a = jnp.asarray(rng.rand(3, 6, 6), jnp.float32)
    v = jnp.asarray(rng.randn(3, 6, 4), jnp.float32)
    r_out = jnp.asarray(np.abs(rng.randn(3, 6, 4)), jnp.float32)
    r_a, r_v = zrule(lambda u, w: jnp.einsum("bij,bjd->bid", u, w),
                     (a, v), r_out, split=True)
    np.testing.assert_allclose(float(r_a.sum() + r_v.sum()),
                               float(r_out.sum()), rtol=1e-5)


def test_detached_ln_is_forward_identical_and_conserves_when_affine_free():
    """_ln_detached forward == nn.layers.layernorm; with γ=1, β=0 and a
    zero-mean input the ε-rule through it conserves exactly (the map is
    then purely linear: x/σ̂)."""
    from istvt_tpu.nn.layers import layernorm

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(4, 12), jnp.float32)
    p = {"scale": jnp.asarray(rng.rand(12) + 0.5, jnp.float32),
         "bias": jnp.asarray(rng.randn(12), jnp.float32)}
    np.testing.assert_allclose(np.asarray(_ln_detached(p, x)),
                               np.asarray(layernorm(p, x)), atol=1e-6)

    p0 = {"scale": jnp.ones(12), "bias": jnp.zeros(12)}
    xc = x - x.mean(axis=-1, keepdims=True)
    r_out = jnp.asarray(np.abs(rng.randn(4, 12)), jnp.float32)
    r_in = zrule(lambda u: _ln_detached(p0, u), (xc,), r_out)
    np.testing.assert_allclose(float(r_in.sum()), float(r_out.sum()),
                               rtol=1e-4)
    # the RAW (non-detached) LayerNorm annihilates relevance (Euler /
    # 0-homogeneity) — the reason _ln_detached exists
    from istvt_tpu.nn.layers import layernorm as raw_ln
    r_raw = zrule(lambda u: raw_ln(p0, u), (xc,), r_out)
    assert abs(float(r_raw.sum())) < 1e-3 * float(r_out.sum())


def test_layerwise_relevance_sums_stay_bounded():
    """Integration conservation: walking the full DSTTr, the total
    relevance after each layer stays within a band of the head-stage
    total (ε-rule leaks only through biases/softmax-gradient terms —
    annihilation or blow-up means a rule is wrong)."""
    cfg = ISTVTConfig(num_frames=3, image_size=72, feat_hw=5, depth=3)
    p, s = istvt.init(jax.random.PRNGKey(0), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 5, 5, 728)) \
        * 0.1
    rel, logits, sums = dsttr_full_lrp(p["vit"], feats, cfg, index=0)
    sums = np.asarray(sums)
    assert np.isfinite(sums).all()
    assert sums[0] > 1e-3            # no annihilation at the head
    for a, b in zip(sums[:-1], sums[1:]):
        assert 0.3 < b / a < 3.0, sums
    # per-layer attention relevances exist and are finite
    assert len(rel["s"]) == cfg.depth and len(rel["t"]) == cfg.depth
    for r in rel["s"] + rel["t"]:
        assert bool(jnp.isfinite(r).all())


def test_generate_full_lrp_shapes_and_localization():
    """full_lrp cams have the rollout cams' contract (B, T, hw) and, on a
    model overfit to a fixed-patch artifact, localize it (same behavioral
    bar as test_lrp_golden.test_lrp_localizes_synthetic_artifact)."""
    from istvt_tpu.core.config import TrainConfig
    from istvt_tpu.models.registry import model_selection
    from istvt_tpu.train import step as S
    from istvt_tpu.train.schedule import cosine_schedule

    size, fhw, t = 72, 5, 3
    cell = size / fhw
    lo, hi = int(cell * 1), int(cell * 4)

    def make_batch(n, seed):
        rng = np.random.default_rng(seed)
        clips, labels = [], []
        for i in range(n):
            base = rng.normal(0, 0.3, (size, size, 3)).astype(np.float32)
            clip = np.stack([np.roll(base, sh, axis=1) for sh in range(t)])
            if i % 2 == 1:
                clip[:, lo:hi, lo:hi] += rng.normal(
                    0, 1.0, (t, hi - lo, hi - lo, 3)).astype(np.float32)
            clips.append(clip)
            labels.append(i % 2)
        return {"clips": jnp.asarray(np.stack(clips)),
                "labels": jnp.asarray(np.asarray(labels, np.int32))}

    cfg = ISTVTConfig(num_frames=t, image_size=size, feat_hw=fhw, depth=2)
    model = model_selection("istvt", num_out_classes=1, cfg=cfg)
    opt = S.make_optimizer(TrainConfig(), cosine_schedule(3e-4, 10_000))
    ts = S.create_train_state(model, jax.random.PRNGKey(0), opt)
    step = S.make_train_step(model, opt, donate=False)
    batch = make_batch(16, seed=0)
    rng = jax.random.PRNGKey(1)
    for _ in range(30):
        rng, srng = jax.random.split(rng)
        ts, m = step(ts, batch, srng)
    assert float(m["loss"]) < 0.3, float(m["loss"])

    fake = make_batch(2, seed=7)["clips"][1:2]
    cam_s, cam_t = generate_full_lrp(ts.params, ts.model_state, fake, cfg)
    assert cam_s.shape == cam_t.shape == (1, t, fhw * fhw)
    mask = np.zeros((fhw, fhw), bool)
    mask[1:4, 1:4] = True
    for name, cam in (("cam_s", cam_s), ("cam_t", cam_t)):
        grid = np.asarray(cam)[0].mean(0).reshape(fhw, fhw)
        assert grid[mask].mean() > grid[~mask].mean(), (name, grid)
