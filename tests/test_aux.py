"""Aux subsystem tests: perceiver, group transforms, topk, profiling,
debug-nans (SURVEY.md §5)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from istvt_tpu.data import gtransforms as G
from istvt_tpu.models import perceiver
from istvt_tpu.train.metrics import topk_accuracy
from istvt_tpu.utils import StepTimer, assert_finite, debug_nans


def test_perceiver_forward():
    p, cfg = perceiver.init(jax.random.PRNGKey(0), input_channels=6,
                            depth=1, num_latents=8, latent_dim=32,
                            num_classes=1, self_per_cross_attn=1)
    views = (jnp.zeros((2, 16, 16, 3)), jnp.ones((2, 16, 16, 3)))
    out, zero, a, b = perceiver.dual_perceiver_apply(p, views, cfg)
    assert out.shape == (2, 1)
    assert bool(jnp.isfinite(out).all())


def test_fourier_encode():
    pos = jnp.asarray([[0.0, 1.0]])
    enc = perceiver.fourier_encode(pos, max_freq=10.0, num_bands=4)
    assert enc.shape == (1, 2, 9)   # x + 4 sin + 4 cos


def test_group_transforms():
    rng = np.random.default_rng(0)
    clip = (np.random.RandomState(0).rand(4, 40, 50, 3) * 255).astype(
        np.uint8)
    out = G.clip_transform("train", size=32, rng=rng)(clip)
    assert out.shape == (4, 32, 32, 3)
    out = G.clip_transform("val", size=32)(clip)
    assert out.shape == (4, 32, 32, 3)
    crops = G.clip_transform("3crop", size=32)(clip)
    assert crops.shape == (3, 4, 32, 32, 3)
    # same crop window across frames: frame-to-frame diffs preserved
    norm = G.group_normalize(clip)
    assert abs(float(norm.mean())) < 3.0


def test_topk_accuracy():
    logits = jnp.asarray([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    labels = jnp.asarray([1, 2])
    out = topk_accuracy(logits, labels, ks=(1, 2, 3))
    assert abs(float(out["top1"]) - 0.5) < 1e-6
    assert abs(float(out["top3"]) - 1.0) < 1e-6


def test_step_timer():
    t = StepTimer(warmup=1, items_per_step=4)
    for _ in range(4):
        with t.step():
            pass
    s = t.summary()
    assert s["steps"] == 3 and "items_per_sec" in s


def test_assert_finite():
    assert assert_finite({"a": jnp.ones(3)})
    with pytest.raises(FloatingPointError):
        assert_finite({"a": jnp.asarray([1.0, float("nan")])})


def test_debug_nans_context():
    with debug_nans(False):
        _ = jnp.asarray(0.0) / 0.0   # would raise under debug_nans(True)
