"""MAT texture-net tests (reference network/vivit/texture.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from istvt_tpu.models import mat


def _img(b=1, hw=75):
    return jnp.asarray(np.random.RandomState(0).randn(b, hw, hw, 3),
                       jnp.float32)


def test_attention_map_mask_and_positivity():
    p, s = mat.attention_map_init(jax.random.PRNGKey(0), 8, 4)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 24, 24, 8), jnp.float32)
    y, _ = mat.attention_map_apply(p, s, x)
    assert y.shape == (2, 24, 24, 4)
    assert float(y.min()) >= 0.0            # ELU + 1 through mask
    # 2px border masked to zero (reference texture.py:17-19,33)
    assert float(jnp.abs(y[:, :2]).max()) == 0.0
    assert float(jnp.abs(y[:, :, -2:]).max()) == 0.0


def test_attention_pooling_norms():
    feats = jnp.asarray(np.random.RandomState(0).rand(2, 6, 6, 8),
                        jnp.float32)
    atts = jnp.asarray(np.random.RandomState(1).rand(2, 6, 6, 3),
                       jnp.float32)
    fm = mat.attention_pooling(feats, atts, norm=2)
    assert fm.shape == (2, 3, 8)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(fm, axis=-1)),
                               np.ones((2, 3)), atol=1e-5)
    fm1 = mat.attention_pooling(feats, atts, norm=1)
    assert bool(jnp.isfinite(fm1).all())


def test_texture_enhance_v1_highpass():
    p, s = mat.texture_enhance_v1_init(jax.random.PRNGKey(0), 8)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 8), jnp.float32)
    (y, d), _ = mat.texture_enhance_v1_apply(p, s, x, (0.5, 0.5))
    assert y.shape == (1, 8, 8, 32)
    assert d.shape == (1, 4, 4, 8)


def test_texture_enhance_v2_grouped():
    m = 3
    p, s = mat.texture_enhance_v2_init(jax.random.PRNGKey(0), 8, m)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 8), jnp.float32)
    att = jnp.asarray(np.random.RandomState(1).rand(1, 8, 8, m), jnp.float32)
    (y, d), _ = mat.texture_enhance_v2_apply(p, s, x, att, m=m)
    assert y.shape == (1, m, 8, 8, 8)


def test_auxiliary_loss_updates_centers():
    state = mat.auxiliary_loss_init(3, 8)
    fm_d = jnp.asarray(np.random.RandomState(0).rand(4, 6, 6, 8), jnp.float32)
    att = jnp.asarray(np.random.RandomState(1).rand(4, 6, 6, 3), jnp.float32)
    y = jnp.asarray([0, 1, 0, 1])
    loss, fm, new_state = mat.auxiliary_loss_v2(state, fm_d, att, y)
    assert np.isfinite(float(loss))
    assert fm.shape == (4, 3, 8)
    assert not np.allclose(np.asarray(new_state["feature_centers"]),
                           np.asarray(state["feature_centers"]))
    # eval mode: centers frozen
    _, _, ns2 = mat.auxiliary_loss_v2(state, fm_d, att, y, train=False)
    np.testing.assert_array_equal(np.asarray(ns2["feature_centers"]),
                                  np.asarray(state["feature_centers"]))


def test_mat_forward():
    p, s, cfg = mat.mat_init(jax.random.PRNGKey(0), num_classes=2, m=4)
    (logits, aux), ns = mat.mat_apply(p, s, _img(), cfg, train=False)
    assert logits.shape == (1, 2)
    assert aux["attention_maps"].shape[-1] == 4
    assert bool(jnp.isfinite(logits).all())


def test_netrunc_forward():
    p, s, cfg = mat.netrunc_init(jax.random.PRNGKey(0), num_classes=2)
    out, ns = mat.netrunc_apply(p, s, _img(), cfg)
    assert out.shape == (1, 2)
