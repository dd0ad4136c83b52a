"""DualNet frequency heads + fusion tests (reference network/dual_net.py;
the reference module itself imports the absent `attention_lib`, so parity
here is against the mathematical definitions rather than torch runs)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from istvt_tpu.models import dualnet


def test_dct_mat_matches_reference_formula():
    size = 16
    m = dualnet.dct_mat(size)
    want = np.array(
        [[(np.sqrt(1.0 / size) if i == 0 else np.sqrt(2.0 / size))
          * np.cos((j + 0.5) * np.pi * i / size) for j in range(size)]
         for i in range(size)], np.float32)   # dual_net.py:270-272
    np.testing.assert_allclose(m, want, atol=1e-6)
    # orthogonality: D D^T = I
    np.testing.assert_allclose(m @ m.T, np.eye(size), atol=1e-5)


def test_generate_filter_band_support():
    f = dualnet.generate_filter(0, 4, 8)
    # 1 iff 0 < i+j <= 4 (dual_net.py:274-275)
    assert f[0, 0] == 0.0
    assert f[0, 1] == 1.0 and f[2, 2] == 1.0
    assert f[2, 3] == 0.0 and f[7, 7] == 0.0


def test_fad_head_roundtrip_and_shape():
    size = 32
    # zero learnable masks: norm_sigma(0) = 0, filters reduce to the
    # fixed band supports (dual_net.py:38-41)
    p = {"learnable": [jnp.zeros((size, size)) for _ in range(4)]}
    x = jnp.asarray(np.random.RandomState(0).randn(2, size, size, 3),
                    jnp.float32)
    out = dualnet.fad_apply(p, x, size)
    assert out.shape == (2, size, size, 12)
    # band 4 is all-pass except DC (generate_filter(0, 2*size)): its output
    # must equal x minus the per-image DCT-DC component
    band_all = np.asarray(out[..., 9:12])
    d = np.asarray(dualnet.dct_mat(size))
    xf = np.einsum("ih,bhwc->biwc", d, np.asarray(x))
    xf = np.einsum("jw,biwc->bijc", d, xf)
    dc_only = np.zeros_like(xf)
    dc_only[:, 0, 0] = xf[:, 0, 0]
    rec_dc = np.einsum("jw,bhjc->bhwc", d, np.einsum(
        "ih,biwc->bhwc", d, dc_only))
    np.testing.assert_allclose(band_all, np.asarray(x) - rec_dc, atol=1e-4)


def test_lfs_head_shape_and_finiteness():
    key = jax.random.PRNGKey(0)
    p = dualnet.lfs_init(key, 10, 6)
    # the reference asserts size_after == 149, which holds for the 299-px
    # xception_default transform: (299 - 10 + 8)//2 + 1 (dual_net.py:113)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 299, 299, 3) * 2 - 1,
                    jnp.float32)
    out = dualnet.lfs_apply(p, x, 10, 2, 6)
    assert out.shape == (1, 149, 149, 6)
    assert bool(jnp.isfinite(out).all())


def test_psa_shapes():
    p = dualnet.psa_init(jax.random.PRNGKey(0), 16)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 5, 16), jnp.float32)
    y = dualnet.psa_apply(p, x)
    assert y.shape == x.shape
    assert bool(jnp.isfinite(y).all())


def test_mixblock_shapes():
    p, s = dualnet.mixblock_init(jax.random.PRNGKey(0), 8)
    a = jnp.asarray(np.random.RandomState(0).randn(2, 5, 5, 8), jnp.float32)
    b = jnp.asarray(np.random.RandomState(1).randn(2, 5, 5, 8), jnp.float32)
    ya, yb, ns = dualnet.mixblock_apply(p, s, a, b)
    assert ya.shape == a.shape and yb.shape == b.shape


def test_dualnet_forward_small():
    p, s, cfg = dualnet.init(jax.random.PRNGKey(0), num_classes=1,
                             img_size=75)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 75, 75, 3) * 2 - 1,
                    jnp.float32)
    (logits, feat, _, _), ns = dualnet.apply(p, s, x, cfg, train=False)
    assert logits.shape == (1, 1)
    assert feat.shape[-1] == 4096
    assert bool(jnp.isfinite(logits).all())


def test_dualnet_registry():
    from istvt_tpu.models.registry import model_selection
    m = model_selection("dualnet", num_out_classes=1, img_size=75)
    p, s = m.init(jax.random.PRNGKey(0))
    out, _ = m.apply(p, s, jnp.zeros((1, 75, 75, 3)), train=False)
    assert out.shape == (1, 1)
