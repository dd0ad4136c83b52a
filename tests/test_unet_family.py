"""UNet-family tests: shapes and behaviors of the residual-map UNets,
siamese wrappers, pretext heads, ensembles (reference network/unet.py,
unet_.py, unet_nest.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from istvt_tpu.models import unet as U
from istvt_tpu.models import resnet2d


def _img(b=2, hw=64):
    return jnp.asarray(np.random.RandomState(0).randn(b, hw, hw, 3),
                       jnp.float32)


def test_resnet2d_shapes():
    p, s, cfg = resnet2d.init(jax.random.PRNGKey(0), 18, 2)
    out, ns = resnet2d.apply(p, s, _img(), cfg)
    assert out.shape == (2, 2)
    p, s, cfg = resnet2d.init(jax.random.PRNGKey(0), 50, 2)
    out, _ = resnet2d.apply(p, s, _img(1), cfg)
    assert out.shape == (1, 2)


def test_modified_unet_regression_and_classification():
    p, s, cfg = U.modified_unet_init(jax.random.PRNGKey(0), 3, 3,
                                     mode="add")
    (reg, cla, feats), ns = U.modified_unet_apply(p, s, _img(), cfg)
    assert reg.shape == (2, 64, 64, 3)        # residual map = input grid
    assert cla.shape == (2, 2)
    assert len(feats) == 5                    # [e5, d1, d2, d3, d4]


def test_modified_unet_mul_mode_and_resnet_classifier():
    p, s, cfg = U.modified_unet_init(jax.random.PRNGKey(0), 3, 3,
                                     mode="mul", classifier="resnet18")
    (reg, cla, _), _ = U.modified_unet_apply(p, s, _img(1), cfg)
    assert cla.shape == (1, 2)


def test_triple_apply_shares_weights():
    p, s, cfg = U.modified_unet_init(jax.random.PRNGKey(0), 3, 3)

    def fwd(params, state, x, train=False, rng=None):
        return U.modified_unet_apply(params, state, x, cfg, train, rng)

    a, pp, n = _img(2), _img(2) + 0.1, _img(2) - 0.1
    (regs, clas, feats), _ = U.triple_apply(fwd, p, s, a, pp, n)
    assert len(regs) == 3 and len(clas) == 3
    assert regs[0].shape == (2, 64, 64, 3)
    # same weights: identical inputs give identical outputs across branches
    (regs2, _, _), _ = U.triple_apply(fwd, p, s, a, a, a)
    np.testing.assert_allclose(np.asarray(regs2[0]), np.asarray(regs2[1]),
                               atol=1e-6)


def test_jigsaw_and_compression_heads():
    p, s = U.jigsaw_solver_init(jax.random.PRNGKey(0), 9, 32)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 32), jnp.float32)
    out, _ = U.jigsaw_solver_apply(p, s, x, train=False)
    assert out.shape == (4, 18)
    pc = U.compression_cls_init(jax.random.PRNGKey(1), 32)
    out = U.compression_cls_apply(pc, x)
    assert out.shape == (4, 2)
    pj = U.jigsaw_solver_conv_init(jax.random.PRNGKey(2), 9, 8, grid_hw=4)
    fmap = jnp.zeros((2, 4, 4, 8))
    assert U.jigsaw_solver_conv_apply(pj, fmap).shape == (2, 18)


def test_quadnet_encoder_decoder_roundtrip_shapes():
    p, s, cfg = U.quadnet_encoder_init(jax.random.PRNGKey(0), id_len=896,
                                       model="efficientnet-b0")
    (gs, ids, clas, gf, idf), _ = U.quadnet_encoder_apply(
        p, s, [_img(1, 64)] * 4, cfg)
    assert len(gs) == 4 and clas[0].shape == (1, 2)
    assert ids[0].shape[-1] == 896
    dp, ds = U.quadnet_decoder_init(jax.random.PRNGKey(1), cin=1280, cout=3)
    fmap = jnp.zeros((1, 2, 2, 1280))
    rec, _ = U.quadnet_decoder_apply(dp, ds, fmap)
    assert rec.shape == (1, 64, 64, 3)        # 5 x2 upsamples: 2 -> 64


def test_unet_nested():
    p, s, cfg = U.unet_nested_init(jax.random.PRNGKey(0), 3, 2)
    out, _ = U.unet_nested_apply(p, s, _img(1, 64), cfg)
    assert out.shape == (1, 64, 64, 2)


def test_attention_blocks():
    x = _img(2, 16)
    xc = jnp.concatenate([x] * 6, axis=-1)    # 18 channels
    pc = U.channel_attention_init(jax.random.PRNGKey(0), 18, reduction=2)
    assert U.channel_attention(pc, xc).shape == xc.shape
    ps = U.spatial_attention_init(jax.random.PRNGKey(1))
    assert U.spatial_attention(ps, xc).shape == xc.shape
    pw = U.branch_weight_generator_init(jax.random.PRNGKey(2), 54, 3)
    w = U.branch_weight_generator(pw, [xc, xc, xc])
    assert w.shape == (2, 3)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), np.ones(2), atol=1e-5)


def test_cross_attention_xception():
    p, s = U.cross_attention_xception_init(jax.random.PRNGKey(0), 2)
    x = _img(1, 75)
    (clas, att), _ = U.cross_attention_xception_apply(p, s, [x, x])
    assert len(clas) == 2 and clas[0].shape == (1, 2)
    assert att.shape[-1] == 728


def test_domain_cls():
    p = U.domain_cls_init(jax.random.PRNGKey(0))
    x = jnp.zeros((2, 5, 5, 2048))
    assert U.domain_cls_apply(p, x).shape == (2, 5)


def test_registry_keys_cover_reference():
    from istvt_tpu.models.registry import available_models
    have = set(available_models())
    # registry keys from reference models.py:36-182 (SURVEY.md §2.3)
    needed = {
        "xception", "xception_concat", "resnet50", "resnet18", "mesonet",
        "mesoincep", "efficientnet", "efficientnet_cdc",
        "unet_efficientnet_add", "unet_efficientnet_mul",
        "tripunet_efficientnet_add", "tripunet_efficientnet_mul",
        "triplet_efficientnet", "triplet_efficientnet_cdc",
        "unetplus_efficientnet", "unet_resnet", "quadnet", "quadnet_full",
        "quadnet_conv", "quadnet_dfc", "quadnet_decoder", "decoder",
        "quadplet_efficientnet", "multi_efficientnet",
        "fusion_efficientnet", "trip_multi_en", "multi_xception",
        "jigsaw_multi_en", "jigsaw_multi_en_adv", "jigsaw_multi_xcep_adv",
        "jigsaw_multi_xcep_adv_pair", "fastformer", "resnet_3d",
        "mixed_xcep", "xception_dg",
    }
    missing = needed - have
    assert not missing, f"registry missing: {sorted(missing)}"
