"""Fastformer / CvT tests: additive attention properties, rotary
embeddings, end-to-end shapes (reference fast_attention.py,
fast_transformer_torch.py, vit_pytorch CvT)."""
import numpy as np

import jax
import jax.numpy as jnp

from istvt_tpu.models import cvt, fastformer


def test_rotary_preserves_norm_and_relative_phase():
    freqs = fastformer.rotary_frequencies(8, 16)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 1, 8, 32), np.float32)
    y = fastformer.apply_rotary_emb(freqs[None, None], x)
    # rotation preserves the norm of the rotated half
    n0 = jnp.linalg.norm(x[..., :16], axis=-1)
    n1 = jnp.linalg.norm(y[..., :16], axis=-1)
    np.testing.assert_allclose(np.asarray(n0), np.asarray(n1), atol=1e-4)
    # the un-rotated half passes through
    np.testing.assert_allclose(np.asarray(x[..., 16:]),
                               np.asarray(y[..., 16:]))
    # inner products depend only on relative position: <rot_i q, rot_j k>
    q = x[0, 0, 2, :16]
    k = x[0, 0, 5, :16]
    def rot(v, i):
        return fastformer.apply_rotary_emb(freqs[i], v)
    d1 = jnp.dot(rot(q, 2), rot(k, 5))
    d2 = jnp.dot(rot(q, 3), rot(k, 6))
    np.testing.assert_allclose(float(d1), float(d2), atol=1e-3)


def test_fast_attention_shapes_and_linearity_in_n():
    key = jax.random.PRNGKey(0)
    p = fastformer.fast_attention_init(key, 32, heads=4, dim_head=16,
                                       use_rotary=True)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 10, 32), jnp.float32)
    y = fastformer.fast_attention(p, x, heads=4, use_rotary=True)
    assert y.shape == (2, 10, 32)
    assert bool(jnp.isfinite(y).all())
    # no-rotary path
    p2 = fastformer.fast_attention_init(key, 32, heads=4, dim_head=16,
                                        use_rotary=False)
    y2 = fastformer.fast_attention(p2, x, heads=4, use_rotary=False)
    assert y2.shape == (2, 10, 32)


def test_fast_transformer_forward():
    p, cfg = fastformer.fast_transformer_init(
        jax.random.PRNGKey(0), num_tokens=1, dim=64, depth=2,
        image_size=32, patch_size=16, heads=4, dim_head=16)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3), jnp.float32)
    out = fastformer.fast_transformer_apply(p, x, cfg)
    assert out.shape == (2, 1)
    assert bool(jnp.isfinite(out).all())
    # shared attention-logit weights: layers > 0 carry no logit params
    assert "to_q_attn_logits" in p["layers"][0]["attn"]
    assert "to_q_attn_logits" not in p["layers"][1]["attn"]


def test_fast_self_attention_bert_style():
    p = fastformer.fast_self_attention_init(jax.random.PRNGKey(0), 32, 4)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 7, 32), jnp.float32)
    y = fastformer.fast_self_attention(p, x, num_heads=4)
    assert y.shape == (2, 7, 32)


def test_cvt_forward_and_registry():
    p, s = cvt.init(jax.random.PRNGKey(0), num_classes=1)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3), jnp.float32)
    out, ns = cvt.apply(p, s, x)
    assert out.shape == (1, 1)
    from istvt_tpu.models.registry import model_selection
    m = model_selection("fastformer", num_out_classes=1)
    p2, s2 = m.init(jax.random.PRNGKey(0))
    out2, _ = m.apply(p2, s2, x)
    assert out2.shape == (1, 1)
