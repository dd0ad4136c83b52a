"""Alt attention variants (reference network/vivit/module.py:96-363):
unfold/fold parity vs torch, windowed attention, ReAttention, LeFF,
LCAttention."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from istvt_tpu.nn import attention as A
from istvt_tpu.nn.layers import (batchnorm_init, conv2d_init, layernorm_init,
                                 linear_init)


def test_unfold_fold_match_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    x = rng.randn(2, 19, 19, 5).astype(np.float32)
    k, stride, pad = 7, 3, 6
    ours = A.unfold2d(jnp.asarray(x), k, stride, pad)
    tx = torch.tensor(x.transpose(0, 3, 1, 2))
    theirs = torch.nn.functional.unfold(tx, (k, k), padding=pad,
                                        stride=stride)
    n = theirs.shape[-1]
    gh = int(round(n ** 0.5))
    theirs = theirs.reshape(2, 5, k, k, gh, gh).permute(0, 4, 5, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-6)

    folded = A.fold2d(ours, 19, k, stride, pad)
    tf = torch.nn.functional.fold(
        torch.nn.functional.unfold(tx, (k, k), padding=pad, stride=stride),
        (19, 19), (k, k), padding=pad, stride=stride)
    np.testing.assert_allclose(np.asarray(folded),
                               tf.numpy().transpose(0, 2, 3, 1), atol=1e-4)


def test_local_spatial_attention():
    grid, d, heads, inner = 19, 16, 2, 32
    key = jax.random.PRNGKey(0)
    p = {"to_qkv": linear_init(key, d, inner * 3, bias=False),
         "to_out": linear_init(key, inner, d)}
    t1 = 2
    n = t1 * (grid * grid + 1)
    x = jnp.asarray(np.random.RandomState(0).randn(1, n, d), jnp.float32)
    out = A.local_spatial_attention(p, x, heads, grid=grid)
    assert out.shape == (1, n, d)
    assert bool(jnp.isfinite(out).all())


def test_re_attention():
    d, heads = 16, 4
    key = jax.random.PRNGKey(0)
    p = {"to_qkv": linear_init(key, d, 64 * 3, bias=False),
         "reattn_weights": jax.random.normal(key, (heads, heads)),
         "reattn_norm_scale": jnp.ones((heads,)),
         "reattn_norm_bias": jnp.zeros((heads,))}
    x = jnp.asarray(np.random.RandomState(0).randn(2, 9, d), jnp.float32)
    out = A.re_attention(p, x, heads)
    assert out.shape == (2, 9, 64)


def test_lc_attention_queries_last_token_only():
    d, heads = 16, 2
    key = jax.random.PRNGKey(0)
    p = {"to_qkv": linear_init(key, d, 32 * 3, bias=False),
         "to_out": linear_init(key, 32, d)}
    x = jnp.asarray(np.random.RandomState(0).randn(2, 9, d), jnp.float32)
    out = A.lc_attention(p, x, heads)
    assert out.shape == (2, 1, d)


def test_leff():
    d, scale, grid = 8, 4, 4
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    p = {"up": linear_init(ks[0], d, d * scale),
         "dw": conv2d_init(ks[1], d * scale, d * scale, 3,
                           groups=d * scale),
         "down": linear_init(ks[2], d * scale, d)}
    s = {}
    p["bn1"], s["bn1"] = batchnorm_init(d * scale)
    p["bn2"], s["bn2"] = batchnorm_init(d * scale)
    p["bn3"], s["bn3"] = batchnorm_init(d)
    x = jnp.asarray(np.random.RandomState(0).randn(2, grid * grid, d),
                    jnp.float32)
    y, ns = A.leff(p, s, x, grid=grid)
    assert y.shape == x.shape


def test_mat_registry():
    from istvt_tpu.models.registry import model_selection
    m = model_selection("netrunc", num_out_classes=2)
    p, s = m.init(jax.random.PRNGKey(0))
    out, _ = m.apply(p, s, jnp.zeros((1, 75, 75, 3)), train=False)
    assert out.shape == (1, 2)
