"""Fastformer — additive-attention transformers (TPU-native).

Two reference variants are covered:

1. `FastTransformer` ViT (reference network/fast_transformer_torch/
   fast_transformer_torch.py:35-108, fast_attention.py:7-102, runnable):
   patch embedding + CLS, layers of additive attention where a global
   query token (softmax-pooled q) biases keys, a global key biases
   values, with optional rotary embeddings (pairs of adjacent feature
   dims are sum-reduced before the k/v attention-logit projections), a
   `to_r` value transform, query residual, and to_q/to_k attention-logit
   projections SHARED across depth (fast_transformer_torch.py:87-90).

2. `fast_self_attention` (reference network/fastformer.py:32-249) — the
   BERT-style additive attention encoder. The reference file references
   undefined Bert modules and is non-runnable (SURVEY.md §2.4); the
   attention math itself is reproduced here as a working layer.

Additive attention is O(N): two softmax-pooled reductions replace the
N x N score matrix — already MXU/VPU-friendly, no Pallas needed.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from istvt_tpu.nn.layers import (
    dropout,
    gelu,
    layernorm,
    layernorm_init,
    linear,
    linear_init,
)


# ---------------------------------------------------------------------------
# rotary embeddings (replacing rotary_embedding_torch;
# reference fast_transformer_torch.py:3,66-68)


def rotary_frequencies(n: int, rot_dim: int, base: float = 10000.0):
    """-> (n, rot_dim) angles; rot_dim = dim_head // 2 in the reference
    (RotaryEmbedding(dim_head // 2) at fast_transformer_torch.py:68)."""
    inv = 1.0 / (base ** (jnp.arange(0, rot_dim, 2, dtype=jnp.float32)
                          / rot_dim))
    t = jnp.arange(n, dtype=jnp.float32)
    freqs = jnp.einsum("n,d->nd", t, inv)
    return jnp.repeat(freqs, 2, axis=-1)              # interleaved pairs


def _rotate_half(x):
    """(..., d r=2) pair rotation: (x1, x2) -> (-x2, x1)."""
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.stack([-x2, x1], axis=-1).reshape(*x.shape[:-2], -1)


def apply_rotary_emb(freqs, t):
    """Rotate the first rot_dim features of t, pass the rest through
    (rotary_embedding_torch.apply_rotary_emb semantics)."""
    rot_dim = freqs.shape[-1]
    t_left, t_right = t[..., :rot_dim], t[..., rot_dim:]
    t_left = t_left * jnp.cos(freqs) + _rotate_half(t_left) * jnp.sin(freqs)
    return jnp.concatenate([t_left, t_right], axis=-1)


# ---------------------------------------------------------------------------
# FastAttention (reference fast_attention.py:7-102)


def fast_attention_init(key, dim, heads=8, dim_head=64, use_rotary=True,
                        shared_logits: Optional[Dict] = None):
    divisor = 2 if use_rotary else 1
    ks = jax.random.split(key, 5)
    p = {
        "to_qkv": linear_init(ks[0], dim, heads * dim_head * 3, bias=False),
        "to_r": linear_init(ks[1], dim_head // divisor, dim_head),
        "to_out": linear_init(ks[2], heads * dim_head, dim),
    }
    if shared_logits is None:
        p["to_q_attn_logits"] = linear_init(ks[3], dim_head, 1, bias=False)
        p["to_k_attn_logits"] = linear_init(ks[4], dim_head // divisor, 1,
                                            bias=False)
    return p


def fast_attention(p, x, heads: int, use_rotary: bool = True,
                   shared_logits: Optional[Dict] = None):
    """Additive attention forward (reference fast_attention.py:42-102)."""
    b, n, _ = x.shape
    logits_p = shared_logits if shared_logits is not None else p
    qkv = linear(p["to_qkv"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    # reference reshapes (b, n, h*dh) contiguously to (b, h, n, dh)
    # (fast_attention.py:46) — an unusual grouping, mirrored exactly
    q, k, v = (t.reshape(b, heads, n, -1) for t in (q, k, v))
    dh = q.shape[-1]
    scale = dh ** -0.5

    if use_rotary:
        freqs = rotary_frequencies(n, dh // 2)[None, None]
        q_agg, k_agg, v_agg = (apply_rotary_emb(freqs, t) for t in (q, k, v))
    else:
        q_agg, k_agg, v_agg = q, k, v

    q_attn = jax.nn.softmax(
        linear(logits_p["to_q_attn_logits"], q)[..., 0] * scale, axis=-1)
    global_q = jnp.einsum("bhn,bhnd->bhd", q_attn, q_agg)[:, :, None]
    k = k * global_q
    if use_rotary:
        k = k.reshape(b, heads, n, -1, 2).sum(-1)
    k_attn = jax.nn.softmax(
        linear(logits_p["to_k_attn_logits"], k)[..., 0] * scale, axis=-1)
    global_k = jnp.einsum("bhn,bhnd->bhd", k_attn, k_agg)[:, :, None]
    v = v_agg * global_k
    if use_rotary:
        v = v.reshape(b, heads, n, -1, 2).sum(-1)
    r = linear(p["to_r"], v) + q
    r = r.reshape(b, n, -1)
    return linear(p["to_out"], r)


# ---------------------------------------------------------------------------
# FastTransformer ViT (reference fast_transformer_torch.py:35-108)


def fast_transformer_init(key, num_tokens=1, dim=512, depth=4,
                          image_size=224, patch_size=16, heads=8,
                          dim_head=64, use_rotary=True):
    num_patches = (image_size // patch_size) ** 2
    ks = jax.random.split(key, depth * 2 + 5)
    p: Dict = {
        "patch_proj": linear_init(ks[0], patch_size * patch_size * 3, dim),
        "pos_embedding": jax.random.normal(ks[1], (1, num_patches + 1, dim)),
        "cls_token": jax.random.normal(ks[2], (1, 1, dim)),
        "layers": [],
    }
    for i in range(depth):
        lk = jax.random.split(ks[3 + i], 2)
        shared = None if i == 0 else {}  # marker: layers >0 share layer-0's
        p["layers"].append({
            "attn_norm": layernorm_init(dim),
            "attn": fast_attention_init(lk[0], dim, heads, dim_head,
                                        use_rotary,
                                        shared_logits=shared),
            "ff_norm": layernorm_init(dim),
            "fc1": linear_init(jax.random.split(lk[1])[0], dim, dim * 4),
            "fc2": linear_init(jax.random.split(lk[1])[1], dim * 4, dim),
        })
    p["head_norm"] = layernorm_init(dim)
    p["head"] = linear_init(ks[-1], dim, num_tokens)
    cfg = {"patch_size": patch_size, "heads": heads,
           "use_rotary": use_rotary, "dim": dim}
    return p, cfg


def fast_transformer_apply(p, x, cfg, train: bool = False, rng=None):
    """x: (B, H, W, 3) NHWC -> (B, num_tokens)."""
    b, hh, ww, c = x.shape
    ps = cfg["patch_size"]
    gh, gw = hh // ps, ww // ps
    # 'b (h p1) (w p2) c -> b (h w) (p1 p2 c)'
    patches = x.reshape(b, gh, ps, gw, ps, c).transpose(0, 1, 3, 2, 4, 5)
    patches = patches.reshape(b, gh * gw, ps * ps * c)
    z = linear(p["patch_proj"], patches)
    cls = jnp.broadcast_to(p["cls_token"].astype(z.dtype), (b, 1, z.shape[-1]))
    z = jnp.concatenate([cls, z], axis=1)
    z = z + p["pos_embedding"][:, : z.shape[1]].astype(z.dtype)
    z = dropout(rng, z, 0.1, train)
    # attention-logit projections shared with layer 0
    # (reference fast_transformer_torch.py:87-90)
    shared = p["layers"][0]["attn"]
    for i, layer in enumerate(p["layers"]):
        sl = None if i == 0 else shared
        z = fast_attention(layer["attn"],
                           layernorm(layer["attn_norm"], z),
                           cfg["heads"], cfg["use_rotary"],
                           shared_logits=sl) + z
        h = layernorm(layer["ff_norm"], z)
        z = linear(layer["fc2"], gelu(linear(layer["fc1"], h))) + z
    out = layernorm(p["head_norm"], z[:, 0])
    return linear(p["head"], out)


# ---------------------------------------------------------------------------
# BERT-style FastSelfAttention (reference fastformer.py:32-96; the file's
# encoder scaffolding is broken upstream — the layer itself is kept)


def fast_self_attention_init(key, hidden_size: int, num_heads: int):
    ks = jax.random.split(key, 5)
    return {
        "query": linear_init(ks[0], hidden_size, hidden_size),
        "query_att": linear_init(ks[1], hidden_size, num_heads),
        "key": linear_init(ks[2], hidden_size, hidden_size),
        "key_att": linear_init(ks[3], hidden_size, num_heads),
        "transform": linear_init(ks[4], hidden_size, hidden_size),
    }


def fast_self_attention(p, x, num_heads: int):
    """Per-head additive attention (reference fastformer.py:61-96):
    alpha = softmax(q W_a / sqrt(dh)) pools q globally; pooled q biases k;
    beta-pooled k biases v(=q here); transform + query residual."""
    b, n, d = x.shape
    dh = d // num_heads
    q = linear(p["query"], x)
    k = linear(p["key"], x)
    alpha = jax.nn.softmax(
        linear(p["query_att"], q).transpose(0, 2, 1) / dh ** 0.5, axis=-1)
    qh = q.reshape(b, n, num_heads, dh).transpose(0, 2, 1, 3)
    pooled_q = jnp.einsum("bhn,bhnd->bhd", alpha, qh)[:, :, None]
    kh = k.reshape(b, n, num_heads, dh).transpose(0, 2, 1, 3)
    mixed = kh * pooled_q
    beta = jax.nn.softmax(
        linear(p["key_att"], mixed.transpose(0, 2, 1, 3).reshape(b, n, d))
        .transpose(0, 2, 1) / dh ** 0.5, axis=-1)
    pooled_k = jnp.einsum("bhn,bhnd->bhd", beta, mixed)[:, :, None]
    weighted = pooled_k * qh
    weighted = weighted.transpose(0, 2, 1, 3).reshape(b, n, d)
    return linear(p["transform"], weighted) + q
