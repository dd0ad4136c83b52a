"""ViViT (factorized) and VanillaTr (joint) transformer baselines.

Reference: network/vivit/vivit.py:29-81 (ViViT — per-frame spatial
transformer, then temporal transformer over per-frame CLS tokens) and
:150-191 (VanillaTr — joint space-time attention over all T*hw tokens with a
linear patch projection). Both kept for the decomposition-ablation design
space; VanillaTr is the O((T*hw)^2) comparison point (SURVEY.md §5.7).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from istvt_tpu.core.config import ISTVTConfig
from istvt_tpu.nn import attention as A
from istvt_tpu.nn.layers import (
    dropout, gelu, layernorm, layernorm_init, linear, linear_init,
)


def transformer_init(key, dim, depth, inner_dim, mlp_dim):
    """Vanilla pre-norm transformer (reference vivit.py:10-25)."""
    keys = jax.random.split(key, depth)
    layers = []
    for k in keys:
        lk = jax.random.split(k, 4)
        layers.append({
            "attn": {
                "norm": layernorm_init(dim),
                "to_qkv": linear_init(lk[0], dim, inner_dim * 3, bias=False),
                "to_out": linear_init(lk[1], inner_dim, dim),
            },
            "ff": {
                "norm": layernorm_init(dim),
                "fc1": linear_init(lk[2], dim, mlp_dim),
                "fc2": linear_init(lk[3], mlp_dim, dim),
            },
        })
    return {"layers": layers, "norm": layernorm_init(dim)}


def transformer_apply(p, x, heads, cfg: ISTVTConfig, train=False, rng=None):
    for layer in p["layers"]:
        h = layernorm(layer["attn"]["norm"], x)
        h = A.joint_attention(layer["attn"], h, heads)
        x = h + x
        f = layernorm(layer["ff"]["norm"], x)
        f = linear(layer["ff"]["fc2"], gelu(linear(layer["ff"]["fc1"], f)))
        x = f + x
    return layernorm(p["norm"], x)


# ---------------------------------------------------------------------------
# ViViT — factorized spatial->temporal (vivit.py:29-81)


def vivit_init(key, cfg: ISTVTConfig):
    d, inner = cfg.dim, cfg.inner_dim
    n1 = cfg.tokens_per_frame
    keys = jax.random.split(key, 6)
    return {
        "pos_embedding": jax.random.normal(keys[0], (1, cfg.num_frames, n1, d)),
        "space_token": jax.random.normal(keys[1], (1, 1, d)),
        "temporal_token": jax.random.normal(keys[2], (1, 1, d)),
        "space_transformer": transformer_init(
            keys[3], d, cfg.depth, inner, d * cfg.mlp_ratio),
        "temporal_transformer": transformer_init(
            keys[4], d, cfg.depth, inner, d * cfg.mlp_ratio),
        "mlp_head": {"norm": layernorm_init(d),
                     "fc": linear_init(keys[5], d, cfg.num_classes)},
    }


def vivit_apply(p, feats, cfg: ISTVTConfig, train=False, rng=None):
    """feats: (B, T, H, W, C) -> (B, num_classes)."""
    b, t, hh, ww, d = feats.shape
    n = hh * ww
    x = feats.reshape(b, t, n, d)
    cls_space = jnp.broadcast_to(p["space_token"].astype(x.dtype), (b, t, 1, d))
    x = jnp.concatenate([cls_space, x], axis=2)
    x = x + p["pos_embedding"][:, :, :n + 1].astype(x.dtype)
    x = x.reshape(b * t, n + 1, d)
    x = transformer_apply(p["space_transformer"], x, cfg.heads, cfg, train, rng)
    x = x[:, 0].reshape(b, t, d)                       # per-frame CLS
    cls_temp = jnp.broadcast_to(p["temporal_token"].astype(x.dtype), (b, 1, d))
    x = jnp.concatenate([cls_temp, x], axis=1)
    x = transformer_apply(p["temporal_transformer"], x, cfg.heads, cfg, train, rng)
    cls = x[:, 0]
    return linear(p["mlp_head"]["fc"], layernorm(p["mlp_head"]["norm"], cls))


# ---------------------------------------------------------------------------
# VanillaTr — joint space-time attention (vivit.py:150-191)


def vanilla_tr_init(key, cfg: ISTVTConfig):
    d, inner = cfg.dim, cfg.inner_dim
    n = cfg.feat_hw * cfg.feat_hw
    keys = jax.random.split(key, 5)
    return {
        "patch_proj": linear_init(keys[0], d, d),
        "pos_embedding": jax.random.normal(
            keys[1], (1, cfg.num_frames * n + 1, d)),
        "cls_token": jax.random.normal(keys[2], (1, 1, d)),
        "transformer": transformer_init(
            keys[3], d, cfg.depth, inner, d * cfg.mlp_ratio),
        "mlp_head": {"norm": layernorm_init(d),
                     "fc": linear_init(keys[4], d, cfg.num_classes)},
    }


def vanilla_tr_apply(p, feats, cfg: ISTVTConfig, train=False, rng=None):
    b, t, hh, ww, d = feats.shape
    x = feats.reshape(b, t * hh * ww, d)
    x = linear(p["patch_proj"], x)                       # (vivit.py:163)
    cls = jnp.broadcast_to(p["cls_token"].astype(x.dtype), (b, 1, d))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["pos_embedding"].astype(x.dtype)
    x = transformer_apply(p["transformer"], x, cfg.heads, cfg, train, rng)
    cls = x[:, 0]
    return linear(p["mlp_head"]["fc"], layernorm(p["mlp_head"]["norm"], cls))
