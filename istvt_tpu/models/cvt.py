"""CvT — Convolutional vision Transformer (TPU-native).

The reference's 'fastformer' registry key instantiates `vit_pytorch.cvt.CvT`
(reference network/models.py:21,158,174: `CvT(num_classes=1)`), an external
dependency; rebuilt here following the CvT-13 architecture (Wu et al. 2021,
matching vit_pytorch's defaults):

  stage 1: conv embed k7 s4 -> 64 d, 1 head, depth 1
  stage 2: conv embed k3 s2 -> 192 d, 3 heads, depth 2
  stage 3: conv embed k3 s2 -> 384 d, 6 heads, depth 10

Each attention projects q/k/v with depthwise convs over the spatial grid
(k3; stride 1 for q, stride 2 for k/v — the token downsampling that makes
CvT cheap), then standard softmax attention + GELU MLP. Head: LayerNorm ->
global mean pool -> Linear.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from istvt_tpu.core import precision as _precision
from istvt_tpu.nn.layers import (
    batchnorm,
    batchnorm_init,
    conv2d,
    conv2d_init,
    gelu,
    layernorm,
    layernorm_init,
    linear,
    linear_init,
    separable_conv2d,
    separable_conv2d_init,
)

STAGES = (
    # (emb_kernel, emb_stride, emb_pad, dim, heads, depth)
    (7, 4, 2, 64, 1, 1),
    (3, 2, 1, 192, 3, 2),
    (3, 2, 1, 384, 6, 10),
)


def _attn_init(key, dim, heads):
    ks = jax.random.split(key, 4)
    return {
        "norm": layernorm_init(dim),
        "to_q": separable_conv2d_init(ks[0], dim, dim, 3, bias=True),
        "to_k": separable_conv2d_init(ks[1], dim, dim, 3, bias=True),
        "to_v": separable_conv2d_init(ks[2], dim, dim, 3, bias=True),
        "to_out": linear_init(ks[3], dim, dim),
    }


def _conv_attention(p, x, heads):
    """x: (B, H, W, C) grid -> same. q stride 1; k/v stride 2."""
    b, h, w, c = x.shape
    xn = layernorm(p["norm"], x)
    q = separable_conv2d(p["to_q"], xn, stride=1, padding=1)
    k = separable_conv2d(p["to_k"], xn, stride=2, padding=1)
    v = separable_conv2d(p["to_v"], xn, stride=2, padding=1)
    dh = c // heads

    def tokens(u):
        return u.reshape(b, -1, heads, dh).transpose(0, 2, 1, 3)

    q, k, v = tokens(q), tokens(k), tokens(v)
    dots = jnp.einsum("bhid,bhjd->bhij", q, k,
                      preferred_element_type=jnp.float32,
                      precision=_precision.get()) * dh ** -0.5
    attn = jax.nn.softmax(dots, axis=-1)
    out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v,
                     preferred_element_type=jnp.float32,
                     precision=_precision.get()).astype(v.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, h, w, c)
    return linear(p["to_out"], out)


def init(key, num_classes: int = 1):
    ks = jax.random.split(key, 20)
    p: Dict = {"stages": []}
    s: Dict = {"stages": []}
    in_ch = 3
    ki = 0
    for (ek, es, ep, dim, heads, depth) in STAGES:
        st_p: Dict = {"embed": conv2d_init(ks[ki], in_ch, dim, ek, bias=True)}
        st_s: Dict = {}
        st_p["embed_bn"], st_s["embed_bn"] = batchnorm_init(dim)
        ki += 1
        st_p["blocks"] = []
        for d in range(depth):
            bk = jax.random.split(ks[ki], 3)
            st_p["blocks"].append({
                "attn": _attn_init(bk[0], dim, heads),
                "ff_norm": layernorm_init(dim),
                "fc1": linear_init(bk[1], dim, dim * 4),
                "fc2": linear_init(bk[2], dim * 4, dim),
            })
        ki += 1
        p["stages"].append(st_p)
        s["stages"].append(st_s)
        in_ch = dim
    p["head_norm"] = layernorm_init(STAGES[-1][3])
    p["head"] = linear_init(ks[-1], STAGES[-1][3], num_classes)
    return p, s


def apply(p, s, x, train: bool = False, rng=None):
    """x: (B, H, W, 3) -> (B, num_classes)."""
    ns: Dict = {"stages": []}
    for si, (ek, es, ep, dim, heads, depth) in enumerate(STAGES):
        st_p, st_s = p["stages"][si], s["stages"][si]
        st_ns: Dict = {}
        x = conv2d(st_p["embed"], x, stride=es, padding=ep)
        x, st_ns["embed_bn"] = batchnorm(st_p["embed_bn"],
                                         st_s["embed_bn"], x, train)
        for blk in st_p["blocks"]:
            x = _conv_attention(blk["attn"], x, heads) + x
            h = layernorm(blk["ff_norm"], x)
            x = linear(blk["fc2"], gelu(linear(blk["fc1"], h))) + x
        ns["stages"].append(st_ns)
    feat = layernorm(p["head_norm"], x)
    feat = jnp.mean(feat, axis=(1, 2))
    return linear(p["head"], feat), ns
