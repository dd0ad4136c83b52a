"""Perceiver — cross-attention latent transformer (TPU-native).

The reference's `DualPerceiver` (reference network/dual_net.py:134-161)
instantiates `perceiver_pytorch.Perceiver` over the concatenated 6-channel
frequency views with Fourier position encoding. That external package is
rebuilt here (Jaegle et al., "Perceiver: General Perception with Iterative
Attention", 2021), with the reference's configuration as defaults
(depth 6, 256 latents x 512, 1 cross head, 8 latent heads,
num_freq_bands 6, max_freq 10, 2 self-attends per cross-attend).
"""
from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

from istvt_tpu.core import precision as _precision
from istvt_tpu.nn.layers import (
    gelu,
    layernorm,
    layernorm_init,
    linear,
    linear_init,
)


def fourier_encode(x, max_freq: float, num_bands: int):
    """Fourier features (perceiver_pytorch.fourier_encode): for positions
    in [-1, 1], concat [x, sin(x f π), cos(x f π)] over log-spaced freqs."""
    x = x[..., None]
    freqs = jnp.linspace(1.0, max_freq / 2.0, num_bands)
    scaled = x * freqs * math.pi
    return jnp.concatenate(
        [x, jnp.sin(scaled), jnp.cos(scaled)], axis=-1)


def _attn_init(key, q_dim, kv_dim, heads, dim_head):
    inner = heads * dim_head
    ks = jax.random.split(key, 4)
    return {
        "norm_q": layernorm_init(q_dim),
        "norm_kv": layernorm_init(kv_dim),
        "to_q": linear_init(ks[0], q_dim, inner, bias=False),
        "to_kv": linear_init(ks[1], kv_dim, inner * 2, bias=False),
        "to_out": linear_init(ks[2], inner, q_dim),
    }


def _attention(p, q_in, kv_in, heads):
    b = q_in.shape[0]
    qn = layernorm(p["norm_q"], q_in)
    kvn = layernorm(p["norm_kv"], kv_in)
    q = linear(p["to_q"], qn)
    kv = linear(p["to_kv"], kvn)
    k, v = jnp.split(kv, 2, axis=-1)

    def split(u):
        return u.reshape(b, u.shape[1], heads, -1).transpose(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    dots = jnp.einsum("bhid,bhjd->bhij", q, k,
                      preferred_element_type=jnp.float32,
                      precision=_precision.get()) * q.shape[-1] ** -0.5
    attn = jax.nn.softmax(dots, axis=-1)
    out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v,
                     preferred_element_type=jnp.float32,
                     precision=_precision.get()).astype(v.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, q_in.shape[1], -1)
    return linear(p["to_out"], out)


def _ff_init(key, dim):
    k1, k2 = jax.random.split(key)
    return {"norm": layernorm_init(dim),
            "fc1": linear_init(k1, dim, dim * 4),
            "fc2": linear_init(k2, dim * 4, dim)}


def _ff(p, x):
    return linear(p["fc2"], gelu(linear(p["fc1"], layernorm(p["norm"], x))))


def init(key, input_channels: int = 6, input_axis: int = 2,
         num_freq_bands: int = 6, max_freq: float = 10.0,
         depth: int = 6, num_latents: int = 256, latent_dim: int = 512,
         cross_heads: int = 1, latent_heads: int = 8,
         cross_dim_head: int = 64, latent_dim_head: int = 64,
         num_classes: int = 1, self_per_cross_attn: int = 2):
    input_dim = input_channels + input_axis * (2 * num_freq_bands + 1)
    ks = jax.random.split(key, depth * (2 + 2 * self_per_cross_attn) + 3)
    p: Dict = {
        "latents": jax.random.normal(ks[0], (num_latents, latent_dim)),
        "layers": [],
    }
    ki = 1
    for _ in range(depth):
        layer = {
            "cross": _attn_init(ks[ki], latent_dim, input_dim, cross_heads,
                                cross_dim_head),
            "cross_ff": _ff_init(ks[ki + 1], latent_dim),
            "selfs": [],
        }
        ki += 2
        for _ in range(self_per_cross_attn):
            layer["selfs"].append({
                "attn": _attn_init(ks[ki], latent_dim, latent_dim,
                                   latent_heads, latent_dim_head),
                "ff": _ff_init(ks[ki + 1], latent_dim),
            })
            ki += 2
        p["layers"].append(layer)
    p["head_norm"] = layernorm_init(latent_dim)
    p["head"] = linear_init(ks[-1], latent_dim, num_classes)
    cfg = {"num_freq_bands": num_freq_bands, "max_freq": max_freq,
           "cross_heads": cross_heads, "latent_heads": latent_heads}
    return p, cfg


def apply(p, x, cfg):
    """x: (B, H, W, C) -> (B, num_classes). Fourier-encoded positions are
    concatenated to the channel features, then iterative cross/self
    attention over the latent array."""
    b, h, w, c = x.shape
    ys = jnp.linspace(-1.0, 1.0, h)
    xs = jnp.linspace(-1.0, 1.0, w)
    pos = jnp.stack(jnp.meshgrid(ys, xs, indexing="ij"), axis=-1)
    enc = fourier_encode(pos, cfg["max_freq"], cfg["num_freq_bands"])
    enc = enc.reshape(h, w, -1)
    enc = jnp.broadcast_to(enc[None], (b, h, w, enc.shape[-1]))
    data = jnp.concatenate([x, enc.astype(x.dtype)], axis=-1)
    data = data.reshape(b, h * w, -1)

    z = jnp.broadcast_to(p["latents"][None].astype(x.dtype),
                         (b,) + p["latents"].shape)
    for layer in p["layers"]:
        z = _attention(layer["cross"], z, data, cfg["cross_heads"]) + z
        z = _ff(layer["cross_ff"], z) + z
        for blk in layer["selfs"]:
            z = _attention(blk["attn"], z, z, cfg["latent_heads"]) + z
            z = _ff(blk["ff"], z) + z
    out = jnp.mean(layernorm(p["head_norm"], z), axis=1)
    return linear(p["head"], out)


def dual_perceiver_apply(p, views, cfg):
    """DualPerceiver forward (reference dual_net.py:158-161): concat the
    two 3-channel frequency views on channels -> Perceiver. Returns
    (logits, 0, [], []) like the reference."""
    x = jnp.concatenate(list(views), axis=-1)
    return apply(p, x, cfg), 0, [], []
