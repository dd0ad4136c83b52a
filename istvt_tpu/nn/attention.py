"""Decomposed spatial-temporal attention ops (XLA einsum path).

These implement ISTVT's decomposition (reference network/vivit/module.py):
instead of joint attention over all (T+1)*362 tokens — O((T*hw)^2) — the
model alternates:

  * temporal_residual_attention — attention over the t axis *per spatial
    location*, where Q,K are projected from the self-subtract residual
    stream cat(x[:,0:2], x[:,2:] - x[:,1:-1]) and V from the original x
    (reference module.py:174-208). The residual makes Q/K see frame
    *differences*, the temporal-artifact signal.
  * spatial_only_attention — attention over the hw axis *per frame*
    (reference module.py:66-93).

Token layout throughout: x is (B, N, D) with N = (T+1) * S, S = hw + 1
(spatial CLS first in each frame row, temporal-CLS frame first in t),
flattened row-major from (T+1, S) (reference vivit.py:132-144).

All contractions carry `preferred_element_type=float32` so the MXU
accumulates in f32 even under bf16 inputs. A fused Pallas kernel path is
selectable via `use_pallas` (istvt_tpu/kernels/attention.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from istvt_tpu.core import precision as _precision
from istvt_tpu.nn.layers import linear


def _split_heads(x, heads):
    """(..., N, H*Dh) -> (..., H, N, Dh)"""
    *lead, n, hd = x.shape
    x = x.reshape(*lead, n, heads, hd // heads)
    return jnp.moveaxis(x, -2, -3)


def _merge_heads(x):
    """(..., H, N, Dh) -> (..., N, H*Dh)"""
    x = jnp.moveaxis(x, -3, -2)
    *lead, n, h, dh = x.shape
    return x.reshape(*lead, n, h * dh)


def _sdpa(q, k, v, scale):
    """softmax(q k^T * scale) v over the second-to-last axis of q/k/v."""
    dots = jnp.einsum("...id,...jd->...ij", q, k,
                      preferred_element_type=jnp.float32,
                      precision=_precision.get()) * scale
    attn = jax.nn.softmax(dots, axis=-1)
    out = jnp.einsum("...ij,...jd->...id", attn.astype(v.dtype), v,
                     preferred_element_type=jnp.float32,
                     precision=_precision.get())
    return out.astype(v.dtype), attn


def joint_attention(p, x, heads: int, return_attn: bool = False):
    """Vanilla joint self-attention over all tokens
    (reference module.py:36-64), used by ViViT/VanillaTr baselines."""
    qkv = linear(p["to_qkv"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    dh = q.shape[-1] // heads
    q, k, v = (_split_heads(t, heads) for t in (q, k, v))
    out, attn = _sdpa(q, k, v, dh ** -0.5)
    out = linear(p["to_out"], _merge_heads(out))
    return (out, attn) if return_attn else out


def spatial_only_attention(p, x, heads: int, tokens_per_frame: int,
                           return_attn: bool = False):
    """Per-frame attention over the hw axis (reference module.py:66-93).

    x: (B, (T+1)*S, D) -> attn shape (B, H, T+1, S, S).
    """
    b, n, d = x.shape
    s = tokens_per_frame
    t1 = n // s
    qkv = linear(p["to_qkv"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def arrange(u):
        # 'b (t hw) (h d) -> b h t hw d'  (reference module.py:84)
        u = u.reshape(b, t1, s, heads, -1)
        return u.transpose(0, 3, 1, 2, 4)

    q, k, v = arrange(q), arrange(k), arrange(v)
    out, attn = _sdpa(q, k, v, q.shape[-1] ** -0.5)
    # 'b h t hw d -> b (t hw) (h d)'
    out = out.transpose(0, 2, 3, 1, 4).reshape(b, n, -1)
    out = linear(p["to_out"], out)
    return (out, attn) if return_attn else out


def self_subtract(x_bt, first_passthrough: int = 2):
    """Residual stream cat(x[:, :2], x[:, 2:] - x[:, 1:-1]) over the t axis
    (reference module.py:193). Row 0 is the temporal-CLS frame and row 1 the
    first real frame — both pass through; later rows become frame diffs."""
    k = first_passthrough
    return jnp.concatenate(
        [x_bt[:, :k], x_bt[:, k:] - x_bt[:, k - 1:-1]], axis=1)


def temporal_residual_attention(p, x, heads: int, tokens_per_frame: int,
                                return_attn: bool = False):
    """Self-subtract temporal attention (reference module.py:174-208).

    Attention over the t axis per spatial location: Q,K from the residual
    (frame-difference) stream, V from the original tokens.
    attn shape (B, H, S, T+1, T+1).
    """
    b, n, d = x.shape
    s = tokens_per_frame
    t1 = n // s
    x_t = x.reshape(b, t1, s, d)
    residual = self_subtract(x_t).reshape(b, n, d)
    qk = linear(p["to_qk"], residual)
    q, k = jnp.split(qk, 2, axis=-1)
    v = linear(p["to_v"], x)

    def arrange(u):
        # 'b (t hw) (h d) -> b h hw t d'  (reference module.py:197-198)
        u = u.reshape(b, t1, s, heads, -1)
        return u.transpose(0, 3, 2, 1, 4)

    q, k, v = arrange(q), arrange(k), arrange(v)
    out, attn = _sdpa(q, k, v, q.shape[-1] ** -0.5)
    # 'b h hw t d -> b (t hw) (h d)'
    out = out.transpose(0, 3, 2, 1, 4).reshape(b, n, -1)
    out = linear(p["to_out"], out)
    return (out, attn) if return_attn else out


def temporal_only_attention(p, x, heads: int, tokens_per_frame: int,
                            return_attn: bool = False):
    """t-axis attention WITHOUT the self-subtract (reference
    module.py:145-172) — ablation variant kept for the design space."""
    b, n, d = x.shape
    s = tokens_per_frame
    t1 = n // s
    qkv = linear(p["to_qkv"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def arrange(u):
        u = u.reshape(b, t1, s, heads, -1)
        return u.transpose(0, 3, 2, 1, 4)

    q, k, v = arrange(q), arrange(k), arrange(v)
    out, attn = _sdpa(q, k, v, q.shape[-1] ** -0.5)
    out = out.transpose(0, 3, 2, 1, 4).reshape(b, n, -1)
    out = linear(p["to_out"], out)
    return (out, attn) if return_attn else out
