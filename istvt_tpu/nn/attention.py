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
                           return_attn: bool = False, attn_bias=None,
                           use_pallas: bool = False):
    """Per-frame attention over the hw axis (reference module.py:66-93).

    x: (B, (T+1)*S, D) -> attn shape (B, H, T+1, S, S).

    TPU note: all contractions run directly on the contiguous
    (B, T+1, S, H, dh) projection layout — only reshapes (free) between
    them, no materialized head transposes; XLA picks internal layouts.
    """
    b, n, d = x.shape
    s = tokens_per_frame
    t1 = n // s
    qkv = linear(p["to_qkv"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (u.reshape(b, t1, s, heads, -1) for u in (q, k, v))
    if use_pallas and not return_attn and attn_bias is None:
        from istvt_tpu.kernels.attention import spatial_attention_pallas
        out = spatial_attention_pallas(q, k, v)
        out = out.reshape(b, n, heads * v.shape[-1])
        return linear(p["to_out"], out)
    scale = q.shape[-1] ** -0.5
    dots = jnp.einsum("btihd,btjhd->bthij", q, k,
                      preferred_element_type=jnp.float32,
                      precision=_precision.get()) * scale
    attn = jax.nn.softmax(dots, axis=-1)
    if attn_bias is not None:
        # bias arrives in the public (B, H, T+1, S, S) order
        attn = attn + jnp.transpose(attn_bias, (0, 2, 1, 3, 4))
    out = jnp.einsum("bthij,btjhd->btihd", attn.astype(v.dtype), v,
                     preferred_element_type=jnp.float32,
                     precision=_precision.get()).astype(v.dtype)
    out = out.reshape(b, n, heads * v.shape[-1])
    out = linear(p["to_out"], out)
    if return_attn:
        return out, jnp.transpose(attn, (0, 2, 1, 3, 4))
    return out


def self_subtract(x_bt, first_passthrough: int = 2):
    """Residual stream cat(x[:, :2], x[:, 2:] - x[:, 1:-1]) over the t axis
    (reference module.py:193). Row 0 is the temporal-CLS frame and row 1 the
    first real frame — both pass through; later rows become frame diffs."""
    k = first_passthrough
    return jnp.concatenate(
        [x_bt[:, :k], x_bt[:, k:] - x_bt[:, k - 1:-1]], axis=1)


def temporal_residual_attention(p, x, heads: int, tokens_per_frame: int,
                                return_attn: bool = False, attn_bias=None):
    """Self-subtract temporal attention (reference module.py:174-208).

    Attention over the t axis per spatial location: Q,K from the residual
    (frame-difference) stream, V from the original tokens.
    attn shape (B, H, S, T+1, T+1).

    TPU note: contractions run on the contiguous (B, T+1, S, H, dh)
    projection layout (t axis is tiny — these are VPU-friendly
    reductions, not MXU-shaped matmuls; see kernels/attention.py for the
    fused Pallas version).
    """
    b, n, d = x.shape
    s = tokens_per_frame
    t1 = n // s
    # Self-subtract is LINEAR along t and pointwise projections commute
    # with it: to_qk(cat(x[:2], x[2:]-x[1:-1])) == the same cat applied to
    # to_qk(x). So QK and V share ONE fused GEMM over x (K=728, N=2560 —
    # much better MXU shape than two passes), and the subtract runs on the
    # projected 1536-dim stream instead of the 728-dim input twice.
    w = jnp.concatenate([p["to_qk"]["w"], p["to_v"]["w"]], axis=1)
    qkv = linear({"w": w}, x)
    inner = p["to_v"]["w"].shape[1]
    qk, v = qkv[..., : 2 * inner], qkv[..., 2 * inner:]
    qk = self_subtract(qk.reshape(b, t1, s, 2 * inner)).reshape(b, n, -1)
    q, k = jnp.split(qk, 2, axis=-1)
    q = q.reshape(b, t1, s, heads, -1)
    k = k.reshape(b, t1, s, heads, -1)
    v = v.reshape(b, t1, s, heads, -1)
    scale = q.shape[-1] ** -0.5
    dots = jnp.einsum("bishd,bjshd->bshij", q, k,
                      preferred_element_type=jnp.float32,
                      precision=_precision.get()) * scale
    attn = jax.nn.softmax(dots, axis=-1)
    if attn_bias is not None:
        # bias arrives in the public (B, H, S, T+1, T+1) order
        attn = attn + jnp.transpose(attn_bias, (0, 2, 1, 3, 4))
    out = jnp.einsum("bshij,bjshd->bishd", attn.astype(v.dtype), v,
                     preferred_element_type=jnp.float32,
                     precision=_precision.get()).astype(v.dtype)
    out = out.reshape(b, n, heads * v.shape[-1])
    out = linear(p["to_out"], out)
    if return_attn:
        return out, jnp.transpose(attn, (0, 2, 1, 3, 4))
    return out


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
