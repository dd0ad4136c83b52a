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
    if use_pallas and not return_attn and attn_bias is None:
        # TP-aware dispatch: under an active parallel/tp.scope the kernel
        # runs shard_map'd with heads on the model axis (falls back to the
        # plain kernel otherwise)
        from istvt_tpu.parallel.tp import spatial_attention_sharded
        inner = qkv.shape[-1] // 3
        out = spatial_attention_sharded(
            qkv.reshape(b * t1, s, 3 * inner), heads)
        return linear(p["to_out"], out.reshape(b, n, inner))
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (u.reshape(b, t1, s, heads, -1) for u in (q, k, v))
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
                                return_attn: bool = False, attn_bias=None,
                                use_pallas: bool = False):
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
    if use_pallas and not return_attn and attn_bias is None:
        from istvt_tpu.parallel.tp import temporal_attention_sharded
        out = temporal_attention_sharded(
            qkv.reshape(b, t1, s, 3 * inner), heads)
        return linear(p["to_out"], out.reshape(b, n, inner))
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


def temporal_block_fused(p, x, heads: int, tokens_per_frame: int):
    """Whole PreNorm temporal branch in three Pallas kernels:
    LN+QKV-GEMM -> fused self-subtract attention -> out-GEMM+bias.
    Equals temporal_residual_attention(p, layernorm(p['norm'], x), ...)
    with the normalized tensor and head transposes never touching HBM."""
    from istvt_tpu.kernels.attention import temporal_attention_packed
    from istvt_tpu.kernels.linear import ln_matmul, matmul_bias_residual

    b, n, d = x.shape
    s = tokens_per_frame
    t1 = n // s
    w = jnp.concatenate([p["to_qk"]["w"], p["to_v"]["w"]], axis=1)
    qkv = ln_matmul(x, p["norm"]["scale"], p["norm"]["bias"], w)
    inner = p["to_v"]["w"].shape[1]
    out = temporal_attention_packed(qkv.reshape(b, t1, s, 3 * inner), heads)
    return matmul_bias_residual(out.reshape(b, n, inner),
                                p["to_out"]["w"], p["to_out"]["b"], None)


def spatial_block_fused(p, x, heads: int, tokens_per_frame: int, residual,
                        n_valid: int = -1):
    """Whole PreNorm spatial branch in three Pallas kernels, with the
    layer residual (reference vivit.py:99 `attn_s(attn_t(x)) + x`) fused
    into the out-GEMM epilogue. n_valid masks padded key tokens when the
    token axis is padded to a sublane multiple."""
    from istvt_tpu.kernels.attention import spatial_attention_packed
    from istvt_tpu.kernels.linear import ln_matmul, matmul_bias_residual

    b, n, d = x.shape
    s = tokens_per_frame
    t1 = n // s
    qkv = ln_matmul(x, p["norm"]["scale"], p["norm"]["bias"],
                    p["to_qkv"]["w"])
    inner = qkv.shape[-1] // 3
    out = spatial_attention_packed(qkv.reshape(b * t1, s, 3 * inner),
                                   heads, n_valid)
    return matmul_bias_residual(out.reshape(b, n, inner),
                                p["to_out"]["w"], p["to_out"]["b"],
                                residual)


def temporal_block_q8(p, q8, x, heads: int, tokens_per_frame: int):
    """Int8 serving form of temporal_block_fused: the two projection
    GEMMs run W8A8 on the MXU (kernels/quant.py), the self-subtract
    attention core stays bf16."""
    from istvt_tpu.kernels.attention import temporal_attention_packed
    from istvt_tpu.kernels.quant import ln_matmul_q8, matmul_q8_bias_residual

    b, n, d = x.shape
    s = tokens_per_frame
    t1 = n // s
    qkv = ln_matmul_q8(x, p["norm"]["scale"], p["norm"]["bias"],
                       q8["qkv_wq"], q8["qkv_ws"])
    inner = qkv.shape[-1] // 3
    out = temporal_attention_packed(qkv.reshape(b, t1, s, 3 * inner), heads)
    return matmul_q8_bias_residual(out.reshape(b, n, inner),
                                   q8["out_wq"], q8["out_ws"],
                                   p["to_out"]["b"], None)


def spatial_block_q8(p, q8, x, heads: int, tokens_per_frame: int, residual,
                     n_valid: int = -1):
    """Int8 serving form of spatial_block_fused (residual fused into the
    out-GEMM epilogue)."""
    from istvt_tpu.kernels.attention import spatial_attention_packed
    from istvt_tpu.kernels.quant import ln_matmul_q8, matmul_q8_bias_residual

    b, n, d = x.shape
    s = tokens_per_frame
    t1 = n // s
    qkv = ln_matmul_q8(x, p["norm"]["scale"], p["norm"]["bias"],
                       q8["qkv_wq"], q8["qkv_ws"])
    inner = qkv.shape[-1] // 3
    out = spatial_attention_packed(qkv.reshape(b * t1, s, 3 * inner),
                                   heads, n_valid)
    return matmul_q8_bias_residual(out.reshape(b, n, inner),
                                   q8["out_wq"], q8["out_ws"],
                                   p["to_out"]["b"], residual)


def unfold2d(x, kernel: int, stride: int, padding: int):
    """torch F.unfold over NHWC -> (B, nH, nW, k, k, C)."""
    patches = jax.lax.conv_general_dilated_patches(
        x, filter_shape=(kernel, kernel), window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    b, nh, nw, _ = patches.shape
    c = x.shape[-1]
    # conv_general_dilated_patches emits (C, k, k) channel-major features
    return patches.reshape(b, nh, nw, c, kernel, kernel).transpose(
        0, 1, 2, 4, 5, 3)


def fold2d(patches, out_hw: int, kernel: int, stride: int, padding: int):
    """torch F.fold: scatter-add overlapping (B, nH, nW, k, k, C) patches
    back to (B, out, out, C). Static k² shift-adds — fine for the
    windowed-attention ablation path."""
    b, nh, nw, k, _, c = patches.shape
    padded = out_hw + 2 * padding
    out = jnp.zeros((b, padded, padded, c), patches.dtype)
    for ki in range(k):
        for kj in range(k):
            vals = patches[:, :, :, ki, kj]         # (B, nH, nW, C)
            rows = ki + stride * jnp.arange(nh)
            cols = kj + stride * jnp.arange(nw)
            out = out.at[:, rows[:, None], cols[None, :]].add(vals)
    return out[:, padding: padding + out_hw, padding: padding + out_hw]


def local_spatial_attention(p, x, heads: int, grid: int = 19,
                            kernel: int = 7, stride: int = 3,
                            padding: int = 6,
                            reference_bug_compat: bool = False):
    """Windowed local spatial attention with per-window CLS broadcast
    (reference module.py:96-143): per frame, the hw grid is unfolded into
    k x k windows; the frame's spatial CLS token is prepended to each window;
    attention runs inside each window; window outputs fold back with
    overlap-add, and the CLS outputs average over windows."""
    b, n, d = x.shape
    s = grid * grid + 1
    t1 = n // s
    xt = x.reshape(b * t1, s, d)
    # The reference drops token 0 BEFORE reading its "CLS"
    # (module.py:117-118: x = x[:,:,1:,:].squeeze(); cls = x[:,:,0,:]),
    # so its per-window CLS is actually PATCH 0 — and .squeeze() crashes
    # at batch 1. reference_bug_compat=True reproduces that selection for
    # golden tests; the default uses the real spatial CLS.
    cls_tok = xt[:, 1] if reference_bug_compat else xt[:, 0]   # (bt, d)
    gridx = xt[:, 1:].reshape(b * t1, grid, grid, d)
    win = unfold2d(gridx, kernel, stride, padding)       # (bt,nh,nw,k,k,d)
    bt, nh, nw = win.shape[:3]
    win = win.reshape(bt, nh * nw, kernel * kernel, d)
    cls_b = jnp.broadcast_to(cls_tok[:, None, None, :],
                             (bt, nh * nw, 1, d))
    tokens = jnp.concatenate([cls_b, win], axis=2)       # (bt,n,khw+1,d)
    qkv = linear(p["to_qkv"], tokens)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads_split(u):
        return u.reshape(bt, nh * nw, kernel * kernel + 1, heads, -1
                         ).transpose(0, 3, 1, 2, 4)

    q, k, v = heads_split(q), heads_split(k), heads_split(v)
    out, _ = _sdpa(q, k, v, q.shape[-1] ** -0.5)
    # the reference also slices BEFORE reading its output "CLS"
    # (module.py:132-134), so compat mode averages patch-0's output
    cls_src = 1 if reference_bug_compat else 0
    cls_out = jnp.mean(out[:, :, :, cls_src], axis=2)    # (bt, h, dh)
    win_out = out[:, :, :, 1:]                           # (bt,h,n,khw,dh)
    dh = win_out.shape[-1]
    win_out = win_out.transpose(0, 1, 2, 3, 4).reshape(
        bt * heads, nh, nw, kernel, kernel, dh)
    folded = fold2d(win_out, grid, kernel, stride, padding)
    folded = folded.reshape(bt, heads, grid * grid, dh)
    full = jnp.concatenate([cls_out[:, :, None], folded], axis=2)
    full = full.transpose(0, 2, 1, 3).reshape(b, n, heads * dh)
    return linear(p["to_out"], full)


def re_attention(p, x, heads: int):
    """DeepViT ReAttention (reference module.py:210-252): post-softmax
    attention maps are remixed across heads by a learned (H, H) matrix
    then LayerNorm'd over heads. NOTE: the reference returns WITHOUT the
    to_out projection (its :251 is commented out) — mirrored."""
    b, n, d = x.shape
    qkv = linear(p["to_qkv"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (_split_heads(t, heads) for t in (q, k, v))
    dots = jnp.einsum("bhid,bhjd->bhij", q, k,
                      preferred_element_type=jnp.float32) \
        * q.shape[-1] ** -0.5
    attn = jax.nn.softmax(dots, axis=-1)
    attn = jnp.einsum("bhij,hg->bgij", attn, p["reattn_weights"])
    # LayerNorm over the head axis (reference module.py:221-225)
    mean = jnp.mean(attn, axis=1, keepdims=True)
    var = jnp.var(attn, axis=1, keepdims=True)
    attn = (attn - mean) * jax.lax.rsqrt(var + 1e-5)
    attn = attn * p["reattn_norm_scale"][None, :, None, None] \
        + p["reattn_norm_bias"][None, :, None, None]
    out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return _merge_heads(out)


def lc_attention(p, x, heads: int):
    """Last-token cross attention (reference module.py:287-316): only the
    final token queries all tokens — O(N) instead of O(N²)."""
    b, n, d = x.shape
    qkv = linear(p["to_qkv"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (_split_heads(t, heads) for t in (q, k, v))
    q = q[:, :, -1:]                                     # (B,H,1,dh)
    out, _ = _sdpa(q, k, v, q.shape[-1] ** -0.5)
    return linear(p["to_out"], _merge_heads(out))


def leff(p, s, x, grid: int = 14, train: bool = False):
    """LeFF — Locally-enhanced FeedForward (reference module.py:254-284):
    up-project, BN+GELU, 3x3 depthwise conv over the token grid, BN+GELU,
    down-project, BN+GELU. x: (B, grid², dim) -> same. Returns (y, new BN
    state tuple)."""
    from istvt_tpu.nn.layers import batchnorm, conv2d, gelu
    b, n, d = x.shape
    y = linear(p["up"], x)
    y, bn1 = batchnorm(p["bn1"], s["bn1"], y, train)
    y = gelu(y)
    y = y.reshape(b, grid, grid, -1)
    y = conv2d(p["dw"], y, padding=1, groups=y.shape[-1])
    y, bn2 = batchnorm(p["bn2"], s["bn2"], y, train)
    y = gelu(y).reshape(b, n, -1)
    y = linear(p["down"], y)
    y, bn3 = batchnorm(p["bn3"], s["bn3"], y, train)
    return gelu(y), {"bn1": bn1, "bn2": bn2, "bn3": bn3}


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
