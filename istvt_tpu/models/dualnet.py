"""DualNet — F3-Net-style dual-frequency deepfake detector (TPU-native).

Rebuild of reference network/dual_net.py:163-267 and its frequency heads:

  * FAD_Head (:51-79): full-image DCT -> 4 band filters (learnable
    sigmoid-bounded masks over fixed band supports, Filter :20-47)
    -> inverse DCT -> 12-channel image.
  * LFS_Head (:82-132): gray -> 0..255 rescale -> sliding-window (10x10,
    stride 2, pad 4) local DCT -> log10 |.| -> M=6 normalized band
    filters summed per window -> (149,149,M) spectrum map.
  * Two Xception branches over the frequency views with mid-fusion at
    block7 via Sequential Polarized Self-Attention (channel=1456,
    dual_net.py:186,218; PSA reimplemented from the paper — the
    reference imports it from the external `attention_lib`).
  * Late stages -> GAP -> cat 2048+2048 -> dropout -> fc(4096 -> 1)
    (:183,222-232).
  * MixBlock cross-attention (:358-405) — present-but-unused in the
    reference; implemented for completeness.

Reference bug NOT reproduced: dual_net.py:226 runs the LFS stream through
`FAD_xcep.fea_8_12` (FAD branch weights); here each branch uses its own
late stage.

Everything is NHWC; inputs are raw RGB images in [-1, 1] — the frequency
views are computed ON DEVICE inside the jitted forward (the reference
precomputes them host-side and ships a list, SURVEY.md §3.2), keeping the
host-TPU interface to one tensor.
"""
from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from istvt_tpu.core import precision as _precision
from istvt_tpu.models import xception
from istvt_tpu.nn.layers import (
    batchnorm,
    batchnorm_init,
    conv2d,
    conv2d_init,
    dropout,
    layernorm,
    layernorm_init,
    linear,
    linear_init,
    relu,
)


# ---------------------------------------------------------------------------
# DCT utilities (reference dual_net.py:270-275)


def dct_mat(size: int) -> np.ndarray:
    i = np.arange(size)[:, None]
    j = np.arange(size)[None, :]
    m = np.sqrt(2.0 / size) * np.cos((j + 0.5) * np.pi * i / size)
    m[0] = np.sqrt(1.0 / size)
    return m.astype(np.float32)


def generate_filter(start: float, end: float, size: int) -> np.ndarray:
    i = np.arange(size)[:, None]
    j = np.arange(size)[None, :]
    return (((i + j) > start) & ((i + j) <= end)).astype(np.float32)


def norm_sigma(x):
    return 2.0 * jax.nn.sigmoid(x) - 1.0


# ---------------------------------------------------------------------------
# FAD head (reference dual_net.py:51-79)

FAD_BANDS = lambda size: ((0, size // 16), (size // 16, size // 8),
                          (size // 8, size), (0, size * 2))


def fad_init(key, size: int):
    keys = jax.random.split(key, 4)
    return {
        "learnable": [0.1 * jax.random.normal(k, (size, size))
                      for k in keys],
    }


def fad_apply(p, x, size: int):
    """x: (B, H, W, 3) -> (B, H, W, 12) (4 filtered bands x 3 channels)."""
    d = jnp.asarray(dct_mat(size))
    # DCT: D x D^T over the spatial dims (channels last)
    xf = jnp.einsum("ih,bhwc->biwc", d, x, precision=_precision.get())
    xf = jnp.einsum("jw,biwc->bijc", d, xf, precision=_precision.get())
    outs = []
    for li, (lo, hi) in enumerate(FAD_BANDS(size)):
        base = jnp.asarray(generate_filter(lo, hi, size))
        filt = base + norm_sigma(p["learnable"][li])
        y = xf * filt[None, :, :, None]
        # inverse: D^T y D
        y = jnp.einsum("ih,biwc->bhwc", d, y, precision=_precision.get())
        y = jnp.einsum("jw,bhjc->bhwc", d, y, precision=_precision.get())
        outs.append(y)
    return jnp.concatenate(outs, axis=-1)


# ---------------------------------------------------------------------------
# LFS head (reference dual_net.py:82-132)


def lfs_init(key, window_size: int, m: int):
    keys = jax.random.split(key, m)
    return {"learnable": [0.1 * jax.random.normal(k, (window_size, window_size))
                          for k in keys]}


def lfs_apply(p, x, window_size: int = 10, stride: int = 2, m: int = 6):
    """x: (B, H, W, 3) in [-1,1] -> (B, out, out, M) local log-spectra."""
    b = x.shape[0]
    s = window_size
    gray = (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])
    gray = (gray + 1.0) * 122.5                       # [0, 255]
    gray = gray[..., None]
    patches = jax.lax.conv_general_dilated_patches(
        gray, filter_shape=(s, s), window_strides=(stride, stride),
        padding=[(4, 4), (4, 4)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))   # (B, oh, ow, s*s)
    oh, ow = patches.shape[1], patches.shape[2]
    win = patches.reshape(b, oh, ow, s, s)
    d = jnp.asarray(dct_mat(s))
    f = jnp.einsum("ih,bxyhw->bxyiw", d, win, precision=_precision.get())
    f = jnp.einsum("jw,bxyiw->bxyij", d, f, precision=_precision.get())
    y = jnp.log10(jnp.abs(f) + 1e-15)
    outs = []
    for li in range(m):
        lo = s * 2.0 / m * li
        hi = s * 2.0 / m * (li + 1)
        base = jnp.asarray(generate_filter(lo, hi, s))
        ft_num = jnp.sum(base)
        filt = base + norm_sigma(p["learnable"][li])
        v = jnp.sum(y * filt[None, None, None], axis=(3, 4)) / ft_num
        outs.append(v)
    return jnp.stack(outs, axis=-1)                   # (B, oh, ow, M)


# ---------------------------------------------------------------------------
# Sequential Polarized Self-Attention (fusion at block7;
# reference dual_net.py:186,218 — external attention_lib reimplemented
# from Liu et al., "Polarized Self-Attention", 2021)


def psa_init(key, channel: int):
    c2 = channel // 2
    ks = jax.random.split(key, 5)
    p = {
        "ch_wv": conv2d_init(ks[0], channel, c2, 1, bias=True),
        "ch_wq": conv2d_init(ks[1], channel, 1, 1, bias=True),
        "ch_wz": conv2d_init(ks[2], c2, channel, 1, bias=True),
        "ln": layernorm_init(channel),
        "sp_wv": conv2d_init(ks[3], channel, c2, 1, bias=True),
        "sp_wq": conv2d_init(ks[4], channel, c2, 1, bias=True),
    }
    return p


def psa_apply(p, x):
    """Sequential polarized attention: spatial(channel(x)). x: NHWC."""
    b, h, w, c = x.shape
    c2 = c // 2
    # --- channel-only branch
    wv = conv2d(p["ch_wv"], x).reshape(b, h * w, c2)          # (B, HW, C/2)
    wq = conv2d(p["ch_wq"], x).reshape(b, h * w, 1)           # (B, HW, 1)
    wq = jax.nn.softmax(wq, axis=1)
    z = jnp.einsum("bnc,bno->bco", wv, wq,
                   precision=_precision.get()).reshape(b, 1, 1, c2)
    z = conv2d(p["ch_wz"], z)                                  # (B,1,1,C)
    z = jax.nn.sigmoid(layernorm(p["ln"], z))
    x = x * z
    # --- spatial-only branch
    sv = conv2d(p["sp_wv"], x).reshape(b, h * w, c2)          # (B, HW, C/2)
    sq = jnp.mean(conv2d(p["sp_wq"], x), axis=(1, 2))         # (B, C/2)
    sq = jax.nn.softmax(sq, axis=-1)
    attn = jax.nn.sigmoid(jnp.einsum("bc,bnc->bn", sq, sv,
                                     precision=_precision.get()))
    return x * attn.reshape(b, h, w, 1)


# ---------------------------------------------------------------------------
# MixBlock (reference dual_net.py:358-405, unused in the main path)


def mixblock_init(key, c_in: int = 728):
    ks = jax.random.split(key, 6)
    p = {
        "fad_q": conv2d_init(ks[0], c_in, c_in, 1, bias=True),
        "lfs_q": conv2d_init(ks[1], c_in, c_in, 1, bias=True),
        "fad_k": conv2d_init(ks[2], c_in, c_in, 1, bias=True),
        "lfs_k": conv2d_init(ks[3], c_in, c_in, 1, bias=True),
        "fad_gamma": jnp.zeros((1,)),
        "lfs_gamma": jnp.zeros((1,)),
        "fad_conv": conv2d_init(ks[4], c_in, c_in, 1, groups=c_in, bias=True),
        "lfs_conv": conv2d_init(ks[5], c_in, c_in, 1, groups=c_in, bias=True),
    }
    s = {}
    p["fad_bn"], s["fad_bn"] = batchnorm_init(c_in)
    p["lfs_bn"], s["lfs_bn"] = batchnorm_init(c_in)
    return p, s


def mixblock_apply(p, s, x_fad, x_lfs, train: bool = False):
    b, w, h, c = x_fad.shape
    def flat(u):  # NHWC -> (B*C, W, H) like the reference's view
        return u.transpose(0, 3, 1, 2).reshape(-1, w, h)
    q = jnp.concatenate([flat(conv2d(p["fad_q"], x_fad)),
                         flat(conv2d(p["lfs_q"], x_lfs))], axis=2)
    k = jnp.concatenate(
        [flat(conv2d(p["fad_k"], x_fad)).transpose(0, 2, 1),
         flat(conv2d(p["lfs_k"], x_lfs)).transpose(0, 2, 1)], axis=1)
    energy = jnp.einsum("gwa,gab->gwb", q, k, precision=_precision.get())
    attn = jax.nn.softmax(energy, axis=-1).reshape(b, c, w, w)
    attn = attn.transpose(0, 2, 3, 1)                       # NHWC
    ns = {}
    att_lfs = x_lfs * attn * norm_sigma(p["lfs_gamma"])
    y, ns["fad_bn"] = batchnorm(
        p["fad_bn"], s["fad_bn"],
        conv2d(p["fad_conv"], att_lfs, groups=c), train)
    y_fad = x_fad + y
    att_fad = x_fad * attn * norm_sigma(p["fad_gamma"])
    y2, ns["lfs_bn"] = batchnorm(
        p["lfs_bn"], s["lfs_bn"],
        conv2d(p["lfs_conv"], att_fad, groups=c), train)
    y_lfs = x_lfs + y2
    return y_fad, y_lfs, ns


# ---------------------------------------------------------------------------
# DualNet


def init(key, num_classes: int = 1, img_size: int = 300,
         lfs_window: int = 10, lfs_m: int = 6):
    ks = jax.random.split(key, 6)
    p: Dict = {}
    s: Dict = {}
    p["fad_head"] = fad_init(ks[0], img_size)
    p["lfs_head"] = lfs_init(ks[1], lfs_window, lfs_m)
    p["fad_xcep"], s["fad_xcep"] = xception.init(
        ks[2], xception.XceptionConfig(in_channels=12))
    p["lfs_xcep"], s["lfs_xcep"] = xception.init(
        ks[3], xception.XceptionConfig(in_channels=lfs_m))
    p["fusion"] = psa_init(ks[4], 1456)
    p["fc"] = linear_init(ks[5], 4096, num_classes)
    cfg = {"img_size": img_size, "lfs_window": lfs_window, "lfs_m": lfs_m}
    return p, s, cfg


def apply(p, s, x, cfg, train: bool = False, rng=None, drop: float = 0.2):
    """x: (B, H, W, 3) in [-1, 1] -> (logits, feat, [], []) like the
    reference forward (dual_net.py:210-232), plus new BN state."""
    ns: Dict = {}
    fad = fad_apply(p["fad_head"], x, cfg["img_size"])
    lfs = lfs_apply(p["lfs_head"], x, cfg["lfs_window"], 2, cfg["lfs_m"])
    # The LFS spectrum map is half-resolution (149x149 for a 300 input);
    # upsample to the image grid so both Xception branches land on the
    # same block7 shape for fusion. (The reference's host-side view
    # pipeline is external/absent — SURVEY.md §2.7 — this is the one
    # consistent geometry for its fusion code at dual_net.py:218.)
    lfs = jax.image.resize(
        lfs, (lfs.shape[0], cfg["img_size"], cfg["img_size"], lfs.shape[-1]),
        method="bilinear")
    # early stages to block7 (fea_0_7, xception_for_dualnet.py:215-231)
    fad_low, ns["fad_xcep"] = xception.mid_features(
        p["fad_xcep"], s["fad_xcep"], fad, 7, train)
    lfs_low, ns_l = xception.mid_features(
        p["lfs_xcep"], s["lfs_xcep"], lfs, 7, train)
    ns["lfs_xcep"] = ns_l
    fused = psa_apply(p["fusion"],
                      jnp.concatenate([fad_low, lfs_low], axis=-1))
    fad_low, lfs_low = fused[..., :728], fused[..., 728:]
    fad_hi, tf_ns = xception.tail_features(p["fad_xcep"], ns["fad_xcep"],
                                           fad_low, 8, train)
    ns["fad_xcep"] = tf_ns
    lfs_hi, tl_ns = xception.tail_features(p["lfs_xcep"], ns["lfs_xcep"],
                                           lfs_low, 8, train)
    ns["lfs_xcep"] = tl_ns
    feat = jnp.concatenate([fad_hi, lfs_hi], axis=-1)
    def norm_fea(f):
        return jnp.mean(relu(f), axis=(1, 2))
    y = jnp.concatenate([norm_fea(fad_hi), norm_fea(lfs_hi)], axis=-1)
    y = dropout(rng, y, drop, train)
    return (linear(p["fc"], y), feat, [], []), ns
