"""EfficientNet (+ optional central-difference convs) — TPU-native.

Rebuild of the reference's vendored lukemelas EfficientNet with CDC
plumbing (reference network/efficientnet_cdc.py:37-418,
network/utils.py:83-677). Key behaviors preserved:

  * b0 block spec + width/depth compound scaling with the /8 filter
    rounding rule (utils.py `round_filters`/`round_repeats`).
  * TF 'SAME' padding computed statically per conv from the traced input
    size (utils.py:256-329) — here just asymmetric lax.conv padding.
  * BN momentum 0.01 / eps 1e-3 (tf 0.99 inverted at
    efficientnet_cdc.py:171-173).
  * Stochastic depth (`drop_connect`, utils.py:169-194) scaled idx/len.
  * Swish activation — plain silu; the reference's MemoryEfficientSwish
    hand-written backward (utils.py:105-120) is unnecessary under XLA
    fusion + jax.checkpoint.
  * The CDC variant's head `_fc` maps to 2048 features, not classes
    (efficientnet_cdc.py:219); a classifier head is added by the zoo
    wrapper like TransferModel does (models.py:40-47).
  * Central-difference conv: y = conv(x, W) - theta * conv(x, sum_kk W)
    (the reference declares theta=0.7 for stem/stage-0 convs but has the
    difference term commented out, utils.py:289-293,322-329 — here it is
    IMPLEMENTED and gated by `cdc_theta`, default 0.0 to match reference
    behavior). The sum_kk W term is a 1x1 conv — XLA fuses it; no custom
    kernel needed.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from istvt_tpu.nn.layers import (
    batchnorm,
    batchnorm_init,
    conv2d_init,
    dropout,
    linear,
    linear_init,
    swish,
)
from istvt_tpu.nn.layers import conv2d as _conv2d
from jax import lax


@dataclasses.dataclass(frozen=True)
class BlockArgs:
    num_repeat: int
    kernel_size: int
    stride: int
    expand_ratio: int
    input_filters: int
    output_filters: int
    se_ratio: float = 0.25
    id_skip: bool = True


# b0 spec (reference utils.py:563-575)
B0_BLOCKS: Tuple[BlockArgs, ...] = (
    BlockArgs(1, 3, 1, 1, 32, 16),
    BlockArgs(2, 3, 2, 6, 16, 24),
    BlockArgs(2, 5, 2, 6, 24, 40),
    BlockArgs(3, 3, 2, 6, 40, 80),
    BlockArgs(3, 5, 1, 6, 80, 112),
    BlockArgs(4, 5, 2, 6, 112, 192),
    BlockArgs(1, 3, 1, 6, 192, 320),
)

# (width, depth, resolution, dropout) per model (reference utils.py:520-542)
PARAMS = {
    "efficientnet-b0": (1.0, 1.0, 224, 0.2),
    "efficientnet-b1": (1.0, 1.1, 240, 0.2),
    "efficientnet-b2": (1.1, 1.2, 260, 0.3),
    "efficientnet-b3": (1.2, 1.4, 300, 0.3),
    "efficientnet-b4": (1.4, 1.8, 380, 0.4),
    "efficientnet-b5": (1.6, 2.2, 456, 0.4),
    "efficientnet-b6": (1.8, 2.6, 528, 0.5),
    "efficientnet-b7": (2.0, 3.1, 600, 0.5),
}

BN_MOM = 0.01     # 1 - 0.99 (reference efficientnet_cdc.py:171)
BN_EPS = 1e-3


def round_filters(filters: int, width: float, divisor: int = 8) -> int:
    """Compound width scaling with /8 rounding (reference utils.py:124-146)."""
    filters *= width
    new_f = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_f < 0.9 * filters:
        new_f += divisor
    return int(new_f)


def round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


def same_conv(p, x, stride: int = 1, groups: int = 1,
              cdc_theta: float = 0.0):
    """TF-SAME conv (asymmetric padding), optional central-difference term
    (reference utils.py:256-329)."""
    kh, kw = p["w"].shape[0], p["w"].shape[1]
    ih, iw = x.shape[1], x.shape[2]
    oh, ow = -(-ih // stride), -(-iw // stride)
    pad_h = max((oh - 1) * stride + kh - ih, 0)
    pad_w = max((ow - 1) * stride + kw - iw, 0)
    pads = [(pad_h // 2, pad_h - pad_h // 2), (pad_w // 2, pad_w - pad_w // 2)]
    y = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), pads,
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    if cdc_theta and kh > 1:
        w_sum = jnp.sum(p["w"], axis=(0, 1), keepdims=True)
        y_diff = lax.conv_general_dilated(
            x, w_sum.astype(x.dtype), (stride, stride), [(0, 0), (0, 0)],
            feature_group_count=groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # align spatial dims (the 1x1 diff conv has no padding; crop/bcast
        # to the SAME-padded output grid)
        y = y - cdc_theta * _match_hw(y_diff, y.shape)
    return y


def _match_hw(a, shape):
    """Center-crop/pad `a` to `shape` on the two spatial dims."""
    dh, dw = shape[1] - a.shape[1], shape[2] - a.shape[2]
    if dh == 0 and dw == 0:
        return a
    pads = [(0, 0), (max(dh // 2, 0), max(dh - dh // 2, 0)),
            (max(dw // 2, 0), max(dw - dw // 2, 0)), (0, 0)]
    a = jnp.pad(a, pads)
    return a[:, : shape[1], : shape[2]]


def drop_connect(rng, x, rate: float, train: bool):
    """Stochastic depth on the residual branch (reference utils.py:169-194)."""
    if not train or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return x * mask.astype(x.dtype) / keep


def _mbconv_init(key, ba: BlockArgs):
    ks = jax.random.split(key, 6)
    inp, oup = ba.input_filters, ba.input_filters * ba.expand_ratio
    p: Dict = {}
    s: Dict = {}
    if ba.expand_ratio != 1:
        p["expand"] = conv2d_init(ks[0], inp, oup, 1)
        p["bn0"], s["bn0"] = batchnorm_init(oup)
    p["dw"] = conv2d_init(ks[1], oup, oup, ba.kernel_size, groups=oup)
    p["bn1"], s["bn1"] = batchnorm_init(oup)
    n_sq = max(1, int(ba.input_filters * ba.se_ratio))
    p["se_reduce"] = conv2d_init(ks[2], oup, n_sq, 1, bias=True)
    p["se_expand"] = conv2d_init(ks[3], n_sq, oup, 1, bias=True)
    p["project"] = conv2d_init(ks[4], oup, ba.output_filters, 1)
    p["bn2"], s["bn2"] = batchnorm_init(ba.output_filters)
    return p, s


def _mbconv_apply(p, s, x, ba: BlockArgs, train, rng, dc_rate,
                  cdc_theta=0.0):
    """MBConv forward (reference efficientnet_cdc.py:92-136)."""
    ns: Dict = {}
    inputs = x
    if "expand" in p:
        x = same_conv(p["expand"], x, cdc_theta=0.0)
        x, ns["bn0"] = batchnorm(p["bn0"], s["bn0"], x, train, BN_MOM, BN_EPS)
        x = swish(x)
    x = same_conv(p["dw"], x, stride=ba.stride, groups=x.shape[-1],
                  cdc_theta=cdc_theta)
    x, ns["bn1"] = batchnorm(p["bn1"], s["bn1"], x, train, BN_MOM, BN_EPS)
    x = swish(x)
    # squeeze-excite
    sq = jnp.mean(x, axis=(1, 2), keepdims=True)
    sq = swish(same_conv(p["se_reduce"], sq))
    sq = same_conv(p["se_expand"], sq)
    x = jax.nn.sigmoid(sq) * x
    x = same_conv(p["project"], x)
    x, ns["bn2"] = batchnorm(p["bn2"], s["bn2"], x, train, BN_MOM, BN_EPS)
    if ba.id_skip and ba.stride == 1 and \
            ba.input_filters == ba.output_filters:
        x = drop_connect(rng, x, dc_rate, train) + inputs
    return x, ns


def scaled_blocks(model_name: str) -> List[BlockArgs]:
    width, depth, _, _ = PARAMS[model_name]
    out = []
    for ba in B0_BLOCKS:
        ba = dataclasses.replace(
            ba,
            input_filters=round_filters(ba.input_filters, width),
            output_filters=round_filters(ba.output_filters, width),
            num_repeat=round_repeats(ba.num_repeat, depth))
        out.append(ba)
    return out


def init(key, model_name: str = "efficientnet-b3", feature_dim: int = 2048,
         include_head: bool = True):
    """Params for EfficientNet_cdc (reference efficientnet_cdc.py:164-221).
    `feature_dim` is the _fc output (2048 in the reference CDC variant)."""
    width, depth, _, _ = PARAMS[model_name]
    blocks = scaled_blocks(model_name)
    n_blocks = sum(ba.num_repeat for ba in blocks)
    keys = jax.random.split(key, n_blocks + 3)
    p: Dict = {}
    s: Dict = {}
    stem_ch = round_filters(32, width)
    p["conv_stem"] = conv2d_init(keys[0], 3, stem_ch, 3)
    p["bn0"], s["bn0"] = batchnorm_init(stem_ch)
    p["blocks"], s["blocks"] = [], []
    flat: List[BlockArgs] = []
    ki = 1
    for ba in blocks:
        stage = [dataclasses.replace(ba, num_repeat=1)]
        stage += [dataclasses.replace(ba, num_repeat=1, stride=1,
                                      input_filters=ba.output_filters)
                  ] * (ba.num_repeat - 1)
        for one in stage:
            bp, bs = _mbconv_init(keys[ki], one)
            ki += 1
            p["blocks"].append(bp)
            s["blocks"].append(bs)
            flat.append(one)
    head_in = blocks[-1].output_filters
    head_ch = round_filters(1280, width)
    p["conv_head"] = conv2d_init(keys[ki], head_in, head_ch, 1)
    p["bn1"], s["bn1"] = batchnorm_init(head_ch)
    if include_head:
        p["fc"] = linear_init(keys[ki + 1], head_ch, feature_dim)
    cfg = {"blocks": tuple(flat), "model_name": model_name,
           "drop_connect_rate": 0.2,
           "dropout": PARAMS[model_name][3]}
    return p, s, cfg


def extract_features(p, s, x, cfg, train: bool = False, rng=None,
                     cdc_theta: float = 0.0):
    """Stem + blocks + head conv (reference efficientnet_cdc.py:275-297).
    cdc_theta applies to the stem and stage-0 depthwise convs, mirroring
    `use_cdc=True` stem / `bidx == 0` plumbing (efficientnet_cdc.py:177,204)."""
    ns: Dict = {"blocks": []}
    x = same_conv(p["conv_stem"], x, stride=2, cdc_theta=cdc_theta)
    x, ns["bn0"] = batchnorm(p["bn0"], s["bn0"], x, train, BN_MOM, BN_EPS)
    x = swish(x)
    n = len(cfg["blocks"])
    stage0_out = cfg["blocks"][0].output_filters
    for i, ba in enumerate(cfg["blocks"]):
        dc = cfg["drop_connect_rate"] * i / n
        brng = None
        if rng is not None:
            rng, brng = jax.random.split(rng)
        theta_i = cdc_theta if ba.output_filters == stage0_out and \
            ba.input_filters == stage0_out else 0.0
        x, bns = _mbconv_apply(p["blocks"][i], s["blocks"][i], x, ba, train,
                               brng, dc, cdc_theta=theta_i)
        ns["blocks"].append(bns)
    x = same_conv(p["conv_head"], x)
    x, ns["bn1"] = batchnorm(p["bn1"], s["bn1"], x, train, BN_MOM, BN_EPS)
    x = swish(x)
    return x, ns


def apply(p, s, x, cfg, train: bool = False, rng=None,
          cdc_theta: float = 0.0):
    """Full forward -> (B, feature_dim) (reference efficientnet_cdc.py:302-314)."""
    feats, ns = extract_features(p, s, x, cfg, train, rng, cdc_theta)
    pooled = jnp.mean(feats, axis=(1, 2))
    drng = None
    if rng is not None:
        _, drng = jax.random.split(rng)
    pooled = dropout(drng, pooled, cfg["dropout"], train)
    if "fc" in p:
        return linear(p["fc"], pooled), ns
    return pooled, ns
