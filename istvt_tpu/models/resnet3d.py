"""3D ResNets (TPU-native, NDHWC):

1. Generic Conv3d ResNet-{10..200} (reference network/resnet_3d.py:31-235,
   `generate_model`) — BasicBlock/Bottleneck with full 3x3x3 kernels.
2. I3D-ResNet50(-NL) (reference network/resnet3d/models/resnet.py:41-240,
   the FAIR video-nonlocal-net port) — inflated bottlenecks with temporal
   1/3-kernels on conv1 only, optional space-time NonLocal blocks, and the
   10-clip x 3-crop `forward_multi` eval protocol.

The reference's FrozenBN (resnet.py:7-37) needs no special class here:
eval-mode `batchnorm(train=False)` IS frozen BN; for finetuning-with-
frozen-stats pass `train=False` while still taking gradients w.r.t.
scale/bias.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from istvt_tpu.core import precision as _precision
from istvt_tpu.nn.layers import (
    avg_pool3d,
    batchnorm,
    batchnorm_init,
    conv3d,
    conv3d_init,
    dropout,
    linear,
    linear_init,
    max_pool3d,
    relu,
)

INPLANES = (64, 128, 256, 512)
DEPTH_TO_LAYERS = {
    10: ("basic", (1, 1, 1, 1)),
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
    200: ("bottleneck", (3, 24, 36, 3)),
}


# ---------------------------------------------------------------------------
# generic 3D ResNet (reference network/resnet_3d.py)


def _basic_init(key, in_planes, planes, stride):
    ks = jax.random.split(key, 3)
    p, s = {}, {}
    p["conv1"] = conv3d_init(ks[0], in_planes, planes, 3)
    p["bn1"], s["bn1"] = batchnorm_init(planes)
    p["conv2"] = conv3d_init(ks[1], planes, planes, 3)
    p["bn2"], s["bn2"] = batchnorm_init(planes)
    if stride != 1 or in_planes != planes:
        p["down"] = conv3d_init(ks[2], in_planes, planes, 1)
        p["downbn"], s["downbn"] = batchnorm_init(planes)
    return p, s


def _basic_apply(p, s, x, stride, train):
    ns = {}
    y = conv3d(p["conv1"], x, stride=stride, padding=1)
    y, ns["bn1"] = batchnorm(p["bn1"], s["bn1"], y, train)
    y = relu(y)
    y = conv3d(p["conv2"], y, padding=1)
    y, ns["bn2"] = batchnorm(p["bn2"], s["bn2"], y, train)
    if "down" in p:
        r = conv3d(p["down"], x, stride=stride)
        r, ns["downbn"] = batchnorm(p["downbn"], s["downbn"], r, train)
    else:
        r = x
    return relu(y + r), ns


def _bottleneck_init(key, in_planes, planes, stride):
    ks = jax.random.split(key, 4)
    p, s = {}, {}
    p["conv1"] = conv3d_init(ks[0], in_planes, planes, 1)
    p["bn1"], s["bn1"] = batchnorm_init(planes)
    p["conv2"] = conv3d_init(ks[1], planes, planes, 3)
    p["bn2"], s["bn2"] = batchnorm_init(planes)
    p["conv3"] = conv3d_init(ks[2], planes, planes * 4, 1)
    p["bn3"], s["bn3"] = batchnorm_init(planes * 4)
    if stride != 1 or in_planes != planes * 4:
        p["down"] = conv3d_init(ks[3], in_planes, planes * 4, 1)
        p["downbn"], s["downbn"] = batchnorm_init(planes * 4)
    return p, s


def _bottleneck_apply(p, s, x, stride, train):
    ns = {}
    y = conv3d(p["conv1"], x)
    y, ns["bn1"] = batchnorm(p["bn1"], s["bn1"], y, train)
    y = relu(y)
    y = conv3d(p["conv2"], y, stride=stride, padding=1)
    y, ns["bn2"] = batchnorm(p["bn2"], s["bn2"], y, train)
    y = relu(y)
    y = conv3d(p["conv3"], y)
    y, ns["bn3"] = batchnorm(p["bn3"], s["bn3"], y, train)
    if "down" in p:
        r = conv3d(p["down"], x, stride=stride)
        r, ns["downbn"] = batchnorm(p["downbn"], s["downbn"], r, train)
    else:
        r = x
    return relu(y + r), ns


def init(key, model_depth: int = 50, n_classes: int = 1,
         n_input_channels: int = 3, conv1_t_size: int = 7,
         widen_factor: float = 1.0):
    """generate_model parity (reference resnet_3d.py:217-235)."""
    kind, layers = DEPTH_TO_LAYERS[model_depth]
    planes = [int(x * widen_factor) for x in INPLANES]
    expansion = 4 if kind == "bottleneck" else 1
    block_init = _bottleneck_init if kind == "bottleneck" else _basic_init
    keys = jax.random.split(key, sum(layers) + 2)
    p: Dict = {"conv1": conv3d_init(keys[0], n_input_channels, planes[0],
                                    (conv1_t_size, 7, 7))}
    s: Dict = {}
    p["bn1"], s["bn1"] = batchnorm_init(planes[0])
    in_planes = planes[0]
    ki = 1
    meta = []
    for li, (n_blocks, pl) in enumerate(zip(layers, planes)):
        stage_p, stage_s, stage_m = [], [], []
        for bi in range(n_blocks):
            stride = 2 if (li > 0 and bi == 0) else 1
            bp, bs = block_init(keys[ki], in_planes, pl, stride)
            ki += 1
            stage_p.append(bp)
            stage_s.append(bs)
            stage_m.append(stride)
            in_planes = pl * expansion
        p[f"layer{li + 1}"] = stage_p
        s[f"layer{li + 1}"] = stage_s
        meta.append(stage_m)
    p["fc"] = linear_init(keys[-1], planes[3] * expansion, n_classes)
    cfg = {"kind": kind, "meta": meta, "conv1_t_size": conv1_t_size}
    return p, s, cfg


def apply(p, s, x, cfg, train: bool = False, rng=None, drop: float = 0.0):
    """x: (B, T, H, W, 3) NDHWC -> (B, n_classes)
    (reference resnet_3d.py:198-214)."""
    block_apply = _bottleneck_apply if cfg["kind"] == "bottleneck" \
        else _basic_apply
    ns: Dict = {}
    t_pad = cfg["conv1_t_size"] // 2
    y = conv3d(p["conv1"], x, stride=(1, 2, 2), padding=(t_pad, 3, 3))
    y, ns["bn1"] = batchnorm(p["bn1"], s["bn1"], y, train)
    y = relu(y)
    y = max_pool3d(y, 3, 2, 1)
    for li, stage_m in enumerate(cfg["meta"]):
        name = f"layer{li + 1}"
        ns[name] = []
        for bi, stride in enumerate(stage_m):
            y, bns = block_apply(p[name][bi], s[name][bi], y, stride, train)
            ns[name].append(bns)
    y = jnp.mean(y, axis=(1, 2, 3))
    y = dropout(rng, y, drop, train)
    return linear(p["fc"], y), ns


# ---------------------------------------------------------------------------
# I3D ResNet-50 (-NL) (reference network/resnet3d/models/resnet.py)

I3D_TEMP_CONV = ((1, 1, 1), (1, 0, 1, 0), (1, 0, 1, 0, 1, 0), (0, 1, 0))
I3D_LAYERS = (3, 4, 6, 3)


def _nl_init(key, dim_in, dim_inner, dim_out):
    ks = jax.random.split(key, 4)
    p, s = {}, {}
    p["theta"] = conv3d_init(ks[0], dim_in, dim_inner, 1, bias=True)
    p["phi"] = conv3d_init(ks[1], dim_in, dim_inner, 1, bias=True)
    p["g"] = conv3d_init(ks[2], dim_in, dim_inner, 1, bias=True)
    p["out"] = conv3d_init(ks[3], dim_inner, dim_out, 1, bias=True)
    p["bn"], s["bn"] = batchnorm_init(dim_out)
    return p, s


def _nl_apply(p, s, x, dim_inner, train):
    """Space-time non-local block (reference resnet.py:85-124): phi/g on a
    spatially max-pooled stream, softmax over pooled positions."""
    b = x.shape[0]
    mp = max_pool3d(x, (1, 2, 2), (1, 2, 2), 0)
    theta = conv3d(p["theta"], x)
    phi = conv3d(p["phi"], mp)
    g = conv3d(p["g"], mp)
    tshape = theta.shape
    theta = theta.reshape(b, -1, dim_inner)           # (B, THW, C)
    phi = phi.reshape(b, -1, dim_inner)               # (B, thw, C)
    g = g.reshape(b, -1, dim_inner)
    attn = jnp.einsum("bic,bjc->bij", theta, phi,
                      preferred_element_type=jnp.float32,
                      precision=_precision.get()) * dim_inner ** -0.5
    attn = jax.nn.softmax(attn, axis=-1)
    t = jnp.einsum("bij,bjc->bic", attn.astype(g.dtype), g,
                   preferred_element_type=jnp.float32,
                   precision=_precision.get()).astype(g.dtype)
    t = t.reshape(tshape)
    out = conv3d(p["out"], t)
    out, bns = batchnorm(p["bn"], s["bn"], out, train)
    return x + out, {"bn": bns}


def _i3d_block_init(key, inplanes, planes, stride, temp_conv, temp_stride,
                    use_nl):
    ks = jax.random.split(key, 5)
    p, s = {}, {}
    p["conv1"] = conv3d_init(ks[0], inplanes, planes,
                             (1 + temp_conv * 2, 1, 1))
    p["bn1"], s["bn1"] = batchnorm_init(planes)
    p["conv2"] = conv3d_init(ks[1], planes, planes, (1, 3, 3))
    p["bn2"], s["bn2"] = batchnorm_init(planes)
    p["conv3"] = conv3d_init(ks[2], planes, planes * 4, 1)
    p["bn3"], s["bn3"] = batchnorm_init(planes * 4)
    if stride != 1 or inplanes != planes * 4 or temp_stride != 1:
        p["down"] = conv3d_init(ks[3], inplanes, planes * 4, 1)
        p["downbn"], s["downbn"] = batchnorm_init(planes * 4)
    if use_nl:
        p["nl"], s["nl"] = _nl_init(ks[4], planes * 4, planes * 2, planes * 4)
    return p, s


def _i3d_block_apply(p, s, x, stride, temp_conv, temp_stride, train):
    ns = {}
    y = conv3d(p["conv1"], x, stride=(temp_stride, 1, 1),
               padding=(temp_conv, 0, 0))
    y, ns["bn1"] = batchnorm(p["bn1"], s["bn1"], y, train)
    y = relu(y)
    y = conv3d(p["conv2"], y, stride=(1, stride, stride), padding=(0, 1, 1))
    y, ns["bn2"] = batchnorm(p["bn2"], s["bn2"], y, train)
    y = relu(y)
    y = conv3d(p["conv3"], y)
    y, ns["bn3"] = batchnorm(p["bn3"], s["bn3"], y, train)
    if "down" in p:
        r = conv3d(p["down"], x, stride=(temp_stride, stride, stride))
        r, ns["downbn"] = batchnorm(p["downbn"], s["downbn"], r, train)
    else:
        r = x
    y = relu(y + r)
    if "nl" in p:
        dim_inner = p["nl"]["theta"]["w"].shape[-1]
        y, ns["nl"] = _nl_apply(p["nl"], s["nl"], y, dim_inner, train)
    return y, ns


def i3d_init(key, num_classes: int = 400, use_nl: bool = False):
    """I3Res50 (reference resnet.py:129-160)."""
    keys = jax.random.split(key, sum(I3D_LAYERS) + 2)
    p: Dict = {"conv1": conv3d_init(keys[0], 3, 64, (5, 7, 7))}
    s: Dict = {}
    p["bn1"], s["bn1"] = batchnorm_init(64)
    inplanes = 64
    ki = 1
    meta = []
    nonlocal_mod = 2 if use_nl else 1000
    for li, (n_blocks, planes) in enumerate(zip(I3D_LAYERS,
                                                (64, 128, 256, 512))):
        tconv = I3D_TEMP_CONV[li]
        stage_p, stage_s, stage_m = [], [], []
        for bi in range(n_blocks):
            stride = (2 if li > 0 else 1) if bi == 0 else 1
            nl = (li in (1, 2)) and bi % nonlocal_mod == nonlocal_mod - 1
            bp, bs = _i3d_block_init(keys[ki], inplanes, planes, stride,
                                     tconv[bi], 1, nl)
            ki += 1
            stage_p.append(bp)
            stage_s.append(bs)
            stage_m.append((stride, tconv[bi], 1))
            inplanes = planes * 4
        p[f"layer{li + 1}"] = stage_p
        s[f"layer{li + 1}"] = stage_s
        meta.append(stage_m)
    p["fc"] = linear_init(keys[-1], 2048, num_classes)
    return p, s, {"meta": meta}


def i3d_apply(p, s, x, cfg, train: bool = False, rng=None,
              drop: float = 0.5):
    """forward_single (reference resnet.py:172-189).
    x: (B, T, H, W, 3) NDHWC."""
    ns: Dict = {}
    y = conv3d(p["conv1"], x, stride=(2, 2, 2), padding=(2, 3, 3))
    y, ns["bn1"] = batchnorm(p["bn1"], s["bn1"], y, train)
    y = relu(y)
    y = max_pool3d(y, (2, 3, 3), (2, 2, 2), 0)
    for li, stage_m in enumerate(cfg["meta"]):
        name = f"layer{li + 1}"
        ns[name] = []
        for bi, (stride, tconv, tstride) in enumerate(stage_m):
            y, bns = _i3d_block_apply(p[name][bi], s[name][bi], y, stride,
                                      tconv, tstride, train)
            ns[name].append(bns)
        if li == 0:
            y = max_pool3d(y, (2, 1, 1), (2, 1, 1), 0)
    y = jnp.mean(y, axis=(1, 2, 3))
    y = dropout(rng, y, drop, train)
    return linear(p["fc"], y), ns


def i3d_forward_multi(p, s, x, cfg, train: bool = False):
    """Multi-clip multi-crop eval (reference resnet.py:191-202):
    x (B, n_clips, n_crops, T, H, W, 3) -> mean over clips and crops."""
    b, n_clips, n_crops = x.shape[:3]
    flat = x.reshape((b * n_clips * n_crops,) + x.shape[3:])
    preds, _ = i3d_apply(p, s, flat, cfg, train=train)
    preds = preds.reshape(b, n_clips, n_crops, -1)
    return jnp.mean(preds, axis=(1, 2))
