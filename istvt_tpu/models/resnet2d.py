"""2D ResNets (torchvision-style resnet18/34/50) — registry keys
'resnet18'/'resnet50' (reference network/models.py:48-63 wraps torchvision
models with a Dropout+Linear head). NHWC."""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from istvt_tpu.nn.layers import (
    batchnorm,
    batchnorm_init,
    conv2d,
    conv2d_init,
    linear,
    linear_init,
    max_pool2d,
    relu,
)

LAYERS = {18: ("basic", (2, 2, 2, 2)), 34: ("basic", (3, 4, 6, 3)),
          50: ("bottleneck", (3, 4, 6, 3)), 101: ("bottleneck", (3, 4, 23, 3))}


def _basic_init(key, cin, planes, stride):
    ks = jax.random.split(key, 3)
    p, s = {}, {}
    p["conv1"] = conv2d_init(ks[0], cin, planes, 3)
    p["bn1"], s["bn1"] = batchnorm_init(planes)
    p["conv2"] = conv2d_init(ks[1], planes, planes, 3)
    p["bn2"], s["bn2"] = batchnorm_init(planes)
    if stride != 1 or cin != planes:
        p["down"] = conv2d_init(ks[2], cin, planes, 1)
        p["downbn"], s["downbn"] = batchnorm_init(planes)
    return p, s


def _basic_apply(p, s, x, stride, train):
    ns = {}
    y = conv2d(p["conv1"], x, stride=stride, padding=1)
    y, ns["bn1"] = batchnorm(p["bn1"], s["bn1"], y, train)
    y = relu(y)
    y = conv2d(p["conv2"], y, padding=1)
    y, ns["bn2"] = batchnorm(p["bn2"], s["bn2"], y, train)
    if "down" in p:
        r = conv2d(p["down"], x, stride=stride)
        r, ns["downbn"] = batchnorm(p["downbn"], s["downbn"], r, train)
    else:
        r = x
    return relu(y + r), ns


def _bottleneck_init(key, cin, planes, stride):
    ks = jax.random.split(key, 4)
    p, s = {}, {}
    p["conv1"] = conv2d_init(ks[0], cin, planes, 1)
    p["bn1"], s["bn1"] = batchnorm_init(planes)
    p["conv2"] = conv2d_init(ks[1], planes, planes, 3)
    p["bn2"], s["bn2"] = batchnorm_init(planes)
    p["conv3"] = conv2d_init(ks[2], planes, planes * 4, 1)
    p["bn3"], s["bn3"] = batchnorm_init(planes * 4)
    if stride != 1 or cin != planes * 4:
        p["down"] = conv2d_init(ks[3], cin, planes * 4, 1)
        p["downbn"], s["downbn"] = batchnorm_init(planes * 4)
    return p, s


def _bottleneck_apply(p, s, x, stride, train):
    ns = {}
    y, ns["bn1"] = batchnorm(p["bn1"], s["bn1"], conv2d(p["conv1"], x), train)
    y = relu(y)
    y = conv2d(p["conv2"], y, stride=stride, padding=1)
    y, ns["bn2"] = batchnorm(p["bn2"], s["bn2"], y, train)
    y = relu(y)
    y = conv2d(p["conv3"], y)
    y, ns["bn3"] = batchnorm(p["bn3"], s["bn3"], y, train)
    if "down" in p:
        r = conv2d(p["down"], x, stride=stride)
        r, ns["downbn"] = batchnorm(p["downbn"], s["downbn"], r, train)
    else:
        r = x
    return relu(y + r), ns


def init(key, depth: int = 18, num_classes: int = 2):
    kind, layers = LAYERS[depth]
    block_init = _bottleneck_init if kind == "bottleneck" else _basic_init
    expansion = 4 if kind == "bottleneck" else 1
    keys = jax.random.split(key, sum(layers) + 2)
    p: Dict = {"conv1": conv2d_init(keys[0], 3, 64, 7)}
    s: Dict = {}
    p["bn1"], s["bn1"] = batchnorm_init(64)
    cin = 64
    ki = 1
    meta = []
    for li, (n, planes) in enumerate(zip(layers, (64, 128, 256, 512))):
        sp, ss, sm = [], [], []
        for bi in range(n):
            stride = 2 if (li > 0 and bi == 0) else 1
            bp, bs = block_init(keys[ki], cin, planes, stride)
            ki += 1
            sp.append(bp)
            ss.append(bs)
            sm.append(stride)
            cin = planes * expansion
        p[f"layer{li+1}"] = sp
        s[f"layer{li+1}"] = ss
        meta.append(sm)
    p["fc"] = linear_init(keys[-1], 512 * expansion, num_classes)
    return p, s, {"kind": kind, "meta": meta}


def apply(p, s, x, cfg, train: bool = False, rng=None):
    block_apply = _bottleneck_apply if cfg["kind"] == "bottleneck" \
        else _basic_apply
    ns: Dict = {}
    y = conv2d(p["conv1"], x, stride=2, padding=3)
    y, ns["bn1"] = batchnorm(p["bn1"], s["bn1"], y, train)
    y = relu(y)
    y = max_pool2d(y, 3, 2, 1)
    for li, sm in enumerate(cfg["meta"]):
        name = f"layer{li+1}"
        ns[name] = []
        for bi, stride in enumerate(sm):
            y, bns = block_apply(p[name][bi], s[name][bi], y, stride, train)
            ns[name].append(bns)
    feat = jnp.mean(y, axis=(1, 2))
    # TransferModel head: Dropout(p) -> Linear (reference
    # network/models.py:66-71); identity in eval mode
    drop = cfg.get("dropout", 0.0)
    if train and drop and rng is not None:
        from istvt_tpu.nn.layers import dropout
        feat = dropout(rng, feat, drop, train)
    return linear(p["fc"], feat), ns
