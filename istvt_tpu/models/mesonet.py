"""MesoNet baselines — Meso4 and MesoInception4 (TPU-native).

Per-frame lightweight CNNs for deepfake detection (reference
network/mesonet.py:11-162, registry keys 'mesonet'/'mesoincep' at
models.py:64-71). 256x256 RGB in, `num_classes` logits out.

Architecture notes preserved from the reference:
  * Meso4 REUSES bn1 after conv1 and conv2, and bn2 after conv3 and conv4
    (mesonet.py:39-56) — shared running stats, faithfully mirrored here.
  * MesoInception4's two inception layers concatenate 1x1 / 3x3 /
    dilated-2 / dilated-3 branches to 11 then 12 channels
    (mesonet.py:78-100); BN is reused across conv1/conv2 (:149-156).
  * Final head: flatten 16*8*8 -> Dropout -> fc1(16) -> LeakyReLU(0.1)
    -> Dropout -> fc2 (mesonet.py:58-64).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from istvt_tpu.nn.layers import (
    batchnorm,
    batchnorm_init,
    conv2d,
    conv2d_init,
    dropout,
    linear,
    linear_init,
    max_pool2d,
    relu,
)


def leaky_relu(x, slope: float = 0.1):
    return jnp.where(x >= 0, x, slope * x)


def _maxpool(x, k):
    """MaxPool2d(k) with stride k, no padding."""
    return max_pool2d(x, window=k, stride=k, padding=0)


# ---------------------------------------------------------------------------
# Meso4


def meso4_init(key, num_classes: int = 2):
    ks = jax.random.split(key, 8)
    p = {
        "conv1": conv2d_init(ks[0], 3, 8, 3),
        "conv2": conv2d_init(ks[1], 8, 8, 5),
        "conv3": conv2d_init(ks[2], 8, 16, 5),
        "conv4": conv2d_init(ks[3], 16, 16, 5),
        "fc1": linear_init(ks[4], 16 * 8 * 8, 16),
        "fc2": linear_init(ks[5], 16, num_classes),
    }
    s = {}
    p["bn1"], s["bn1"] = batchnorm_init(8)
    p["bn2"], s["bn2"] = batchnorm_init(16)
    return p, s


def meso4_apply(p, s, x, train: bool = False, rng=None, drop: float = 0.5):
    """x: (B, 256, 256, 3) NHWC -> (B, num_classes)."""
    ns = {}
    k1 = k2 = None
    if rng is not None:
        k1, k2 = jax.random.split(rng)
    x = relu(conv2d(p["conv1"], x, padding=1))
    x, ns["bn1"] = batchnorm(p["bn1"], s["bn1"], x, train)
    x = _maxpool(x, 2)
    x = relu(conv2d(p["conv2"], x, padding=2))
    # bn1 reused (reference mesonet.py:44); its running stats see both
    x, ns["bn1"] = batchnorm(p["bn1"], ns["bn1"], x, train)
    x = _maxpool(x, 2)
    x = relu(conv2d(p["conv3"], x, padding=2))
    x, ns["bn2"] = batchnorm(p["bn2"], s["bn2"], x, train)
    x = _maxpool(x, 2)
    x = relu(conv2d(p["conv4"], x, padding=2))
    x, ns["bn2"] = batchnorm(p["bn2"], ns["bn2"], x, train)
    x = _maxpool(x, 4)
    x = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)  # torch NCHW flatten
    x = dropout(k1, x, drop, train)
    x = leaky_relu(linear(p["fc1"], x))
    x = dropout(k2, x, drop, train)
    return linear(p["fc2"], x), ns


# ---------------------------------------------------------------------------
# MesoInception4


def _inception_init(key, in_ch, b1, b2, b3, b4):
    ks = jax.random.split(key, 7)
    return {
        "c1": conv2d_init(ks[0], in_ch, b1, 1),
        "c2a": conv2d_init(ks[1], in_ch, b2, 1),
        "c2b": conv2d_init(ks[2], b2, b2, 3),
        "c3a": conv2d_init(ks[3], in_ch, b3, 1),
        "c3b": conv2d_init(ks[4], b3, b3, 3),
        "c4a": conv2d_init(ks[5], in_ch, b4, 1),
        "c4b": conv2d_init(ks[6], b4, b4, 3),
    }


def _inception_apply(p, bn_p, bn_s, x, train):
    """1x1 | 1x1->3x3 | 1x1->3x3(d2) | 1x1->3x3(d3) concat
    (reference mesonet.py:115-141)."""
    x1 = conv2d(p["c1"], x)
    x2 = conv2d(p["c2b"], conv2d(p["c2a"], x), padding=1)
    x3 = conv2d(p["c3b"], conv2d(p["c3a"], x), padding=2, dilation=2)
    x4 = conv2d(p["c4b"], conv2d(p["c4a"], x), padding=3, dilation=3)
    y = jnp.concatenate([x1, x2, x3, x4], axis=-1)
    y, bn_ns = batchnorm(bn_p, bn_s, y, train)
    return _maxpool(y, 2), bn_ns


def mesoinception4_init(key, num_classes: int = 2):
    ks = jax.random.split(key, 6)
    p = {
        "inc1": _inception_init(ks[0], 3, 1, 4, 4, 2),
        "inc2": _inception_init(ks[1], 11, 2, 4, 4, 2),
        "conv1": conv2d_init(ks[2], 12, 16, 5),
        "conv2": conv2d_init(ks[3], 16, 16, 5),
        "fc1": linear_init(ks[4], 16 * 8 * 8, 16),
        "fc2": linear_init(ks[5], 16, num_classes),
    }
    s = {}
    p["bn_inc1"], s["bn_inc1"] = batchnorm_init(11)
    p["bn_inc2"], s["bn_inc2"] = batchnorm_init(12)
    p["bn1"], s["bn1"] = batchnorm_init(16)
    return p, s


def mesoinception4_apply(p, s, x, train: bool = False, rng=None,
                         drop: float = 0.5):
    ns = {}
    k1 = k2 = None
    if rng is not None:
        k1, k2 = jax.random.split(rng)
    x, ns["bn_inc1"] = _inception_apply(p["inc1"], p["bn_inc1"],
                                        s["bn_inc1"], x, train)
    x, ns["bn_inc2"] = _inception_apply(p["inc2"], p["bn_inc2"],
                                        s["bn_inc2"], x, train)
    x = relu(conv2d(p["conv1"], x, padding=2))
    x, ns["bn1"] = batchnorm(p["bn1"], s["bn1"], x, train)
    x = _maxpool(x, 2)
    x = relu(conv2d(p["conv2"], x, padding=2))
    x, ns["bn1"] = batchnorm(p["bn1"], ns["bn1"], x, train)
    x = _maxpool(x, 4)
    x = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)
    x = dropout(k1, x, drop, train)
    x = leaky_relu(linear(p["fc1"], x))
    x = dropout(k2, x, drop, train)
    return linear(p["fc2"], x), ns
