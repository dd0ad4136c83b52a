"""Functional NN layers with PyTorch-matching numerics.

Every layer is an (init, apply) pair over plain-dict pytrees. Activations are
NHWC (TPU-friendly); the compat/ converters transpose PyTorch's NCHW/OIHW
weights on import. Numerics intentionally match torch defaults so golden
parity tests against the reference (SURVEY.md §4) pass to <=1e-3:

  * GELU is the exact erf form (torch nn.GELU default), not tanh-approx.
  * LayerNorm eps 1e-5, BatchNorm eps 1e-5 / momentum 0.1 with torch's
    unbiased-variance running update.
  * MaxPool pads with -inf like torch MaxPool2d(3, s, 1)
    (reference network/xception.py:87-88).
  * Default inits follow torch (kaiming-uniform a=sqrt(5) == U(+-1/sqrt(fan_in))).
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from istvt_tpu.core import precision as _precision

# ---------------------------------------------------------------------------
# activations


def gelu(x):
    """Exact GELU (erf), matching torch nn.GELU() default."""
    return jax.nn.gelu(x, approximate=False)


def relu(x):
    return jnp.maximum(x, 0)


def swish(x):
    """SiLU; replaces the reference's MemoryEfficientSwish custom autograd
    Function (reference network/utils.py:105-120) — XLA fuses this and
    rematerializes under jax.checkpoint, so no hand-written backward."""
    return x * jax.nn.sigmoid(x)


# ---------------------------------------------------------------------------
# initializers (torch-default flavors)


def _kaiming_uniform(key, shape, fan_in):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


# ---------------------------------------------------------------------------
# conv2d — NHWC activations, HWIO weights


def conv2d_init(key, in_ch, out_ch, kernel_size, groups: int = 1, bias: bool = False):
    k = kernel_size
    fan_in = (in_ch // groups) * k * k
    wkey, bkey = jax.random.split(key)
    p = {"w": _kaiming_uniform(wkey, (k, k, in_ch // groups, out_ch), fan_in)}
    if bias:
        p["b"] = _kaiming_uniform(bkey, (out_ch,), fan_in)
    return p


def conv2d(p, x, stride: int = 1, padding: int = 0, groups: int = 1,
           dilation: int = 1):
    """2D conv, torch Conv2d semantics (symmetric int padding), NHWC/HWIO."""
    y = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        rhs_dilation=(dilation, dilation),
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=_precision.get(),
    )
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def separable_conv2d_init(key, in_ch, out_ch, kernel_size=3, bias: bool = False):
    """Depthwise + 1x1 pointwise (reference network/xception.py:39-49)."""
    k1, k2 = jax.random.split(key)
    return {
        "dw": conv2d_init(k1, in_ch, in_ch, kernel_size, groups=in_ch, bias=bias),
        "pw": conv2d_init(k2, in_ch, out_ch, 1, bias=bias),
    }


def separable_conv2d(p, x, stride: int = 1, padding: int = 0, dilation: int = 1):
    c = x.shape[-1]
    x = conv2d(p["dw"], x, stride=stride, padding=padding, groups=c,
               dilation=dilation)
    x = conv2d(p["pw"], x, stride=1, padding=0)
    return x


# ---------------------------------------------------------------------------
# conv3d — NDHWC activations (B, T, H, W, C), DHWIO weights


def conv3d_init(key, in_ch, out_ch, kernel_size, bias: bool = False):
    """kernel_size: int or (kt, kh, kw). Kaiming-normal fan_out init
    (matching the reference 3D nets, network/resnet_3d.py:153-157)."""
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size,) * 3
    kt, kh, kw = kernel_size
    fan_out = out_ch * kt * kh * kw
    std = math.sqrt(2.0 / fan_out)
    wkey, bkey = jax.random.split(key)
    p = {"w": std * jax.random.normal(wkey, (kt, kh, kw, in_ch, out_ch))}
    if bias:
        p["b"] = jnp.zeros((out_ch,))
    return p


def conv3d(p, x, stride=1, padding=0):
    """3D conv, torch Conv3d semantics. stride/padding: int or 3-tuples."""
    if isinstance(stride, int):
        stride = (stride,) * 3
    if isinstance(padding, int):
        padding = (padding,) * 3
    y = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1]),
                 (padding[2], padding[2])],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=_precision.get(),
    )
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def max_pool3d(x, window=3, stride=2, padding=1):
    """torch MaxPool3d. window/stride/padding: int or 3-tuples."""
    if isinstance(window, int):
        window = (window,) * 3
    if isinstance(stride, int):
        stride = (stride,) * 3
    if isinstance(padding, int):
        padding = (padding,) * 3
    init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) \
        else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x, init, lax.max,
        window_dimensions=(1,) + window + (1,),
        window_strides=(1,) + stride + (1,),
        padding=((0, 0),) + tuple((pp, pp) for pp in padding) + ((0, 0),),
    )


def avg_pool3d(x, window, stride):
    if isinstance(window, int):
        window = (window,) * 3
    if isinstance(stride, int):
        stride = (stride,) * 3
    summed = lax.reduce_window(
        x, 0.0, lax.add,
        window_dimensions=(1,) + window + (1,),
        window_strides=(1,) + stride + (1,),
        padding="VALID")
    return summed / (window[0] * window[1] * window[2])


# ---------------------------------------------------------------------------
# batchnorm2d/3d — params {'scale','bias'}, state {'mean','var'}


def batchnorm_init(ch):
    params = {"scale": jnp.ones((ch,)), "bias": jnp.zeros((ch,))}
    state = {"mean": jnp.zeros((ch,)), "var": jnp.ones((ch,))}
    return params, state


def batchnorm(p, s, x, train: bool = False, momentum: float = 0.1,
              eps: float = 1e-5):
    """BatchNorm over all but the channel (last) axis.

    train=True computes batch statistics over the *global* (mesh-sharded)
    batch — under jit+sharding XLA inserts the cross-replica reduction, i.e.
    sync-BN by construction (the reference's DataParallel uses per-replica
    stats; divergence documented in SURVEY.md §7 'hard parts').
    Returns (y, new_state).
    """
    if train:
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=axes)
        var = jnp.var(x, axis=axes)
        n = x.size // x.shape[-1]
        unbiased = var * (n / max(n - 1, 1))
        new_s = {
            "mean": (1 - momentum) * s["mean"] + momentum * mean.astype(s["mean"].dtype),
            "var": (1 - momentum) * s["var"] + momentum * unbiased.astype(s["var"].dtype),
        }
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    inv = lax.rsqrt(var.astype(jnp.float32) + eps)
    scale = (p["scale"].astype(jnp.float32) * inv).astype(x.dtype)
    shift = (p["bias"].astype(jnp.float32)
             - mean.astype(jnp.float32) * p["scale"].astype(jnp.float32) * inv
             ).astype(x.dtype)
    return x * scale + shift, new_s


# ---------------------------------------------------------------------------
# pooling


def max_pool2d(x, window: int = 3, stride: int = 2, padding: int = 1):
    """torch MaxPool2d(window, stride, padding): pads with -inf."""
    return lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def global_avg_pool(x):
    """adaptive_avg_pool2d(x, (1,1)) + flatten, NHWC -> (N, C)."""
    return jnp.mean(x, axis=(1, 2))


# ---------------------------------------------------------------------------
# linear — weights stored (in, out) so y = x @ w + b


def linear_init(key, in_dim, out_dim, bias: bool = True):
    wkey, bkey = jax.random.split(key)
    p = {"w": _kaiming_uniform(wkey, (in_dim, out_dim), in_dim)}
    if bias:
        p["b"] = _kaiming_uniform(bkey, (out_dim,), in_dim)
    return p


def linear(p, x):
    y = jnp.dot(x, p["w"].astype(x.dtype), precision=_precision.get())
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# layernorm


def layernorm_init(dim):
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def layernorm(p, x, eps: float = 1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# dropout


def dropout(key: Optional[jax.Array], x, rate: float, train: bool):
    if not train or rate == 0.0 or key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
