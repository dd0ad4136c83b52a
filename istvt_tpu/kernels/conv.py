"""Fused [ReLU->]SeparableConv2d->BN(inference) Pallas kernel — the
Xception stem's hot op (reference network/xception.py:40-50,63-89).

Round-2 profiling: the entry-flow blocks cost ~12 ms of a 56-62 ms
batch-of-16 inference — XLA runs the depthwise 3x3 at ~10-20% MXU with
separate BN/ReLU passes over (96, 147, 147, C) activations. This kernel
keeps one frame's activation in VMEM and does the whole unit in one HBM
round trip:

    y   = relu(x)                     (optional; reference Block pre-relu)
    acc = depthwise3x3(y)             (9 shifted VPU FMAs, f32)
    o   = acc @ pw                    (MXU; contraction over C_in)
    out = o * A + B                   (folded inference BatchNorm)

BN folding: eval-mode BN is the affine o*A+B with A = scale/sqrt(var+eps)
and B = bias - mean*A, precomputed in XLA. TRAIN-mode BN needs global
batch statistics (a cross-program reduction), so this is eval-only.
Differentiable anyway (custom_vjp, XLA recompute) so eval-mode gradient
paths (LRP input relevance) still work.

MEASURED NEGATIVE RESULT (v5e, batch-of-96 frames, bf16): numerically
exact but SLOWER than XLA's own lowering — 74x74x128->256: 5.67 ms vs
4.16; 37x37x256->728: 6.78 vs 5.81; the 147x147 shape exceeds the remote
compiler. Mosaic implements the W-axis taps as sublane shifts, costing
more than XLA's conv schedule, and the per-frame grid serializes the VPU
work. Left UNWIRED (models/xception.py always uses the XLA path); kept
with its tests as the record of the experiment so the next optimization
pass doesn't redo it.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_bn(scale, bias, mean, var, eps: float = 1e-5):
    """Inference BN -> (A, B) with y = x * A + B."""
    a = scale * jax.lax.rsqrt(var + eps)
    return a, bias - mean * a


def _sepconv_kernel(x_ref, dw_ref, pw_ref, a_ref, b_ref, o_ref, *,
                    relu_in: bool, h: int, w: int):
    x = x_ref[0].astype(jnp.float32)                 # (H, W, Cin)
    if relu_in:
        x = jnp.maximum(x, 0.0)
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
    acc = None
    for di in range(3):
        for dj in range(3):
            tap = xp[di:di + h, dj:dj + w, :] \
                * dw_ref[di * 3 + dj:di * 3 + dj + 1, :]  # bcast (1, Cin)
            acc = tap if acc is None else acc + tap
    o = jax.lax.dot_general(
        acc.astype(o_ref.dtype), pw_ref[...],
        (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (H, W, Cout)
    o = o * a_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("relu_in", "interpret"))
def _sepconv_bn_impl(x, dw, pw, a, b, relu_in: bool = False,
                     interpret: bool = False):
    n, h, w, cin = x.shape
    cout = pw.shape[1]
    frame = pl.BlockSpec((1, h, w, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    vec = lambda v: pl.BlockSpec(v.shape, lambda i: (0,) * v.ndim,
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_sepconv_kernel, relu_in=relu_in, h=h, w=w),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), x.dtype),
        grid=(n,),
        in_specs=[frame, vec(dw), vec(pw), vec(a), vec(b)],
        out_specs=pl.BlockSpec((1, h, w, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * cin * (9 + cout),
            bytes_accessed=n * h * w * (cin + cout) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, dw, pw, a, b)


def _sepconv_bn_reference(x, dw, pw, a, b, relu_in: bool):
    """XLA formulation (identical math) for the VJP recompute / CPU."""
    if relu_in:
        x = jnp.maximum(x, 0.0)
    cin = x.shape[-1]
    y = jax.lax.conv_general_dilated(
        x, dw.reshape(3, 3, 1, cin).astype(x.dtype),
        window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=cin)
    o = jnp.einsum("nhwc,ck->nhwk", y, pw.astype(x.dtype),
                   preferred_element_type=jnp.float32)
    return (o * a + b).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def sepconv_bn(x, dw, pw, a, b, relu_in: bool = False):
    """[relu ->] depthwise3x3 -> pointwise -> affine, one Pallas kernel.

    x: (N, H, W, Cin); dw: (9, Cin) flattened 3x3 taps; pw: (Cin, Cout);
    a, b: (1, 1, Cout)-broadcastable folded-BN affine. Numerics match
    nn.layers.separable_conv2d + inference batchnorm.
    """
    interpret = jax.default_backend() != "tpu"
    return _sepconv_bn_impl(x, dw, pw.astype(x.dtype), a, b,
                            relu_in=relu_in, interpret=interpret)


def _sepconv_fwd(x, dw, pw, a, b, relu_in):
    return sepconv_bn(x, dw, pw, a, b, relu_in), (x, dw, pw, a, b)


def _sepconv_bwd(relu_in, res, g):
    _, vjp = jax.vjp(
        lambda *t: _sepconv_bn_reference(*t, relu_in=relu_in), *res)
    return vjp(g)


sepconv_bn.defvjp(_sepconv_fwd, _sepconv_bwd)
