"""Fused transformer MLP (fc1 -> GELU -> fc2) Pallas kernel.

The unfused FF materializes the 4x-wide hidden activation in HBM
(2534 tokens x 2912 x bf16 ≈ 15 MB/clip written + read per layer — the
largest single traffic term after the attention probs). This kernel keeps
the hidden tile in VMEM: token tiles stream through, both weight blocks
use constant index maps so Mosaic hoists their copies out of the grid
loop (weights stay VMEM-resident across tiles).

Differentiable via custom_vjp with XLA recompute backward.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ff_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[...]
    h = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    # tanh-approx GELU: exact erf doesn't lower in Pallas TPU (erfc
    # unimplemented); max deviation ~3e-4, below bf16 resolution
    h = jax.nn.gelu(h, approximate=True).astype(x.dtype)
    o = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    o = o + b2_ref[...].astype(jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_ff_impl(x, w1, b1, w2, b2, interpret: bool = False):
    from istvt_tpu.kernels.linear import _row_tiles
    n, d = x.shape
    dh = w1.shape[1]
    np_, grid, tile = _row_tiles(n)
    if np_ != n:
        x = jnp.pad(x, ((0, np_ - n), (0, 0)))
    out = pl.pallas_call(
        _ff_kernel,
        out_shape=jax.ShapeDtypeStruct((np_, d), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, dh), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dh, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * np_ * d * dh,
            bytes_accessed=(2 * np_ * d + d * dh * 2) * x.dtype.itemsize,
            transcendentals=np_ * dh,
        ),
    )(x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))
    return out[:n]


def _ln_ff_res_kernel(x_ref, s_ref, bn_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                      o_ref):
    """x + fc2(gelu(fc1(LN(x)))) on one token tile — the whole PreNorm-FF
    residual branch (reference vivit.py:100 `ff(x) + x` with PreNorm)
    in one HBM round trip."""
    x = x_ref[...]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = (xc * jax.lax.rsqrt(var + 1e-5)
         * s_ref[...].astype(jnp.float32)
         + bn_ref[...].astype(jnp.float32)).astype(x.dtype)
    h = jnp.dot(y, w1_ref[...], preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=True).astype(x.dtype)
    o = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    o = o + b2_ref[...].astype(jnp.float32) + xf
    o_ref[...] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ln_ff_res_impl(x, s, bn, w1, b1, w2, b2, interpret: bool = False):
    from istvt_tpu.kernels.linear import _row_tiles
    n, d = x.shape
    dh = w1.shape[1]
    np_, grid, tile = _row_tiles(n)
    if np_ != n:
        x = jnp.pad(x, ((0, np_ - n), (0, 0)))
    out = pl.pallas_call(
        _ln_ff_res_kernel,
        out_shape=jax.ShapeDtypeStruct((np_, d), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, dh), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dh, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * np_ * d * dh,
            bytes_accessed=(2 * np_ * d + d * dh * 2) * x.dtype.itemsize,
            transcendentals=np_ * (dh + 1),
        ),
    )(x, s.reshape(1, -1), bn.reshape(1, -1),
      w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))
    return out[:n]


def _ln_ff_res_reference(x, s, bn, w1, b1, w2, b2):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = (xc * jax.lax.rsqrt(var + 1e-5) * s.astype(jnp.float32)
         + bn.astype(jnp.float32)).astype(x.dtype)
    h = jnp.dot(y, w1.astype(x.dtype),
                preferred_element_type=jnp.float32) \
        + b1.astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=True).astype(x.dtype)
    o = jnp.dot(h, w2.astype(x.dtype),
                preferred_element_type=jnp.float32) \
        + b2.astype(jnp.float32) + xf
    return o.astype(x.dtype)


@jax.custom_vjp
def ln_ff_residual(x, s, bn, w1, b1, w2, b2):
    """The full PreNorm FF residual branch: x + fc2(gelu(fc1(LN(x)))).

    x: (..., N, D); LN affine (s, bn); w1 (D, 4D), w2 (4D, D).
    One kernel, one HBM round trip — neither the normalized tensor nor
    the 4x hidden ever leave VMEM.
    """
    lead = x.shape[:-1]
    flat = x.reshape(-1, x.shape[-1])
    interpret = jax.default_backend() != "tpu"
    out = _ln_ff_res_impl(flat, s.astype(x.dtype), bn.astype(x.dtype),
                          w1.astype(x.dtype), b1.astype(x.dtype),
                          w2.astype(x.dtype), b2.astype(x.dtype),
                          interpret=interpret)
    return out.reshape(*lead, x.shape[-1])


def _ln_ff_res_fwd(x, s, bn, w1, b1, w2, b2):
    return ln_ff_residual(x, s, bn, w1, b1, w2, b2), \
        (x, s, bn, w1, b1, w2, b2)


def _ln_ff_res_bwd(res, g):
    _, vjp = jax.vjp(_ln_ff_res_reference, *res)
    return vjp(g)


ln_ff_residual.defvjp(_ln_ff_res_fwd, _ln_ff_res_bwd)


def _ff_reference(x, w1, b1, w2, b2):
    """Same math in XLA (weights cast inside, like nn.layers.linear) —
    the VJP recompute path. Uses the SAME tanh-approx GELU as the Pallas
    forward so fwd/bwd are consistent (the exact-erf convention lives on
    the non-Pallas path in nn/layers.py)."""
    h = jnp.dot(x, w1.astype(x.dtype),
                preferred_element_type=jnp.float32) \
        + b1.astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=True).astype(x.dtype)
    o = jnp.dot(h, w2.astype(x.dtype),
                preferred_element_type=jnp.float32) \
        + b2.astype(jnp.float32)
    return o.astype(x.dtype)


@jax.custom_vjp
def fused_ff(x, w1, b1, w2, b2):
    """x: (..., N, D) tokens; w1 (D, 4D), w2 (4D, D). -> (..., N, D)."""
    lead = x.shape[:-1]
    flat = x.reshape(-1, x.shape[-1])
    interpret = jax.default_backend() != "tpu"
    out = _fused_ff_impl(flat, w1.astype(x.dtype), b1.astype(x.dtype),
                         w2.astype(x.dtype), b2.astype(x.dtype),
                         interpret=interpret)
    return out.reshape(*lead, x.shape[-1])


def _fused_ff_fwd(x, w1, b1, w2, b2):
    return fused_ff(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _fused_ff_bwd(res, g):
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(_ff_reference, x, w1, b1, w2, b2)
    return vjp(g)


fused_ff.defvjp(_fused_ff_fwd, _fused_ff_bwd)
