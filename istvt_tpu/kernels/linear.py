"""Fused LayerNorm->GEMM and GEMM(+bias)(+residual) Pallas kernels.

Round-1 profiling (CLAUDE.md): the XLA projection GEMMs of the ST layers
ran at ~39% MXU (~38 ms/batch-of-16) and the separate LayerNorms cost
another ~15 ms ('convert_reduce_fusion'), while the Pallas fused-FF kernel
sustained ~92% MXU. These kernels give every projection the same
treatment: token tiles stream through VMEM, weights stay VMEM-resident
across tiles (constant index maps), and the LayerNorm / bias / residual
epilogues ride along so the normalized tensor never touches HBM.

Shapes (ISTVT hot path, reference network/vivit/module.py):
  * ln_matmul:        (R, 728) -> LN -> @ (728, 1536)    [to_qk|to_v, to_qkv]
  * matmul_bias:      (R, 512) @ (512, 728) + b [+ resid] [to_out(+residual)]

All kernels are differentiable via custom_vjp with an XLA-reference
backward (recompute; no forward residuals spilled).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5


def _ln(xf, scale, bias):
    """f32 LayerNorm matching nn/layers.layernorm (two-pass variance)."""
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc * jax.lax.rsqrt(var + _EPS) * scale + bias


def _ln_matmul_kernel(x_ref, s_ref, b_ref, w_ref, o_ref):
    x = x_ref[...]
    y = _ln(x.astype(jnp.float32),
            s_ref[...].astype(jnp.float32),
            b_ref[...].astype(jnp.float32)).astype(x.dtype)
    o = jnp.dot(y, w_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


def _matmul_bias_kernel(x_ref, w_ref, b_ref, o_ref):
    o = jnp.dot(x_ref[...], w_ref[...],
                preferred_element_type=jnp.float32)
    o_ref[...] = (o + b_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _matmul_bias_res_kernel(x_ref, w_ref, b_ref, r_ref, o_ref):
    o = jnp.dot(x_ref[...], w_ref[...],
                preferred_element_type=jnp.float32)
    o = o + b_ref[...].astype(jnp.float32) \
        + r_ref[...].astype(jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


def _vec_spec(v):
    """BlockSpec for a (1, K) broadcast vector resident in VMEM (bias /
    LN-affine / quant-scale rows shared by every grid program)."""
    return pl.BlockSpec((1, v.shape[-1]), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)


def _row_tiles(n: int, max_tile: int = 512):
    """Pick a row tile that divides n exactly (multiple of 8) so the
    kernel needs NO pad + slice glue — round-2 profiling showed the
    pad/slice/copy ops around padded pallas_calls cost more than the
    kernels. Falls back to padding only when n has no suitable divisor.
    Returns (padded_n, grid, tile)."""
    for t in range(max_tile, 7, -8):
        if n % t == 0:
            return n, (n // t,), t
    np_ = (n + max_tile - 1) // max_tile * max_tile
    return np_, (np_ // max_tile,), max_tile


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ln_matmul_impl(x, s, b, w, interpret: bool = False):
    n, d = x.shape
    k = w.shape[1]
    np_, grid, tile = _row_tiles(n)
    if np_ != n:
        x = jnp.pad(x, ((0, np_ - n), (0, 0)))
    out = pl.pallas_call(
        _ln_matmul_kernel,
        out_shape=jax.ShapeDtypeStruct((np_, k), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * np_ * d * k,
            bytes_accessed=(np_ * (d + k) + d * k) * x.dtype.itemsize,
            transcendentals=np_,
        ),
    )(x, s.reshape(1, -1), b.reshape(1, -1), w)
    return out[:n]


def _ln_matmul_reference(x, s, b, w):
    xf = x.astype(jnp.float32)
    y = _ln(xf, s.astype(jnp.float32), b.astype(jnp.float32)).astype(x.dtype)
    return jnp.dot(y, w.astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)


def _ln_stats(xf):
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _EPS)
    return xc * rstd, rstd


def _ln_bwd_rows(dy, xhat, s, rstd):
    """LayerNorm input-grad for row-local stats (f32 in, f32 out)."""
    dxhat = dy * s
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    return (dxhat - m1 - xhat * m2) * rstd


def _ln_matmul_bwd_kernel(x_ref, s_ref, b_ref, w_ref, g_ref,
                          dx_ref, ds_ref, db_ref, dw_ref):
    """Fused backward of LN->GEMM on one token tile; dw/ds/db accumulate
    f32 across the grid (constant-index output blocks stay VMEM-resident;
    zero-padded g rows contribute nothing)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        ds_ref[...] = jnp.zeros_like(ds_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dw_ref[...] = jnp.zeros_like(dw_ref)

    x = x_ref[...]
    g = g_ref[...]
    s = s_ref[...].astype(jnp.float32)
    xhat, rstd = _ln_stats(x.astype(jnp.float32))
    y = (xhat * s + b_ref[...].astype(jnp.float32)).astype(x.dtype)
    dy = jax.lax.dot_general(g, w_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (t, D)
    ds_ref[...] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    db_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
    dx_ref[...] = _ln_bwd_rows(dy, xhat, s, rstd).astype(dx_ref.dtype)
    dw_ref[...] += jax.lax.dot_general(
        y, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ln_matmul_bwd_impl(x, s, b, w, g, interpret: bool = False):
    n, d = x.shape
    k = w.shape[1]
    np_, grid, tile = _row_tiles(n)
    if np_ != n:
        x = jnp.pad(x, ((0, np_ - n), (0, 0)))
        g = jnp.pad(g, ((0, np_ - n), (0, 0)))
    vec_spec = pl.BlockSpec((1, d), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    dx, ds, db, dw = pl.pallas_call(
        _ln_matmul_bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((np_, d), x.dtype),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((d, k), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            vec_spec, vec_spec,
            pl.BlockSpec((d, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            vec_spec,
            vec_spec,
            pl.BlockSpec((d, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * np_ * d * k,
            bytes_accessed=(2 * np_ * (d + k) + 2 * d * k)
            * x.dtype.itemsize,
            transcendentals=np_,
        ),
    )(x, s.reshape(1, -1), b.reshape(1, -1), w, g)
    return dx[:n], ds.reshape(-1), db.reshape(-1), dw


@jax.custom_vjp
def ln_matmul(x, s, b, w):
    """LayerNorm(x) @ w, x: (..., N, D), w: (D, K) -> (..., N, K).

    The normalized activation lives only in VMEM; HBM sees x once and the
    projection once. s/b are the LN affine params (eps 1e-5, f32 norm —
    identical numerics to nn/layers.layernorm followed by nn/layers.linear).
    """
    lead = x.shape[:-1]
    flat = x.reshape(-1, x.shape[-1])
    interpret = jax.default_backend() != "tpu"
    out = _ln_matmul_impl(flat, s, b, w.astype(x.dtype),
                          interpret=interpret)
    return out.reshape(*lead, w.shape[1])


def _ln_matmul_fwd(x, s, b, w):
    return ln_matmul(x, s, b, w), (x, s, b, w)


def _ln_matmul_bwd(res, g):
    x, s, b, w = res
    if jax.default_backend() == "tpu":
        flat = x.reshape(-1, x.shape[-1])
        gf = g.reshape(-1, g.shape[-1])
        dx, ds, db, dw = _ln_matmul_bwd_impl(flat, s, b, w.astype(x.dtype),
                                             gf)
        return (dx.reshape(x.shape), ds.astype(s.dtype),
                db.astype(b.dtype), dw.astype(w.dtype))
    _, vjp = jax.vjp(_ln_matmul_reference, *res)
    return vjp(g)


ln_matmul.defvjp(_ln_matmul_fwd, _ln_matmul_bwd)


@functools.partial(jax.jit, static_argnames=("interpret", "has_res"))
def _matmul_bias_impl(x, w, b, r, interpret: bool = False,
                      has_res: bool = False):
    n, d = x.shape
    k = w.shape[1]
    np_, grid, tile = _row_tiles(n)
    if np_ != n:
        x = jnp.pad(x, ((0, np_ - n), (0, 0)))
        if has_res:
            r = jnp.pad(r, ((0, np_ - n), (0, 0)))
    in_specs = [
        pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, w, b.reshape(1, -1)]
    kernel = _matmul_bias_kernel
    if has_res:
        in_specs.append(pl.BlockSpec((tile, k), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(r)
        kernel = _matmul_bias_res_kernel
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((np_, k), x.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * np_ * d * k,
            bytes_accessed=(np_ * (d + k * (2 if has_res else 1))
                            + d * k) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(*args)
    return out[:n]


def _matmul_bias_reference(x, w, b, r):
    o = jnp.dot(x, w.astype(x.dtype),
                preferred_element_type=jnp.float32) \
        + b.astype(jnp.float32)
    if r is not None:
        o = o + r.astype(jnp.float32)
    return o.astype(x.dtype)


@jax.custom_vjp
def matmul_bias_residual(x, w, b, r):
    """x @ w + b + r (residual add fused into the GEMM epilogue).

    x: (..., N, D), w: (D, K), b: (K,), r: (..., N, K) or None.
    """
    lead = x.shape[:-1]
    flat = x.reshape(-1, x.shape[-1])
    interpret = jax.default_backend() != "tpu"
    rf = r.reshape(-1, r.shape[-1]) if r is not None else None
    out = _matmul_bias_impl(flat, w.astype(x.dtype), b.astype(x.dtype),
                            rf, interpret=interpret, has_res=r is not None)
    return out.reshape(*lead, w.shape[1])


def _mbr_fwd(x, w, b, r):
    return matmul_bias_residual(x, w, b, r), (x, w, b, r)


def _mbr_bwd(res, g):
    x, w, b, r = res
    if r is None:
        _, vjp = jax.vjp(lambda x_, w_, b_:
                         _matmul_bias_reference(x_, w_, b_, None), x, w, b)
        dx, dw, db = vjp(g)
        return dx, dw, db, None
    _, vjp = jax.vjp(_matmul_bias_reference, x, w, b, r)
    return vjp(g)


matmul_bias_residual.defvjp(_mbr_fwd, _mbr_bwd)
