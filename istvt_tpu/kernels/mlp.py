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
                      o_ref, *stash):
    """x + fc2(gelu(fc1(LN(x)))) on one token tile — the whole PreNorm-FF
    residual branch (reference vivit.py:100 `ff(x) + x` with PreNorm)
    in one HBM round trip.

    When a second output ref is present (`stash` = (h1_ref,), the
    differentiated training forward), the pre-GELU hidden h1 is ALSO
    written to HBM so the backward skips the fc1 recompute GEMM — the
    save-vs-recompute trade taken the other way (one (N, 4D) bf16 stash
    ≈ 0.2 ms of HBM vs a ~1 ms/layer MXU recompute at B=16)."""
    x = x_ref[...]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = (xc * jax.lax.rsqrt(var + 1e-5)
         * s_ref[...].astype(jnp.float32)
         + bn_ref[...].astype(jnp.float32)).astype(x.dtype)
    h1 = jnp.dot(y, w1_ref[...], preferred_element_type=jnp.float32)
    h1 = h1 + b1_ref[...].astype(jnp.float32)
    if stash:
        stash[0][...] = h1.astype(stash[0].dtype)
    h = jax.nn.gelu(h1, approximate=True).astype(x.dtype)
    o = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    o = o + b2_ref[...].astype(jnp.float32) + xf
    o_ref[...] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "stash_h1"))
def _ln_ff_res_impl(x, s, bn, w1, b1, w2, b2, interpret: bool = False,
                    stash_h1: bool = False):
    from istvt_tpu.kernels.linear import _row_tiles
    n, d = x.shape
    dh = w1.shape[1]
    np_, grid, tile = _row_tiles(n)
    if np_ != n:
        x = jnp.pad(x, ((0, np_ - n), (0, 0)))
    from istvt_tpu.kernels.linear import _vec_spec as vec
    tok = pl.BlockSpec((tile, d), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((np_, d), x.dtype)
    out_spec = tok
    if stash_h1:
        out_shape = (out_shape, jax.ShapeDtypeStruct((np_, dh), x.dtype))
        out_spec = (tok, pl.BlockSpec((tile, dh), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
    res = pl.pallas_call(
        _ln_ff_res_kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            tok, vec(s), vec(bn),
            pl.BlockSpec((d, dh), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            vec(b1),
            pl.BlockSpec((dh, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            vec(b2),
        ],
        out_specs=out_spec,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * np_ * d * dh,
            bytes_accessed=(2 * np_ * d + (np_ * dh if stash_h1 else 0)
                            + d * dh * 2) * x.dtype.itemsize,
            transcendentals=np_ * (dh + 1),
        ),
    )(x, s.reshape(1, -1), bn.reshape(1, -1),
      w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))
    if stash_h1:
        out, h1 = res
        return out[:n], h1[:n]
    return res[:n]


def _ln_ff_res_h1_impl(x, s, bn, w1, b1, w2, b2, interpret: bool = False):
    return _ln_ff_res_impl(x, s, bn, w1, b1, w2, b2, interpret=interpret,
                           stash_h1=True)


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
    if jax.default_backend() == "tpu":
        # differentiated forward: stash the pre-GELU hidden so the
        # backward kernel skips the fc1 recompute GEMM (5 -> 4 GEMMs)
        lead = x.shape[:-1]
        flat = x.reshape(-1, x.shape[-1])
        out, h1 = _ln_ff_res_h1_impl(
            flat, s.astype(x.dtype), bn.astype(x.dtype),
            w1.astype(x.dtype), b1.astype(x.dtype), w2.astype(x.dtype),
            b2.astype(x.dtype))
        return out.reshape(*lead, x.shape[-1]), \
            (x, s, bn, w1, b1, w2, b2, h1)
    return ln_ff_residual(x, s, bn, w1, b1, w2, b2), \
        (x, s, bn, w1, b1, w2, b2, None)


_GC = 0.7978845608028654   # sqrt(2/pi)
_GA = 0.044715


def _gelu_tanh_and_grad(h):
    """tanh-approx GELU value and derivative (f32)."""
    u = _GC * (h + _GA * h * h * h)
    t = jnp.tanh(u)
    val = 0.5 * h * (1.0 + t)
    dval = 0.5 * (1.0 + t) \
        + 0.5 * h * (1.0 - t * t) * _GC * (1.0 + 3.0 * _GA * h * h)
    return val, dval


def _ln_ff_bwd_kernel(x_ref, s_ref, bn_ref, w1_ref, h1_ref, w2_ref, g_ref,
                      dx_ref, ds_ref, dbn_ref, dw1_ref, db1_ref, dw2_ref,
                      db2_ref):
    """Fused backward of the PreNorm-FF residual branch on one token
    tile: the forward stashed the pre-GELU hidden h1 (no fc1 recompute
    GEMM), the LN is recomputed in VMEM (cheap VPU), the four backward
    GEMMs run on the MXU, and all weight/affine grads accumulate f32
    across the grid."""
    from istvt_tpu.kernels.linear import _ln_bwd_rows, _ln_stats
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        ds_ref[...] = jnp.zeros_like(ds_ref)
        dbn_ref[...] = jnp.zeros_like(dbn_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    x = x_ref[...]
    g = g_ref[...]
    s = s_ref[...].astype(jnp.float32)
    xhat, rstd = _ln_stats(x.astype(jnp.float32))
    y = (xhat * s + bn_ref[...].astype(jnp.float32)).astype(x.dtype)
    h1 = h1_ref[...].astype(jnp.float32)
    hg, dgelu = _gelu_tanh_and_grad(h1)
    hgb = hg.astype(x.dtype)

    dw2_ref[...] += jax.lax.dot_general(
        hgb, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db2_ref[...] += jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)
    dhg = jax.lax.dot_general(g, w2_ref[...], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dh1 = (dhg * dgelu)
    dh1b = dh1.astype(x.dtype)
    dw1_ref[...] += jax.lax.dot_general(
        y, dh1b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db1_ref[...] += jnp.sum(dh1, axis=0, keepdims=True)
    dy = jax.lax.dot_general(dh1b, w1_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds_ref[...] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    dbn_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
    dx = _ln_bwd_rows(dy, xhat, s, rstd) + g.astype(jnp.float32)
    dx_ref[...] = dx.astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ln_ff_bwd_impl(x, s, bn, w1, h1, w2, g, interpret: bool = False):
    from istvt_tpu.kernels.linear import _row_tiles
    n, d = x.shape
    dh = w1.shape[1]
    # tile 256: measured faster than 512 (155 -> 149 ms/step at B=8 —
    # the bigger tile's f32 hidden intermediates evict the VMEM-resident
    # weight-grad accumulators)
    np_, grid, tile = _row_tiles(n, max_tile=256)
    if np_ != n:
        x = jnp.pad(x, ((0, np_ - n), (0, 0)))
        g = jnp.pad(g, ((0, np_ - n), (0, 0)))
        h1 = jnp.pad(h1, ((0, np_ - n), (0, 0)))
    vd = pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    vh = pl.BlockSpec((1, dh), lambda i: (0, 0), memory_space=pltpu.VMEM)
    tok = pl.BlockSpec((tile, d), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    hid = pl.BlockSpec((tile, dh), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _ln_ff_bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((np_, d), x.dtype),      # dx
            jax.ShapeDtypeStruct((1, d), jnp.float32),    # ds
            jax.ShapeDtypeStruct((1, d), jnp.float32),    # dbn
            jax.ShapeDtypeStruct((d, dh), jnp.float32),   # dw1
            jax.ShapeDtypeStruct((1, dh), jnp.float32),   # db1
            jax.ShapeDtypeStruct((dh, d), jnp.float32),   # dw2
            jax.ShapeDtypeStruct((1, d), jnp.float32),    # db2
        ),
        grid=grid,
        in_specs=[
            tok, vd, vd,
            pl.BlockSpec((d, dh), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            hid,
            pl.BlockSpec((dh, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            tok,
        ],
        out_specs=(
            tok, vd, vd,
            pl.BlockSpec((d, dh), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            vh,
            pl.BlockSpec((dh, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            vd,
        ),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * np_ * d * dh,
            bytes_accessed=(3 * np_ * d + np_ * dh + 4 * d * dh)
            * x.dtype.itemsize,
            transcendentals=2 * np_ * dh,
        ),
    )(x, s.reshape(1, -1), bn.reshape(1, -1), w1, h1, w2, g)
    dx, ds, dbn, dw1, db1, dw2, db2 = outs
    return (dx[:n], ds.reshape(-1), dbn.reshape(-1), dw1,
            db1.reshape(-1), dw2, db2.reshape(-1))


def _ln_ff_res_bwd(res, g):
    x, s, bn, w1, b1, w2, b2, h1 = res
    if jax.default_backend() == "tpu":
        lead = x.shape[:-1]
        flat = x.reshape(-1, x.shape[-1])
        gf = g.reshape(-1, g.shape[-1])
        dx, ds, dbn, dw1, db1, dw2, db2 = _ln_ff_bwd_impl(
            flat, s.astype(x.dtype), bn.astype(x.dtype),
            w1.astype(x.dtype), h1, w2.astype(x.dtype), gf)
        return (dx.reshape(x.shape), ds.astype(s.dtype),
                dbn.astype(bn.dtype), dw1.astype(w1.dtype),
                db1.astype(b1.dtype), dw2.astype(w2.dtype),
                db2.astype(b2.dtype))
    _, vjp = jax.vjp(_ln_ff_res_reference, x, s, bn, w1, b1, w2, b2)
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
