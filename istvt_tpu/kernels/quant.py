"""Int8 serving kernels: W8A8 GEMMs for the ST-layer projections.

BASELINE.md's roofline: the 625 clips/s/chip serving target exceeds the
v5e bf16 MXU peak for ISTVT's ~0.5 TF/clip — int8 MXU throughput (2x) is
the only route. These kernels quantize exactly where the FLOPs are (the
12 ST layers' projection/FF GEMMs, ~90% of the model's compute) and keep
everything precision-sensitive in float: LayerNorm statistics, softmax,
GELU, residual stream, conv stem, and the attention cores all stay
bf16/f32 (reference numerics contract: network/vivit/module.py).

Scheme (standard dynamic W8A8):
  * weights  — per-OUTPUT-channel symmetric int8, scale_j = max|w[:, j]|/127,
    quantized once at load time (quantize_weight);
  * activations — per-ROW (per-token) symmetric int8, scale computed on
    the fly inside the kernel from the row amax — no calibration pass;
  * GEMM — int8 x int8 -> int32 on the MXU; epilogue rescales by
    row_scale x col_scale in f32 and applies bias/residual.

Serving-only: these kernels are not differentiable (use the bf16 path
for training); `models/istvt.py` selects them via ISTVTConfig.quantize.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from istvt_tpu.kernels.attention import _mh_attention_vmem, _pair_heads
from istvt_tpu.kernels.linear import _ln, _row_tiles, _vec_spec


def quantize_weight(w) -> tuple:
    """(D, K) float -> (int8 (D, K), f32 scales (K,)) per output channel."""
    w = jnp.asarray(w, jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return q, scale


def _quant_rows(yf):
    """f32 (R, D) -> (int8 (R, D), f32 row scales (R, 1))."""
    amax = jnp.max(jnp.abs(yf), axis=-1, keepdims=True)
    rs = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(yf / rs), -127, 127).astype(jnp.int8)
    return q, rs


def _q8_dot(q, wq):
    """int8 (R, D) x int8 (D, K) -> f32 (R, K) raw accumulator."""
    return jax.lax.dot_general(
        q, wq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)


def _ln_matmul_q8_kernel(x_ref, s_ref, b_ref, wq_ref, ws_ref, o_ref):
    x = x_ref[...]
    y = _ln(x.astype(jnp.float32), s_ref[...].astype(jnp.float32),
            b_ref[...].astype(jnp.float32))
    q, rs = _quant_rows(y)
    acc = _q8_dot(q, wq_ref[...])
    o = acc * rs * ws_ref[...].astype(jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ln_matmul_q8_impl(x, s, b, wq, ws, interpret: bool = False):
    n, d = x.shape
    k = wq.shape[1]
    np_, grid, tile = _row_tiles(n)
    if np_ != n:
        x = jnp.pad(x, ((0, np_ - n), (0, 0)))
    vec = _vec_spec
    out = pl.pallas_call(
        _ln_matmul_q8_kernel,
        out_shape=jax.ShapeDtypeStruct((np_, k), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            vec(s), vec(b),
            pl.BlockSpec((d, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vec(ws),
        ],
        out_specs=pl.BlockSpec((tile, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * np_ * d * k,
            bytes_accessed=np_ * (d + k) * x.dtype.itemsize + d * k,
            transcendentals=np_,
        ),
    )(x, s.reshape(1, -1), b.reshape(1, -1), wq, ws.reshape(1, -1))
    return out[:n]


def ln_matmul_q8(x, s, b, wq, ws):
    """LayerNorm(x) @ dequant(wq, ws): x (..., N, D) bf16/f32, wq int8
    (D, K), ws (K,) -> (..., N, K) in x.dtype. Activation rows quantize
    dynamically after the LN, inside VMEM."""
    lead = x.shape[:-1]
    flat = x.reshape(-1, x.shape[-1])
    interpret = jax.default_backend() != "tpu"
    out = _ln_matmul_q8_impl(flat, s, b, wq, ws, interpret=interpret)
    return out.reshape(*lead, wq.shape[1])


def _matmul_q8_kernel(x_ref, wq_ref, ws_ref, b_ref, o_ref):
    q, rs = _quant_rows(x_ref[...].astype(jnp.float32))
    acc = _q8_dot(q, wq_ref[...])
    o = acc * rs * ws_ref[...].astype(jnp.float32) \
        + b_ref[...].astype(jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


def _matmul_q8_res_kernel(x_ref, wq_ref, ws_ref, b_ref, r_ref, o_ref):
    q, rs = _quant_rows(x_ref[...].astype(jnp.float32))
    acc = _q8_dot(q, wq_ref[...])
    o = acc * rs * ws_ref[...].astype(jnp.float32) \
        + b_ref[...].astype(jnp.float32) + r_ref[...].astype(jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "has_res"))
def _matmul_q8_impl(x, wq, ws, b, r, interpret: bool = False,
                    has_res: bool = False):
    n, d = x.shape
    k = wq.shape[1]
    np_, grid, tile = _row_tiles(n)
    if np_ != n:
        x = jnp.pad(x, ((0, np_ - n), (0, 0)))
        if has_res:
            r = jnp.pad(r, ((0, np_ - n), (0, 0)))
    vec = _vec_spec
    in_specs = [
        pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        vec(ws), vec(b),
    ]
    args = [x, wq, ws.reshape(1, -1), b.reshape(1, -1)]
    kernel = _matmul_q8_kernel
    if has_res:
        in_specs.append(pl.BlockSpec((tile, k), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(r)
        kernel = _matmul_q8_res_kernel
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
            bytes_accessed=np_ * (d + k * (2 if has_res else 1))
            * x.dtype.itemsize + d * k,
            transcendentals=0,
        ),
    )(*args)
    return out[:n]


def matmul_q8_bias_residual(x, wq, ws, b, r=None):
    """x @ dequant(wq, ws) + b [+ r] — the int8 form of
    kernels/linear.matmul_bias_residual."""
    lead = x.shape[:-1]
    flat = x.reshape(-1, x.shape[-1])
    rf = r.reshape(-1, r.shape[-1]) if r is not None else None
    interpret = jax.default_backend() != "tpu"
    out = _matmul_q8_impl(flat, wq, ws, b, rf, interpret=interpret,
                          has_res=r is not None)
    return out.reshape(*lead, wq.shape[1])


def _ln_ff_q8_kernel(x_ref, s_ref, b_ref, w1q_ref, w1s_ref, b1_ref,
                     w2_ref, b2_ref, o_ref):
    """PreNorm FF residual branch: LN -> int8 GEMM1 -> GELU -> bf16
    GEMM2 -> + bias + x. GEMM2 deliberately stays bf16: requantizing the
    4x-wide GELU hidden costs more VPU time than the int8 MXU saves
    (profiled 1.27 ms vs bf16's 1.0 — the amax/round/clip chain over
    (tile, 2912) f32 dominates), and skipping it removes that
    quantization error entirely."""
    x = x_ref[...]
    y = _ln(x.astype(jnp.float32), s_ref[...].astype(jnp.float32),
            b_ref[...].astype(jnp.float32))
    q, rs = _quant_rows(y)
    h = _q8_dot(q, w1q_ref[...]) * rs * w1s_ref[...].astype(jnp.float32) \
        + b1_ref[...].astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=True).astype(x.dtype)
    o = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32) \
        + b2_ref[...].astype(jnp.float32)
    o_ref[...] = (o + x.astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ln_ff_q8_impl(x, s, b, w1q, w1s, b1, w2, b2,
                   interpret: bool = False):
    n, d = x.shape
    hdim = w1q.shape[1]
    np_, grid, tile = _row_tiles(n, max_tile=256)
    if np_ != n:
        x = jnp.pad(x, ((0, np_ - n), (0, 0)))
    vec = _vec_spec
    out = pl.pallas_call(
        _ln_ff_q8_kernel,
        out_shape=jax.ShapeDtypeStruct((np_, d), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            vec(s), vec(b),
            pl.BlockSpec((d, hdim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            vec(w1s), vec(b1),
            pl.BlockSpec((hdim, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            vec(b2),
        ],
        out_specs=pl.BlockSpec((tile, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * np_ * d * hdim,
            bytes_accessed=2 * np_ * d * x.dtype.itemsize + 2 * d * hdim,
            transcendentals=np_ * hdim,
        ),
    )(x, s.reshape(1, -1), b.reshape(1, -1), w1q, w1s.reshape(1, -1),
      b1.reshape(1, -1), w2.astype(x.dtype), b2.reshape(1, -1))
    return out[:n]


def ln_ff_residual_q8(x, s, b, w1q, w1s, b1, w2, b2):
    """Mixed int8/bf16 form of kernels/mlp.ln_ff_residual: int8 fc1,
    bf16 fc2 (see kernel docstring for why fc2 stays float)."""
    lead = x.shape[:-1]
    flat = x.reshape(-1, x.shape[-1])
    interpret = jax.default_backend() != "tpu"
    out = _ln_ff_q8_impl(flat, s, b, w1q, w1s, b1, w2, b2,
                         interpret=interpret)
    return out.reshape(*lead, x.shape[-1])


def _ln_ff_q8_full_kernel(x_ref, s_ref, b_ref, w1q_ref, w1s_ref, b1_ref,
                          w2q_ref, w2s_ref, b2_ref, o_ref):
    """Fully-int8 FF variant (both GEMMs W8A8, GELU hidden requantized).
    Kept alongside the mixed kernel for A/B measurement — see
    _ln_ff_q8_kernel's docstring for the tradeoff."""
    x = x_ref[...]
    y = _ln(x.astype(jnp.float32), s_ref[...].astype(jnp.float32),
            b_ref[...].astype(jnp.float32))
    q, rs = _quant_rows(y)
    h = _q8_dot(q, w1q_ref[...]) * rs * w1s_ref[...].astype(jnp.float32) \
        + b1_ref[...].astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=True)
    q2, rs2 = _quant_rows(h)
    o = _q8_dot(q2, w2q_ref[...]) * rs2 * w2s_ref[...].astype(jnp.float32) \
        + b2_ref[...].astype(jnp.float32)
    o_ref[...] = (o + x.astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ln_ff_q8_full_impl(x, s, b, w1q, w1s, b1, w2q, w2s, b2,
                        interpret: bool = False):
    n, d = x.shape
    hdim = w1q.shape[1]
    np_, grid, tile = _row_tiles(n, max_tile=256)
    if np_ != n:
        x = jnp.pad(x, ((0, np_ - n), (0, 0)))
    vec = _vec_spec
    out = pl.pallas_call(
        _ln_ff_q8_full_kernel,
        out_shape=jax.ShapeDtypeStruct((np_, d), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            vec(s), vec(b),
            pl.BlockSpec((d, hdim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            vec(w1s), vec(b1),
            pl.BlockSpec((hdim, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            vec(w2s), vec(b2),
        ],
        out_specs=pl.BlockSpec((tile, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * np_ * d * hdim,
            bytes_accessed=2 * np_ * d * x.dtype.itemsize + 2 * d * hdim,
            transcendentals=np_ * hdim,
        ),
    )(x, s.reshape(1, -1), b.reshape(1, -1), w1q, w1s.reshape(1, -1),
      b1.reshape(1, -1), w2q, w2s.reshape(1, -1), b2.reshape(1, -1))
    return out[:n]


def ln_ff_residual_q8_full(x, s, b, w1q, w1s, b1, w2q, w2s, b2):
    """Fully-int8 FF (see ln_ff_residual_q8 for the default mixed form)."""
    lead = x.shape[:-1]
    flat = x.reshape(-1, x.shape[-1])
    interpret = jax.default_backend() != "tpu"
    out = _ln_ff_q8_full_impl(flat, s, b, w1q, w1s, b1, w2q, w2s, b2,
                              interpret=interpret)
    return out.reshape(*lead, x.shape[-1])


# ---------------------------------------------------------------------------
# Layer-boundary fusions (round 3): the int8 layer chain used to write
# two (N, 728) intermediates to HBM per layer purely to re-read them in
# the NEXT kernel — the temporal out-projection's result (consumed only
# by the spatial LN+QKV GEMM) and the spatial out-projection's result
# (consumed only by the FF block, which also needs it as its residual).
# Fusing each boundary keeps the 728-wide stream in VMEM registers:
# 2 x (write+read) x 60 MB x 12 layers ~ 3.6 ms/batch of HBM traffic
# gone. The quantization points are IDENTICAL to the unfused chain; the
# only numeric change is that the intermediate stays f32 instead of
# taking a bf16 round trip (slightly MORE accurate).


def _mm_q8_ln_mm_q8_kernel(a_ref, wq1_ref, ws1_ref, b1_ref, s_ref, b_ref,
                           wq2_ref, ws2_ref, o_ref):
    """out-proj (W8A8) -> LayerNorm -> QKV GEMM (W8A8), one pass."""
    q, rs = _quant_rows(a_ref[...].astype(jnp.float32))
    y = _q8_dot(q, wq1_ref[...]) * rs * ws1_ref[...].astype(jnp.float32) \
        + b1_ref[...].astype(jnp.float32)
    h = _ln(y, s_ref[...].astype(jnp.float32),
            b_ref[...].astype(jnp.float32))
    q2, rs2 = _quant_rows(h)
    o = _q8_dot(q2, wq2_ref[...]) * rs2 * ws2_ref[...].astype(jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mm_q8_ln_mm_q8_impl(a, wq1, ws1, b1, s, b, wq2, ws2,
                         interpret: bool = False):
    n, d_in = a.shape
    d_mid = wq1.shape[1]
    k = wq2.shape[1]
    np_, grid, tile = _row_tiles(n)
    if np_ != n:
        a = jnp.pad(a, ((0, np_ - n), (0, 0)))
    vec = _vec_spec
    out = pl.pallas_call(
        _mm_q8_ln_mm_q8_kernel,
        out_shape=jax.ShapeDtypeStruct((np_, k), a.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, d_in), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, d_mid), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            vec(ws1), vec(b1), vec(s), vec(b),
            pl.BlockSpec((d_mid, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            vec(ws2),
        ],
        out_specs=pl.BlockSpec((tile, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * np_ * d_mid * (d_in + k),
            bytes_accessed=np_ * (d_in + k) * a.dtype.itemsize
            + d_in * d_mid + d_mid * k,
            transcendentals=np_,
        ),
    )(a, wq1, ws1.reshape(1, -1), b1.reshape(1, -1), s.reshape(1, -1),
      b.reshape(1, -1), wq2, ws2.reshape(1, -1))
    return out[:n]


def matmul_q8_ln_matmul_q8(a, wq1, ws1, b1, s, b, wq2, ws2):
    """a @ dq(wq1) + b1 -> LN -> @ dq(wq2): the fused t-out-proj ->
    spatial-LN -> spatial-QKV boundary; the (N, 728) intermediate never
    touches HBM. a: (..., N, d_in) -> (..., N, wq2.shape[1])."""
    lead = a.shape[:-1]
    flat = a.reshape(-1, a.shape[-1])
    interpret = jax.default_backend() != "tpu"
    out = _mm_q8_ln_mm_q8_impl(flat, wq1, ws1, b1, s, b, wq2, ws2,
                               interpret=interpret)
    return out.reshape(*lead, wq2.shape[1])


def _mm_q8_res_ln_ff_q8_kernel(a_ref, r_ref, wqo_ref, wso_ref, bo_ref,
                               s_ref, b_ref, w1q_ref, w1s_ref, b1_ref,
                               w2q_ref, w2s_ref, b2_ref, o_ref):
    """out-proj (W8A8) + residual -> PreNorm fully-int8 FF, one pass."""
    q, rs = _quant_rows(a_ref[...].astype(jnp.float32))
    y = _q8_dot(q, wqo_ref[...]) * rs * wso_ref[...].astype(jnp.float32) \
        + bo_ref[...].astype(jnp.float32) \
        + r_ref[...].astype(jnp.float32)
    h = _ln(y, s_ref[...].astype(jnp.float32),
            b_ref[...].astype(jnp.float32))
    q1, rs1 = _quant_rows(h)
    hid = _q8_dot(q1, w1q_ref[...]) * rs1 \
        * w1s_ref[...].astype(jnp.float32) \
        + b1_ref[...].astype(jnp.float32)
    hid = jax.nn.gelu(hid, approximate=True)
    q2, rs2 = _quant_rows(hid)
    o = _q8_dot(q2, w2q_ref[...]) * rs2 \
        * w2s_ref[...].astype(jnp.float32) \
        + b2_ref[...].astype(jnp.float32)
    o_ref[...] = (o + y).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mm_q8_res_ln_ff_q8_impl(a, r, wqo, wso, bo, s, b, w1q, w1s, b1,
                             w2q, w2s, b2, interpret: bool = False):
    n, d_in = a.shape
    d = wqo.shape[1]
    hdim = w1q.shape[1]
    np_, grid, tile = _row_tiles(n, max_tile=256)
    if np_ != n:
        a = jnp.pad(a, ((0, np_ - n), (0, 0)))
        r = jnp.pad(r, ((0, np_ - n), (0, 0)))
    vec = _vec_spec
    out = pl.pallas_call(
        _mm_q8_res_ln_ff_q8_kernel,
        out_shape=jax.ShapeDtypeStruct((np_, d), a.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, d_in), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            vec(wso), vec(bo), vec(s), vec(b),
            pl.BlockSpec((d, hdim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            vec(w1s), vec(b1),
            pl.BlockSpec((hdim, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            vec(w2s), vec(b2),
        ],
        out_specs=pl.BlockSpec((tile, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * np_ * d * (d_in + 4 * hdim // 2) + 2 * np_ * d * hdim,
            bytes_accessed=np_ * (d_in + 2 * d) * a.dtype.itemsize
            + d_in * d + 2 * d * hdim,
            transcendentals=np_ * hdim,
        ),
    )(a, r, wqo, wso.reshape(1, -1), bo.reshape(1, -1), s.reshape(1, -1),
      b.reshape(1, -1), w1q, w1s.reshape(1, -1), b1.reshape(1, -1),
      w2q, w2s.reshape(1, -1), b2.reshape(1, -1))
    return out[:n]


def matmul_q8_res_ln_ff_q8_full(a, r, wqo, wso, bo, s, b, w1q, w1s, b1,
                                w2q, w2s, b2):
    """y = a @ dq(wqo) + bo + r;  return y + FF_int8(LN(y)) — the fused
    spatial-out-proj -> residual -> PreNorm-FF boundary; y never touches
    HBM. a: (..., N, d_in), r: (..., N, d) -> (..., N, d)."""
    lead = a.shape[:-1]
    fa = a.reshape(-1, a.shape[-1])
    fr = r.reshape(-1, r.shape[-1])
    interpret = jax.default_backend() != "tpu"
    out = _mm_q8_res_ln_ff_q8_impl(fa, fr, wqo, wso, bo, s, b, w1q, w1s,
                                   b1, w2q, w2s, b2, interpret=interpret)
    return out.reshape(*lead, wqo.shape[1])


# ---------------------------------------------------------------------------
# Int8-ingest attention kernels (round 3, stage 2): the boundary-fused
# chain above still writes each layer's packed-qkv tensors to HBM
# (2 x (N, 3I) bf16 ~ 126 MB each at B=16) purely so the attention
# kernels can read them back. Fusing the producing GEMMs INTO the
# attention kernels keeps qkv entirely in VMEM:
#   * temporal: LN -> QKV (W8A8) -> self-subtract attention, one kernel
#     per batch element (kernels/attention._temporal_packed_kernel math);
#   * spatial: t-out-proj (W8A8) + bias -> LN -> QKV (W8A8) -> per-frame
#     attention, one kernel per (batch, frame)
#     (kernels/attention._attn_kernel_mh_packed math).
# ~2 x 252 MB/layer of HBM traffic gone (~6 GB/batch over 12 layers).
# Quantization points and attention math are IDENTICAL to the composed
# chain; qkv is cast to the activation dtype in VMEM exactly where the
# composed chain's HBM round trip cast it. Serving-only (no vjp).
# Reference numerics contract: network/vivit/module.py:66-93,174-208.


def _ln_qkv_q8_temporal_kernel(x_ref, s_ref, b_ref, wq_ref, ws_ref,
                               o_ref, qs_ref, ks_ref, vs_ref, *,
                               scale: float, heads: int, inner: int):
    """x (1, T1, S, D) -> LN -> int8 QKV GEMM -> packed self-subtract
    temporal attention -> (1, T1, S, I). Segmented lane-reduce scheme
    mirrors kernels/attention._temporal_packed_kernel."""
    t1, s_len, d = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    xf = x_ref[0].reshape(t1 * s_len, d).astype(jnp.float32)
    y = _ln(xf, s_ref[...].astype(jnp.float32),
            b_ref[...].astype(jnp.float32))
    qx, rs = _quant_rows(y)
    acc = _q8_dot(qx, wq_ref[...]) * rs * ws_ref[...].astype(jnp.float32)
    qkv = acc.reshape(t1, s_len, 3 * inner).astype(qs_ref.dtype)
    q = qkv[..., :inner]
    k = qkv[..., inner:2 * inner]
    qs_ref[:] = jnp.concatenate([q[:2], q[2:] - q[1:-1]], axis=0)
    ks_ref[:] = jnp.concatenate([k[:2], k[2:] - k[1:-1]], axis=0)
    vs_ref[:] = qkv[..., 2 * inner:]
    dh = inner // heads
    m_seg = (jax.lax.broadcasted_iota(jnp.int32, (inner, heads), 0) // dh
             == jax.lax.broadcasted_iota(jnp.int32, (inner, heads), 1)
             ).astype(jnp.float32)               # (I, H)
    e_exp = (jax.lax.broadcasted_iota(jnp.int32, (heads, inner), 1) // dh
             == jax.lax.broadcasted_iota(jnp.int32, (heads, inner), 0)
             ).astype(jnp.float32)               # (H, I)

    def body(i, _):
        qi = qs_ref[i].astype(jnp.float32)       # (S, I)
        ls = []
        for j in range(t1):
            pj = qi * ks_ref[j].astype(jnp.float32)
            ls.append(jax.lax.dot_general(
                pj, m_seg, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale)   # (S, H)
        m = ls[0]
        for j in range(1, t1):
            m = jnp.maximum(m, ls[j])
        es = [jnp.exp(l - m) for l in ls]
        den = es[0]
        for j in range(1, t1):
            den = den + es[j]
        acc_o = None
        for j in range(t1):
            w = jax.lax.dot_general(
                es[j], e_exp, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # (S, I)
            vj = vs_ref[j].astype(jnp.float32)
            term = w * vj
            acc_o = term if acc_o is None else acc_o + term
        dnb = jax.lax.dot_general(
            den, e_exp, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, i] = (acc_o / dnb).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, t1, body, 0)


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def _ln_qkv_q8_temporal_impl(x, s, b, wq, ws, heads: int,
                             interpret: bool = False):
    bsz, t1, s_len, d = x.shape
    i3 = wq.shape[1]
    inner = i3 // 3
    dh = inner // heads
    scale = dh ** -0.5
    vec = _vec_spec
    return pl.pallas_call(
        functools.partial(_ln_qkv_q8_temporal_kernel, scale=scale,
                          heads=heads, inner=inner),
        out_shape=jax.ShapeDtypeStruct((bsz, t1, s_len, inner), x.dtype),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, t1, s_len, d), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            vec(s), vec(b),
            pl.BlockSpec((d, i3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            vec(ws),
        ],
        out_specs=pl.BlockSpec((1, t1, s_len, inner),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((t1, s_len, inner), x.dtype)] * 3,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * t1 * s_len * d * i3
            + 2 * 2 * bsz * t1 * t1 * s_len * inner,
            bytes_accessed=bsz * t1 * s_len * (d + inner)
            * x.dtype.itemsize + d * i3,
            transcendentals=bsz * t1 * s_len * (1 + t1 * heads),
        ),
    )(x, s.reshape(1, -1), b.reshape(1, -1), wq, ws.reshape(1, -1))


def ln_qkv_q8_temporal_attention(x, s, b, wq, ws, heads: int):
    """Fused LN -> int8 QKV -> self-subtract temporal attention:
    x (B, T1, S, D) -> (B, T1, S, I); the (N, 3I) packed qkv never
    touches HBM. Equals ln_matmul_q8 + temporal_attention_packed."""
    interpret = jax.default_backend() != "tpu"
    return _ln_qkv_q8_temporal_impl(x, s, b, wq, ws, heads,
                                    interpret=interpret)


def _mm_q8_ln_qkv_q8_spatial_kernel(a_ref, woq_ref, wos_ref, bo_ref,
                                    s_ref, b_ref, wq_ref, ws_ref, o_ref,
                                    *, scale: float, heads: int,
                                    inner: int, n_valid: int):
    """a (1, S, I_in) -> t-out-proj (W8A8) + bias -> LN -> int8 QKV GEMM
    -> per-frame multi-head attention -> (1, S, I). Head/q/k/v selection
    and pad-key masking mirror kernels/attention._attn_kernel_mh_packed."""
    af = a_ref[0].astype(jnp.float32)            # (S, I_in)
    qa, rsa = _quant_rows(af)
    y = _q8_dot(qa, woq_ref[...]) * rsa * wos_ref[...].astype(jnp.float32) \
        + bo_ref[...].astype(jnp.float32)
    hn = _ln(y, s_ref[...].astype(jnp.float32),
             b_ref[...].astype(jnp.float32))
    qh, rsh = _quant_rows(hn)
    x = (_q8_dot(qh, wq_ref[...]) * rsh
         * ws_ref[...].astype(jnp.float32)).astype(o_ref.dtype)  # (S, 3I)
    dh = inner // heads
    s_len = x.shape[0]
    mask = None
    if n_valid < s_len:
        cols = jax.lax.broadcasted_iota(jnp.int32, (s_len, s_len), 1)
        mask = jnp.where(cols < n_valid, 0.0, -1e30).astype(jnp.float32)
    _mh_attention_vmem(x[:, :inner], x[:, inner:2 * inner],
                       x[:, 2 * inner:], o_ref, heads, scale, mask,
                       pair=_pair_heads(heads, dh, inner))


@functools.partial(jax.jit,
                   static_argnames=("heads", "n_valid", "interpret"))
def _mm_q8_ln_qkv_q8_spatial_impl(a, woq, wos, bo, s, b, wq, ws,
                                  heads: int, n_valid: int,
                                  interpret: bool = False):
    g, s_len, d_in = a.shape
    d_mid = woq.shape[1]
    i3 = wq.shape[1]
    inner = i3 // 3
    dh = inner // heads
    scale = dh ** -0.5
    vec = _vec_spec
    return pl.pallas_call(
        functools.partial(_mm_q8_ln_qkv_q8_spatial_kernel, scale=scale,
                          heads=heads, inner=inner, n_valid=n_valid),
        out_shape=jax.ShapeDtypeStruct((g, s_len, inner), a.dtype),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, s_len, d_in), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, d_mid), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            vec(wos), vec(bo), vec(s), vec(b),
            pl.BlockSpec((d_mid, i3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            vec(ws),
        ],
        out_specs=pl.BlockSpec((1, s_len, inner), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * g * s_len * d_mid * (d_in + i3)
            + 2 * 2 * g * heads * s_len * s_len * dh,
            bytes_accessed=g * s_len * (d_in + inner) * a.dtype.itemsize
            + d_in * d_mid + d_mid * i3,
            transcendentals=g * s_len * (1 + heads * s_len),
        ),
    )(a, woq, wos.reshape(1, -1), bo.reshape(1, -1), s.reshape(1, -1),
      b.reshape(1, -1), wq, ws.reshape(1, -1))


def mm_q8_ln_qkv_q8_spatial_attention(a, woq, wos, bo, s, b, wq, ws,
                                      heads: int, n_valid: int = -1):
    """Fused t-out-proj (W8A8) -> LN -> int8 QKV -> spatial attention:
    a (G, S, I_in) -> (G, S, I); neither the (N, 728) out-proj result nor
    the (N, 3I) packed qkv touches HBM. Equals matmul_q8_ln_matmul_q8 +
    spatial_attention_packed."""
    if n_valid < 0:
        n_valid = a.shape[1]
    interpret = jax.default_backend() != "tpu"
    return _mm_q8_ln_qkv_q8_spatial_impl(a, woq, wos, bo, s, b, wq, ws,
                                         heads, n_valid,
                                         interpret=interpret)


# ---------------------------------------------------------------------------
# Whole-layer mega-kernel (round 3, stage 3): one pallas_call per ST
# layer per batch element. Beyond the ingest fusions above, the
# temporal-attention output a_t, the spatial qkv, the spatial-attention
# output a_s, AND the residual re-read of x all stay in VMEM — per layer
# the only HBM traffic left is read x + write x' (~120 MB/batch vs ~348
# for the 3-kernel ingest chain). Same quantization points; the
# attention/FF math is the composition of the kernels above.
# Reference layer law: x = attn_s(attn_t(x)) + x, PreNorm FF residual
# (network/vivit/vivit.py:85-101, module.py:23-93,174-208).


def _st_layer_q8_kernel(x_ref, st_ref, bt_ref, wqt_ref, wst_ref,
                        wot_ref, sot_ref, bot_ref,
                        ss_ref, bs_ref, wqs_ref, wss_ref,
                        wos_ref, sos_ref, bos_ref,
                        sf_ref, bf_ref, w1q_ref, w1s_ref, b1_ref,
                        w2q_ref, w2s_ref, b2_ref, o_ref,
                        qs_ref, ks_ref, vs_ref, at_ref, qkvs_ref, as_ref,
                        *, scale: float, heads: int, inner: int,
                        n_valid: int):
    t1, s_len, d = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    n = t1 * s_len
    dh = inner // heads
    x = x_ref[0].reshape(n, d)
    # --- temporal branch: LN -> int8 QKV -> self-subtract attention ---
    y = _ln(x.astype(jnp.float32), st_ref[...].astype(jnp.float32),
            bt_ref[...].astype(jnp.float32))
    qx, rs = _quant_rows(y)
    acc = _q8_dot(qx, wqt_ref[...]) * rs * wst_ref[...].astype(jnp.float32)
    qkv = acc.reshape(t1, s_len, 3 * inner).astype(qs_ref.dtype)
    q = qkv[..., :inner]
    k = qkv[..., inner:2 * inner]
    qs_ref[:] = jnp.concatenate([q[:2], q[2:] - q[1:-1]], axis=0)
    ks_ref[:] = jnp.concatenate([k[:2], k[2:] - k[1:-1]], axis=0)
    vs_ref[:] = qkv[..., 2 * inner:]
    m_seg = (jax.lax.broadcasted_iota(jnp.int32, (inner, heads), 0) // dh
             == jax.lax.broadcasted_iota(jnp.int32, (inner, heads), 1)
             ).astype(jnp.float32)
    e_exp = (jax.lax.broadcasted_iota(jnp.int32, (heads, inner), 1) // dh
             == jax.lax.broadcasted_iota(jnp.int32, (heads, inner), 0)
             ).astype(jnp.float32)

    def t_body(i, _):
        qi = qs_ref[i].astype(jnp.float32)
        ls = []
        for j in range(t1):
            pj = qi * ks_ref[j].astype(jnp.float32)
            ls.append(jax.lax.dot_general(
                pj, m_seg, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale)
        m = ls[0]
        for j in range(1, t1):
            m = jnp.maximum(m, ls[j])
        es = [jnp.exp(l - m) for l in ls]
        den = es[0]
        for j in range(1, t1):
            den = den + es[j]
        acc_o = None
        for j in range(t1):
            w = jax.lax.dot_general(
                es[j], e_exp, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            term = w * vs_ref[j].astype(jnp.float32)
            acc_o = term if acc_o is None else acc_o + term
        dnb = jax.lax.dot_general(
            den, e_exp, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        at_ref[i] = (acc_o / dnb).astype(at_ref.dtype)
        return 0

    jax.lax.fori_loop(0, t1, t_body, 0)
    # --- spatial branch: out-proj -> LN -> int8 QKV -> per-frame attn ---
    a_t = at_ref[:].reshape(n, inner).astype(jnp.float32)
    qa, rsa = _quant_rows(a_t)
    yt = _q8_dot(qa, wot_ref[...]) * rsa * sot_ref[...].astype(jnp.float32) \
        + bot_ref[...].astype(jnp.float32)
    hs = _ln(yt, ss_ref[...].astype(jnp.float32),
             bs_ref[...].astype(jnp.float32))
    qh, rsh = _quant_rows(hs)
    qkvs = (_q8_dot(qh, wqs_ref[...]) * rsh
            * wss_ref[...].astype(jnp.float32)).astype(qkvs_ref.dtype)
    qkvs_ref[:] = qkvs.reshape(t1, s_len, 3 * inner)
    mask = None
    if n_valid < s_len:
        cols = jax.lax.broadcasted_iota(jnp.int32, (s_len, s_len), 1)
        mask = jnp.where(cols < n_valid, 0.0, -1e30).astype(jnp.float32)

    def _one_head(qf, kf, vf):
        sc = jax.lax.dot_general(
            qf, kf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if mask is not None:
            sc = sc + mask
        pr = jax.nn.softmax(sc, axis=-1)
        return jnp.dot(pr.astype(vf.dtype), vf,
                       preferred_element_type=jnp.float32)

    def s_body(j, _):
        xf = qkvs_ref[j]                          # (S, 3I)
        if not _pair_heads(heads, dh, inner):
            for h in range(heads):
                o = _one_head(
                    xf[:, h * dh:(h + 1) * dh],
                    xf[:, inner + h * dh:inner + (h + 1) * dh],
                    xf[:, 2 * inner + h * dh:2 * inner + (h + 1) * dh])
                as_ref[j, :, h * dh:(h + 1) * dh] = o.astype(as_ref.dtype)
            return 0
        # aligned head-pair path (see attention._pair_heads): 128-lane
        # slices, other head's K/V lanes zero-masked — bitwise equal.
        lane = jax.lax.broadcasted_iota(jnp.int32, (s_len, 2 * dh), 1)
        lo = lane < dh
        for p_ in range(heads // 2):
            qp = xf[:, p_ * 128:(p_ + 1) * 128]
            kp = xf[:, inner + p_ * 128:inner + (p_ + 1) * 128]
            vp = xf[:, 2 * inner + p_ * 128:2 * inner + (p_ + 1) * 128]
            o_pair = None
            for half in (lo, ~lo):
                k_m = jnp.where(half, kp, 0).astype(kp.dtype)
                v_m = jnp.where(half, vp, 0).astype(vp.dtype)
                o = _one_head(qp, k_m, v_m)
                o_pair = o if o_pair is None else o_pair + o
            as_ref[j, :, p_ * 128:(p_ + 1) * 128] = \
                o_pair.astype(as_ref.dtype)
        return 0

    jax.lax.fori_loop(0, t1, s_body, 0)
    # --- out-proj + residual -> PreNorm fully-int8 FF ---
    a_s = as_ref[:].reshape(n, inner).astype(jnp.float32)
    qo, rso = _quant_rows(a_s)
    yr = _q8_dot(qo, wos_ref[...]) * rso * sos_ref[...].astype(jnp.float32) \
        + bos_ref[...].astype(jnp.float32) + x.astype(jnp.float32)
    hf = _ln(yr, sf_ref[...].astype(jnp.float32),
             bf_ref[...].astype(jnp.float32))
    q1, rs1 = _quant_rows(hf)
    hid = _q8_dot(q1, w1q_ref[...]) * rs1 \
        * w1s_ref[...].astype(jnp.float32) \
        + b1_ref[...].astype(jnp.float32)
    hid = jax.nn.gelu(hid, approximate=True)
    q2, rs2 = _quant_rows(hid)
    out = _q8_dot(q2, w2q_ref[...]) * rs2 \
        * w2s_ref[...].astype(jnp.float32) \
        + b2_ref[...].astype(jnp.float32)
    o_ref[0] = (out + yr).reshape(t1, s_len, d).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "n_valid",
                                             "interpret"))
def _st_layer_q8_impl(x, st, bt, wqt, wst, wot, sot, bot,
                      ss, bs, wqs, wss, wos, sos, bos,
                      sf, bf, w1q, w1s, b1, w2q, w2s, b2,
                      heads: int, n_valid: int, interpret: bool = False):
    bsz, t1, s_len, d = x.shape
    i3 = wqt.shape[1]
    inner = i3 // 3
    hdim = w1q.shape[1]
    dh = inner // heads
    scale = dh ** -0.5
    vec = _vec_spec
    mat = lambda w: pl.BlockSpec(w.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((1, t1, s_len, d), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    n = t1 * s_len
    return pl.pallas_call(
        functools.partial(_st_layer_q8_kernel, scale=scale, heads=heads,
                          inner=inner, n_valid=n_valid),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(bsz,),
        in_specs=[
            blk,
            vec(st), vec(bt), mat(wqt), vec(wst),
            mat(wot), vec(sot), vec(bot),
            vec(ss), vec(bs), mat(wqs), vec(wss),
            mat(wos), vec(sos), vec(bos),
            vec(sf), vec(bf), mat(w1q), vec(w1s), vec(b1),
            mat(w2q), vec(w2s), vec(b2),
        ],
        out_specs=blk,
        scratch_shapes=[
            pltpu.VMEM((t1, s_len, inner), x.dtype),   # qs
            pltpu.VMEM((t1, s_len, inner), x.dtype),   # ks
            pltpu.VMEM((t1, s_len, inner), x.dtype),   # vs
            pltpu.VMEM((t1, s_len, inner), x.dtype),   # a_t
            pltpu.VMEM((t1, s_len, 3 * inner), x.dtype),  # qkv_s
            pltpu.VMEM((t1, s_len, inner), x.dtype),   # a_s
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * n * (d * i3 + inner * d + d * i3
                                 + inner * d + 2 * d * hdim)
            + 2 * 2 * bsz * t1 * t1 * s_len * inner
            + 2 * 2 * bsz * t1 * heads * s_len * s_len * dh,
            bytes_accessed=2 * bsz * n * d * x.dtype.itemsize
            + 2 * d * i3 + 2 * inner * d + 2 * d * hdim,
            transcendentals=bsz * n * (3 + t1 * heads + heads * s_len
                                       + hdim),
        ),
    )(x, st.reshape(1, -1), bt.reshape(1, -1), wqt, wst.reshape(1, -1),
      wot, sot.reshape(1, -1), bot.reshape(1, -1),
      ss.reshape(1, -1), bs.reshape(1, -1), wqs, wss.reshape(1, -1),
      wos, sos.reshape(1, -1), bos.reshape(1, -1),
      sf.reshape(1, -1), bf.reshape(1, -1), w1q, w1s.reshape(1, -1),
      b1.reshape(1, -1), w2q, w2s.reshape(1, -1), b2.reshape(1, -1))


def st_layer_q8(x, layer, heads: int, n_valid: int = -1):
    """One full int8 ST layer (temporal attn -> spatial attn -> FF, all
    residual/PreNorm plumbing included) as a single Pallas program per
    batch element: x (B, T1, S, D) -> (B, T1, S, D). `layer` is the
    quantized param subtree (attn_t/attn_s/ff with 'q8' leaves)."""
    if n_valid < 0:
        n_valid = x.shape[2]
    at, asp, pf = layer["attn_t"], layer["attn_s"], layer["ff"]
    q_t, q_s, q_f = at["q8"], asp["q8"], pf["q8"]
    interpret = jax.default_backend() != "tpu"
    return _st_layer_q8_impl(
        x, at["norm"]["scale"], at["norm"]["bias"],
        q_t["qkv_wq"], q_t["qkv_ws"],
        q_t["out_wq"], q_t["out_ws"], at["to_out"]["b"],
        asp["norm"]["scale"], asp["norm"]["bias"],
        q_s["qkv_wq"], q_s["qkv_ws"],
        q_s["out_wq"], q_s["out_ws"], asp["to_out"]["b"],
        pf["norm"]["scale"], pf["norm"]["bias"],
        q_f["w1q"], q_f["w1s"], pf["fc1"]["b"],
        q_f["w2q"], q_f["w2s"], pf["fc2"]["b"],
        heads, n_valid, interpret=interpret)
