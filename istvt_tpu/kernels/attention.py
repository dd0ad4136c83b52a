"""Pallas TPU kernels: fused decomposed-attention for ISTVT.

The hot spatial attention (reference module.py:66-93) materializes
(B, T+1, H, S, S) f32 score/prob tensors in HBM under plain XLA —
~470 MB per layer at the paper geometry (B=16, S=362). This kernel keeps
the whole (S, S) attention for one (batch·frame, head) in VMEM:

    scores = q k^T * scale   (MXU, f32 accumulation)
    probs  = softmax(scores) (VPU, f32)
    out    = probs v         (MXU)

S=362, dh=64 -> q/k/v tiles ~139 KB + f32 scores ~524 KB per program:
comfortably inside the ~16 MB VMEM budget, so no streaming (flash) pass
is needed; the grid runs one program per (B·(T+1), H).

The kernel reads the contiguous (G, S, H, dh) projection layout directly
(BlockSpec strides over H) — no host-side head transpose is materialized.

The temporal self-subtract attention (reference module.py:174-208) is NOT
a kernel: its score matrices are (T+1)² = 49 floats per location (tiny),
and its real cost is the projections, which stay as one fused XLA matmul —
see nn/attention.py `temporal_residual_attention` (the self-subtract
commutes with the pointwise projection, so QK/V share one GEMM).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]                                # (S, dh)
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale       # (S, S) f32
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.dot(p.astype(v.dtype), v,
                preferred_element_type=jnp.float32)       # (S, dh)
    o_ref[0] = o.astype(o_ref.dtype)


def _pair_heads(heads: int, dh: int, inner: int) -> bool:
    """True when the per-head q/k/v column slices can be processed as
    128-lane head PAIRS: dh=64 puts every odd head's slice at a 64-lane
    offset, and Mosaic materializes each misaligned (S, 64) slice with
    lane-rotate ops — measured ~0.33 ms/layer at S=368, B=32 (r3
    interleaved A/B, docs/KERNELS.md). Pairing reads aligned (S, 128)
    tiles instead and isolates each head by zero-masking the OTHER
    head's K/V lanes: zeros in K kill the cross-head score terms
    exactly, and the two PV products concatenate into one aligned
    (S, 128) output write. MXU cycles are identical (ceil(64/128) ==
    ceil(128/128) per tile); numerics are bitwise equal."""
    return dh == 64 and heads % 2 == 0 and inner % 128 == 0


def _mh_attention_vmem(q, k, v, o_ref, heads: int, scale: float, mask,
                       pair: bool):
    """Multi-head softmax attention on VMEM values q/k/v (S, H*dh),
    writing o_ref[0, :, :] (1, S, H*dh). mask: optional (S, S) additive
    f32 key mask. pair=True takes the aligned head-pair path."""
    s_len, hd = q.shape
    dh = hd // heads

    def one_head(qh, kh, vh):
        sc = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # (S, S) f32
        if mask is not None:
            sc = sc + mask
        pr = jax.nn.softmax(sc, axis=-1)
        return jnp.dot(pr.astype(vh.dtype), vh,
                       preferred_element_type=jnp.float32)

    if not pair:
        for h in range(heads):                  # static unroll
            sl = slice(h * dh, (h + 1) * dh)
            o = one_head(q[:, sl], k[:, sl], v[:, sl])
            o_ref[0, :, sl] = o.astype(o_ref.dtype)
        return
    lane = jax.lax.broadcasted_iota(jnp.int32, (s_len, 2 * dh), 1)
    lo = lane < dh
    for p in range(heads // 2):
        sl = slice(p * 128, (p + 1) * 128)
        qp, kp, vp = q[:, sl], k[:, sl], v[:, sl]
        o_pair = None
        for half in (lo, ~lo):
            k_m = jnp.where(half, kp, 0).astype(kp.dtype)
            v_m = jnp.where(half, vp, 0).astype(vp.dtype)
            o = one_head(qp, k_m, v_m)
            o_pair = o if o_pair is None else o_pair + o
        o_ref[0, :, sl] = o_pair.astype(o_ref.dtype)


def _attn_kernel_mh(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                    heads: int):
    """All-heads variant: refs are (1, S, H*dh); the head loop runs inside
    the kernel so the caller needs NO head transpose in HBM."""
    q = q_ref[0]                                # (S, H*dh)
    k = k_ref[0]
    v = v_ref[0]
    s_len, hd = q.shape
    dh = hd // heads
    _mh_attention_vmem(q, k, v, o_ref, heads, scale, None,
                       pair=_pair_heads(heads, dh, hd))


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_frame_attention(q, k, v, interpret: bool = False):
    """softmax(q k^T / sqrt(dh)) v, independently per leading index.

    q, k, v: (G, S, dh) — G folds (batch, frame, head); returns same shape.
    Block (1, S, dh): the last two block dims equal the array dims, which
    satisfies the Mosaic (8, 128)-tiling rule for any S/dh.
    """
    g, s, dh = q.shape
    scale = dh ** -0.5
    spec = pl.BlockSpec((1, s, dh), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(g,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * g * s * s * dh,
            bytes_accessed=4 * g * s * dh * q.dtype.itemsize,
            transcendentals=g * s * s,
        ),
    )(q, k, v)


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def fused_frame_attention_mh(q, k, v, heads: int, interpret: bool = False):
    """All-heads fused attention on the CONTIGUOUS projection layout:
    q, k, v (G, S, H*dh) -> (G, S, H*dh), one grid program per G, head
    loop inside VMEM. No head transposes touch HBM."""
    g, s, hd = q.shape
    dh = hd // heads
    scale = dh ** -0.5
    spec = pl.BlockSpec((1, s, hd), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel_mh, scale=scale, heads=heads),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(g,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * g * heads * s * s * dh,
            bytes_accessed=4 * g * s * hd * q.dtype.itemsize,
            transcendentals=g * heads * s * s,
        ),
    )(q, k, v)


def _attn_kernel_mh_packed(qkv_ref, o_ref, *, scale: float, heads: int,
                           inner: int, n_valid: int):
    """Packed variant: one ref (1, S, 3I) holding [q | k | v] columns.
    Head and q/k/v selection are static VMEM column slices — the caller
    passes the projection GEMM output UNTOUCHED, so no (8, dh) lane
    retiling copies ever hit HBM (round-2 profile: the reshape/slice glue
    between kernels cost more than the kernels themselves).

    n_valid < S masks key columns >= n_valid to -inf so the token axis can
    be padded to a sublane multiple (pad-token QUERIES produce isolated
    garbage rows; pad KEYS must not receive attention mass)."""
    x = qkv_ref[0]                              # (S, 3I)
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
def fused_frame_attention_packed(qkv, heads: int, n_valid: int = -1,
                                 interpret: bool = False):
    """qkv: (G, S, 3I) packed projections -> (G, S, I) attention output."""
    g, s, i3 = qkv.shape
    inner = i3 // 3
    dh = inner // heads
    scale = dh ** -0.5
    if n_valid < 0:
        n_valid = s
    return pl.pallas_call(
        functools.partial(_attn_kernel_mh_packed, scale=scale, heads=heads,
                          inner=inner, n_valid=n_valid),
        out_shape=jax.ShapeDtypeStruct((g, s, inner), qkv.dtype),
        grid=(g,),
        in_specs=[pl.BlockSpec((1, s, i3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, s, inner), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * g * heads * s * s * dh,
            bytes_accessed=g * s * (i3 + inner) * qkv.dtype.itemsize,
            transcendentals=g * heads * s * s,
        ),
    )(qkv)


def _spatial_packed_reference(qkv, heads: int, n_valid: int = -1):
    g, s, i3 = qkv.shape
    inner = i3 // 3
    dh = inner // heads
    q = qkv[..., :inner].reshape(g, s, heads, dh)
    k = qkv[..., inner:2 * inner].reshape(g, s, heads, dh)
    v = qkv[..., 2 * inner:].reshape(g, s, heads, dh)
    dots = jnp.einsum("gihd,gjhd->ghij", q, k,
                      preferred_element_type=jnp.float32) * dh ** -0.5
    if 0 <= n_valid < s:
        mask = jnp.where(jnp.arange(s) < n_valid, 0.0, -1e30)
        dots = dots + mask[None, None, None, :]
    attn = jax.nn.softmax(dots, axis=-1)
    out = jnp.einsum("ghij,gjhd->gihd", attn.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return out.reshape(g, s, inner)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def spatial_attention_packed(qkv, heads: int, n_valid: int = -1):
    """Packed-qkv spatial attention: (G, S, 3I) -> (G, S, I).
    Differentiable; backward slices the packed columns (lane-aligned,
    cheap) and runs the flash-style Pallas backward kernel."""
    interpret = jax.default_backend() != "tpu"
    return fused_frame_attention_packed(qkv, heads=heads, n_valid=n_valid,
                                        interpret=interpret)


def _spatial_packed_fwd(qkv, heads, n_valid):
    return spatial_attention_packed(qkv, heads, n_valid), qkv


def _spatial_packed_bwd(heads, n_valid, qkv, g):
    inner = qkv.shape[-1] // 3
    if jax.default_backend() == "tpu":
        q = qkv[..., :inner]
        k = qkv[..., inner:2 * inner]
        v = qkv[..., 2 * inner:]
        dq, dk, dv = fused_frame_attention_bwd(q, k, v, g, heads=heads,
                                               n_valid=n_valid)
        return (jnp.concatenate([dq, dk, dv], axis=-1),)
    _, vjp = jax.vjp(
        lambda u: _spatial_packed_reference(u, heads, n_valid), qkv)
    return vjp(g)


spatial_attention_packed.defvjp(_spatial_packed_fwd, _spatial_packed_bwd)


def _temporal_packed_kernel(qkv_ref, o_ref, qs_ref, ks_ref, *,
                            scale: float, heads: int, inner: int):
    """Packed self-subtract temporal attention, ref (1, T1, S, 3I).

    Per-(s, h) attention over t without any head reshape: logits are
    computed as segmented lane reductions via a block-indicator matmul
    M (I, H) [m[c,h] = c//dh == h], and probabilities broadcast back over
    each head's dh lanes via its transpose E (H, I). All intermediates
    stay (S, I)- or (S, H)-shaped 2-D arrays — no (8, dh) lane splits.
    """
    t1 = qkv_ref.shape[1]
    dh = inner // heads
    q = qkv_ref[0, :, :, :inner]                # (T1, S, I)
    k = qkv_ref[0, :, :, inner:2 * inner]
    qs_ref[:] = jnp.concatenate([q[:2], q[2:] - q[1:-1]], axis=0)
    ks_ref[:] = jnp.concatenate([k[:2], k[2:] - k[1:-1]], axis=0)
    m_seg = (jax.lax.broadcasted_iota(jnp.int32, (inner, heads), 0) // dh
             == jax.lax.broadcasted_iota(jnp.int32, (inner, heads), 1)
             ).astype(jnp.float32)              # (I, H)
    e_exp = (jax.lax.broadcasted_iota(jnp.int32, (heads, inner), 1) // dh
             == jax.lax.broadcasted_iota(jnp.int32, (heads, inner), 0)
             ).astype(jnp.float32)              # (H, I)

    def body(i, _):
        qi = qs_ref[i].astype(jnp.float32)      # (S, I)
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
        acc = None
        for j in range(t1):
            w = jax.lax.dot_general(
                es[j], e_exp, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # (S, I)
            vj = qkv_ref[0, j, :, 2 * inner:].astype(jnp.float32)
            term = w * vj
            acc = term if acc is None else acc + term
        dnb = jax.lax.dot_general(
            den, e_exp, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, i] = (acc / dnb).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, t1, body, 0)


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def fused_temporal_attention_packed(qkv, heads: int,
                                    interpret: bool = False):
    """qkv: (B, T1, S, 3I) packed [q|k|v] projections (PRE-subtract) ->
    (B, T1, S, I) attention output. Grid (B,), whole-clip blocks."""
    b, t1, s, i3 = qkv.shape
    inner = i3 // 3
    dh = inner // heads
    scale = dh ** -0.5
    out = pl.pallas_call(
        functools.partial(_temporal_packed_kernel, scale=scale,
                          heads=heads, inner=inner),
        out_shape=jax.ShapeDtypeStruct((b, t1, s, inner), qkv.dtype),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, t1, s, i3), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, t1, s, inner), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((t1, s, inner), qkv.dtype),
            pltpu.VMEM((t1, s, inner), qkv.dtype),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * t1 * t1 * s * heads * dh,
            bytes_accessed=b * t1 * s * (i3 + inner) * qkv.dtype.itemsize,
            transcendentals=b * t1 * t1 * s * heads,
        ),
    )(qkv)
    return out


def _temporal_packed_bwd_kernel(qkv_ref, do_ref, dqkv_ref,
                                qs_ref, ks_ref, dqs_ref, dks_ref, *,
                                scale: float, heads: int, inner: int):
    """Packed backward of the self-subtract temporal attention.

    Mirrors _temporal_packed_kernel's segmented-lane-reduce scheme: all
    per-(s, h) softmax statistics live as (S, H) arrays produced by
    block-indicator matmuls (m_seg) and broadcast back over each head's
    dh lanes by its transpose (e_exp) — MXU reduces instead of the folded
    kernel's 64-lane VPU reduces (measured 16.8 -> MXU-bound ms at B=8).
    Ends with the transposed self-subtract mapping residual-stream grads
    back to the projection outputs."""
    t1 = qkv_ref.shape[1]
    dh = inner // heads
    q = qkv_ref[0, :, :, :inner]
    k = qkv_ref[0, :, :, inner:2 * inner]
    qs_ref[:] = jnp.concatenate([q[:2], q[2:] - q[1:-1]], axis=0)
    ks_ref[:] = jnp.concatenate([k[:2], k[2:] - k[1:-1]], axis=0)
    m_seg = (jax.lax.broadcasted_iota(jnp.int32, (inner, heads), 0) // dh
             == jax.lax.broadcasted_iota(jnp.int32, (inner, heads), 1)
             ).astype(jnp.float32)
    e_exp = (jax.lax.broadcasted_iota(jnp.int32, (heads, inner), 1) // dh
             == jax.lax.broadcasted_iota(jnp.int32, (heads, inner), 0)
             ).astype(jnp.float32)
    dks_ref[:] = jnp.zeros_like(dks_ref)
    # dv accumulates into the v-columns of the OUTPUT ref (zeroed here);
    # dq/dk land at the end after the transposed subtract
    dqkv_ref[0] = jnp.zeros_like(dqkv_ref[0])

    def seg(u):
        return jax.lax.dot_general(u, m_seg, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def bcast(u):
        return jax.lax.dot_general(u, e_exp, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def body(i, _):
        qi = qs_ref[i].astype(jnp.float32)              # (S, I)
        doi = do_ref[0, i].astype(jnp.float32)
        ls, dps = [], []
        for j in range(t1):
            ksj = ks_ref[j].astype(jnp.float32)
            vj = qkv_ref[0, j, :, 2 * inner:].astype(jnp.float32)
            ls.append(seg(qi * ksj) * scale)            # (S, H)
            dps.append(seg(doi * vj))                   # (S, H)
        m = ls[0]
        for j in range(1, t1):
            m = jnp.maximum(m, ls[j])
        es = [jnp.exp(l - m) for l in ls]
        den = es[0]
        for j in range(1, t1):
            den = den + es[j]
        pdp = es[0] * dps[0]
        for j in range(1, t1):
            pdp = pdp + es[j] * dps[j]
        pdp = pdp / den                                  # Σ_j p_j dp_j
        denb = bcast(den)                                # (S, I)
        dq_acc = None
        for j in range(t1):
            ksj = ks_ref[j].astype(jnp.float32)
            vj = qkv_ref[0, j, :, 2 * inner:].astype(jnp.float32)
            ds_j = es[j] / den * (dps[j] - pdp) * scale  # (S, H)
            dsb = bcast(ds_j)                            # (S, I)
            term = dsb * ksj
            dq_acc = term if dq_acc is None else dq_acc + term
            dks_ref[j] += (dsb * qi).astype(dks_ref.dtype)
            pb = bcast(es[j]) / denb
            dqkv_ref[0, j, :, 2 * inner:] += \
                (pb * doi).astype(dqkv_ref.dtype)
        dqs_ref[i] = dq_acc.astype(dqs_ref.dtype)
        return 0

    jax.lax.fori_loop(0, t1, body, 0)
    dqs = dqs_ref[:]
    dks = dks_ref[:]
    dqkv_ref[0, :, :, :inner] = jnp.concatenate(
        [dqs[0:1], dqs[1:t1 - 1] - dqs[2:t1], dqs[t1 - 1:]], axis=0)
    dqkv_ref[0, :, :, inner:2 * inner] = jnp.concatenate(
        [dks[0:1], dks[1:t1 - 1] - dks[2:t1], dks[t1 - 1:]], axis=0)


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def fused_temporal_attention_packed_bwd(qkv, do, heads: int,
                                        interpret: bool = False):
    """(B, T1, S, 3I) packed projections + (B, T1, S, I) out-grad ->
    (B, T1, S, 3I) packed grad."""
    b, t1, s, i3 = qkv.shape
    inner = i3 // 3
    dh = inner // heads
    scale = dh ** -0.5
    return pl.pallas_call(
        functools.partial(_temporal_packed_bwd_kernel, scale=scale,
                          heads=heads, inner=inner),
        out_shape=jax.ShapeDtypeStruct((b, t1, s, i3), qkv.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t1, s, i3), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t1, s, inner), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t1, s, i3), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((t1, s, inner), qkv.dtype),   # qs
            pltpu.VMEM((t1, s, inner), qkv.dtype),   # ks
            pltpu.VMEM((t1, s, inner), qkv.dtype),   # dqs
            pltpu.VMEM((t1, s, inner), qkv.dtype),   # dks
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * t1 * t1 * s * inner,
            bytes_accessed=2 * b * t1 * s * (i3 + inner)
            * qkv.dtype.itemsize,
            transcendentals=b * t1 * t1 * s * heads,
        ),
    )(qkv, do)


def _temporal_packed_reference(qkv, heads: int):
    inner = qkv.shape[-1] // 3
    return _temporal_reference(qkv[..., :inner],
                               qkv[..., inner:2 * inner],
                               qkv[..., 2 * inner:], heads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def temporal_attention_packed(qkv, heads: int):
    """Packed-qkv self-subtract temporal attention:
    (B, T1, S, 3I) -> (B, T1, S, I). Differentiable."""
    interpret = jax.default_backend() != "tpu"
    return fused_temporal_attention_packed(qkv, heads=heads,
                                           interpret=interpret)


def _temporal_packed_fwd(qkv, heads):
    return temporal_attention_packed(qkv, heads), qkv


def _temporal_packed_bwd(heads, qkv, g):
    if jax.default_backend() == "tpu":
        return (fused_temporal_attention_packed_bwd(qkv, g, heads=heads),)
    _, vjp = jax.vjp(lambda u: _temporal_packed_reference(u, heads), qkv)
    return vjp(g)


temporal_attention_packed.defvjp(_temporal_packed_fwd, _temporal_packed_bwd)


def _temporal_kernel(q_ref, k_ref, v_ref, o_ref, qs_ref, ks_ref, *,
                     scale: float):
    """Fused self-subtract temporal attention, refs (1, T1, N, dh) where
    N folds (location, head) — every (s, h) is an independent T1 x T1
    attention, so no head loop exists. The subtract couples adjacent t
    rows (reference module.py:193) — trivial once the clip's projections
    sit in VMEM. Scores are (T1, T1) per location: tiny matmuls that
    would waste the MXU, so they run as wide VPU multiply-reduces.

    Mosaic notes: (a) arithmetic intermediates stay 2-D — (N, dh)
    multiplies with lane reduces into (N, 1) columns concatenated to
    (N, T1) logits; (b) the query-row loop is a fori_loop reading VMEM
    *scratch* refs (dynamic indexing of values is not lowered, and full
    static unrolls overflow the remote compiler).
    """
    q = q_ref[0]                                 # (T1, N, dh)
    k = k_ref[0]
    v = v_ref[0]
    t1 = q.shape[0]
    # self-subtract on the projected stream (commutes with the pointwise
    # projection; rows 0..1 pass through, later rows become differences)
    qs_ref[:] = jnp.concatenate([q[:2], q[2:] - q[1:-1]], axis=0)
    ks = jnp.concatenate([k[:2], k[2:] - k[1:-1]], axis=0)
    ks_ref[:] = ks

    def body(i, _):
        qi = qs_ref[i]                           # (N, dh), dynamic row
        logits = jnp.concatenate(
            [jnp.sum((qi * ks[j]).astype(jnp.float32), axis=-1,
                     keepdims=True)
             for j in range(t1)], axis=1) * scale            # (N, T1)
        m = jnp.max(logits, axis=1, keepdims=True)
        e = jnp.exp(logits - m)
        p = (e / jnp.sum(e, axis=1, keepdims=True)).astype(v.dtype)
        out = p[:, 0:1] * v[0]
        for j in range(1, t1):
            out = out + p[:, j:j + 1] * v[j]                 # (N, dh)
        o_ref[0, i] = out.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, t1, body, 0)


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def fused_temporal_attention(q, k, v, heads: int, interpret: bool = False):
    """q, k, v: (B, T1, S, H*dh) pre-subtract projections ->
    (B, T1, S, H*dh) attention output.

    Per-location temporal attention treats every (s, head) pair
    IDENTICALLY, so the (S, H, dh) tail reshapes (free, contiguous) to
    (S*H, dh) and the kernel has no head loop at all — one fori over the
    T1 query rows with wide (N_tile, dh) VPU ops. Grid tiles (batch,
    location-blocks) to bound VMEM."""
    b, t1, s, hd = q.shape
    dh = hd // heads
    n = s * heads
    scale = dh ** -0.5
    fold = lambda u: u.reshape(b, t1, n, dh)
    q, k, v = fold(q), fold(k), fold(v)
    # location tile: halve until the double-buffered working set fits.
    # n_tile % 16 keeps the halved tile a multiple of 8 (Mosaic sublane
    # rule) — e.g. S=362, H=8 f32 stops at 1448, never the illegal 724.
    n_tile = n
    itemsize = q.dtype.itemsize
    while n_tile % 16 == 0 and \
            4 * 2 * t1 * n_tile * dh * itemsize > 12 * 1024 * 1024:
        n_tile //= 2
    spec = pl.BlockSpec((1, t1, n_tile, dh),
                        lambda i, j: (i, 0, j, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_temporal_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(b, n // n_tile),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        scratch_shapes=[
            pltpu.VMEM((t1, n_tile, dh), q.dtype),  # subtracted q
            pltpu.VMEM((t1, n_tile, dh), q.dtype),  # subtracted k
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * t1 * t1 * n * dh,
            bytes_accessed=4 * b * t1 * n * dh * itemsize,
            transcendentals=b * t1 * t1 * n,
        ),
    )(q, k, v)
    return out.reshape(b, t1, s, hd)


def _temporal_bwd_kernel(q_ref, k_ref, v_ref, do_ref,
                         dq_ref, dk_ref, dv_ref,
                         qs_ref, ks_ref, dqs_ref, dks_ref, dv_acc_ref, *,
                         scale: float):
    """Backward of the fused temporal attention, refs (1, T1, N, dh).
    Recomputes P per query row (flash-style), accumulates dK/dV across
    rows in scratch, then applies the TRANSPOSED self-subtract to map
    residual-stream grads back to the projection outputs:
        res[t] = x[t] - x[t-1] (t>=2)  =>  dx[t] = dres[t] - dres[t+1]
        (last row keeps only its direct term; rows 0..1 pass through).
    """
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    t1 = q.shape[0]
    qs_ref[:] = jnp.concatenate([q[:2], q[2:] - q[1:-1]], axis=0)
    ks = jnp.concatenate([k[:2], k[2:] - k[1:-1]], axis=0)
    ks_ref[:] = ks
    dks_ref[:] = jnp.zeros_like(ks)
    dv_acc_ref[:] = jnp.zeros_like(v)

    def body(i, _):
        qi = qs_ref[i]                                       # (N, dh)
        doi = do_ref[0, i]
        logits = jnp.concatenate(
            [jnp.sum((qi * ks[j]).astype(jnp.float32), axis=-1,
                     keepdims=True)
             for j in range(t1)], axis=1) * scale            # (N, T1)
        m = jnp.max(logits, axis=1, keepdims=True)
        e = jnp.exp(logits - m)
        p = e / jnp.sum(e, axis=1, keepdims=True)            # (N, T1) f32
        # dp[:, j] = sum_d do_i * v_j
        dp = jnp.concatenate(
            [jnp.sum((doi * v[j]).astype(jnp.float32), axis=-1,
                     keepdims=True)
             for j in range(t1)], axis=1)                    # (N, T1)
        ds = p * (dp - jnp.sum(p * dp, axis=1, keepdims=True)) * scale
        ds = ds.astype(q.dtype)
        pb = p.astype(q.dtype)
        dqs = ds[:, 0:1] * ks[0]
        for j in range(1, t1):
            dqs = dqs + ds[:, j:j + 1] * ks[j]               # (N, dh)
        dqs_ref[i] = dqs
        for j in range(t1):
            dks_ref[j] += ds[:, j:j + 1] * qi
            dv_acc_ref[j] += pb[:, j:j + 1] * doi
        return 0

    jax.lax.fori_loop(0, t1, body, 0)
    dqs = dqs_ref[:]
    dks = dks_ref[:]
    # transposed self-subtract
    dq_ref[0] = jnp.concatenate(
        [dqs[0:1], dqs[1:t1 - 1] - dqs[2:t1], dqs[t1 - 1:]], axis=0)
    dk_ref[0] = jnp.concatenate(
        [dks[0:1], dks[1:t1 - 1] - dks[2:t1], dks[t1 - 1:]], axis=0)
    dv_ref[0] = dv_acc_ref[:]


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def fused_temporal_attention_bwd(q, k, v, do, heads: int,
                                 interpret: bool = False):
    """(B, T1, S, H*dh) x4 -> (dq, dk, dv) wrt the PRE-subtract streams."""
    b, t1, s, hd = q.shape
    dh = hd // heads
    n = s * heads
    scale = dh ** -0.5
    fold = lambda u: u.reshape(b, t1, n, dh)
    qf, kf, vf, dof = fold(q), fold(k), fold(v), fold(do)
    n_tile = n
    itemsize = q.dtype.itemsize
    while n_tile % 16 == 0 and \
            11 * t1 * n_tile * dh * itemsize > 24 * 1024 * 1024:
        n_tile //= 2
    spec = pl.BlockSpec((1, t1, n_tile, dh), lambda i, j: (i, 0, j, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct(qf.shape, q.dtype)
    scratch = pltpu.VMEM((t1, n_tile, dh), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_temporal_bwd_kernel, scale=scale),
        out_shape=(shape, shape, shape),
        grid=(b, n // n_tile),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        scratch_shapes=[scratch] * 5,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * t1 * t1 * n * dh,
            bytes_accessed=7 * b * t1 * n * dh * itemsize,
            transcendentals=b * t1 * t1 * n,
        ),
    )(qf, kf, vf, dof)
    unfold = lambda u: u.reshape(b, t1, s, hd)
    return unfold(dq), unfold(dk), unfold(dv)


def _temporal_reference(q, k, v, heads: int):
    """XLA reference of the fused temporal kernel (same math), used as
    the VJP recompute path — Pallas kernels have no autodiff rule."""
    b, t1, s, hd = q.shape
    dh = hd // heads
    sub = lambda u: jnp.concatenate([u[:, :2], u[:, 2:] - u[:, 1:-1]],
                                    axis=1)
    qs = sub(q).reshape(b, t1, s, heads, dh)
    ks = sub(k).reshape(b, t1, s, heads, dh)
    vh = v.reshape(b, t1, s, heads, dh)
    dots = jnp.einsum("bishd,bjshd->bshij", qs, ks,
                      preferred_element_type=jnp.float32) * dh ** -0.5
    attn = jax.nn.softmax(dots, axis=-1)
    out = jnp.einsum("bshij,bjshd->bishd", attn.astype(v.dtype), vh,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return out.reshape(b, t1, s, hd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def temporal_attention_pallas(q, k, v, heads: int):
    """Drop-in for nn/attention.py's temporal path: q, k, v
    (B, T1, S, I) PRE-subtract (the kernel applies it in VMEM).
    Differentiable: forward runs the fused kernel; backward recomputes
    through the XLA formulation (flash-style recompute)."""
    interpret = jax.default_backend() != "tpu"
    return fused_temporal_attention(q, k, v, heads=heads,
                                    interpret=interpret)


def _temporal_fwd(q, k, v, heads):
    return temporal_attention_pallas(q, k, v, heads), (q, k, v)


def _temporal_bwd(heads, res, g):
    q, k, v = res
    if jax.default_backend() == "tpu":
        return fused_temporal_attention_bwd(q, k, v, g, heads=heads)
    _, vjp = jax.vjp(lambda a, b, c: _temporal_reference(a, b, c, heads),
                     q, k, v)
    return vjp(g)


temporal_attention_pallas.defvjp(_temporal_fwd, _temporal_bwd)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                     *, scale: float, heads: int, n_valid: int = -1):
    """Flash-style attention backward for one (batch·frame) block:
    refs (1, S, H*dh). Probs are recomputed per head in VMEM (nothing
    spilled from the forward); standard softmax backward:
        P  = softmax(QK^T·s);  dV = P^T dO;  dP = dO V^T
        dS = P ⊙ (dP - rowsum(P ⊙ dP));  dQ = dS K·s;  dK = dS^T Q·s
    """
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    s_len, hd = q.shape
    dh = hd // heads
    mask = None
    if 0 <= n_valid < s_len:
        cols = jax.lax.broadcasted_iota(jnp.int32, (s_len, s_len), 1)
        mask = jnp.where(cols < n_valid, 0.0, -1e30).astype(jnp.float32)

    def one_head(qh, kh, vh, doh):
        dots = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # (S, S)
        if mask is not None:
            dots = dots + mask
        m = jnp.max(dots, axis=1, keepdims=True)
        e = jnp.exp(dots - m)
        p = e / jnp.sum(e, axis=1, keepdims=True)
        pb = p.astype(vh.dtype)
        dv = jax.lax.dot_general(
            pb, doh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (S, dh)
        dp = jax.lax.dot_general(
            doh, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (S, S)
        ds = p * (dp - jnp.sum(p * dp, axis=1, keepdims=True))
        ds = (ds * scale).astype(qh.dtype)
        dq = jnp.dot(ds, kh, preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(
            ds, qh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (S, dh)
        return dq, dk, dv

    if not _pair_heads(heads, dh, hd):
        for h in range(heads):
            sl = slice(h * dh, (h + 1) * dh)
            dq, dk, dv = one_head(q[:, sl], k[:, sl], v[:, sl], do[:, sl])
            dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
            dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)
            dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)
        return
    lane = jax.lax.broadcasted_iota(jnp.int32, (s_len, 2 * dh), 1)
    lo = lane < dh
    for pr_ in range(heads // 2):
        sl = slice(pr_ * 128, (pr_ + 1) * 128)
        qp, kp, vp, dop = q[:, sl], k[:, sl], v[:, sl], do[:, sl]
        acc = None
        # dots/dq use full qp with masked k (exact: zeroed k lanes kill
        # cross-head terms); dk contracts against masked q, dv against
        # masked do, dp against masked v — each lands in this head's
        # lanes only, so the pair sums concatenate exactly.
        for half in (lo, ~lo):
            k_m = jnp.where(half, kp, 0).astype(kp.dtype)
            v_m = jnp.where(half, vp, 0).astype(vp.dtype)
            q_m = jnp.where(half, qp, 0).astype(qp.dtype)
            do_m = jnp.where(half, dop, 0).astype(dop.dtype)
            dots = jax.lax.dot_general(
                qp, k_m, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if mask is not None:
                dots = dots + mask
            m = jnp.max(dots, axis=1, keepdims=True)
            e = jnp.exp(dots - m)
            p = e / jnp.sum(e, axis=1, keepdims=True)
            pb = p.astype(vp.dtype)
            dv = jax.lax.dot_general(
                pb, do_m, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(
                dop, v_m, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = p * (dp - jnp.sum(p * dp, axis=1, keepdims=True))
            ds = (ds * scale).astype(qp.dtype)
            dq = jnp.dot(ds, k_m, preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(
                ds, q_m, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            trip = (dq, dk, dv)
            acc = trip if acc is None else tuple(
                a + t for a, t in zip(acc, trip))
        dq_ref[0, :, sl] = acc[0].astype(dq_ref.dtype)
        dk_ref[0, :, sl] = acc[1].astype(dk_ref.dtype)
        dv_ref[0, :, sl] = acc[2].astype(dv_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("heads", "n_valid", "interpret"))
def fused_frame_attention_bwd(q, k, v, do, heads: int, n_valid: int = -1,
                              interpret: bool = False):
    """(G, S, H*dh) x4 -> (dq, dk, dv), same shapes."""
    g, s, hd = q.shape
    dh = hd // heads
    scale = dh ** -0.5
    spec = pl.BlockSpec((1, s, hd), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct(q.shape, q.dtype)
    return pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale, heads=heads,
                          n_valid=n_valid),
        out_shape=(shape, shape, shape),
        grid=(g,),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * g * heads * s * s * dh,
            bytes_accessed=7 * g * s * hd * q.dtype.itemsize,
            transcendentals=g * heads * s * s,
        ),
    )(q, k, v, do)


def _spatial_reference(q, k, v):
    """XLA reference for the spatial kernel's VJP recompute."""
    dh = q.shape[-1]
    dots = jnp.einsum("btihd,btjhd->bthij", q, k,
                      preferred_element_type=jnp.float32) * dh ** -0.5
    attn = jax.nn.softmax(dots, axis=-1)
    return jnp.einsum("bthij,btjhd->btihd", attn.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


@jax.custom_vjp
def spatial_attention_pallas(q, k, v):
    """Drop-in for the XLA einsum path in nn/attention.py:
    q,k,v (B, T1, S, H, dh) -> out (B, T1, S, H, dh).

    The (B, T1, S, H, dh) projection layout is already contiguous as
    (B·T1, S, H·dh); heads are peeled inside the kernel, so neither the
    ~470 MB/layer of f32 probs nor any head transpose touches HBM.
    Differentiable: forward is the fused kernel; backward recomputes
    through the XLA formulation (flash-style recompute)."""
    b, t1, s, h, dh = q.shape
    fold = lambda u: u.reshape(b * t1, s, h * dh)
    interpret = jax.default_backend() != "tpu"
    o = fused_frame_attention_mh(fold(q), fold(k), fold(v), heads=h,
                                 interpret=interpret)
    return o.reshape(b, t1, s, h, dh)


def _spatial_fwd(q, k, v):
    return spatial_attention_pallas(q, k, v), (q, k, v)


def _spatial_bwd(res, g):
    q, k, v = res
    b, t1, s, h, dh = q.shape
    if jax.default_backend() == "tpu":
        fold = lambda u: u.reshape(b * t1, s, h * dh)
        dq, dk, dv = fused_frame_attention_bwd(
            fold(q), fold(k), fold(v), fold(g), heads=h)
        unfold = lambda u: u.reshape(b, t1, s, h, dh)
        return unfold(dq), unfold(dk), unfold(dv)
    _, vjp = jax.vjp(_spatial_reference, q, k, v)
    return vjp(g)


spatial_attention_pallas.defvjp(_spatial_fwd, _spatial_bwd)
