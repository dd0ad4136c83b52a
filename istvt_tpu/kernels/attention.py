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


def spatial_attention_pallas(q, k, v):
    """Drop-in for the XLA einsum path in nn/attention.py:
    q,k,v (B, T1, S, H, dh) -> out (B, T1, S, H, dh).

    Heads fold into the grid axis via one bf16 transpose (~0.2 ms at the
    paper geometry) — far cheaper than the ~470 MB of f32 probs the
    unfused path streams through HBM."""
    b, t1, s, h, dh = q.shape
    fold = lambda u: u.transpose(0, 1, 3, 2, 4).reshape(b * t1 * h, s, dh)
    interpret = jax.default_backend() != "tpu"
    o = fused_frame_attention(fold(q), fold(k), fold(v), interpret=interpret)
    o = o.reshape(b, t1, h, s, dh).transpose(0, 1, 3, 2, 4)
    return o
