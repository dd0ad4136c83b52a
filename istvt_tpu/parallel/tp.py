"""Tensor-parallel execution of the fused Pallas attention kernels.

A pallas_call is opaque to jit's SPMD partitioner: under a `model`-axis
sharding of the qkv projections (parallel/sharding.py Megatron rules) the
partitioner would have to all-gather the operands and replicate the kernel.
This module instead runs the packed attention kernels under `shard_map`:

  * spatial attention — heads sharded over the model axis (every head's
    (S, S) attention is independent; reference network/vivit/module.py:80-87
    computes heads independently too),
  * temporal self-subtract attention — the head component of the folded
    (s, h) location axis sharded over the model axis (every (s, h) is an
    independent (T+1)x(T+1) attention, module.py:174-208).

The qkv tensor arrives packed as [q | k | v] along the last dim (each of
inner = H*dh columns). Head sharding is expressed by the free reshape
(..., 3I) -> (..., 3, H, dh); shard_map's in_spec places H on the model
axis, each shard re-flattens to its local packed layout and calls the
ordinary kernel with heads//mp local heads. Concatenating the per-shard
outputs along the last dim reproduces the exact head-major unsharded
layout, so the row-parallel to_out projection consumes it with no
resharding (the partitioner inserts the psum).

The mesh is communicated by a TRACE-TIME context (`scope`): train/eval
step builders enter it inside the traced function body, so the Python
conditionals below resolve while jit traces and nothing dynamic remains
in the compiled program.
"""
from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # jax < 0.8
    from jax.experimental.shard_map import shard_map

from istvt_tpu.core.mesh import DATA_AXIS, MODEL_AXIS


def shard_map_compat(f, mesh, in_specs, out_specs):
    """shard_map with replication checking off, across the jax 0.8 API
    rename (check_vma) and its predecessor (check_rep)."""
    try:
        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    except TypeError:  # jax < 0.8 signature
        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)

_STATE = threading.local()


@contextmanager
def scope(mesh: Optional[Mesh], model_axis: str = MODEL_AXIS,
          data_axis: str = DATA_AXIS):
    """Activate TP-aware kernel dispatch while tracing under `mesh`.

    A no-op when mesh is None or its model axis has size 1 — the plain
    kernels handle pure DP (replicated weights) fine.
    """
    prev = getattr(_STATE, "ctx", None)
    if mesh is not None and model_axis in mesh.shape \
            and mesh.shape[model_axis] > 1:
        _STATE.ctx = (mesh, model_axis, data_axis)
    else:
        _STATE.ctx = None
    try:
        yield
    finally:
        _STATE.ctx = prev


def current() -> Optional[Tuple[Mesh, str, str]]:
    return getattr(_STATE, "ctx", None)


def active() -> bool:
    return current() is not None


def model_size() -> int:
    ctx = current()
    return ctx[0].shape[ctx[1]] if ctx is not None else 1


def _divisible(heads: int, leading: int) -> bool:
    ctx = current()
    if ctx is None:
        return False
    mesh, model_axis, data_axis = ctx
    mp = mesh.shape[model_axis]
    dp = mesh.shape.get(data_axis, 1)
    return heads % mp == 0 and leading % dp == 0


def spatial_attention_sharded(qkv, heads: int, n_valid: int = -1):
    """TP form of kernels.attention.spatial_attention_packed.

    qkv: (G, S, 3I) packed projections -> (G, S, I); G folds (batch,
    frame) and is data-sharded, heads are model-sharded. Falls back to
    the unsharded kernel outside a TP scope or when heads don't divide.
    """
    from istvt_tpu.kernels.attention import spatial_attention_packed

    g, s, i3 = qkv.shape
    if not _divisible(heads, g):
        return spatial_attention_packed(qkv, heads, n_valid)
    mesh, model_axis, data_axis = current()
    mp = mesh.shape[model_axis]
    h_local = heads // mp
    dh = (i3 // 3) // heads
    x = qkv.reshape(g, s, 3, heads, dh)

    def local_fn(xl):
        gl = xl.shape[0]
        packed = xl.reshape(gl, s, 3 * h_local * dh)
        return spatial_attention_packed(packed, h_local, n_valid)

    out = shard_map_compat(
        local_fn, mesh,
        in_specs=(P(data_axis, None, None, model_axis, None),),
        out_specs=P(data_axis, None, model_axis),
    )(x)
    return out  # (G, S, I), model-sharded over the head-major last dim


def temporal_attention_sharded(qkv, heads: int):
    """TP form of kernels.attention.temporal_attention_packed.

    qkv: (B, T1, S, 3I) packed PRE-subtract projections -> (B, T1, S, I);
    the head component of the per-location (s, h) axis is model-sharded.
    """
    from istvt_tpu.kernels.attention import temporal_attention_packed

    b, t1, s, i3 = qkv.shape
    if not _divisible(heads, b):
        return temporal_attention_packed(qkv, heads)
    mesh, model_axis, data_axis = current()
    mp = mesh.shape[model_axis]
    h_local = heads // mp
    dh = (i3 // 3) // heads
    x = qkv.reshape(b, t1, s, 3, heads, dh)

    def local_fn(xl):
        packed = xl.reshape(xl.shape[0], t1, s, 3 * h_local * dh)
        return temporal_attention_packed(packed, h_local)

    out = shard_map_compat(
        local_fn, mesh,
        in_specs=(P(data_axis, None, None, None, model_axis, None),),
        out_specs=P(data_axis, None, None, model_axis),
    )(x)
    return out
