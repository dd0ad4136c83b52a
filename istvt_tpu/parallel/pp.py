"""Pipeline parallelism over the ISTVT layer stack (GPipe microbatching).

The reference's only parallelism is single-host `nn.DataParallel`
(reference train_CNN.py:185-186); SURVEY.md §2.8 lists further axes as
TPU-first additions. `parallel/tp.py` covers tensor parallelism; this
module adds the third classic axis: the 12 identical decomposed-ST layers
(reference network/vivit/vivit.py:97-100) are split into contiguous
stages over a 'pipe' mesh axis and executed as a GPipe schedule —
microbatches flow stage-to-stage over single-hop ICI `ppermute`s while
every stage computes a different microbatch in parallel.

Design (idiomatic JAX, scaling-book pipelining recipe):

  * layer params are stacked on a leading L axis and pipe-sharded with a
    `with_sharding_constraint`, so each device materializes only its own
    L/S stage slice out of the (replicated) per-layer training params;
  * inside `shard_map`, a `lax.scan` over M + S - 1 ticks runs the local
    stage (itself a `lax.scan` over its layers) on the current inbox:
    stage 0 feeds microbatch k, stages s>0 consume the activation
    ppermute'd from stage s-1 on the previous tick;
  * the last stage collects its outputs into a buffer; one `psum` over
    the pipe axis broadcasts the result so downstream (head/loss) code
    sees a replicated activation, exactly like the sequential layer loop;
  * bubbles are the standard (S-1)/(M+S-1) GPipe overhead; backward
    differentiates straight through scan/ppermute (the transpose of a
    shift is the reverse shift), giving 1F1B-equivalent math without a
    hand-written schedule.

Like tensor parallelism, the mesh is communicated by a TRACE-TIME scope:
step builders enter `pp.scope(mesh, microbatches)` inside the traced
function; `models/istvt.dsttr_apply` dispatches its layer loop here when
the scope is active. The scope no-ops when the mesh has no pipe axis.
Composition rules: pipe composes with the 'data' axis (the batch stays
data-sharded; each data row runs its own pipeline) AND with 'model'>1 —
but since shard_maps don't nest, a model>1 mesh needs a layer_fn that is
itself written in MANUAL Megatron style (local weight shards + explicit
`lax.psum` over the model axis; models/istvt.dsttr_apply's
run_layer_manual_tp is the ISTVT one) with `param_specs` declaring each
leaf's model-axis
sharding. A plain layer_fn under model>1 still computes correctly — the
model ranks just replicate the work.
"""
from __future__ import annotations

import math
import threading
from contextlib import contextmanager
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from istvt_tpu.core.mesh import DATA_AXIS, PIPE_AXIS
from istvt_tpu.parallel.tp import shard_map_compat

_STATE = threading.local()


@contextmanager
def scope(mesh: Optional[Mesh], microbatches: Optional[int] = None,
          pipe_axis: str = PIPE_AXIS, data_axis: str = DATA_AXIS):
    """Activate pipeline-parallel layer dispatch while tracing under `mesh`.

    No-op when mesh is None or has no pipe axis (or pipe size 1).
    `microbatches` defaults to the stage count (the smallest M at which
    every stage is busy in the steady state); it is clamped to divide the
    local batch.
    """
    prev = getattr(_STATE, "ctx", None)
    if mesh is not None and pipe_axis in mesh.shape \
            and mesh.shape[pipe_axis] > 1:
        _STATE.ctx = (mesh, pipe_axis, data_axis, microbatches)
    else:
        _STATE.ctx = None
    try:
        yield
    finally:
        _STATE.ctx = prev


def current():
    return getattr(_STATE, "ctx", None)


def active() -> bool:
    return current() is not None


def stack_layers(layers: Sequence):
    """[{...}, {...}, ...] (identical structures) -> one pytree with a
    leading L axis on every leaf."""
    return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *layers)


def _pipe_spec(leaf, pipe_axis: str) -> P:
    return P(pipe_axis, *([None] * (leaf.ndim - 1)))


def pipeline_layers(
    x: jax.Array,
    layers: List,
    layer_fn: Callable[[object, jax.Array], jax.Array],
    param_specs=None,
) -> jax.Array:
    """Run `x` through `layers` as a GPipe pipeline over the scope's mesh.

    x: (B, N, D) with B sharded on the data axis (replicated over pipe —
    jit's partitioner maintains that for activations produced outside any
    shard_map). layer_fn(layer_params, x_local) -> x_local must be
    shape-preserving and batch-elementwise (true of the ST layer law,
    reference vivit.py:98-100). Returns (B, N, D), same shardings as x.

    param_specs: optional pytree of PartitionSpec matching ONE layer's
    structure, giving each weight leaf's intra-layer sharding (e.g. a
    'model' TP axis for Megatron column/row shards). The leading stacked-
    L axis is always pipe-sharded on top of it. When given, layer_fn
    receives LOCAL weight shards and must psum its row-parallel partial
    sums over the model axis itself. Every mesh axis is manual inside
    the shard_map, so `lax.psum(v, MODEL_AXIS)` works directly.
    """
    mesh, pipe_axis, data_axis, microbatches = current()
    n_stages = mesh.shape[pipe_axis]
    dp = mesh.shape.get(data_axis, 1)
    depth = len(layers)
    assert depth % n_stages == 0, (
        f"depth {depth} not divisible by pipe={n_stages}; pick a pipe "
        f"axis that divides the layer count")
    b = x.shape[0]
    assert b % dp == 0, f"batch {b} not divisible by data={dp}"
    b_local = b // dp
    m = microbatches or n_stages
    m = math.gcd(m, b_local) or 1

    stacked = stack_layers(layers)
    if param_specs is None:
        stacked_specs = jax.tree_util.tree_map(
            lambda l: _pipe_spec(l, pipe_axis), stacked)
    else:
        stacked_specs = jax.tree_util.tree_map(
            lambda sp: P(pipe_axis, *tuple(sp)), param_specs,
            is_leaf=lambda v: isinstance(v, P))
    # early pipe(+model)-shard constraint: lets the partitioner fuse the
    # stack into a local slice so each device materializes only its own
    # stage's (and TP rank's) layer slice instead of the full stacked copy
    stacked = jax.lax.with_sharding_constraint(
        stacked,
        jax.tree_util.tree_map(
            lambda sp: NamedSharding(mesh, sp), stacked_specs,
            is_leaf=lambda v: isinstance(v, P)))

    def local(x_local, stage_params):
        s_idx = jax.lax.axis_index(pipe_axis)
        mb = b_local // m
        xs = x_local.reshape(m, mb, *x_local.shape[1:])

        def run_stage(act):
            def body(a, lp):
                return layer_fn(lp, a), None
            out, _ = jax.lax.scan(body, act, stage_params)
            return out

        def tick(carry, k):
            recv, ybuf = carry
            feed = xs[jnp.clip(k, 0, m - 1)]
            inbox = jnp.where(s_idx == 0, feed, recv)
            out = run_stage(inbox)
            # last stage banks microbatch k-(S-1) once it's real
            widx = jnp.clip(k - (n_stages - 1), 0, m - 1)
            is_out = ((s_idx == n_stages - 1)
                      & (k >= n_stages - 1) & (k - (n_stages - 1) < m))
            cur = jax.lax.dynamic_slice_in_dim(ybuf, widx, 1, 0)
            upd = jnp.where(is_out, out[None], cur)
            ybuf = jax.lax.dynamic_update_slice_in_dim(ybuf, upd, widx, 0)
            nxt = jax.lax.ppermute(
                out, pipe_axis,
                [(i, i + 1) for i in range(n_stages - 1)])
            return (nxt, ybuf), None

        carry0 = (jnp.zeros_like(xs[0]), jnp.zeros_like(xs))
        (_, ybuf), _ = jax.lax.scan(tick, carry0,
                                    jnp.arange(m + n_stages - 1))
        # every rank returns ITS buffer as a pipe-sharded leading axis;
        # only the last stage's block is meaningful. Keeping the output
        # sharded (instead of psum-replicating it here) gives the
        # shard_map transpose unambiguous semantics under
        # check_vma=False — the caller's [-1] slice makes the backward
        # cotangent zero on every non-final stage, which is exact.
        return ybuf.reshape(1, *x_local.shape)

    x_spec = P(data_axis, *([None] * (x.ndim - 1)))
    out_spec = P(pipe_axis, data_axis, *([None] * (x.ndim - 1)))
    out = shard_map_compat(
        local, mesh,
        in_specs=(x_spec, stacked_specs),
        out_specs=out_spec,
    )(x, stacked)
    return out[-1]
