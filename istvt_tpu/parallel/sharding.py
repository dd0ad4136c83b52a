"""Parameter/batch sharding rules over the (data, model) mesh.

Replaces the reference's parallelism (single-host `nn.DataParallel`,
reference train_CNN.py:185-186) with SPMD shardings consumed by jit's
partitioner (SURVEY.md §2.8):

  * batch axis        -> 'data'   (DP; gradient psum rides ICI)
  * attention/MLP inner projections -> 'model' (Megatron-style TP):
      - to_qk / to_qkv / to_v / fc1 weights: output-dim sharded
      - to_out / fc2 weights: input-dim sharded (XLA inserts the psum)
  * conv stem + norms: replicated (ISTVT's 728-d trunk fits per chip;
    TP is optional headroom, MeshConfig.model=1 disables it)
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from istvt_tpu.core.mesh import DATA_AXIS, MODEL_AXIS

# param-tree key -> (axis to shard for 'w'); bias follows the output dim.
_COL_PARALLEL = {"to_qk", "to_qkv", "to_v", "fc1"}   # shard output dim
_ROW_PARALLEL = {"to_out", "fc2"}                    # shard input dim


def _spec_for(path, leaf) -> P:
    names = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
    leaf_name = names[-1] if names else None
    parent = [n for n in names if isinstance(n, str)]
    ndim = getattr(leaf, "ndim", 0)
    for mod in reversed(parent):
        if mod in _COL_PARALLEL:
            if leaf_name == "w" and ndim == 2:
                return P(None, MODEL_AXIS)
            if leaf_name == "b" and ndim == 1:
                return P(MODEL_AXIS)
            return P()
        if mod in _ROW_PARALLEL:
            if leaf_name == "w" and ndim == 2:
                return P(MODEL_AXIS, None)
            return P()  # bias on the (replicated) output dim
    return P()


def param_pspecs(params: Any):
    """PartitionSpec pytree for a model's params (TP over 'model' axis)."""
    return jax.tree_util.tree_map_with_path(_spec_for, params)


def param_shardings(params: Any, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), param_pspecs(params),
        is_leaf=lambda x: isinstance(x, P))


def replicated_shardings(tree: Any, mesh: Mesh):
    return jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), tree)


def batch_pspec(ndim: int) -> P:
    return P(DATA_AXIS, *([None] * (ndim - 1)))


def batch_shardings(batch: Any, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, batch_pspec(max(getattr(x, "ndim", 1), 1))),
        batch)


def place(tree: Any, shardings: Any):
    """device_put a pytree with per-leaf shardings."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), tree, shardings)
