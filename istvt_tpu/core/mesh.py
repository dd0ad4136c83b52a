"""Device mesh + sharding helpers.

The reference's only parallelism is single-host `nn.DataParallel`
(reference train_CNN.py:185-186). The TPU-native equivalent is a
`jax.sharding.Mesh` with a 'data' axis (batch sharding; gradient psum rides
ICI) and an optional 'model' axis (tensor-parallel attention/MLP shards).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
PIPE_AXIS = "pipe"


def make_mesh(
    data: int = -1,
    model: int = 1,
    pipe: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a (data, model[, pipe]) mesh over the given devices.

    data=-1 means "all remaining devices". The device order is left to JAX's
    default, which lays contiguous mesh dims along ICI neighbours on TPU —
    the pipe axis is innermost so stage-to-stage ppermute hops ride
    single-link ICI. The 'pipe' axis only appears when pipe > 1, so
    existing (data, model) consumers are unaffected.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data == -1:
        assert n % (model * pipe) == 0, \
            f"{n} devices not divisible by model*pipe={model * pipe}"
        data = n // (model * pipe)
    assert data * model * pipe == n, \
        f"mesh {data}x{model}x{pipe} != {n} devices"
    if pipe == 1:
        arr = np.asarray(devices).reshape(data, model)
        return Mesh(arr, (DATA_AXIS, MODEL_AXIS))
    arr = np.asarray(devices).reshape(data, model, pipe)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS, PIPE_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch (pytree of np/jnp arrays) onto the mesh, sharded on
    the leading axis. Replaces the reference's DataParallel scatter."""
    def put(x):
        return jax.device_put(x, data_sharding(mesh, np.ndim(x)))
    return jax.tree_util.tree_map(put, batch)
