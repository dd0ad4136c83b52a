"""Serving: a compiled batch predictor for production scoring.

The reference has no serving path (eval is welded into train_CNN.py's
epoch loop). Here a `Predictor` wraps any registry model with:

  * fixed-shape jitted forwards (one compile per bucket size, cached);
  * partial-batch padding with a validity mask;
  * probability outputs (sigmoid over the BCE logit, reference
    threshold-at-0 semantics preserved via `preds`);
  * optional LRP saliency alongside logits (ISTVT only).

Int8 serving: build the model with ISTVTConfig(use_pallas=True,
quantize='int8'), pass `models.istvt.quantize_params(params)` as params —
the ST-layer GEMMs run W8A8 on the MXU (kernels/quant.py; accuracy delta
asserted by tests/test_quant.py).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp


class Predictor:
    def __init__(self, model, params, state, batch_sizes: Sequence[int] =
                 (1, 8, 16), compute_dtype=None, input_dtype=None,
                 mesh=None):
        """compute_dtype: cast params AND inputs per call (float leaves
        only). input_dtype: cast ONLY the inputs — use this for int8
        serving, where the params already carry their deployed dtypes
        (bf16 weights, int8 q8 copies, f32 scales) and a blanket float
        cast would degrade the f32 quantization scales to bf16.

        mesh: optional data-only `jax.sharding.Mesh` for DP-sharded
        serving — the batch shards over the 'data' axis (shard_map, one
        replica per chip, no inter-chip communication at inference) and
        params/state replicate. Bucket sizes round up to multiples of
        the data-axis size. Model-axis sharding belongs to
        `train.step.make_eval_step(mesh=...)`, not here."""
        self.model = model
        self.params = params
        self.state = state
        self.batch_sizes = sorted(batch_sizes)
        self.compute_dtype = compute_dtype
        self.input_dtype = input_dtype
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import PartitionSpec as P
            from istvt_tpu.core.mesh import DATA_AXIS
            from istvt_tpu.parallel.tp import shard_map_compat
            if any(a != DATA_AXIS and n > 1
                   for a, n in mesh.shape.items()):
                raise ValueError(
                    "Predictor meshes must be data-only; use "
                    "make_eval_step(mesh=...) for model-sharded eval")
            nd = mesh.shape[DATA_AXIS]
            self.batch_sizes = sorted({-(-b // nd) * nd
                                       for b in self.batch_sizes})
            self._fwd = jax.jit(shard_map_compat(
                self._forward, mesh,
                in_specs=(P(), P(), P(DATA_AXIS)),
                out_specs=P(DATA_AXIS)))
        else:
            self._fwd = jax.jit(self._forward)

    def _forward(self, params, state, x):
        if self.compute_dtype is not None:
            from istvt_tpu.core import tree as _tree
            params = _tree.cast(params, self.compute_dtype)
            x = x.astype(self.compute_dtype)
        elif self.input_dtype is not None:
            x = x.astype(self.input_dtype)
        logits, _ = self.model.apply(params, state, x, train=False)
        return logits.reshape(x.shape[0], -1)[:, 0].astype(jnp.float32)

    def _bucket(self, n: int) -> int:
        for b in self.batch_sizes:
            if n <= b:
                return b
        return self.batch_sizes[-1]

    def predict(self, clips: np.ndarray) -> Dict[str, np.ndarray]:
        """clips: (N, ...) normalized inputs -> {'logits', 'probs',
        'preds'} of length N. Batches over compile-cached bucket sizes."""
        n = clips.shape[0]
        logits: List[np.ndarray] = []
        i = 0
        while i < n:
            take = min(self._bucket(n - i), n - i)
            bucket = self._bucket(take)
            chunk = clips[i:i + take]
            if take < bucket:
                pad = np.zeros((bucket - take,) + chunk.shape[1:],
                               chunk.dtype)
                chunk = np.concatenate([chunk, pad])
            out = np.asarray(self._fwd(self.params, self.state,
                                       jnp.asarray(chunk)))[:take]
            logits.append(out)
            i += take
        logits = np.concatenate(logits)
        return {
            "logits": logits,
            "probs": 1.0 / (1.0 + np.exp(-logits)),
            "preds": (logits > 0).astype(np.int32),
        }
