"""AOT serving artifacts — deploy a compiled model with NO model code.

The reference has no deployment story at all (eval is welded into
train_CNN.py's epoch loop and every consumer must import the model
zoo). The TPU-native production path here AOT-lowers the serving
forward with `jax.export` (StableHLO + a versioned calling convention),
stores the weights in a self-contained npz beside it, and
`load_artifact` reconstructs a `serve.Predictor`-compatible scorer from
the directory alone — the target process needs jax, not istvt_tpu's
model zoo, and is immune to model-code drift between training and
serving.

Artifact layout (directory):

    manifest.json       format/version metadata, model name + config,
                        bucket batch sizes, pytree specs for
                        params/state
    weights.npz         flattened leaves; ml_dtypes leaves (bf16, f8)
                        ride as raw bytes and are restored bit-exact by
                        dtype view (npz erases non-numpy dtypes to V2)
    fwd_b{N}.jaxexport  one serialized `jax.export.Exported` per bucket

Quantized serving: quantize the params FIRST (models.istvt.
quantize_params) and export with the matching config — the int8 q8
copies and f32 scales are stored verbatim and the exported HLO already
contains the W8A8 compute graph.

Pallas kernels lower to `tpu_custom_call` StableHLO custom calls, which
carry no cross-version compatibility guarantee (jax versions differ on
whether export refuses them outright). Where the refusal exists,
`save_artifact` retries with the check disabled and records the waiver
in the manifest; either way a Pallas artifact is pinned to the
jaxlib/libtpu generation that produced it (redeploy = re-export), which
is the normal operating mode for compiled serving artifacts.
"""
from __future__ import annotations

import dataclasses
import json
import os
import re
from typing import Any, Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jexport

from istvt_tpu.serve import Predictor

FORMAT_VERSION = 1
_MANIFEST = "manifest.json"
_WEIGHTS = "weights.npz"


def _np_dtype(name: str) -> np.dtype:
    """Resolve a dtype name including ml_dtypes extended floats
    (np.dtype('bfloat16') raises — numpy never learns the name)."""
    try:
        return np.dtype(name)
    except TypeError:
        import ml_dtypes
        return np.dtype(getattr(ml_dtypes, name))


def _is_native_dtype(dt: np.dtype) -> bool:
    try:
        np.dtype(dt.name)
        return True
    except TypeError:
        return False


def _encode_tree(tree: Any, leaves: list) -> Any:
    """JSON-able spec for a params/state pytree of dicts/lists/tuples
    with array leaves; arrays move to `leaves` by index."""
    if isinstance(tree, dict):
        if not all(isinstance(k, str) for k in tree):
            raise TypeError("artifact pytrees need string dict keys")
        return {"t": "d", "v": {k: _encode_tree(v, leaves)
                                for k, v in tree.items()}}
    if isinstance(tree, (list, tuple)):
        return {"t": "l" if isinstance(tree, list) else "t",
                "v": [_encode_tree(v, leaves) for v in tree]}
    if tree is None:
        return {"t": "n"}
    if isinstance(tree, (bool, int, float, str)):
        return {"t": "py", "v": tree}
    arr = np.asarray(tree)
    leaves.append(arr)
    return {"t": "a", "i": len(leaves) - 1, "dtype": arr.dtype.name,
            "shape": list(arr.shape)}


def _export_with_retry(fn, args, platforms):
    """Export; on the custom-call stability refusal, disable the check
    for exactly the targets named in the error (Pallas tpu_custom_call)
    and report the waived targets."""
    kw = {"platforms": list(platforms)} if platforms else {}
    try:
        return jexport.export(jax.jit(fn), **kw)(*args), []
    except ValueError as e:
        msg = str(e)
        if "custom call" not in msg.lower():
            raise
        targets = sorted(set(re.findall(r'["\']([\w.\-]+)["\']', msg)))
        if not targets:
            raise
        kw["disabled_checks"] = [
            jexport.DisabledSafetyCheck.custom_call(t) for t in targets]
        return jexport.export(jax.jit(fn), **kw)(*args), targets


def save_artifact(path: str, model, params, state, *,
                  input_shape: Sequence[int],
                  batch_sizes: Sequence[int] = (1, 16),
                  input_dtype=None,
                  platforms: Optional[Sequence[str]] = None,
                  extra_meta: Optional[Dict[str, Any]] = None) -> Dict:
    """Write a self-contained serving artifact for `model`.

    input_shape: per-clip shape WITHOUT the batch dim, e.g.
        (6, 300, 300, 3); callers feed f32 and any cast happens inside
        the exported fn.
    input_dtype: cast applied to inputs INSIDE the exported fn (mirrors
        Predictor(input_dtype=...) — e.g. bf16 for the int8 path whose
        params already carry their deployed dtypes).
    platforms: lowering platforms (default: the current backend).

    Returns the manifest dict (also written to manifest.json).
    """
    os.makedirs(path, exist_ok=True)
    cast = None if input_dtype is None else jnp.dtype(input_dtype)

    def fwd(params, state, x):
        if cast is not None:
            x = x.astype(cast)
        logits, _ = model.apply(params, state, x, train=False)
        return logits.reshape(x.shape[0], -1)[:, 0].astype(jnp.float32)

    waived: Dict[str, list] = {}
    batch_sizes = sorted(set(int(b) for b in batch_sizes))
    for b in batch_sizes:
        x_spec = jax.ShapeDtypeStruct((b,) + tuple(input_shape),
                                      jnp.float32)
        exp, targets = _export_with_retry(fwd, (params, state, x_spec),
                                          platforms)
        if targets:
            waived[str(b)] = targets
        with open(os.path.join(path, f"fwd_b{b}.jaxexport"), "wb") as f:
            f.write(exp.serialize())

    leaves: list = []
    spec = {"params": _encode_tree(params, leaves),
            "state": _encode_tree(state, leaves)}
    np.savez(
        os.path.join(path, _WEIGHTS),
        **{f"a{i}": a if _is_native_dtype(a.dtype)
           else a.reshape(-1).view(np.uint8)
           for i, a in enumerate(leaves)})
    cfg = getattr(model, "config", None)
    manifest = {
        "format_version": FORMAT_VERSION,
        "jax_version": jax.__version__,
        "model_name": getattr(model, "name", "unknown"),
        "model_config": dataclasses.asdict(cfg)
        if dataclasses.is_dataclass(cfg) else None,
        "batch_sizes": batch_sizes,
        "input_shape": list(input_shape),
        "input_dtype": None if cast is None else cast.name,
        "platforms": list(platforms) if platforms
        else [jax.devices()[0].platform],
        "waived_custom_calls": waived,
        "tree_spec": spec,
        "extra": extra_meta or {},
    }
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


class ExportedPredictor(Predictor):
    """Predictor over deserialized AOT programs — same bucketing /
    padding / output contract as `serve.Predictor`, no model object
    involved (inherits predict/_bucket; _fwd dispatches per bucket)."""

    def __init__(self, fns: Dict[int, Any], params, state,
                 manifest: Dict):
        self.model = None
        self.params = params
        self.state = state
        self.manifest = manifest
        self.batch_sizes = sorted(fns)
        self.compute_dtype = self.input_dtype = None  # baked into HLO
        self.mesh = None
        jitted = {b: jax.jit(e.call) for b, e in fns.items()}
        self._fwd = lambda p, s, x: jitted[x.shape[0]](p, s, x)


def load_artifact(path: str) -> ExportedPredictor:
    """Reconstruct a scorer from a `save_artifact` directory. Requires
    only jax (+ this module); the model zoo is not imported."""
    with open(os.path.join(path, _MANIFEST)) as f:
        manifest = json.load(f)
    if manifest["format_version"] > FORMAT_VERSION:
        raise ValueError(
            f"artifact format {manifest['format_version']} is newer "
            f"than this reader ({FORMAT_VERSION})")
    raw = np.load(os.path.join(path, _WEIGHTS))

    def decode(s):
        t = s["t"]
        if t == "d":
            return {k: decode(v) for k, v in s["v"].items()}
        if t in ("l", "t"):
            seq = [decode(v) for v in s["v"]]
            return seq if t == "l" else tuple(seq)
        if t == "n":
            return None
        if t == "py":
            return s["v"]
        a = raw[f"a{s['i']}"]
        dt = _np_dtype(s["dtype"])
        if a.dtype != dt:  # ml_dtypes leaf stored as raw bytes
            a = a.view(dt).reshape(s["shape"])
        return jnp.asarray(a)

    spec = manifest["tree_spec"]
    params = decode(spec["params"])
    state = decode(spec["state"])
    fns = {}
    for b in manifest["batch_sizes"]:
        with open(os.path.join(path, f"fwd_b{b}.jaxexport"), "rb") as f:
            fns[int(b)] = jexport.deserialize(f.read())
    return ExportedPredictor(fns, params, state, manifest)
