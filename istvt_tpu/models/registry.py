"""Model registry — `model_selection` parity with reference
network/models.py:240-282 (string-keyed factory used by every driver).

Returns a `Model` bundle: init(rng) -> (params, state); apply(params, state,
batch, train, rng) -> (outputs, new_state). Registered names cover the
reference's registry keys (SURVEY.md §2.3) as implementations land.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

_REGISTRY: Dict[str, Callable[..., "Model"]] = {}


@dataclasses.dataclass(frozen=True)
class Model:
    name: str
    config: Any
    init: Callable  # (rng) -> (params, state)
    apply: Callable  # (params, state, x, train=False, rng=None) -> (out, new_state)
    # optional feature accessors, mirroring TransferModel's .features /
    # .low_level_features (reference models_copy.py:227-237)
    extras: Optional[Dict[str, Callable]] = None


def register(name: str):
    def deco(builder):
        _REGISTRY[name] = builder
        return builder
    return deco


def available_models():
    from istvt_tpu.models import zoo  # noqa: F401  (trigger registrations)
    return sorted(_REGISTRY)


def model_selection(modelname: str, num_out_classes: int = 1,
                    dropout: float = 0.5, **kwargs) -> Model:
    """Public factory (signature parity with reference models.py:240-282;
    the reference's `batch_size` arg was only used to size DataParallel
    splits and is not needed under pjit)."""
    # import model modules lazily so registration side effects run
    from istvt_tpu.models import zoo  # noqa: F401

    if modelname not in _REGISTRY:
        raise NotImplementedError(
            f"model '{modelname}' not in registry; available: {available_models()}")
    return _REGISTRY[modelname](num_out_classes=num_out_classes,
                                dropout=dropout, **kwargs)
