"""Serving Predictor: bucket padding, threshold semantics."""
import numpy as np

import jax
import jax.numpy as jnp

from istvt_tpu.core.config import ISTVTConfig
from istvt_tpu.models.registry import model_selection
from istvt_tpu.serve import Predictor

TINY = ISTVTConfig(num_frames=2, image_size=72, feat_hw=5, depth=1)


def test_predictor_bucket_padding_consistency():
    model = model_selection("istvt", num_out_classes=1, cfg=TINY)
    params, state = model.init(jax.random.PRNGKey(0))
    pred = Predictor(model, params, state, batch_sizes=(4,))
    clips = np.random.RandomState(0).randn(6, 2, 72, 72, 3).astype(
        np.float32)
    out = pred.predict(clips)
    assert out["logits"].shape == (6,)
    assert out["probs"].shape == (6,)
    # padding must not contaminate results: same clips, different grouping
    out_a = pred.predict(clips[:3])
    np.testing.assert_allclose(out["logits"][:3], out_a["logits"],
                               atol=1e-5)
    # threshold-at-0 semantics (reference train_CNN.py:527)
    np.testing.assert_array_equal(out["preds"],
                                  (out["logits"] > 0).astype(np.int32))
    np.testing.assert_allclose(out["probs"],
                               1 / (1 + np.exp(-out["logits"])), atol=1e-6)


def test_predictor_int8_istvt():
    """Predictor over the quantized ISTVT serving path (interpret on
    CPU): predictions track the float path; score CLI --int8 wiring."""
    import jax.numpy as jnp
    from istvt_tpu.core.config import ISTVTConfig
    from istvt_tpu.models import istvt
    from istvt_tpu.models.registry import model_selection
    from istvt_tpu.serve import Predictor

    tiny = dict(num_frames=2, image_size=72, feat_hw=5, depth=1,
                num_classes=1)
    cfg_f = ISTVTConfig(**tiny, use_pallas=True)
    cfg_q = ISTVTConfig(**tiny, use_pallas=True, quantize="int8")
    model_f = model_selection("istvt", num_out_classes=1, cfg=cfg_f)
    model_q = model_selection("istvt", num_out_classes=1, cfg=cfg_q)
    params, state = model_f.init(jax.random.PRNGKey(0))
    qparams = istvt.quantize_params(params)

    clips = np.random.RandomState(0).randn(3, 2, 72, 72, 3).astype(
        np.float32) * 0.5
    out_f = Predictor(model_f, params, state,
                      batch_sizes=(4,)).predict(clips)
    out_q = Predictor(model_q, qparams, state,
                      batch_sizes=(4,)).predict(clips)
    assert out_q["logits"].shape == (3,)
    np.testing.assert_allclose(out_q["logits"], out_f["logits"],
                               atol=0.05, rtol=0.05)


def test_predictor_dp_mesh_matches_single_device():
    """DP-sharded serving (mesh over 'data'): same probabilities as the
    single-device Predictor; buckets round up to the data-axis size and
    partial batches stay uncontaminated. Conftest forces 8 CPU devices."""
    from jax.sharding import Mesh
    from istvt_tpu.core.mesh import DATA_AXIS

    model = model_selection("istvt", num_out_classes=1, cfg=TINY)
    params, state = model.init(jax.random.PRNGKey(0))
    clips = np.random.RandomState(1).randn(5, 2, 72, 72, 3).astype(
        np.float32)
    ref = Predictor(model, params, state, batch_sizes=(8,)).predict(clips)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), (DATA_AXIS,))
    pred = Predictor(model, params, state, batch_sizes=(3,), mesh=mesh)
    assert pred.batch_sizes == [8]          # rounded up to 8 replicas
    out = pred.predict(clips)
    np.testing.assert_allclose(out["logits"], ref["logits"], atol=1e-5)

    import pytest
    from jax.sharding import Mesh as M
    bad = M(np.asarray(jax.devices()[:8]).reshape(4, 2),
            (DATA_AXIS, "model"))
    with pytest.raises(ValueError):
        Predictor(model, params, state, mesh=bad)
