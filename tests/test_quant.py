"""Int8 serving path (kernels/quant.py + ISTVTConfig.quantize='int8'):
numeric fidelity of the W8A8 kernels and the end-to-end quantized model
(interpret mode on CPU; Mosaic lowering covered by tests/test_tpu_smoke.py
and the BENCH_DTYPE=int8 bench)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from istvt_tpu.core.config import ISTVTConfig
from istvt_tpu.kernels.quant import (
    ln_ff_residual_q8,
    ln_matmul_q8,
    matmul_q8_bias_residual,
    quantize_weight,
)

TINY = dict(num_frames=2, image_size=72, feat_hw=5, depth=2, num_classes=1)


def test_quantize_weight_roundtrip():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(128, 64).astype(np.float32))
    wq, ws = quantize_weight(w)
    assert wq.dtype == jnp.int8 and ws.shape == (64,)
    deq = wq.astype(jnp.float32) * ws[None, :]
    # per-channel symmetric int8: max error is half a quantization step
    step = np.asarray(ws)
    assert np.all(np.abs(np.asarray(deq - w)) <= step[None, :] * 0.5 + 1e-7)


def test_ln_matmul_q8_close_to_float():
    from istvt_tpu.kernels.linear import _ln_matmul_reference
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(48, 128).astype(np.float32))
    s = jnp.asarray(rng.rand(128).astype(np.float32) * 0.2 + 0.9)
    b = jnp.asarray(rng.randn(128).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.randn(128, 256).astype(np.float32) * 0.05)
    wq, ws = quantize_weight(w)
    got = ln_matmul_q8(x, s, b, wq, ws)
    want = _ln_matmul_reference(x, s, b, w)
    rel = np.linalg.norm(np.asarray(got - want)) / \
        np.linalg.norm(np.asarray(want))
    assert rel < 2e-2, rel


def test_matmul_q8_bias_residual_close():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(40, 64).astype(np.float32))
    w = jnp.asarray(rng.randn(64, 96).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(96).astype(np.float32) * 0.1)
    r = jnp.asarray(rng.randn(40, 96).astype(np.float32))
    wq, ws = quantize_weight(w)
    got = matmul_q8_bias_residual(x, wq, ws, b, r)
    want = jnp.dot(x, w) + b + r
    rel = np.linalg.norm(np.asarray(got - want)) / \
        np.linalg.norm(np.asarray(want))
    assert rel < 2e-2, rel


def test_ln_ff_q8_close():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(32, 64).astype(np.float32))
    s = jnp.asarray(rng.rand(64).astype(np.float32) * 0.2 + 0.9)
    b = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rng.randn(64, 256).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.randn(256).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(256, 64).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    w1q, w1s = quantize_weight(w1)
    got = ln_ff_residual_q8(x, s, b, w1q, w1s, b1, w2, b2)
    xn = (x - x.mean(-1, keepdims=True)) * jax.lax.rsqrt(
        x.var(-1, keepdims=True) + 1e-5) * s + b
    want = jnp.dot(jax.nn.gelu(jnp.dot(xn, w1) + b1, approximate=True),
                   w2) + b2 + x
    rel = np.linalg.norm(np.asarray(got - want)) / \
        np.linalg.norm(np.asarray(want))
    assert rel < 3e-2, rel


def test_istvt_int8_logits_close_to_float():
    """End-to-end: quantize_params + quantize='int8' must track the f32
    model's logits (serving contract: threshold-at-0 predictions,
    reference train_CNN.py:527,944)."""
    from istvt_tpu.models import istvt
    from istvt_tpu.models.registry import model_selection

    cfg_f = ISTVTConfig(**TINY, use_pallas=True)
    cfg_q = ISTVTConfig(**TINY, use_pallas=True, quantize="int8")
    model = model_selection("istvt", num_out_classes=1, cfg=cfg_f)
    params, state = model.init(jax.random.PRNGKey(0))
    qparams = istvt.quantize_params(params)
    assert "q8" in qparams["vit"]["layers"][0]["attn_t"]

    clips = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 72, 72, 3),
                              jnp.float32)
    logits_f, _ = istvt.apply(params, state, clips, cfg_f)
    logits_q, _ = istvt.apply(qparams, state, clips, cfg_q)
    # same model, same state; int8 only perturbs the ST-layer GEMMs
    np.testing.assert_allclose(np.asarray(logits_q), np.asarray(logits_f),
                               atol=0.05, rtol=0.05)


def test_istvt_int8_preserves_synthetic_auc():
    """Accuracy contract: after overfitting the synthetic artifact in
    float, int8 serving must keep the AUC (documented delta check)."""
    from istvt_tpu.models import istvt
    from istvt_tpu.models.registry import model_selection
    from istvt_tpu.train import step as S
    from istvt_tpu.train.metrics import auc
    from istvt_tpu.train.schedule import cosine_schedule
    from istvt_tpu.core.config import TrainConfig
    from istvt_tpu.data import ClipLoader, SyntheticVideoDataset

    cfg = ISTVTConfig(num_frames=3, image_size=72, feat_hw=5, depth=1)
    model = model_selection("istvt", num_out_classes=1, cfg=cfg)
    opt = S.make_optimizer(TrainConfig(), cosine_schedule(3e-4, 10_000))
    ts = S.create_train_state(model, jax.random.PRNGKey(0), opt)
    step = S.make_train_step(model, opt, donate=False)
    ds = SyntheticVideoDataset(num_clips=16, seq_len=3, size=72, seed=0)
    loader = ClipLoader(ds, batch_size=16, shuffle=False, num_workers=2)
    batch = next(iter(loader))
    batch = {"clips": jnp.asarray(batch["clips"]),
             "labels": jnp.asarray(batch["labels"])}
    rng = jax.random.PRNGKey(1)
    for _ in range(25):
        rng, srng = jax.random.split(rng)
        ts, _ = step(ts, batch, srng)

    cfg_q = ISTVTConfig(num_frames=3, image_size=72, feat_hw=5, depth=1,
                        use_pallas=True, quantize="int8")
    qparams = istvt.quantize_params(ts.params)
    logits_q, _ = istvt.apply(qparams, ts.model_state, batch["clips"],
                              cfg_q)
    logits_f, _ = istvt.apply(ts.params, ts.model_state, batch["clips"],
                              cfg)
    auc_f = float(auc(logits_f.reshape(-1), batch["labels"]))
    auc_q = float(auc(logits_q.reshape(-1), batch["labels"]))
    assert auc_f > 0.9
    assert abs(auc_q - auc_f) < 0.02, (auc_f, auc_q)


def test_boundary_fused_kernels_match_composed_chain():
    """r3 layer-boundary fusions: matmul_q8_ln_matmul_q8 and
    matmul_q8_res_ln_ff_q8_full must equal the 2-kernel compositions they
    replace (identical quantization points; the only change is that the
    728-wide intermediate never leaves VMEM)."""
    from istvt_tpu.kernels.quant import (
        ln_ff_residual_q8_full,
        ln_matmul_q8,
        matmul_q8_bias_residual,
        matmul_q8_ln_matmul_q8,
        matmul_q8_res_ln_ff_q8_full,
        quantize_weight,
    )

    rng = np.random.RandomState(0)
    n, d_in, d, k, h = 64, 512, 728, 1536, 2912
    a = jnp.asarray(rng.randn(n, d_in) * 0.3, jnp.float32)
    res = jnp.asarray(rng.randn(n, d) * 0.3, jnp.float32)
    lns = jnp.asarray(rng.rand(d) + 0.5, jnp.float32)
    lnb = jnp.asarray(rng.randn(d) * 0.01, jnp.float32)
    bo = jnp.asarray(rng.randn(d) * 0.01, jnp.float32)
    b1 = jnp.asarray(rng.randn(h) * 0.01, jnp.float32)
    b2 = jnp.asarray(rng.randn(d) * 0.01, jnp.float32)
    woq, wos = quantize_weight(
        jnp.asarray(rng.randn(d_in, d) * 0.05, jnp.float32))
    wqkvq, wqkvs = quantize_weight(
        jnp.asarray(rng.randn(d, k) * 0.05, jnp.float32))
    w1q, w1s = quantize_weight(
        jnp.asarray(rng.randn(d, h) * 0.05, jnp.float32))
    w2q, w2s = quantize_weight(
        jnp.asarray(rng.randn(h, d) * 0.05, jnp.float32))

    y = matmul_q8_bias_residual(a, woq, wos, bo, None)
    want = ln_matmul_q8(y, lns, lnb, wqkvq, wqkvs)
    got = matmul_q8_ln_matmul_q8(a, woq, wos, bo, lns, lnb, wqkvq, wqkvs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-2, rtol=2e-2)

    y2 = matmul_q8_bias_residual(a, woq, wos, bo, res)
    want2 = ln_ff_residual_q8_full(y2, lns, lnb, w1q, w1s, b1,
                                   w2q, w2s, b2)
    got2 = matmul_q8_res_ln_ff_q8_full(a, res, woq, wos, bo, lns, lnb,
                                       w1q, w1s, b1, w2q, w2s, b2)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               atol=2e-2, rtol=2e-2)


def test_attn_ingest_kernels_match_composed_chain():
    """r3 stage-2 fusions: ln_qkv_q8_temporal_attention and
    mm_q8_ln_qkv_q8_spatial_attention must equal the GEMM-kernel +
    attention-kernel compositions they replace (identical quantization
    points; packed qkv just never leaves VMEM)."""
    from istvt_tpu.kernels.attention import (
        spatial_attention_packed,
        temporal_attention_packed,
    )
    from istvt_tpu.kernels.quant import (
        ln_qkv_q8_temporal_attention,
        matmul_q8_ln_matmul_q8,
        mm_q8_ln_qkv_q8_spatial_attention,
    )

    rng = np.random.RandomState(1)
    b, t1, s, d, heads, inner = 2, 4, 32, 128, 4, 64
    n_valid = 26
    x = jnp.asarray(rng.randn(b, t1, s, d) * 0.3, jnp.float32)
    lns = jnp.asarray(rng.rand(d) + 0.5, jnp.float32)
    lnb = jnp.asarray(rng.randn(d) * 0.01, jnp.float32)
    wqkvq, wqkvs = quantize_weight(
        jnp.asarray(rng.randn(d, 3 * inner) * 0.05, jnp.float32))

    qkv = ln_matmul_q8(x.reshape(b, t1 * s, d), lns, lnb, wqkvq, wqkvs)
    want_t = temporal_attention_packed(
        qkv.reshape(b, t1, s, 3 * inner), heads)
    got_t = ln_qkv_q8_temporal_attention(x, lns, lnb, wqkvq, wqkvs,
                                         heads)
    np.testing.assert_allclose(np.asarray(got_t),
                               np.asarray(want_t.reshape(b, t1, s, inner)),
                               atol=2e-2, rtol=2e-2)

    # spatial: t-out-proj + LN + QKV + masked per-frame attention
    woq, wos = quantize_weight(
        jnp.asarray(rng.randn(inner, d) * 0.05, jnp.float32))
    bo = jnp.asarray(rng.randn(d) * 0.01, jnp.float32)
    lns2 = jnp.asarray(rng.rand(d) + 0.5, jnp.float32)
    lnb2 = jnp.asarray(rng.randn(d) * 0.01, jnp.float32)
    wq2, ws2 = quantize_weight(
        jnp.asarray(rng.randn(d, 3 * inner) * 0.05, jnp.float32))
    a_t = jnp.asarray(rng.randn(b * t1, s, inner) * 0.3, jnp.float32)

    qkv_s = matmul_q8_ln_matmul_q8(
        a_t.reshape(b, t1 * s, inner), woq, wos, bo, lns2, lnb2,
        wq2, ws2)
    want_s = spatial_attention_packed(
        qkv_s.reshape(b * t1, s, 3 * inner), heads, n_valid)
    got_s = mm_q8_ln_qkv_q8_spatial_attention(
        a_t, woq, wos, bo, lns2, lnb2, wq2, ws2, heads, n_valid)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               atol=2e-2, rtol=2e-2)


def test_istvt_int8_ingest_matches_boundary_chain():
    """End-to-end: q8_attn='ingest' (default) and 'boundary' are the same
    math modulo VMEM-vs-HBM intermediates — logits must track closely."""
    import dataclasses

    from istvt_tpu.models import istvt
    from istvt_tpu.models.registry import model_selection

    cfg_i = ISTVTConfig(**TINY, use_pallas=True, quantize="int8")
    cfg_b = dataclasses.replace(cfg_i, q8_attn="boundary")
    model = model_selection("istvt", num_out_classes=1, cfg=cfg_i)
    params, state = model.init(jax.random.PRNGKey(0))
    qparams = istvt.quantize_params(params)
    clips = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 72, 72, 3),
                              jnp.float32)
    logits_i, _ = istvt.apply(qparams, state, clips, cfg_i)
    logits_b, _ = istvt.apply(qparams, state, clips, cfg_b)
    np.testing.assert_allclose(np.asarray(logits_i),
                               np.asarray(logits_b),
                               atol=2e-2, rtol=2e-2)
    # stage-3 whole-layer mega-kernel: same math again
    cfg_l = dataclasses.replace(cfg_i, q8_attn="layer")
    logits_l, _ = istvt.apply(qparams, state, clips, cfg_l)
    np.testing.assert_allclose(np.asarray(logits_l),
                               np.asarray(logits_b),
                               atol=2e-2, rtol=2e-2)


def test_f8_stem_storage_feature_fidelity():
    """Serving-only f8 activation storage in the stem (stem_store='f8'):
    features must track the bf16/f32 stem within the 3-bit-mantissa
    error envelope, and the e2e logits within the int8 serving gate."""
    import dataclasses

    import jax.numpy as jnp

    from istvt_tpu.models import istvt, xception

    p, s = xception.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 72, 72, 3),
                          jnp.float32)
    f_ref, _ = xception.low_level_features(p, s, x)
    f_f8, _ = xception.low_level_features(
        p, s, x, store_dtype=jnp.float8_e4m3fn)
    assert f_f8.dtype == f_ref.dtype
    ref = np.asarray(f_ref, np.float32)
    d = np.abs(np.asarray(f_f8, np.float32) - ref)
    # elementwise: bounded by the e4m3 relative step; aggregate: small
    assert d.mean() / (np.abs(ref).mean() + 1e-9) < 0.08, d.mean()

    # e2e: f8 stem vs bf16 stem under int8 serving
    cfg8 = ISTVTConfig(**TINY, use_pallas=True, quantize="int8")
    cfg16 = dataclasses.replace(cfg8, stem_store="bf16")
    model_cfg = cfg8
    params, state = istvt.init(jax.random.PRNGKey(0), model_cfg)
    qparams = istvt.quantize_params(params)
    clips = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 72, 72, 3),
                              jnp.float32)
    l8, _ = istvt.apply(qparams, state, clips, cfg8)
    l16, _ = istvt.apply(qparams, state, clips, cfg16)
    np.testing.assert_allclose(np.asarray(l8), np.asarray(l16),
                               atol=5e-2, rtol=5e-2)


def test_quantized_params_checkpoint_roundtrip(tmp_path):
    """The deployed int8 artifact (quantize_params output: bf16/f32
    float leaves + int8 'q8' copies + f32 scales) must survive an Orbax
    save/load BITWISE — a restored serving checkpoint with degraded
    scales or upcast q8 leaves would silently change deployed logits
    (the ADVICE r2 'restored after quantization' scenario is now a hard
    error in models/istvt.py; this guards the artifact itself)."""
    from istvt_tpu.core.checkpoint import load_pytree, save_pytree
    from istvt_tpu.models import istvt

    cfg = ISTVTConfig(**TINY)
    params, _ = istvt.init(jax.random.PRNGKey(0), cfg)
    qp = istvt.quantize_params(params)
    path = str(tmp_path / "q8_params")
    save_pytree(path, qp)
    restored = load_pytree(path, qp)

    flat1, tree1 = jax.tree_util.tree_flatten(qp)
    flat2, tree2 = jax.tree_util.tree_flatten(restored)
    assert tree1 == tree2
    n_int8 = 0
    for a, b in zip(flat1, flat2):
        assert a.dtype == b.dtype, (a.dtype, b.dtype)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        n_int8 += a.dtype == jnp.int8
    assert n_int8 > 0, "no int8 leaves in the quantized tree"
