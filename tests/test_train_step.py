"""Train-step + sharding tests on the 8-device virtual CPU mesh
(SURVEY.md §4(c): multi-chip tests without a pod)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from istvt_tpu.core.config import ISTVTConfig, TrainConfig
from istvt_tpu.core.mesh import make_mesh
from istvt_tpu.models.registry import model_selection
from istvt_tpu.parallel import sharding as shd
from istvt_tpu.train import step as train_step
from istvt_tpu.train.schedule import cosine_schedule, reference_epoch_schedule

TINY = ISTVTConfig(num_frames=2, image_size=72, feat_hw=5, depth=1,
                   num_classes=1)


def _batch(bs=8):
    rng = np.random.RandomState(0)
    return {
        "clips": jnp.asarray(rng.randn(
            bs, TINY.num_frames, TINY.image_size, TINY.image_size, 3
        ).astype(np.float32)),
        "labels": jnp.asarray(rng.randint(0, 2, size=bs)),
    }


def test_train_step_runs_and_learns():
    model = model_selection("istvt", num_out_classes=1, cfg=TINY)
    # small constant lr: each step must move downhill on the fixed batch
    tc = TrainConfig(optimizer="sgd", momentum=0.0)
    opt = train_step.make_optimizer(tc, cosine_schedule(1e-4, 10_000_000))
    ts = train_step.create_train_state(model, jax.random.PRNGKey(0), opt)
    step_fn = train_step.make_train_step(model, opt, donate=False)
    batch = _batch()
    losses = []
    for _ in range(4):
        ts, m = step_fn(ts, batch, jax.random.PRNGKey(0))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses)
    # overfitting a fixed batch with a small step must reduce the loss
    assert losses[-1] < losses[0], losses
    assert int(ts.step) == 4


def test_train_step_sharded_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    model = model_selection("istvt", num_out_classes=1, cfg=TINY)
    tc = TrainConfig()
    opt = train_step.make_optimizer(tc, cosine_schedule(1e-3, 100))
    ts0 = train_step.create_train_state(model, jax.random.PRNGKey(0), opt)
    step_fn = train_step.make_train_step(model, opt, donate=False)
    batch = _batch()
    rng = jax.random.PRNGKey(42)

    _, m_single = step_fn(ts0, batch, rng)

    mesh = make_mesh(data=4, model=2)
    ts_sh = train_step.TrainState(
        params=shd.place(ts0.params, shd.param_shardings(ts0.params, mesh)),
        model_state=shd.place(
            ts0.model_state, shd.replicated_shardings(ts0.model_state, mesh)),
        opt_state=jax.device_put(ts0.opt_state),
        step=ts0.step,
    )
    sbatch = shd.place(batch, shd.batch_shardings(batch, mesh))
    _, m_sharded = step_fn(ts_sh, sbatch, rng)

    # same math, different partitioning: loss/acc must agree closely
    assert abs(float(m_single["loss"]) - float(m_sharded["loss"])) < 1e-4
    assert abs(float(m_single["accuracy"]) - float(m_sharded["accuracy"])) < 1e-6


def test_param_pspecs_tensor_parallel_rules():
    model = model_selection("istvt", num_out_classes=1, cfg=TINY)
    params, _ = model.init(jax.random.PRNGKey(0))
    specs = shd.param_pspecs(params)
    layer = specs["vit"]["layers"][0]
    assert layer["attn_t"]["to_qk"]["w"] == P(None, "model")
    assert layer["attn_t"]["to_v"]["w"] == P(None, "model")
    assert layer["attn_t"]["to_out"]["w"] == P("model", None)
    assert layer["attn_s"]["to_qkv"]["w"] == P(None, "model")
    assert layer["ff"]["fc1"]["w"] == P(None, "model")
    assert layer["ff"]["fc2"]["w"] == P("model", None)
    # conv stem replicated
    assert specs["xcep"]["conv1"]["w"] == P()


def test_shard_map_step_matches_jit_path():
    """Explicit-pmean shard_map DP step must agree with the
    sharding-propagated jit step on loss/accuracy."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from istvt_tpu.parallel.shard_map_step import make_shard_map_train_step

    model = model_selection("istvt", num_out_classes=1, cfg=TINY)
    tc = TrainConfig()
    opt = train_step.make_optimizer(tc, cosine_schedule(1e-3, 100))
    ts0 = train_step.create_train_state(model, jax.random.PRNGKey(0), opt)
    batch = _batch()
    rng = jax.random.PRNGKey(42)

    jit_step = train_step.make_train_step(model, opt, donate=False)
    _, m_jit = jit_step(ts0, batch, rng)

    mesh = make_mesh(data=8, model=1)
    sm_step = make_shard_map_train_step(model, opt, mesh)
    ts_r = jax.device_put(ts0, jax.sharding.NamedSharding(mesh, P()))
    sbatch = shd.place(batch, shd.batch_shardings(batch, mesh))
    ts1, m_sm = sm_step(ts_r, sbatch, rng)

    # Semantics differ slightly by design: the shard_map path computes BN
    # batch statistics per replica (the reference DataParallel behavior,
    # SURVEY.md §7 'BatchNorm under DP'), the jit path over the global
    # batch (sync-BN). Tolerance covers that BN-stat delta.
    assert abs(float(m_jit["loss"]) - float(m_sm["loss"])) < 5e-3
    assert abs(float(m_jit["accuracy"]) - float(m_sm["accuracy"])) < 1e-6
    assert int(ts1.step) == 1


def test_reference_epoch_schedule():
    sched = reference_epoch_schedule(base_lr=5e-4, warmup_epochs=20,
                                     steps_per_epoch=10)
    # epoch 0 -> 5e-4; epoch 4 -> 25e-4; epoch 25 -> 25^-1.5
    assert abs(float(sched(jnp.asarray(0))) - 5e-4) < 1e-9
    assert abs(float(sched(jnp.asarray(45))) - 5 * 5e-4) < 1e-9
    assert abs(float(sched(jnp.asarray(250))) - 25 ** -1.5) < 1e-9


def test_evaluate_pads_partial_batches_on_mesh():
    """A final partial batch (10 items, bs=8) must not crash sharded eval
    and padded rows must not contaminate metrics (ADVICE r1)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from istvt_tpu.data import SyntheticVideoDataset
    from istvt_tpu.data.loader import ClipLoader
    from istvt_tpu.train.trainer import evaluate

    model = model_selection("istvt", num_out_classes=1, cfg=TINY)
    params, mstate = model.init(jax.random.PRNGKey(0))
    ds = SyntheticVideoDataset(10, TINY.num_frames, TINY.image_size, seed=0)
    mesh = make_mesh(data=8, model=1)
    loader = ClipLoader(ds, batch_size=8, shuffle=False, num_workers=2)
    ev = evaluate(model, params, mstate, loader, mesh)
    assert ev["n"] == 10
    assert 0.0 <= ev["accuracy"] <= 1.0 and 0.0 <= ev["auc"] <= 1.0

    # unsharded single-stream pass over the same data must agree exactly
    loader1 = ClipLoader(ds, batch_size=10, shuffle=False, num_workers=2)
    ev1 = evaluate(model, params, mstate, loader1, mesh=None)
    assert abs(ev["accuracy"] - ev1["accuracy"]) < 1e-6
    assert abs(ev["auc"] - ev1["auc"]) < 1e-5


def test_eval_step_outputs():
    model = model_selection("istvt", num_out_classes=1, cfg=TINY)
    params, mstate = model.init(jax.random.PRNGKey(0))
    eval_fn = train_step.make_eval_step(model)
    out = eval_fn(params, mstate, _batch(4))
    assert out["logits"].shape == (4,)
    assert out["correct"].shape == (4,)
    total = sum(float(out[k]) for k in ("tp", "fp", "tn", "fn"))
    assert total == 4.0


def test_tp_pallas_kernels_match_xla_path():
    """VERDICT r1 #5: use_pallas=True must survive a model>1 mesh.

    Runs the same forward on (a) a single device with use_pallas=False
    and (b) a data=4 x model=2 mesh with use_pallas=True, where the
    packed Pallas attention kernels dispatch through their shard_map'd
    TP forms (parallel/tp.py). Logits must agree to float tolerance."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from istvt_tpu.parallel import tp

    cfg_x = TINY
    cfg_p = ISTVTConfig(num_frames=2, image_size=72, feat_hw=5, depth=1,
                        num_classes=1, use_pallas=True)
    model_x = model_selection("istvt", num_out_classes=1, cfg=cfg_x)
    model_p = model_selection("istvt", num_out_classes=1, cfg=cfg_p)
    params, mstate = model_x.init(jax.random.PRNGKey(0))
    batch = _batch()

    logits_x, _ = jax.jit(lambda p, s, x: model_x.apply(p, s, x))(
        params, mstate, batch["clips"])

    mesh = make_mesh(data=4, model=2)
    p_sh = shd.place(params, shd.param_shardings(params, mesh))
    s_sh = shd.place(mstate, shd.replicated_shardings(mstate, mesh))
    x_sh = shd.place(batch, shd.batch_shardings(batch, mesh))["clips"]

    def fwd(p, s, x):
        with tp.scope(mesh):
            return model_p.apply(p, s, x)

    logits_p, _ = jax.jit(fwd)(p_sh, s_sh, x_sh)
    np.testing.assert_allclose(np.asarray(logits_p), np.asarray(logits_x),
                               atol=2e-4, rtol=2e-4)


@pytest.mark.slow
def test_tp_pallas_real_geometry_s362():
    """VERDICT r2 #4: TP equivalence at the REAL token geometry.

    All other model>1 tests use S=26 toy tokens; this one feeds the DSTTr
    the paper's 19x19x728 feature grid directly (stem skipped), so the
    S=362 -> 368 tile padding and the spatial kernel's n_valid key
    masking (models/istvt.py:190-193, kernels/attention.py) are exercised
    HEAD-SHARDED (model=2) — exactly the shape where a padding/masking
    bug under TP would hide. Single-device unfused vs mesh+Pallas logits
    must agree to float tolerance."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from istvt_tpu.models import istvt
    from istvt_tpu.parallel import tp

    t = 2
    cfg_x = ISTVTConfig(num_frames=t, image_size=300, feat_hw=19, depth=1,
                        num_classes=1, use_pallas=False)
    cfg_p = ISTVTConfig(num_frames=t, image_size=300, feat_hw=19, depth=1,
                        num_classes=1, use_pallas=True)
    assert cfg_x.tokens_per_frame == 362
    vp = istvt.dsttr_init(jax.random.PRNGKey(0), cfg_x)
    feats = jax.random.normal(jax.random.PRNGKey(1), (4, t, 19, 19, 728),
                              jnp.float32) * 0.5

    ref = jax.jit(lambda p, f: istvt.dsttr_apply(p, f, cfg_x))(vp, feats)

    mesh = make_mesh(data=4, model=2)
    p_sh = shd.place(vp, shd.param_shardings(vp, mesh))
    f_sh = shd.place({"clips": feats},
                     shd.batch_shardings({"clips": feats}, mesh))["clips"]

    def fwd(p, f):
        with tp.scope(mesh):
            return istvt.dsttr_apply(p, f, cfg_p)

    got = jax.jit(fwd)(p_sh, f_sh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-4, rtol=5e-4)


def test_tp_pallas_train_step_matches_single_device():
    """TP + Pallas TRAIN step (fwd+bwd through the shard_map'd kernels)
    agrees with the unsharded non-pallas step."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg_p = ISTVTConfig(num_frames=2, image_size=72, feat_hw=5, depth=1,
                        num_classes=1, use_pallas=True)
    model_x = model_selection("istvt", num_out_classes=1, cfg=TINY)
    model_p = model_selection("istvt", num_out_classes=1, cfg=cfg_p)
    tc = TrainConfig()
    opt = train_step.make_optimizer(tc, cosine_schedule(1e-3, 100))
    ts0 = train_step.create_train_state(model_x, jax.random.PRNGKey(0), opt)
    batch = _batch()
    rng = jax.random.PRNGKey(42)

    step_x = train_step.make_train_step(model_x, opt, donate=False)
    _, m_x = step_x(ts0, batch, rng)

    mesh = make_mesh(data=4, model=2)
    ts_sh = train_step.TrainState(
        params=shd.place(ts0.params, shd.param_shardings(ts0.params, mesh)),
        model_state=shd.place(
            ts0.model_state, shd.replicated_shardings(ts0.model_state, mesh)),
        opt_state=jax.device_put(ts0.opt_state),
        step=ts0.step,
    )
    sbatch = shd.place(batch, shd.batch_shardings(batch, mesh))
    step_p = train_step.make_train_step(model_p, opt, donate=False,
                                        mesh=mesh)
    _, m_p = step_p(ts_sh, sbatch, rng)
    assert abs(float(m_x["loss"]) - float(m_p["loss"])) < 1e-4
    assert abs(float(m_x["accuracy"]) - float(m_p["accuracy"])) < 1e-6


def test_tp_pallas_eval_step():
    """make_eval_step(mesh=...) must run the Pallas path under a model>1
    mesh (the eval analog of the TP train test)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg_p = ISTVTConfig(num_frames=2, image_size=72, feat_hw=5, depth=1,
                        num_classes=1, use_pallas=True)
    model_p = model_selection("istvt", num_out_classes=1, cfg=cfg_p)
    model_x = model_selection("istvt", num_out_classes=1, cfg=TINY)
    params, mstate = model_x.init(jax.random.PRNGKey(0))
    batch = _batch()

    base = train_step.make_eval_step(model_x)(params, mstate, batch)

    mesh = make_mesh(data=4, model=2)
    p_sh = shd.place(params, shd.param_shardings(params, mesh))
    s_sh = shd.place(mstate, shd.replicated_shardings(mstate, mesh))
    b_sh = shd.place(batch, shd.batch_shardings(batch, mesh))
    out = train_step.make_eval_step(model_p, mesh=mesh)(p_sh, s_sh, b_sh)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               np.asarray(base["logits"]),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_array_equal(np.asarray(out["correct"]),
                                  np.asarray(base["correct"]))


# ---------------------------------------------------------------------------
# Gradient accumulation (make_train_step(grad_accum=k))


def _bnfree_model(cfg):
    """BN-free Model over DSTTr features: state is empty, so accumulated
    gradients must EXACTLY equal the full-batch gradient (mean losses are
    microbatch-affine)."""
    from istvt_tpu.models import istvt
    from istvt_tpu.models.registry import Model

    def init(rng):
        return {"vit": istvt.dsttr_init(rng, cfg)}, {}

    def apply(params, state, feats, train=False, rng=None):
        return istvt.dsttr_apply(params["vit"], feats, cfg,
                                 train=train, rng=rng), {}

    return Model(name="dsttr_only", config=cfg, init=init, apply=apply)


def test_grad_accum_exact_for_bn_free_model():
    cfg = ISTVTConfig(num_frames=2, image_size=72, feat_hw=5, depth=2,
                      num_classes=1)
    model = _bnfree_model(cfg)
    tc = TrainConfig()
    opt = train_step.make_optimizer(tc, cosine_schedule(1e-3, 100))
    ts0 = train_step.create_train_state(model, jax.random.PRNGKey(0), opt)
    rng = jax.random.PRNGKey(7)
    rs = np.random.RandomState(3)
    batch = {
        "clips": jnp.asarray(
            rs.randn(8, 2, 5, 5, 728).astype(np.float32) * 0.5),
        "labels": jnp.asarray(rs.randint(0, 2, size=8)),
    }

    full = train_step.make_train_step(model, opt, donate=False)
    ts1, m1 = full(ts0, batch, rng)
    for k in (2, 4):
        acc = train_step.make_train_step(model, opt, donate=False,
                                         grad_accum=k)
        ts2, m2 = acc(ts0, batch, rng)
        assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-6
        assert abs(float(m1["accuracy"]) - float(m2["accuracy"])) < 1e-6
        gn = float(m1["grad_norm"])
        # identical math, different reduction order (k wgrad sums vs one
        # batch GEMM): f32 noise only
        assert abs(gn - float(m2["grad_norm"])) < 1e-4 * max(gn, 1.0)
        a = ts1.params["vit"]["layers"][0]["ff"]["fc1"]["w"]
        b = ts2.params["vit"]["layers"][0]["ff"]["fc1"]["w"]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6, rtol=1e-5)


def test_grad_accum_istvt_smoke_and_bn_semantics():
    """Full ISTVT (BN stem): accum=2 runs, loss is finite and close to the
    full-batch loss (BN batch stats are per-microbatch, so not bitwise),
    and BN running stats DID update through the scan."""
    model = model_selection("istvt", num_out_classes=1, cfg=TINY)
    tc = TrainConfig()
    opt = train_step.make_optimizer(tc, cosine_schedule(1e-3, 100))
    ts0 = train_step.create_train_state(model, jax.random.PRNGKey(0), opt)
    batch = _batch()
    rng = jax.random.PRNGKey(5)

    full = train_step.make_train_step(model, opt, donate=False)
    _, m1 = full(ts0, batch, rng)
    acc = train_step.make_train_step(model, opt, donate=False, grad_accum=2)
    ts2, m2 = acc(ts0, batch, rng)
    l1, l2 = float(m1["loss"]), float(m2["loss"])
    assert np.isfinite(l2)
    assert abs(l1 - l2) < 0.05 * max(abs(l1), 1.0)
    # running stats moved off their init through the scanned microbatches
    leaf0 = jax.tree_util.tree_leaves(ts0.model_state)
    leaf2 = jax.tree_util.tree_leaves(ts2.model_state)
    assert any(float(jnp.max(jnp.abs(a - b))) > 1e-8
               for a, b in zip(leaf0, leaf2))


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs 8 virtual devices")
def test_grad_accum_on_data_mesh():
    """grad_accum composes with DP batch sharding: each microbatch keeps
    the 'data' sharding and the result matches the unsharded accum step."""
    model = model_selection("istvt", num_out_classes=1, cfg=TINY)
    tc = TrainConfig()
    opt = train_step.make_optimizer(tc, cosine_schedule(1e-3, 100))
    ts0 = train_step.create_train_state(model, jax.random.PRNGKey(0), opt)
    batch = _batch(bs=16)  # microbatches of 8 still shard over data=8
    rng = jax.random.PRNGKey(5)

    base = train_step.make_train_step(model, opt, donate=False,
                                      grad_accum=2)
    _, m1 = base(ts0, batch, rng)

    mesh = make_mesh(data=8, model=1)
    ts_sh = train_step.TrainState(
        params=shd.place(ts0.params,
                         shd.replicated_shardings(ts0.params, mesh)),
        model_state=shd.place(
            ts0.model_state, shd.replicated_shardings(ts0.model_state, mesh)),
        opt_state=jax.device_put(ts0.opt_state),
        step=ts0.step,
    )
    sbatch = shd.place(batch, shd.batch_shardings(batch, mesh))
    stepm = train_step.make_train_step(model, opt, donate=False, mesh=mesh,
                                       grad_accum=2)
    _, m2 = stepm(ts_sh, sbatch, rng)
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    gn = float(m1["grad_norm"])
    assert abs(gn - float(m2["grad_norm"])) < 1e-3 * max(gn, 1.0)


def test_recalibrate_bn_installs_exact_batch_stats():
    """recalibrate_bn must replace BN running stats with the EXACT batch
    statistics of the given batches under the current params — verified
    directly against hand-computed activation stats for the first BN
    (conv1's output), single-batch case."""
    model = model_selection("istvt", num_out_classes=1, cfg=TINY)
    params, mstate = model.init(jax.random.PRNGKey(0))
    batch = _batch(4)

    recal = train_step.recalibrate_bn(model, params, mstate, [batch])

    from istvt_tpu.nn.layers import conv2d
    x = batch["clips"].reshape(-1, TINY.image_size, TINY.image_size, 3)
    y = conv2d(params["xcep"]["conv1"], x, stride=2, padding=0)
    mean = jnp.mean(y, axis=(0, 1, 2))
    n = y.size // y.shape[-1]
    var = jnp.var(y, axis=(0, 1, 2)) * (n / (n - 1))
    np.testing.assert_allclose(np.asarray(recal["xcep"]["bn1"]["mean"]),
                               np.asarray(mean), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(recal["xcep"]["bn1"]["var"]),
                               np.asarray(var), rtol=1e-4, atol=1e-5)
    # structure preserved (checkpoint/pjit stability contract)
    assert jax.tree_util.tree_structure(recal) == \
        jax.tree_util.tree_structure(mstate)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_recalibrate_bn_under_tp_mesh():
    """recalibrate_bn(mesh=...) must survive TP-sharded params with the
    Pallas kernels active (the probe traces inside tp.scope like every
    step builder) and agree with the single-device recalibration."""
    cfg = ISTVTConfig(num_frames=2, image_size=72, feat_hw=5, depth=1,
                      num_classes=1, use_pallas=True)
    model = model_selection("istvt", num_out_classes=1, cfg=cfg)
    params, mstate = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    batch = {
        "clips": jnp.asarray(rng.randn(8, 2, 72, 72, 3).astype(np.float32)),
        "labels": jnp.asarray(rng.randint(0, 2, size=8)),
    }

    ref = train_step.recalibrate_bn(model, params, mstate, [batch])

    mesh = make_mesh(data=4, model=2)
    p_sh = shd.place(params, shd.param_shardings(params, mesh))
    s_sh = shd.place(mstate, shd.replicated_shardings(mstate, mesh))
    b_sh = shd.place(batch, shd.batch_shardings(batch, mesh))
    got = train_step.recalibrate_bn(model, p_sh, s_sh, [b_sh], mesh=mesh)

    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-5)
