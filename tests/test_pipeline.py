"""Pipeline-parallel (GPipe over the ST layer stack) tests on the
8-device virtual CPU mesh (SURVEY.md §4(c); parallel/pp.py).

The pipeline must be a pure re-partitioning of the sequential layer
loop (reference network/vivit/vivit.py:97-100): identical logits,
identical training math, for any microbatch count and for both the XLA
and the fused-Pallas layer bodies.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from istvt_tpu.core.config import ISTVTConfig, TrainConfig
from istvt_tpu.core.mesh import make_mesh
from istvt_tpu.models import istvt
from istvt_tpu.models.registry import model_selection
from istvt_tpu.parallel import pp
from istvt_tpu.parallel import sharding as shd
from istvt_tpu.train import step as train_step
from istvt_tpu.train.schedule import cosine_schedule

needs8 = pytest.mark.skipif(len(jax.devices()) < 8,
                            reason="needs 8 virtual devices")


def _feats(b=8, t=2, hw=5, d=728, seed=1):
    return jax.random.normal(jax.random.PRNGKey(seed), (b, t, hw, hw, d),
                             jnp.float32) * 0.5


@needs8
@pytest.mark.parametrize("microbatches", [None, 1, 2])
def test_pipeline_forward_matches_sequential(microbatches):
    """depth=4 over pipe=4 stages (+data=2) must reproduce the
    sequential layer loop bit-for-bit at f32 tolerance, for the
    steady-state microbatch count (None -> stages), a full-bubble M=1,
    and an in-between M=2."""
    cfg = ISTVTConfig(num_frames=2, image_size=72, feat_hw=5, depth=4,
                      num_classes=1)
    vp = istvt.dsttr_init(jax.random.PRNGKey(0), cfg)
    feats = _feats()

    ref = jax.jit(lambda p, f: istvt.dsttr_apply(p, f, cfg))(vp, feats)

    mesh = make_mesh(data=2, model=1, pipe=4)
    p_sh = shd.place(vp, shd.replicated_shardings(vp, mesh))
    f_sh = jax.device_put(
        feats, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data")))

    def fwd(p, f):
        with pp.scope(mesh, microbatches):
            return istvt.dsttr_apply(p, f, cfg)

    got = jax.jit(fwd)(p_sh, f_sh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@needs8
def test_pipeline_forward_pallas_kernels():
    """The fused-Pallas layer body (use_pallas=True incl. the S->8k tile
    padding + n_valid masking) must survive the pipe shard_map."""
    cfg_x = ISTVTConfig(num_frames=2, image_size=72, feat_hw=5, depth=4,
                        num_classes=1, use_pallas=False)
    cfg_p = ISTVTConfig(num_frames=2, image_size=72, feat_hw=5, depth=4,
                        num_classes=1, use_pallas=True)
    vp = istvt.dsttr_init(jax.random.PRNGKey(0), cfg_x)
    feats = _feats()

    ref = jax.jit(lambda p, f: istvt.dsttr_apply(p, f, cfg_x))(vp, feats)

    mesh = make_mesh(data=2, model=1, pipe=4)
    p_sh = shd.place(vp, shd.replicated_shardings(vp, mesh))
    f_sh = jax.device_put(
        feats, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data")))

    def fwd(p, f):
        with pp.scope(mesh):
            return istvt.dsttr_apply(p, f, cfg_p)

    got = jax.jit(fwd)(p_sh, f_sh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


@needs8
def test_pipeline_vjp_exact_f64():
    """The pipeline's forward AND backward are the same math as the
    sequential layer loop — bit-level in f64 (machine epsilon), for a
    toy shape-preserving layer. This is the rigorous correctness anchor;
    the full-model f32 test below can only check to reduction-order
    noise (microbatched wgrad sums vs one fused GEMM)."""
    with jax.enable_x64():
        D, depth, B, N = 16, 4, 8, 6
        rs = np.random.RandomState(0)
        layers = [{"w": jnp.asarray(rs.randn(D, D) * 0.3),
                   "b": jnp.asarray(rs.randn(D) * 0.1)}
                  for _ in range(depth)]
        x = jnp.asarray(rs.randn(B, N, D))

        def layer_fn(lp, xv):
            return jnp.tanh(xv @ lp["w"] + lp["b"]) + xv

        def seq(ls, xv):
            for lp in ls:
                xv = layer_fn(lp, xv)
            return jnp.sum(jnp.sin(xv))

        mesh = make_mesh(data=2, model=1, pipe=4)

        def piped(ls, xv):
            with pp.scope(mesh, None):
                return jnp.sum(jnp.sin(pp.pipeline_layers(xv, ls, layer_fn)))

        l1, g1 = jax.value_and_grad(seq, argnums=(0, 1))(layers, x)
        l2, g2 = jax.jit(jax.value_and_grad(piped, argnums=(0, 1)))(layers, x)
        assert abs(float(l1) - float(l2)) < 1e-12
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            assert float(jnp.max(jnp.abs(a - b))) < 1e-10


@needs8
@pytest.mark.slow
def test_pipeline_train_step_matches_single_device():
    """Full ISTVT train step (stem + pipelined DSTTr + head, BCE + AdamW)
    on a data=2 x pipe=4 mesh vs the unsharded step. The backward is
    EXACT math (test_pipeline_vjp_exact_f64) but not bitwise in f32:
    each stage accumulates its weight grads over M microbatch GEMMs
    instead of one fused batch GEMM, so loss/grad-norm/updates agree
    only to reduction-order noise (measured: grad_norm rel ~1e-3 at
    85M params; AdamW step-1 updates are lr*sign(g) so near-zero-grad
    elements can flip sign, bounding per-element |delta| by ~2*lr)."""
    cfg = ISTVTConfig(num_frames=2, image_size=72, feat_hw=5, depth=4,
                      num_classes=1)
    model = model_selection("istvt", num_out_classes=1, cfg=cfg)
    tc = TrainConfig()
    opt = train_step.make_optimizer(tc, cosine_schedule(1e-3, 100))
    ts0 = train_step.create_train_state(model, jax.random.PRNGKey(0), opt)
    rng = jax.random.PRNGKey(42)
    rs = np.random.RandomState(0)
    batch = {
        "clips": jnp.asarray(rs.randn(8, 2, 72, 72, 3).astype(np.float32)),
        "labels": jnp.asarray(rs.randint(0, 2, size=8)),
    }

    step_single = train_step.make_train_step(model, opt, donate=False)
    ts1, m1 = step_single(ts0, batch, rng)

    mesh = make_mesh(data=2, model=1, pipe=4)
    ts_sh = train_step.TrainState(
        params=shd.place(ts0.params, shd.replicated_shardings(ts0.params,
                                                              mesh)),
        model_state=shd.place(
            ts0.model_state, shd.replicated_shardings(ts0.model_state, mesh)),
        opt_state=jax.device_put(ts0.opt_state),
        step=ts0.step,
    )
    sbatch = shd.place(batch, shd.batch_shardings(batch, mesh))
    step_pp = train_step.make_train_step(model, opt, donate=False, mesh=mesh)
    ts2, m2 = step_pp(ts_sh, sbatch, rng)

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    assert abs(float(m1["accuracy"]) - float(m2["accuracy"])) < 1e-6
    gn = float(m1["grad_norm"])
    assert abs(gn - float(m2["grad_norm"])) < 3e-3 * gn
    # updated params agree leaf-by-leaf (first/last layer + head):
    # mean |delta| far below the lr=1e-3 update scale, max bounded by
    # ~2*lr (rare sign flips of near-zero-grad elements under AdamW's
    # step-1 lr*sign(g) update)
    lr = 1e-3  # cosine_schedule(1e-3, ...) value at step 0
    checked = [ts1.params["vit"]["layers"][0]["ff"]["fc1"]["w"],
               ts1.params["vit"]["layers"][-1]["ff"]["fc1"]["w"],
               ts1.params["vit"]["mlp_head"]["fc"]["w"]]
    against = [ts2.params["vit"]["layers"][0]["ff"]["fc1"]["w"],
               ts2.params["vit"]["layers"][-1]["ff"]["fc1"]["w"],
               ts2.params["vit"]["mlp_head"]["fc"]["w"]]
    for a, b in zip(checked, against):
        d = np.abs(np.asarray(a) - np.asarray(b))
        assert float(d.mean()) < 0.05 * lr, float(d.mean())
        assert float(d.max()) < 2.5 * lr, float(d.max())


@needs8
def test_pipeline_train_step_fast_guard():
    """Default-suite (<60 s) PP train-step equivalence — the always-run
    regression guard for the 16-25 min slow full-model test above: a
    small-dim DSTTr-only model through the SAME make_train_step path
    (loss + grads + optimizer update) on a data=2 x pipe=4 mesh vs the
    unsharded step. SGD (not AdamW) so the update is linear in the
    gradient and sharded reduction-order noise stays near f32 epsilon
    instead of the documented lr*sign(g) sign-flip bound."""
    cfg = ISTVTConfig(num_frames=2, image_size=72, feat_hw=3, depth=4,
                      num_classes=1, dim=64, heads=4, dim_head=8,
                      mlp_ratio=2)

    class TinyDSTTr:
        """make_train_step model protocol over the transformer stack
        alone (no Xception stem): 'clips' are pre-stem feature grids."""

        def init(self, rng):
            return istvt.dsttr_init(rng, cfg), {}

        def apply(self, params, state, x, train=False, rng=None):
            return istvt.dsttr_apply(params, x, cfg, train=train,
                                     rng=rng), state

    model = TinyDSTTr()
    tc = TrainConfig(optimizer="sgd", momentum=0.9)
    opt = train_step.make_optimizer(tc, cosine_schedule(1e-2, 100))
    ts0 = train_step.create_train_state(model, jax.random.PRNGKey(0), opt)
    rng = jax.random.PRNGKey(42)
    rs = np.random.RandomState(3)
    batch = {
        "clips": jnp.asarray(rs.randn(8, 2, 3, 3, 64).astype(np.float32)),
        "labels": jnp.asarray(rs.randint(0, 2, size=8)),
    }

    step_single = train_step.make_train_step(model, opt, donate=False)
    ts1, m1 = step_single(ts0, batch, rng)

    mesh = make_mesh(data=2, model=1, pipe=4)
    ts_sh = train_step.TrainState(
        params=shd.place(ts0.params, shd.replicated_shardings(ts0.params,
                                                              mesh)),
        model_state=ts0.model_state,
        opt_state=jax.device_put(ts0.opt_state),
        step=ts0.step,
    )
    sbatch = shd.place(batch, shd.batch_shardings(batch, mesh))
    step_pp = train_step.make_train_step(model, opt, donate=False, mesh=mesh)
    ts2, m2 = step_pp(ts_sh, sbatch, rng)

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-6
    gn = float(m1["grad_norm"])
    assert abs(gn - float(m2["grad_norm"])) < 1e-4 * max(gn, 1.0)
    for a, b in zip(jax.tree_util.tree_leaves(ts1.params),
                    jax.tree_util.tree_leaves(ts2.params)):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-5


@needs8
@pytest.mark.parametrize("use_pallas", [False, True])
def test_pipeline_tp_forward_matches_sequential(use_pallas):
    """TP×PP composition: a data=2 x model=2 x pipe=2 mesh running the
    manual-Megatron layer body (head-sharded packed attention + psum'd
    row-parallel projections) inside the pipe shard_map must reproduce
    the single-device sequential layer loop."""
    from istvt_tpu.parallel import tp
    cfg_seq = ISTVTConfig(num_frames=2, image_size=72, feat_hw=5, depth=4,
                          num_classes=1, use_pallas=False)
    cfg = ISTVTConfig(num_frames=2, image_size=72, feat_hw=5, depth=4,
                      num_classes=1, use_pallas=use_pallas)
    vp = istvt.dsttr_init(jax.random.PRNGKey(0), cfg)
    feats = _feats()

    ref = jax.jit(lambda p, f: istvt.dsttr_apply(p, f, cfg_seq))(vp, feats)

    mesh = make_mesh(data=2, model=2, pipe=2)
    p_sh = shd.place(vp, shd.param_shardings(vp, mesh))
    f_sh = jax.device_put(
        feats, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data")))

    def fwd(p, f):
        with tp.scope(mesh), pp.scope(mesh):
            return istvt.dsttr_apply(p, f, cfg)

    got = jax.jit(fwd)(p_sh, f_sh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


@needs8
def test_pipeline_tp_grads_match_sequential():
    """TP×PP backward: grads of a BCE-style scalar through the composed
    mesh equal the sequential-loop grads (f32, small-dim DSTTr so the
    reduction-order noise stays tiny)."""
    from istvt_tpu.parallel import tp
    cfg = ISTVTConfig(num_frames=2, image_size=72, feat_hw=3, depth=4,
                      num_classes=1, dim=64, heads=4, dim_head=8,
                      mlp_ratio=2)
    vp = istvt.dsttr_init(jax.random.PRNGKey(1), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(2), (8, 2, 3, 3, 64),
                              jnp.float32) * 0.5

    def loss_seq(p, f):
        return jnp.sum(jax.nn.sigmoid(istvt.dsttr_apply(p, f, cfg)))

    g_ref = jax.jit(jax.grad(loss_seq))(vp, feats)

    mesh = make_mesh(data=2, model=2, pipe=2)
    p_sh = shd.place(vp, shd.param_shardings(vp, mesh))
    f_sh = jax.device_put(
        feats, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data")))

    def loss_tp(p, f):
        with tp.scope(mesh), pp.scope(mesh):
            return jnp.sum(jax.nn.sigmoid(istvt.dsttr_apply(p, f, cfg)))

    g_got = jax.jit(jax.grad(loss_tp))(p_sh, f_sh)
    for path, a in jax.tree_util.tree_leaves_with_path(g_ref):
        b = g_got
        for k in path:
            b = b[k.key if hasattr(k, "key") else k.idx]
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-5, rtol=5e-4,
                                   err_msg=jax.tree_util.keystr(path))


@needs8
def test_pipeline_scope_guards():
    """scope() must no-op on meshes without a pipe axis, activate on
    model>1 meshes (TP×PP composition), and reject depth % pipe != 0."""
    mesh_dp = make_mesh(data=8, model=1)
    with pp.scope(mesh_dp):
        assert not pp.active()
    with pp.scope(make_mesh(data=2, model=2, pipe=2)):
        assert pp.active()
    cfg = ISTVTConfig(num_frames=2, image_size=72, feat_hw=5, depth=3,
                      num_classes=1)
    vp = istvt.dsttr_init(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(data=2, model=1, pipe=4)
    with pp.scope(mesh):
        # depth=3 not divisible by pipe=4
        with pytest.raises(AssertionError):
            istvt.dsttr_apply(vp, _feats(), cfg)


def test_stack_layers_roundtrip():
    layers = [{"w": jnp.full((2, 3), i, jnp.float32), "b": jnp.ones((3,))}
              for i in range(4)]
    st = pp.stack_layers(layers)
    assert st["w"].shape == (4, 2, 3) and st["b"].shape == (4, 3)
    np.testing.assert_array_equal(np.asarray(st["w"][2]),
                                  np.full((2, 3), 2, np.float32))
