"""Specialized training branches: triplet + adversarial alternation
(reference train_CNN.py:236-828, SURVEY.md §3.2)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from istvt_tpu.models import unet as U
from istvt_tpu.train import step as S
from istvt_tpu.train.branches import (
    AdversarialState,
    make_adversarial_train_step,
    make_triplet_train_step,
)
from istvt_tpu.train.step import TrainState


def test_triplet_train_step():
    p, s, cfg = U.modified_unet_init(jax.random.PRNGKey(0), 3, 3,
                                     mode="add")

    def triple_apply(params, state, a, pos, n, train=False, rng=None):
        def fwd(params, state, x, train=False, rng=None):
            return U.modified_unet_apply(params, state, x, cfg, train, rng)
        return U.triple_apply(fwd, params, state, a, pos, n, train=train,
                              rng=rng)

    opt = optax.sgd(1e-4)
    ts = TrainState(params=p, model_state=s, opt_state=opt.init(p),
                    step=jnp.zeros((), jnp.int32))
    step = make_triplet_train_step(triple_apply, opt, loss_kind="total")
    rng0 = np.random.RandomState(0)
    batch = {
        "clips": jnp.asarray(rng0.randn(2, 48, 48, 3), jnp.float32),
        "clips_pos": jnp.asarray(rng0.randn(2, 48, 48, 3), jnp.float32),
        "clips_neg": jnp.asarray(rng0.randn(2, 48, 48, 3), jnp.float32),
        "labels": jnp.asarray([0, 1]),
    }
    ts2, m = step(ts, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    assert int(ts2.step) == 1
    # params actually moved
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), ts.params, ts2.params)
    assert max(jax.tree_util.tree_leaves(d)) > 0


def test_adversarial_train_step():
    key = jax.random.PRNGKey(0)
    bb_p, bb_s, bb_cfg = U.ensemble_en_init(key, num_nets=3,
                                            model="efficientnet-b0",
                                            num_classes=1)
    feat_dim = bb_cfg["feat_dim"]
    sol_p, sol_s = U.jigsaw_solver_init(jax.random.PRNGKey(1), 9, feat_dim)
    ccls_p = U.compression_cls_init(jax.random.PRNGKey(2), feat_dim)

    def ensemble_apply(params, state, inputs, train, rng):
        return U.ensemble_en_apply(params, state, inputs, bb_cfg, train,
                                   rng)

    def solver_apply(params, state, feat, train):
        return U.jigsaw_solver_apply(params, state, feat, train)

    def ccls_apply(params, feat):
        return U.compression_cls_apply(params, feat)

    bopt, sopt, copt = optax.sgd(1e-4), optax.sgd(1e-4), optax.sgd(1e-4)
    st = AdversarialState(
        backbone=TrainState(bb_p, bb_s, bopt.init(bb_p),
                            jnp.zeros((), jnp.int32)),
        solver_params=sol_p, solver_state=sol_s,
        solver_opt=sopt.init(sol_p),
        ccls_params=ccls_p, ccls_opt=copt.init(ccls_p))
    step = make_adversarial_train_step(ensemble_apply, solver_apply,
                                       ccls_apply, bopt, sopt, copt)
    rng0 = np.random.RandomState(0)
    b = 2
    batch = {
        "views": [jnp.asarray(rng0.randn(b, 48, 48, 3), jnp.float32)
                  for _ in range(3)],
        "labels": jnp.asarray([0, 1]),
        "perm": jnp.asarray(rng0.permutation(9)[None].repeat(b, 0)),
        "qual": jnp.asarray([1, 0]),
    }
    st2, m = step(st, batch, jax.random.PRNGKey(3))
    for k in ("loss", "solver_loss", "ccls_loss"):
        assert np.isfinite(float(m[k])), k
    assert int(st2.backbone.step) == 1
    # all three parameter groups moved
    for a, b_ in ((st.backbone.params, st2.backbone.params),
                  (st.solver_params, st2.solver_params),
                  (st.ccls_params, st2.ccls_params)):
        d = jax.tree_util.tree_map(
            lambda u, v: float(jnp.abs(u - v).max()), a, b_)
        assert max(jax.tree_util.tree_leaves(d)) > 0


def test_adversarial_step_dumps_s_attns(tmp_path):
    """VERDICT r2 #8: the pair-training attention side dumps (reference
    train_CNN.py:396-401) — s_attns travel in the step metrics and
    AttnDumper writes the reference-named .npy files."""
    from istvt_tpu.train.attn_dump import AttnDumper

    feat_dim = 18
    rngk = jax.random.PRNGKey(0)
    w = jax.random.normal(rngk, (48 * 48 * 3, feat_dim)) * 0.01
    bb_p = {"w": w, "fc": jnp.zeros((feat_dim, 2))}

    def ensemble_apply(params, state, inputs, train, rng):
        # minimal (clas, feats, s_attns, _) contract of EnsembleXcep
        # (unet.py:535-552): per-branch logits, feature maps, attn maps
        clas, feats, s_attns = [], [], []
        for x in inputs:
            f = x.reshape(x.shape[0], -1) @ params["w"]
            clas.append(f @ params["fc"])
            feats.append(f)
            s_attns.append(jax.nn.sigmoid(
                f[:, :4].reshape(x.shape[0], 2, 2, 1)))
        return (clas, feats, s_attns, []), state

    def solver_apply(params, state, feat, train):
        return feat[:, :18], state

    def ccls_apply(params, feat):
        return feat[:, :2]

    bopt, sopt, copt = optax.sgd(1e-4), optax.sgd(1e-4), optax.sgd(1e-4)
    st = AdversarialState(
        backbone=TrainState(bb_p, {}, bopt.init(bb_p),
                            jnp.zeros((), jnp.int32)),
        solver_params={}, solver_state={}, solver_opt=sopt.init({}),
        ccls_params={}, ccls_opt=copt.init({}))
    step = make_adversarial_train_step(ensemble_apply, solver_apply,
                                       ccls_apply, bopt, sopt, copt,
                                       return_attns=True)
    rng0 = np.random.RandomState(0)
    b = 2
    views = [jnp.asarray(rng0.randn(b, 48, 48, 3), jnp.float32)
             for _ in range(3)]
    batch = {
        "views": views,
        "views_pair": [v + 0.1 for v in views],
        "labels": jnp.asarray([0, 1]),
        "perm": jnp.asarray(rng0.permutation(9)[None].repeat(b, 0)),
        "qual": jnp.asarray([1, 0]),
    }
    st2, m = step(st, batch, jax.random.PRNGKey(3))
    assert m["s_attns"].shape == (b, 2, 2, 1)
    assert m["s_attns_p"].shape == (b, 2, 2, 1)

    dump = AttnDumper(str(tmp_path / "out"), every=2)
    dump(1, m)  # off-cadence: nothing written
    assert not (tmp_path / "out").exists()
    dump(2, m)
    a = np.load(tmp_path / "out" / "s_attns_npe.npy")
    ap = np.load(tmp_path / "out" / "s_attns_p_npe.npy")
    assert a.shape == (b, 2, 2, 1) and ap.shape == (b, 2, 2, 1)
    assert not np.allclose(a, ap)


def test_trainer_step_hook_fires():
    """Trainer.fit calls step_hook(step, metrics) each iteration (the
    cli/train.py --dump_attns_every wiring point)."""
    from istvt_tpu.core.config import DataConfig, TrainConfig
    from istvt_tpu.data.loader import ClipLoader
    from istvt_tpu.data.video_dataset import ClipDataset
    from istvt_tpu.models.registry import model_selection
    from istvt_tpu.train.trainer import Trainer

    class _Imgs(ClipDataset):
        def __len__(self):
            return 16

        def __getitem__(self, i):
            r = np.random.default_rng(i)
            return {"images": r.normal(0, 0.5, (256, 256, 3))
                    .astype(np.float32),
                    "labels": np.int32(i % 2)}

    model = model_selection("mesonet", num_out_classes=1)
    seen = []
    trainer = Trainer(
        model,
        TrainConfig(model_name="meso4", num_epochs=1, base_lr=1e-3,
                    checkpoint_dir=""),
        DataConfig(dataset="synthetic"),
        steps_per_epoch=2, log_fn=lambda s: None,
        step_hook=lambda step, m: seen.append((step, sorted(m))))
    loader = ClipLoader(_Imgs(), batch_size=8, shuffle=False,
                        num_workers=1)
    trainer.fit(loader, val_loader=None)
    assert len(seen) == 2
    assert seen[0][0] == 1 and "loss" in seen[0][1]


def test_triplet_model_trains_and_evals_end_to_end():
    """VERDICT r1 #8: a multi-input (triplet) family must run the FULL
    train -> evaluate loop: triplet train step on (anchor, pos, neg)
    batches, then trainer.evaluate through the model's single-input apply
    (2-class logits collapsed to a threshold-at-0 score)."""
    from istvt_tpu.data.video_dataset import ClipDataset
    from istvt_tpu.models.registry import model_selection
    from istvt_tpu.train.trainer import evaluate

    model = model_selection("tripunet_efficientnet_add", num_out_classes=2)
    params, mstate = model.init(jax.random.PRNGKey(0))
    opt = optax.sgd(1e-3)
    ts = TrainState(params=params, model_state=mstate,
                    opt_state=opt.init(params),
                    step=jnp.zeros((), jnp.int32))
    step = make_triplet_train_step(model.extras["forward_triple"], opt,
                                   loss_kind="total")
    rng0 = np.random.RandomState(0)
    batch = {
        "clips": jnp.asarray(rng0.randn(2, 48, 48, 3), jnp.float32),
        "clips_pos": jnp.asarray(rng0.randn(2, 48, 48, 3), jnp.float32),
        "clips_neg": jnp.asarray(rng0.randn(2, 48, 48, 3), jnp.float32),
        "labels": jnp.asarray([0, 1]),
    }
    for _ in range(2):
        ts, m = step(ts, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))

    class _Imgs(ClipDataset):
        def __len__(self):
            return 6

        def __getitem__(self, i):
            r = np.random.default_rng(i)
            return {"images": r.normal(0, 0.5, (48, 48, 3))
                    .astype(np.float32),
                    "labels": np.int32(i % 2)}

    from istvt_tpu.data.loader import ClipLoader
    loader = ClipLoader(_Imgs(), batch_size=3, shuffle=False, num_workers=1)
    ev = evaluate(model, ts.params, ts.model_state, loader)
    assert ev["n"] == 6
    assert 0.0 <= ev["accuracy"] <= 1.0 and 0.0 <= ev["auc"] <= 1.0


def test_ensemble_model_evals_end_to_end():
    """The ensemble (forward_multi) family must also run trainer.evaluate
    through its single-input apply (branch-averaged 2-class logits)."""
    from istvt_tpu.data.video_dataset import ClipDataset
    from istvt_tpu.models.registry import model_selection
    from istvt_tpu.train.trainer import evaluate

    model = model_selection("multi_efficientnet", num_out_classes=2)
    params, mstate = model.init(jax.random.PRNGKey(0))

    class _Imgs(ClipDataset):
        def __len__(self):
            return 4

        def __getitem__(self, i):
            r = np.random.default_rng(i)
            return {"images": r.normal(0, 0.5, (64, 64, 3))
                    .astype(np.float32),
                    "labels": np.int32(i % 2)}

    from istvt_tpu.data.loader import ClipLoader
    loader = ClipLoader(_Imgs(), batch_size=2, shuffle=False, num_workers=1)
    ev = evaluate(model, params, mstate, loader)
    assert ev["n"] == 4
    assert 0.0 <= ev["accuracy"] <= 1.0 and 0.0 <= ev["auc"] <= 1.0


def test_trainer_recal_bn_post_pass():
    """recal_bn_batches wires S.recalibrate_bn into Trainer.fit: the
    returned state's BN stats are the EXACT batch statistics of the
    recal batches (not the momentum-lagged running values)."""
    from istvt_tpu.core.config import DataConfig, TrainConfig
    from istvt_tpu.data.loader import ClipLoader
    from istvt_tpu.data.video_dataset import ClipDataset
    from istvt_tpu.models.registry import model_selection
    from istvt_tpu.train import step as S
    from istvt_tpu.train.trainer import Trainer

    class _Imgs(ClipDataset):
        def __len__(self):
            return 8

        def __getitem__(self, i):
            r = np.random.default_rng(i)
            return {"images": r.normal(0, 0.5, (256, 256, 3))
                    .astype(np.float32),
                    "labels": np.int32(i % 2)}

    model = model_selection("mesonet", num_out_classes=1)
    logs = []
    trainer = Trainer(
        model,
        TrainConfig(model_name="meso4", num_epochs=1, base_lr=1e-3,
                    checkpoint_dir=""),
        DataConfig(dataset="synthetic"),
        steps_per_epoch=1, log_fn=logs.append, recal_bn_batches=1)
    loader = ClipLoader(_Imgs(), batch_size=8, shuffle=False, num_workers=1)
    ts = trainer.fit(loader, val_loader=None)
    assert any("recalibrated BN" in s for s in logs), logs

    loader.set_epoch(1)
    batch = next(iter(loader))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    want = S.recalibrate_bn(model, ts.params,
                            jax.tree_util.tree_map(jnp.zeros_like,
                                                   ts.model_state),
                            [batch])
    for a, b in zip(jax.tree_util.tree_leaves(ts.model_state),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
