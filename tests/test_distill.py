"""Knowledge distillation (train/distill.py + losses.distillation_bce).

Capability contract: a depth-1 student trained with alpha=0 — i.e. from
the TEACHER'S soft targets alone, never reading a label — must reach
held-out val AUC >= 0.9 on the synthetic temporal-artifact task. That
proves actual knowledge transfer through the distillation plumbing, not
just that the (easy) task is learnable. Teacher BN is recalibrated
before teaching (train/step.recalibrate_bn — short runs otherwise leave
eval-mode teacher logits collapsed, the documented BN-residual trap).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from istvt_tpu.core.config import ISTVTConfig, TrainConfig
from istvt_tpu.data import SyntheticVideoDataset
from istvt_tpu.models.registry import model_selection
from istvt_tpu.train import distill as D
from istvt_tpu.train import losses as L
from istvt_tpu.train import step as S
from istvt_tpu.train.metrics import auc
from istvt_tpu.train.schedule import cosine_schedule

T, SZ = 3, 72


def test_distill_loss_limits():
    z = jax.random.normal(jax.random.PRNGKey(0), (8,))
    t = jax.random.normal(jax.random.PRNGKey(1), (8,))
    labels = jnp.array([0, 1] * 4)
    # alpha=1 reduces to the plain hard-label BCE
    assert float(L.distillation_bce(z, t, labels, alpha=1.0)) == \
        pytest.approx(float(L.bce_with_logits(z, labels)), rel=1e-6)
    # alpha=0 soft term: gradient vanishes exactly at student == teacher
    soft = lambda zz: L.distillation_bce(zz, t, labels, alpha=0.0)
    assert float(jnp.max(jnp.abs(jax.grad(soft)(t)))) < 1e-6
    assert float(jnp.max(jnp.abs(jax.grad(soft)(t + 1.0)))) > 1e-3


def _batch_of(ds, idx):
    items = [ds[i] for i in idx]
    return {"clips": jnp.asarray(np.stack([it["clips"] for it in items])),
            "labels": jnp.asarray(np.stack([it["labels"] for it in items]))}


def _val_auc(model, params, mstate, val_batch):
    out = S.make_eval_step(model)(params, mstate, val_batch)
    return float(auc(out["logits"], out["labels"]))


def test_student_learns_from_teacher_logits_alone(synthetic_trained):
    # teacher: the session-scoped trained capability model (depth 2,
    # static-patch task — same as tests/test_e2e_learning.py)
    teacher, tp, tms, batches = synthetic_trained
    val_ds = SyntheticVideoDataset(num_clips=16, seq_len=T, size=SZ,
                                   seed=999, static_patch=True,
                                   patch_size=24)
    vb = _batch_of(val_ds, range(16))
    assert _val_auc(teacher, tp, tms, vb) >= 0.95

    # student: HALF the ST stack, trained purely on teacher soft targets
    student = model_selection(
        "istvt", num_out_classes=1,
        cfg=ISTVTConfig(num_frames=T, image_size=SZ, feat_hw=5, depth=1))
    opt = S.make_optimizer(TrainConfig(optimizer="adamw"),
                           cosine_schedule(3e-4, 10_000))
    ts = S.create_train_state(student, jax.random.PRNGKey(7), opt)
    step = S.make_train_step(
        student, opt, donate=False,
        loss_fn=L.make_distill_loss(alpha=0.0, temperature=2.0))
    hook = D.augment_with_teacher(D.make_teacher_fn(teacher, tp, tms))
    rng = jax.random.PRNGKey(8)
    for _ in range(6):
        for b in batches:
            rng, srng = jax.random.split(rng)
            ts, m = step(ts, hook(b), srng)
    sms = S.recalibrate_bn(student, ts.params, ts.model_state, batches)
    s_auc = _val_auc(student, ts.params, sms, vb)
    assert s_auc >= 0.9, f"distilled student val AUC {s_auc}"


def test_infer_feat_hw_matches_stem():
    """The stem's grid law is NOT a clean size//16 (56 -> 4, not 3);
    infer_feat_hw must agree with the real stem at EVERY table entry
    and at an eval_shape-resolved size (64)."""
    from istvt_tpu.models import xception
    from istvt_tpu.models.istvt import _FEAT_HW, infer_feat_hw
    for sz in (*sorted(_FEAT_HW), 64):
        p, s = jax.eval_shape(
            lambda k: xception.init(k, xception.XceptionConfig(
                num_classes=2)), jax.random.PRNGKey(0))
        feats, _ = jax.eval_shape(
            lambda p_, s_, x_: xception.low_level_features(p_, s_, x_,
                                                           False),
            p, s, jax.ShapeDtypeStruct((1, sz, sz, 3), jnp.float32))
        assert infer_feat_hw(sz) == feats.shape[1], sz


def test_student_learns_at_reduced_geometry(synthetic_trained):
    """Composed serving recipe's knowledge-transfer path (docs/SERVING.md
    'both levers stack'): the student is BOTH shallower (depth 1) and at
    a REDUCED input size (48^2 vs the teacher's 72^2). The teacher
    scores the original clips; the hook downscales them for the student
    (logits are geometry-free, pos-embeddings are not — each model keeps
    its own grid). Trained from soft targets alone, the student must
    still separate held-out clips."""
    from istvt_tpu.models.istvt import infer_feat_hw
    teacher, tp, tms, batches = synthetic_trained
    SSZ = 48
    hook = D.augment_with_teacher(D.make_teacher_fn(teacher, tp, tms),
                                  student_size=SSZ)
    small = [hook(b) for b in batches]   # teacher logits are static
    assert small[0]["clips"].shape[2:4] == (SSZ, SSZ)
    assert small[0]["teacher_logits"].shape[0] == \
        small[0]["clips"].shape[0]

    student = model_selection(
        "istvt", num_out_classes=1,
        cfg=ISTVTConfig(num_frames=T, image_size=SSZ,
                        feat_hw=infer_feat_hw(SSZ), depth=1))
    opt = S.make_optimizer(TrainConfig(optimizer="adamw"),
                           cosine_schedule(3e-4, 10_000))
    ts = S.create_train_state(student, jax.random.PRNGKey(11), opt)
    step = S.make_train_step(
        student, opt, donate=False,
        loss_fn=L.make_distill_loss(alpha=0.0, temperature=2.0))
    rng = jax.random.PRNGKey(12)
    for _ in range(6):
        for b in small:
            rng, srng = jax.random.split(rng)
            ts, m = step(ts, b, srng)
    sms = S.recalibrate_bn(student, ts.params, ts.model_state, small)

    val_ds = SyntheticVideoDataset(num_clips=16, seq_len=T, size=SZ,
                                   seed=999, static_patch=True,
                                   patch_size=24)
    vb = _batch_of(val_ds, range(16))
    vb = {"clips": jax.image.resize(
              vb["clips"], (16, T, SSZ, SSZ, 3), "bilinear"),
          "labels": vb["labels"]}
    s_auc = _val_auc(student, ts.params, sms, vb)
    assert s_auc >= 0.9, f"reduced-geometry student val AUC {s_auc}"


def test_cli_distill_requires_checkpoint(tmp_path):
    from istvt_tpu.cli import train as cli_train
    with pytest.raises(SystemExit, match="no checkpoint"):
        cli_train.main(["-mn", "istvt", "-is", "72", "-sl", "3",
                        "--depth", "1", "--teacher_depth", "1",
                        "--dataset", "synthetic", "--dataset_len", "8",
                        "-bs", "4", "-e", "1", "-o", "",
                        "--distill_from", str(tmp_path / "nope")])


def test_cli_cross_geometry_distill(tmp_path):
    """The production recipe end to end, CLI only: train a 72^2 teacher,
    distill a 48^2 student (--teacher_input_size: train batches load at
    the TEACHER size, the hook downscales them for the student,
    --recal_bn calibrates on the downscaled hook-applied batches), then
    export the student as a self-contained serving artifact and score
    clips through it."""
    import os

    import numpy as np

    from istvt_tpu import serve_export as SE
    from istvt_tpu.cli import export as cli_export
    from istvt_tpu.cli import train as cli_train
    tdir, sdir = str(tmp_path / "teacher"), str(tmp_path / "student")
    cli_train.main(["-mn", "istvt", "-d", "synthetic", "-is", "72",
                    "-sl", "3", "-bs", "8", "-e", "1", "--depth", "1",
                    "--dataset_len", "8", "-o", tdir])
    cli_train.main(["-mn", "istvt", "-d", "synthetic", "-is", "48",
                    "-sl", "3", "-bs", "8", "-e", "1", "--depth", "1",
                    "--dataset_len", "8", "--recal_bn", "1",
                    "--distill_from", tdir, "--teacher_depth", "1",
                    "--teacher_input_size", "72", "-o", sdir])
    assert os.path.isdir(sdir)

    art = str(tmp_path / "artifact")
    cli_export.main(["-mn", "istvt", "-sl", "3", "-is", "48",
                     "--depth", "1", "-o", sdir,
                     "--batch_sizes", "2", "--out", art, "--selftest"])
    scorer = SE.load_artifact(art)
    clips = np.random.default_rng(0).standard_normal(
        (2, 3, 48, 48, 3)).astype(np.float32)
    out = scorer.predict(clips)
    assert np.all(np.isfinite(out["logits"]))
