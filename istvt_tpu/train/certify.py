"""Accuracy certification of the composed serving recipe (teacher ->
distilled reduced-geometry student -> int8), end to end.

The serving recipe (docs/SERVING.md "Composed recipe") replaces the
paper-geometry model (reference network/vivit/vivit.py:201, 300^2 input
/ depth 12) with a reduced-geometry shallow student served int8 — the
only configuration that beats the 625 clips/s/chip target. A throughput
substitute must carry its own accuracy proof AT ITS OWN GEOMETRY: this
module trains the teacher at full geometry on the held-out synthetic
capability task (the same artifact framework as
tests/test_e2e_learning.py), distills the student cross-geometry,
quantizes it, and measures every link of the chain on a DISJOINT val
split:

  1. teacher generalization   — val AUC of the full-geometry teacher;
  2. student generalization   — val AUC >= `auc_frac` of the teacher's;
  3. int8 serving parity      — the SAME student through the W8A8 path:
                                AUC bound, rank fidelity vs its own
                                float logits, max |logit delta| bound;
  4. teacher-logit fidelity   — Spearman rank correlation between
                                student and teacher val logits (the
                                student must reproduce the teacher's
                                RANKING, not merely the labels);
  5. interpretability         — LRP saliency of the shipped student
                                still localizes the artifact: cam_s
                                mass on the manipulated cells beats the
                                uniform share, cam_t mass concentrates
                                on manipulated frames of subset-frame
                                fakes (the reference saliency contract,
                                visualize_rel.py:257-294).

Drivers: `python -m istvt_tpu.cli.certify` (writes a JSON artifact —
run on the real chip for the production geometry: 300^2/depth-12
teacher -> 224^2/depth-6 int8 student); tests/test_certify.py runs the
same chain at a CPU-scaled analog geometry in the suite.
"""
from __future__ import annotations

import time
from functools import partial
from typing import Callable, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from istvt_tpu.core.config import ISTVTConfig, TrainConfig
from istvt_tpu.data import SyntheticVideoDataset
from istvt_tpu.models import istvt
from istvt_tpu.models.istvt import infer_feat_hw
from istvt_tpu.models.registry import model_selection
from istvt_tpu.train import distill as D
from istvt_tpu.train import losses as L
from istvt_tpu.train import step as S
from istvt_tpu.train.metrics import auc
from istvt_tpu.train.schedule import cosine_schedule


def _batches(ds, batch_size: int):
    """Device-resident batches (clips transfer ONCE; epochs reuse them —
    the axon tunnel's 15-44 MB/s H2D must not be paid per epoch)."""
    items = [ds[i] for i in range(len(ds))]
    out = []
    for i in range(0, len(items), batch_size):
        chunk = items[i:i + batch_size]
        if len(chunk) < batch_size:
            break
        out.append({
            "clips": jnp.asarray(np.stack([it["clips"] for it in chunk])),
            "labels": jnp.asarray(np.stack([it["labels"] for it in chunk])),
        })
    return items, out


def spearman(a, b) -> float:
    """Spearman rank correlation (average ranks for ties)."""
    from scipy.stats import rankdata  # scipy ships with the jax stack
    ra, rb = rankdata(np.asarray(a)), rankdata(np.asarray(b))
    ra, rb = ra - ra.mean(), rb - rb.mean()
    denom = float(np.sqrt((ra * ra).sum() * (rb * rb).sum()))
    return float((ra * rb).sum() / denom) if denom else 0.0


def _train(model, batches, *, epochs: int, lr: float, seed: int,
           loss_fn=None, compute_dtype=None, log: Callable = print,
           tag: str = "model"):
    opt = S.make_optimizer(TrainConfig(optimizer="adamw"),
                           cosine_schedule(lr, 10_000))
    ts = S.create_train_state(model, jax.random.PRNGKey(seed), opt)
    step = S.make_train_step(model, opt, loss_fn=loss_fn,
                             compute_dtype=compute_dtype)
    rng = jax.random.PRNGKey(seed + 1)
    for e in range(epochs):
        t0, ls, accs = time.time(), [], []
        for b in batches:
            rng, srng = jax.random.split(rng)
            ts, m = step(ts, b, srng)
            ls.append(float(m["loss"]))
            accs.append(float(m["accuracy"]))
        log(f"[certify] {tag} epoch {e + 1}/{epochs}: "
            f"loss {np.mean(ls):.4f} acc {np.mean(accs):.3f} "
            f"({time.time() - t0:.1f}s)")
    mstate = S.recalibrate_bn(model, ts.params, ts.model_state, batches)
    return ts.params, mstate


def _eval_logits(model, params, mstate, batch):
    out = S.make_eval_step(model)(params, mstate, batch)
    return np.asarray(out["logits"]).reshape(-1)


@partial(jax.jit, static_argnames=("cfg",))
def _fwd_logits(params, state, clips, cfg):
    """Jitted plain forward (un-jitted apply dispatches op-by-op —
    ruinous through the axon tunnel's ~33 ms/call RTT)."""
    out, _ = istvt.apply(params, state, clips, cfg, train=False)
    return out


def _patch_cells(y: float, x: float, ps: float, size: int,
                 feat_hw: int) -> list:
    cell = size / feat_hw
    rows = range(int(y // cell), min(int((y + ps - 1) // cell), feat_hw - 1) + 1)
    cols = range(int(x // cell), min(int((x + ps - 1) // cell), feat_hw - 1) + 1)
    return [r * feat_hw + c for r in rows for c in cols]


def _lrp_eval(params, mstate, clips, cfg, chunk=None):
    """(logits, cam_s, cam_t) via generate_lrp, in equal-shape batch
    chunks when `chunk` divides the batch — at 300^2/depth-12 the
    materialized attention maps + grads of a >2-clip batch exceed v5e
    HBM, and chunking at the SAME size the distillation teacher hook
    used reuses its remote compile."""
    from istvt_tpu.interpret.lrp import generate_lrp
    n = clips.shape[0]
    if chunk and n > chunk and n % chunk == 0:
        parts = []
        for i in range(0, n, chunk):
            c = clips[i:i + chunk]
            parts.append((_fwd_logits(params, mstate, c, cfg),
                          *generate_lrp(params, mstate, c, cfg, index=0)))
        return (np.concatenate([np.asarray(p[0]) for p in parts]),
                np.concatenate([np.asarray(p[1]) for p in parts]),
                np.concatenate([np.asarray(p[2]) for p in parts]))
    logits = _fwd_logits(params, mstate, clips, cfg)
    cam_s, cam_t = generate_lrp(params, mstate, clips, cfg, index=0)
    return np.asarray(logits), np.asarray(cam_s), np.asarray(cam_t)


def _spatial_ratios(cam_s, fakes, scale: float, size: int, feat_hw: int,
                    ps: float) -> list:
    """Per-fake ratio of cam_s mass on the artifact cells vs the uniform
    share (ratio 1.0 = no localization)."""
    ratios = []
    for j, f in enumerate(fakes):
        y, x = f["patch_yx"]
        cells = _patch_cells(y * scale, x * scale, ps * scale, size,
                             feat_hw)
        sm = cam_s[j] / (cam_s[j].sum(axis=-1, keepdims=True) + 1e-9)
        share = sm[:, cells].sum(axis=-1).mean()
        ratios.append(float(share / (len(cells) / feat_hw ** 2)))
    return ratios


def _subset_frame_fakes(n: int, seq_len: int, size: int, patch: int,
                        frames: Sequence[int], seed: int) -> np.ndarray:
    """Fakes whose artifact lives only in a SUBSET of frames — ground
    truth for the temporal saliency check (all-frames training fakes
    leave cam_t with nothing to localize). frames=() yields reals."""
    clips = []
    for k in range(n):
        rng = np.random.default_rng((seed, k))
        base = rng.normal(0, 0.3, (size, size, 3)).astype(np.float32)
        clip = np.stack([np.roll(base, t, axis=1) for t in range(seq_len)])
        y = int(rng.integers(0, size - patch))
        x = int(rng.integers(0, size - patch))
        for t in frames:
            clip[t, y:y + patch, x:x + patch] += rng.normal(
                0, 1.0, (patch, patch, 3)).astype(np.float32)
        clips.append(clip)
    return np.stack(clips)


def _temporal_aug_batches(n_batches: int, batch_size: int, seq_len: int,
                          size: int, patch: int, seed: int) -> list:
    """Distillation-set coverage of frames-subset fakes.

    The base train set's fakes carry the artifact in EVERY frame, so a
    student distilled only on it can score a single-frame fake as real
    even while matching its teacher everywhere else (measured: the toy
    student fails logit-positivity on last-frame-only probes at 9/10
    criteria). The deployment contract includes exactly those clips
    (reference visualize_rel.py temporal maps), so the distill set gets
    half subset-frame fakes / half reals per batch — the teacher hook
    then supplies logits and cams for them like any other batch. Seeds
    here are disjoint from the held-out temporal probe (seed 4242)."""
    out = []
    for bi in range(n_batches):
        half = batch_size // 2
        clips, labels = [], []
        for k in range(half):
            if k % 2 == 0:          # single frames, cycling from the last
                frames = (seq_len - 1 - (k // 2) % seq_len,)
            else:                   # suffix runs of varying onset
                start = 1 + (k // 2) % max(seq_len - 1, 1)
                frames = tuple(range(start, seq_len))
            clips.append(_subset_frame_fakes(
                1, seq_len, size, patch, frames,
                seed=777 + 1000 * bi + k)[0])
            labels.append(1)
        for k in range(batch_size - half):
            clips.append(_subset_frame_fakes(
                1, seq_len, size, patch, (),
                seed=888 + 1000 * bi + k)[0])
            labels.append(0)
        out.append({"clips": jnp.asarray(np.stack(clips)),
                    "labels": jnp.asarray(np.array(labels, np.float32)),
                    # subset-frame fakes' spatial cam targets are noise
                    # on their artifact-free frames — exclude them from
                    # the spatial transfer term (losses.attention_
                    # transfer_ce cam_s_mask); logit + temporal only
                    "cam_s_mask": jnp.zeros(batch_size, jnp.float32)})
    return out


def certify_recipe(
    *,
    teacher_size: int = 300,
    teacher_depth: int = 12,
    student_size: int = 224,
    student_depth: int = 6,
    seq_len: int = 6,
    train_clips: int = 48,
    val_clips: int = 32,
    batch_size: int = 8,
    patch_size: Optional[int] = None,
    teacher_epochs: int = 15,
    distill_epochs: int = 15,
    lr: float = 3e-4,
    alpha: float = 0.5,
    temperature: float = 2.0,
    attn_weight: float = 1.0,
    seed: int = 0,
    train_amp_range: Optional[Tuple[float, float]] = None,
    compute_dtype=None,
    auc_frac: float = 0.95,
    int8_delta_max: float = 1.0,
    int8_spearman_min: float = 0.98,
    fidelity_min: float = 0.8,
    lrp_ratio_min: float = 1.2,
    lrp_ratio_mean: float = 1.4,
    lrp_fakes: int = 6,
    val_amp_range: Optional[Tuple[float, float]] = (0.5, 1.5),
    temporal_checks: Optional[Sequence[Tuple[Sequence[int], float]]] = None,
    temporal_aug: int = 1,
    cam_chunk: Optional[int] = None,
    run_int8: bool = True,
    run_lrp: bool = True,
    export_dir: Optional[str] = None,
    diag_teacher_lrp: bool = True,
    teacher_ckpt: Optional[str] = None,
    teacher_bundle: Optional[tuple] = None,
    log: Callable = print,
) -> dict:
    """Run the full chain; returns {metrics..., 'criteria': {...},
    'pass': bool}.  Defaults are the production recipe geometry.

    temporal_checks: list of (frames_subset, cam_t_share_floor); default
    picks the last half and the single last frame with floors well above
    their uniform shares (toy calibration: tests/test_e2e_learning.py
    measured 0.957 vs uniform 0.667 and 0.919 vs 0.333).

    temporal_aug: number of frames-subset-fake batches appended to the
    distillation set (_temporal_aug_batches) — transfers the teacher's
    temporal decision boundary; without it the student scores
    single-frame fakes as real (measured, toy: 9/10 criteria).

    teacher_bundle: (model, params, model_state) of an ALREADY-trained
    teacher at (teacher_size, teacher_depth, seq_len) on the SAME
    static-patch task (train seed/patch must match this call's) — skips
    teacher training; tests reuse the session-scoped capability model.

    teacher_ckpt: path for on-disk teacher reuse across runs — restored
    if it exists (geometry/task must match, as with teacher_bundle),
    written after training otherwise. Iterating on DISTILLATION
    hyperparameters then skips the teacher leg entirely.

    diag_teacher_lrp: also measure the TEACHER's own LRP localization
    (spatial ratios + temporal shares, reported as teacher_lrp_* —
    diagnostic only, no pass criterion). The attention-transfer signal
    is the teacher's cams; if the teacher itself does not localize, no
    distill hyperparameter can make the student inherit localization.
    """
    t_start = time.time()
    ps = patch_size or teacher_size // 3
    scale = student_size / teacher_size

    # -- data: train and DISJOINT val, artifact pinned per clip ---------
    # train_amp_range (production: CLI default 0.3-1.5): graded artifact
    # STRENGTH in the TRAIN set. Measured (diag, r5, 300^2/d12): a
    # teacher trained on fixed-amplitude fakes saturates through a
    # shortcut whose d logit / d A is FLAT at the artifact — every
    # gradient-weighted attribution (transformer_attribution, full
    # eps-LRP) is diffuse (spatial ratios 0.04-0.40) even though the raw
    # CLS attention localizes at 3.8x. Training on graded amplitudes
    # keeps the gradient aligned with the evidence: ta ratios 6.0-6.6 at
    # EVERY checkpoint, independent of logit magnitude (8.7 at ep 15).
    # The reference's real-data regime (hard examples keep the loss off
    # zero) is the graded case, not the fixed one.
    train_ds = SyntheticVideoDataset(num_clips=train_clips, seq_len=seq_len,
                                     size=teacher_size, seed=seed,
                                     static_patch=True, patch_size=ps,
                                     amp_range=train_amp_range)
    # graded artifact amplitude on VAL: saturated fixed-amp logits make
    # rank correlation pure within-class noise; a difficulty axis gives
    # the teacher a meaningful ranking for the student to reproduce
    val_ds = SyntheticVideoDataset(num_clips=val_clips, seq_len=seq_len,
                                   size=teacher_size, seed=999 + seed,
                                   static_patch=True, patch_size=ps,
                                   amp_range=val_amp_range)
    _, batches = _batches(train_ds, batch_size)
    val_items, _ = _batches(val_ds, val_clips)
    vb = {"clips": jnp.asarray(
              np.stack([it["clips"] for it in val_items])),
          "labels": jnp.asarray(
              np.stack([it["labels"] for it in val_items]))}
    log(f"[certify] data on device: {len(batches)} train batches of "
        f"{batch_size} + {val_clips} val clips at {teacher_size}^2 T="
        f"{seq_len} ({time.time() - t_start:.0f}s)")

    # -- teacher at full geometry ---------------------------------------
    if teacher_bundle is not None:
        teacher, tp_, tms = teacher_bundle
    else:
        import os

        t_cfg = ISTVTConfig(num_frames=seq_len, image_size=teacher_size,
                            feat_hw=infer_feat_hw(teacher_size),
                            depth=teacher_depth)
        teacher = model_selection("istvt", num_out_classes=1, cfg=t_cfg)
        if teacher_ckpt and os.path.exists(teacher_ckpt):
            from istvt_tpu.core.checkpoint import load_pytree
            tpl_p, tpl_s = teacher.init(jax.random.PRNGKey(0))
            blob = load_pytree(teacher_ckpt,
                               {"params": tpl_p, "model_state": tpl_s})
            tp_, tms = blob["params"], blob["model_state"]
            log(f"[certify] teacher restored from {teacher_ckpt}")
        else:
            tp_, tms = _train(teacher, batches, epochs=teacher_epochs,
                              lr=lr, seed=seed,
                              compute_dtype=compute_dtype, log=log,
                              tag=f"teacher {teacher_size}^2/"
                                  f"d{teacher_depth}")
            if teacher_ckpt:
                from istvt_tpu.core.checkpoint import save_pytree
                save_pytree(teacher_ckpt,
                            {"params": tp_, "model_state": tms})
                log(f"[certify] teacher saved to {teacher_ckpt}")
    t_logits = _eval_logits(teacher, tp_, tms, vb)
    labels = np.asarray(vb["labels"]).reshape(-1)
    teacher_auc = float(auc(jnp.asarray(t_logits), vb["labels"]))
    log(f"[certify] teacher val AUC {teacher_auc:.4f}")

    # -- cross-geometry distillation ------------------------------------
    # attn_weight > 0: ATTENTION-TRANSFER distillation — the teacher's
    # LRP cams supervise the student's CLS-row attention. Logit-only
    # distillation reliably produces anti-localized students that fail
    # the LRP criterion below (measured, train/losses.make_distill_loss
    # docstring); transferring where the teacher looks is what makes the
    # shipped student inherit the interpretability contract.
    t_cfg_eff = teacher.config if teacher_bundle is not None else t_cfg
    s_cfg = ISTVTConfig(num_frames=seq_len, image_size=student_size,
                        feat_hw=infer_feat_hw(student_size),
                        depth=student_depth)
    hook = D.augment_with_teacher(
        D.make_teacher_fn(teacher, tp_, tms,
                          cam_cfg=t_cfg_eff if attn_weight else None,
                          cam_chunk=cam_chunk),
        student_size=student_size, student_feat_hw=s_cfg.feat_hw)
    distill_batches = [
        dict(b, cam_s_mask=jnp.ones(batch_size, jnp.float32))
        for b in batches
    ] + _temporal_aug_batches(temporal_aug, batch_size, seq_len,
                              teacher_size, ps, seed)
    small = [hook(b) for b in distill_batches]  # teacher signals are static
    student = model_selection("istvt", num_out_classes=1, cfg=s_cfg)
    sp, sms = _train(
        student, small, epochs=distill_epochs, lr=lr, seed=seed + 7,
        loss_fn=L.make_distill_loss(alpha=alpha, temperature=temperature,
                                    attn_weight=attn_weight),
        compute_dtype=compute_dtype, log=log,
        tag=f"student {student_size}^2/d{student_depth}")

    vb_s = {"clips": jax.image.resize(
                vb["clips"], (val_clips, seq_len, student_size,
                              student_size, 3), "bilinear"),
            "labels": vb["labels"]}
    s_logits = _eval_logits(student, sp, sms, vb_s)
    student_auc = float(auc(jnp.asarray(s_logits), vb["labels"]))
    fidelity = spearman(s_logits, t_logits)
    log(f"[certify] student val AUC {student_auc:.4f} "
        f"(teacher {teacher_auc:.4f}), teacher-logit spearman "
        f"{fidelity:.4f}")

    result = {
        "geometry": {"teacher": f"{teacher_size}^2/d{teacher_depth}",
                     "student": f"{student_size}^2/d{student_depth}",
                     "seq_len": seq_len, "patch": ps},
        "budget": {"train_clips": train_clips, "val_clips": val_clips,
                   "teacher_epochs": teacher_epochs,
                   "distill_epochs": distill_epochs,
                   "steps_per_epoch": len(batches),
                   "train_amp_range": train_amp_range,
                   "attn_weight": attn_weight},
        "teacher_auc": teacher_auc,
        "student_auc": student_auc,
        "teacher_fidelity_spearman": fidelity,
    }
    criteria = {
        "student_auc": student_auc >= auc_frac * teacher_auc,
        "teacher_fidelity": fidelity >= fidelity_min,
    }

    # -- int8 serving path of the SAME student --------------------------
    if run_int8:
        q_cfg = ISTVTConfig(num_frames=seq_len, image_size=student_size,
                            feat_hw=s_cfg.feat_hw, depth=student_depth,
                            use_pallas=True, quantize="int8")
        student_q = model_selection("istvt", num_out_classes=1, cfg=q_cfg)
        qp = istvt.quantize_params(sp)
        q_logits = _eval_logits(student_q, qp, sms, vb_s)
        int8_auc = float(auc(jnp.asarray(q_logits), vb["labels"]))
        int8_delta = float(np.max(np.abs(q_logits - s_logits)))
        int8_sp = spearman(q_logits, s_logits)
        log(f"[certify] int8 val AUC {int8_auc:.4f}, max |delta| "
            f"{int8_delta:.4f}, float-rank spearman {int8_sp:.4f}")
        result.update(int8_auc=int8_auc, int8_max_logit_delta=int8_delta,
                      int8_spearman_vs_float=int8_sp)
        criteria.update(
            int8_auc=int8_auc >= auc_frac * teacher_auc,
            int8_delta=int8_delta <= int8_delta_max,
            int8_rank_fidelity=int8_sp >= int8_spearman_min)

        # -- deployable artifact of the certified student ---------------
        # export the EXACT quantized params just scored and selftest the
        # reloaded AOT bundle against the certification's own val logits
        # — the artifact a deployer ships is the one the criteria above
        # certify, not a re-derived cousin (serve_export.save_artifact;
        # reference analog: the trained model IS the deliverable,
        # train_CNN.py:998-1011).
        if export_dir:
            from istvt_tpu import serve_export as SE
            man = SE.save_artifact(
                export_dir, student_q, qp, sms,
                input_shape=(seq_len, student_size, student_size, 3),
                batch_sizes=(1, batch_size),
                extra_meta={"certified": True,
                            "geometry": result["geometry"]})
            scorer = SE.load_artifact(export_dir)
            a_logits = scorer.predict(
                np.asarray(vb_s["clips"], np.float32))["logits"]
            a_logits = a_logits.reshape(-1)
            art_delta = float(np.max(np.abs(a_logits - q_logits)))
            log(f"[certify] exported artifact {export_dir} "
                f"({man['batch_sizes']}): max |logit delta| vs certified "
                f"int8 logits {art_delta:.3e}")
            result.update(export_dir=export_dir,
                          artifact_max_logit_delta=art_delta)
            criteria.update(artifact_matches=art_delta <= 1e-3)

    # -- LRP localization on the shipped student ------------------------
    if run_lrp:
        fakes = sorted([it for it in val_items if it["labels"] == 1],
                       key=lambda it: -float(it.get("amp", 1.0)))[:lrp_fakes]
        clips_t = np.stack([f["clips"] for f in fakes])

        # teacher's own localization — the supervision signal's quality
        # ceiling (diagnostic; same chunk shape as the distill hook so
        # its remote compile is reused)
        if diag_teacher_lrp:
            _, t_cam_s, _ = _lrp_eval(tp_, tms, jnp.asarray(clips_t),
                                      t_cfg_eff, chunk=cam_chunk)
            t_ratios = _spatial_ratios(t_cam_s, fakes, 1.0, teacher_size,
                                       t_cfg_eff.feat_hw, ps)
            log(f"[certify] teacher LRP spatial ratios min "
                f"{min(t_ratios):.2f} mean {np.mean(t_ratios):.2f}")
            result.update(
                teacher_lrp_spatial_ratio_min=min(t_ratios),
                teacher_lrp_spatial_ratio_mean=float(np.mean(t_ratios)))

        clips_s = jax.image.resize(
            jnp.asarray(clips_t), (len(fakes), seq_len, student_size,
                                   student_size, 3), "bilinear")
        logits, cam_s, _ = _lrp_eval(sp, sms, clips_s, s_cfg)
        pos = bool(np.all(logits > 0))
        ratios = _spatial_ratios(cam_s, fakes, scale, student_size,
                                 s_cfg.feat_hw, ps)
        log(f"[certify] LRP spatial ratios min {min(ratios):.2f} mean "
            f"{np.mean(ratios):.2f} (fake logits positive: {pos})")
        result.update(lrp_spatial_ratio_min=min(ratios),
                      lrp_spatial_ratio_mean=float(np.mean(ratios)))
        criteria.update(lrp_fake_logits_positive=pos,
                        lrp_spatial_min=min(ratios) >= lrp_ratio_min,
                        lrp_spatial_mean=float(np.mean(ratios))
                        >= lrp_ratio_mean)

        if temporal_checks is None:
            last = seq_len - 1
            temporal_checks = [
                (tuple(range(seq_len // 2, seq_len)), 0.5 + 0.2),
                ((last,), 1 / seq_len + 0.3),
            ]
        def _t_share(cam_t, frames):
            tm = cam_t.sum(axis=-1)
            tm = tm / (tm.sum(axis=-1, keepdims=True) + 1e-9)
            return float(tm[:, list(frames)].sum(axis=-1).mean())

        result["lrp_temporal"] = []
        for frames, floor in temporal_checks:
            sub = _subset_frame_fakes(lrp_fakes, seq_len, teacher_size,
                                      ps, frames, seed=4242)
            entry = {"frames": list(frames), "floor": floor}
            if diag_teacher_lrp:
                _, _, t_cam_t = _lrp_eval(tp_, tms, jnp.asarray(sub),
                                          t_cfg_eff, chunk=cam_chunk)
                entry["teacher_share"] = _t_share(t_cam_t, frames)
            sub_s = jax.image.resize(
                jnp.asarray(sub), (lrp_fakes, seq_len, student_size,
                                   student_size, 3), "bilinear")
            lg, _, cam_t = _lrp_eval(sp, sms, sub_s, s_cfg)
            share = _t_share(cam_t, frames)
            pos_t = bool(np.all(lg > 0))
            log(f"[certify] LRP temporal frames {tuple(frames)}: share "
                f"{share:.3f} (uniform {len(frames) / seq_len:.3f}, "
                f"floor {floor}, teacher "
                f"{entry.get('teacher_share', float('nan')):.3f}, "
                f"logits positive: {pos_t})")
            entry.update(share=share, logits_positive=pos_t)
            result["lrp_temporal"].append(entry)
            criteria[f"lrp_temporal_{'_'.join(map(str, frames))}"] = \
                pos_t and share >= floor

    result["criteria"] = criteria
    result["pass"] = all(criteria.values())
    result["wall_s"] = round(time.time() - t_start, 1)
    log(f"[certify] PASS={result['pass']} in {result['wall_s']}s "
        f"({sum(criteria.values())}/{len(criteria)} criteria)")
    return result
