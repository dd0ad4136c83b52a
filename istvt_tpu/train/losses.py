"""Loss library — behavioral port of the reference's `loss_fn.py` (350 LoC).

TPU-first design note: the reference selects sub-batches with boolean masks
(`feats[label==0]`, reference loss_fn.py:114-117,219-231), which produces
dynamic shapes — untraceable under jit. Every loss here keeps static shapes
by computing per-sample terms for the FULL batch and reducing with 0/1
masks; an empty selection contributes 0 (which also replaces the
reference's explicit NaN guards, loss_fn.py:212-215,224-231,256-259).

Known reference bug NOT reproduced: `TripletLoss.forward` reads an
undefined `d_an` (reference loss_fn.py:84); here the anchor-negative
distance is computed properly.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# elementary criteria


def bce_with_logits(logits, labels):
    """nn.BCEWithLogitsLoss (mean) — the ISTVT criterion
    (reference train_CNN.py:148,526)."""
    logits = logits.reshape(-1).astype(jnp.float32)
    labels = labels.reshape(-1).astype(jnp.float32)
    # numerically stable: max(x,0) - x*y + log(1+exp(-|x|))
    per = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    return jnp.mean(per)


def distillation_bce(logits, teacher_logits, labels, alpha: float = 0.5,
                     temperature: float = 2.0):
    """Hinton knowledge distillation adapted to the single-logit BCE head.

        loss = alpha * BCE(logits, labels)
             + (1 - alpha) * T^2 * BCE(logits / T, sigmoid(teacher / T))

    The soft term is the binary cross-entropy of the temperature-scaled
    student logit against the teacher's temperature-softened probability.
    Its per-sample gradient w.r.t. the student logit is
    T * (sigmoid(z/T) - sigmoid(t/T)) after the T^2 factor — zero exactly
    when the student matches the teacher, and O(1) in T (Hinton et al.
    2015 scaling). No reference analog: distillation is one of the
    architectural serving levers named in docs/KERNELS.md (a shallower
    student serves proportionally faster; docs/SERVING.md).
    """
    z = logits.reshape(-1).astype(jnp.float32)
    t = teacher_logits.reshape(-1).astype(jnp.float32)
    T = float(temperature)
    soft_target = jax.nn.sigmoid(t / T)
    zs = z / T
    soft = jnp.mean(jnp.maximum(zs, 0) - zs * soft_target
                    + jnp.log1p(jnp.exp(-jnp.abs(zs))))
    return alpha * bce_with_logits(z, labels) \
        + (1.0 - alpha) * (T * T) * soft


def attention_transfer_ce(attns, cam_s_target, cam_t_target, labels,
                          cam_s_mask=None):
    """Cross-entropy between the teacher's LRP saliency distributions and
    the student's layer/head-averaged CLS-row attention, masked to fakes.

    attns: the model's return_attn structure — {'s': [L x (B,H,T+1,S,S)],
    't': [L x (B,H,S,T+1,T+1)]} (istvt.apply). The student's predicted
    saliency is the CLS row over patch/frame tokens, averaged over heads
    and layers then renormalized — the first-order (no-gradient) analog
    of the rollout that interpret/lrp.generate_lrp reads out, so pulling
    it toward the teacher's cam pulls the student's LRP maps toward the
    teacher's. Masked to label==1 rows: the teacher's fake-relevance map
    on a REAL clip is ~zero (Chefer rule 6 keeps positive evidence only)
    and normalizes to noise.

    Returns (spatial_ce, temporal_ce); either is 0 when its target is
    None or the mask is empty.
    """
    m = (labels.reshape(-1) > 0).astype(jnp.float32)          # (B,)

    def _masked_ce(pred, target, mask):
        # pred/target: (B, T, n) / per-frame distributions over n cells
        pred = pred / (jnp.sum(pred, axis=-1, keepdims=True) + 1e-9)
        ce = -jnp.sum(target * jnp.log(pred + 1e-9), axis=-1)  # (B, T)
        return (jnp.sum(jnp.mean(ce, axis=-1) * mask)
                / jnp.maximum(jnp.sum(mask), 1.0))

    s_ce = jnp.float32(0.0)
    if cam_s_target is not None:
        # spatial CLS row of real frames: (B,H,T,hw) per layer.
        # cam_s_mask (B,): clips whose spatial cam target is trusted —
        # frames-subset fakes carry artifact-free frames whose teacher
        # spatial cams are normalized noise, and training on them
        # degrades the student's localization (measured, toy: spatial
        # ratios 1.87 -> 0.85 with temporal-aug batches unmasked; frame
        # weighting by the teacher's peaked cam_t was WORSE, 0.09, by
        # leaving most frames unsupervised), so certify's aug batches
        # set it to 0 and contribute only logit + temporal terms.
        m_s = m if cam_s_mask is None else m * cam_s_mask.reshape(-1)
        per = [jnp.mean(a[:, :, 1:, 0, 1:].astype(jnp.float32), axis=1)
               for a in attns["s"]]
        s_ce = _masked_ce(sum(per) / len(per), cam_s_target, m_s)
    t_ce = jnp.float32(0.0)
    if cam_t_target is not None:
        # temporal CLS row at patch locations: (B,H,hw,T) per layer ->
        # frame distribution (B,T); lift to (B,1,T) for the shared helper
        per = [jnp.mean(a[:, :, 1:, 0, 1:].astype(jnp.float32),
                        axis=(1, 2)) for a in attns["t"]]
        t_ce = _masked_ce((sum(per) / len(per))[:, None, :],
                          cam_t_target[:, None, :], m)
    return s_ce, t_ce


def make_distill_loss(alpha: float = 0.5, temperature: float = 2.0,
                      attn_weight: float = 0.0):
    """loss_fn for make_train_step: reads batch['teacher_logits'] (see
    train/distill.py for how those get injected).

    attn_weight > 0 enables attention transfer: adds attn_weight *
    (spatial + temporal) attention_transfer_ce against the teacher's LRP
    cams (batch['teacher_cam_s'/'teacher_cam_t'], injected by
    distill.augment_with_teacher when built with cam_cfg). Measured
    motivation (round 5, toy 72^2->56^2): logit-only distillation
    reliably produces students whose LRP maps put ZERO relevance on the
    artifact cells the teacher localizes at 1.6-2.8x uniform — the soft
    targets are solvable through a global anti-localized pathway, and a
    hard-label fine-tune tail does not undo it. Supervising WHERE the
    teacher looks is the fix. Sets loss_fn.needs_attn so make_train_step
    runs the forward with return_attn=True (materializes attention maps
    — the documented Pallas hot-path tax; training-only)."""
    def loss_fn(logits, batch, attns=None):
        loss = distillation_bce(logits, batch["teacher_logits"],
                                batch["labels"], alpha, temperature)
        if attn_weight and attns is not None:
            s_ce, t_ce = attention_transfer_ce(
                attns, batch.get("teacher_cam_s"),
                batch.get("teacher_cam_t"), batch["labels"],
                cam_s_mask=batch.get("cam_s_mask"))
            loss = loss + attn_weight * (s_ce + t_ce)
        return loss
    loss_fn.needs_attn = attn_weight > 0
    return loss_fn


def softmax_cross_entropy(logits, labels):
    """nn.CrossEntropyLoss (mean) over integer labels."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32),
                               axis=-1)[:, 0]
    return jnp.mean(nll)


def masked_cross_entropy(logits, labels, mask):
    """CE averaged over `mask`-selected rows; 0 if the mask is empty.

    Static-shape replacement for `self.cla(clas[labels==k], ...)`
    (reference loss_fn.py:219-231 and friends).
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32),
                               axis=-1)[:, 0]
    m = mask.astype(jnp.float32)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


def mse(a, b):
    return jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)


def masked_mse(a, target, mask):
    """MSE over rows where mask==1; 0 when empty (replaces the reference's
    isnan guard on empty selections, loss_fn.py:212-215)."""
    d = (a.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    per = jnp.mean(d.reshape(d.shape[0], -1), axis=-1)
    m = mask.astype(jnp.float32)
    return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)


def _pairdist(a, b, p=2.0, eps=1e-6):
    """Row-wise L_p distance, torch.pairwise_distance semantics (adds eps)."""
    d = a.astype(jnp.float32) - b.astype(jnp.float32) + eps
    return jnp.power(jnp.sum(jnp.power(jnp.abs(d), p), axis=-1), 1.0 / p)


def triplet_margin(anchor, positive, negative, margin: float = 1.0,
                   mask=None):
    """nn.TripletMarginLoss(margin), mean reduction; optional row mask."""
    a = anchor.reshape(anchor.shape[0], -1)
    pp = positive.reshape(positive.shape[0], -1)
    nn_ = negative.reshape(negative.shape[0], -1)
    per = jnp.maximum(_pairdist(a, pp) - _pairdist(a, nn_) + margin, 0.0)
    if mask is None:
        return jnp.mean(per)
    m = mask.astype(jnp.float32)
    return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)


# ---------------------------------------------------------------------------
# renorm + hard-mined triplet (reference loss_fn.py:69-100)


def renorm_rows(x, eps: float = 1e-5):
    """Rows with ||x||_2 > eps become unit vectors; smaller rows are left
    unscaled — the exact effect of torch `renorm(2,0,1e-5).mul(1e5)`
    (reference loss_fn.py:93-99; renorm only shrinks rows above the cap)."""
    flat = x.reshape(x.shape[0], -1).astype(jnp.float32)
    n = jnp.linalg.norm(flat, axis=1, keepdims=True)
    return jnp.where(n > eps, flat / jnp.maximum(n, 1e-30), flat)


def hard_triplet(f_anchor, f_positive, f_negative, margin: float = 0.2):
    """TripletLoss with hard-sample mining (reference loss_fn.py:69-92):
    rows are L2-renormalized, only triplets with d_ap - d_an < margin
    (the hard ones) contribute, and the hinge is averaged over them.
    The mining mask is a stop-gradient, like the reference's no_grad block.
    """
    a = renorm_rows(f_anchor)
    p = renorm_rows(f_positive)
    n = renorm_rows(f_negative)
    d_ap = jnp.linalg.norm(a - p, axis=1)
    d_an = jnp.linalg.norm(a - n, axis=1)
    hard = jax.lax.stop_gradient((d_ap - d_an) < margin)
    per = jnp.maximum(d_ap - d_an + margin, 0.0)
    m = hard.astype(jnp.float32)
    return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)


# ---------------------------------------------------------------------------
# quadruplet family (reference loss_fn.py:102-177)


def _swap_by_label(x_real_branch, x_fake_branch, label):
    """Rowwise select: branch output belonging to the 'real' face for each
    sample. The reference concatenates `x0[label==0]` with `x2[label==1]`
    (loss_fn.py:114-117) — order-insensitive for mean-reduced losses, so a
    rowwise where() is equivalent with static shapes."""
    l = label.reshape(-1, *([1] * (x_real_branch.ndim - 1))).astype(bool)
    return jnp.where(l, x_fake_branch, x_real_branch)


def quadplet_cla_loss(feats: Sequence, clas: Sequence, label,
                      margin: float = 1.0, lam_t: float = 1.0):
    """QuadpletClaLoss (reference loss_fn.py:102-129): 4 branch features are
    regrouped by label into (real, real_etc, fake_r, fake_etc); 4 triplets +
    4 CE terms (branches 2,3 trained on flipped labels)."""
    label = label.astype(jnp.int32)
    f_real = _swap_by_label(feats[0], feats[2], label)
    f_real_etc = _swap_by_label(feats[1], feats[3], label)
    f_fake_r = _swap_by_label(feats[2], feats[0], label)
    f_fake_etc = _swap_by_label(feats[3], feats[1], label)

    t = (triplet_margin(f_real, f_real_etc, f_fake_r, margin)
         + triplet_margin(f_real_etc, f_real, f_fake_etc, margin)
         + triplet_margin(f_fake_r, f_fake_etc, f_real, margin)
         + triplet_margin(f_fake_etc, f_fake_r, f_real_etc, margin))

    cla = (softmax_cross_entropy(clas[0], label)
           + softmax_cross_entropy(clas[1], label)
           + softmax_cross_entropy(clas[2], 1 - label)
           + softmax_cross_entropy(clas[3], 1 - label))
    return cla + lam_t * t


def quad_classification_loss(clas: Sequence, label):
    """QuadClassificatonLoss (reference loss_fn.py:157-167)."""
    label = label.astype(jnp.int32)
    return (softmax_cross_entropy(clas[0], label)
            + softmax_cross_entropy(clas[1], label)
            + softmax_cross_entropy(clas[2], 1 - label)
            + softmax_cross_entropy(clas[3], 1 - label))


def quad_triplet_loss(gs: Sequence, ids: Sequence, label, margin: float = 1.0):
    """QuadTripletLoss (reference loss_fn.py:131-155): regroup by label,
    renorm, 2 triplets on texture features g + 2 on identity features id."""
    label = label.astype(jnp.int32)
    g_real = renorm_rows(_swap_by_label(gs[0], gs[2], label))
    g_real_etc = renorm_rows(_swap_by_label(gs[1], gs[3], label))
    g_fake_r = renorm_rows(_swap_by_label(gs[2], gs[0], label))
    g_fake_etc = renorm_rows(_swap_by_label(gs[3], gs[1], label))
    id_real = renorm_rows(_swap_by_label(ids[0], ids[2], label))
    id_real_etc = renorm_rows(_swap_by_label(ids[1], ids[3], label))
    id_fake_r = renorm_rows(_swap_by_label(ids[2], ids[0], label))
    id_fake_etc = renorm_rows(_swap_by_label(ids[3], ids[1], label))
    return (triplet_margin(g_real, g_fake_r, g_fake_etc, margin)
            + triplet_margin(g_real, g_fake_r, g_real_etc, margin)
            + triplet_margin(id_real, id_real_etc, id_fake_r, margin)
            + triplet_margin(id_fake_r, id_fake_etc, id_real, margin))


def quad_loss(gs, ids, clas, label, lam: float = 1.0):
    """QuadLoss = classification + lam * quad-triplet
    (reference loss_fn.py:169-177)."""
    return quad_classification_loss(clas, label) + lam * quad_triplet_loss(
        gs, ids, label)


# ---------------------------------------------------------------------------
# multi-branch / UNet-family losses


def multi_trip_loss(feats, clas, labels, lam: float = 10.0):
    """MultiTripLoss (reference loss_fn.py:179-194): over 3 streams, CE on
    (anchor, positive: true label; negative: flipped) averaged /9, plus
    triplets per stream."""
    labels = labels.astype(jnp.int32)
    trip = 0.0
    cla = 0.0
    for stype in range(3):
        cla = (cla + softmax_cross_entropy(clas[0][stype], labels)
               + softmax_cross_entropy(clas[1][stype], labels)
               + softmax_cross_entropy(clas[2][stype], 1 - labels))
        trip = trip + triplet_margin(feats[0][stype], feats[1][stype],
                                     feats[2][stype])
    return cla / 9.0 + lam * trip


def total_loss(regression, classification, feat, labels, margin: float = 1.0):
    """TotalLoss = cla + trip + reg for triplet-UNet models
    (reference loss_fn.py:196-235).

    regression/classification/feat are (anchor, positive, negative) triples;
    labels==1 marks fake anchors. Regression pushes residual maps of real
    frames to zero; classification uses label-dependent targets with the
    negative branch flipped; empty selections contribute 0 (replacing the
    reference's NaN guards)."""
    labels = labels.astype(jnp.int32)
    reg_a, reg_p, reg_n = regression
    cla_a, cla_p, cla_n = classification
    is_fake = (labels == 1)
    is_real = (labels == 0)

    reg = (masked_mse(reg_n, jnp.zeros_like(reg_n), is_fake)
           + masked_mse(reg_a, jnp.zeros_like(reg_a), is_real)
           + masked_mse(reg_p, jnp.zeros_like(reg_p), is_real))

    zeros = jnp.zeros_like(labels)
    ones = jnp.ones_like(labels)
    cla = (masked_cross_entropy(cla_a, zeros, is_real)
           + masked_cross_entropy(cla_a, ones, is_fake)
           + masked_cross_entropy(cla_p, zeros, is_real)
           + masked_cross_entropy(cla_p, ones, is_fake)
           + masked_cross_entropy(cla_n, ones, is_real)
           + masked_cross_entropy(cla_n, zeros, is_fake))

    trip = sum(hard_triplet(a, p, n, margin)
               for a, p, n in zip(feat[0], feat[1], feat[2])) \
        if isinstance(feat[0], (list, tuple)) else hard_triplet(
            feat[0], feat[1], feat[2], margin)
    return cla + trip + reg


def cla_triplet_loss(classification, feature, labels, lam_t: float = 0.3):
    """ClaTripletLoss (reference loss_fn.py:237-260)."""
    labels = labels.astype(jnp.int32)
    cla_a, cla_p, cla_n = classification
    is_fake = (labels == 1)
    is_real = (labels == 0)
    zeros = jnp.zeros_like(labels)
    ones = jnp.ones_like(labels)
    cla = (masked_cross_entropy(cla_a, zeros, is_real)
           + masked_cross_entropy(cla_a, ones, is_fake)
           + masked_cross_entropy(cla_p, zeros, is_real)
           + masked_cross_entropy(cla_p, ones, is_fake)
           + masked_cross_entropy(cla_n, ones, is_real)
           + masked_cross_entropy(cla_n, zeros, is_fake))
    trip = triplet_margin(feature[0], feature[1], feature[2])
    return cla + lam_t * trip


def jigsaw_loss(idx_pred, idx):
    """JigsawLoss (reference loss_fn.py:262-278): the solver regresses, for
    every patch slot, the (x, y) grid coordinate of the patch placed there;
    loss is the mean Euclidean distance to the true coordinates."""
    b, two_l = idx_pred.shape
    l = two_l // 2
    c = int(round(l ** 0.5))
    pred_x = idx_pred[:, :l].astype(jnp.float32)
    pred_y = idx_pred[:, l:].astype(jnp.float32)
    real_x = (idx // c).astype(jnp.float32)
    real_y = (idx % c).astype(jnp.float32)
    dist = jnp.sqrt((pred_x - real_x) ** 2 + (pred_y - real_y) ** 2 + 1e-12)
    return jnp.sum(dist) / (b * l)


# ---------------------------------------------------------------------------
# distillation / domain losses


def representation_loss(feat, feat_p, sources, targets, qual):
    """RepresentationLoss (reference loss_fn.py:30-67): pair each sample's
    hq-branch and lq-branch features (which branch is which depends on
    `qual`), weight the feature MSE by the (stop-gradient) source/target
    embedding MSE."""
    q = qual.reshape(-1, *([1] * (feat.ndim - 1))).astype(bool)
    f_hq = jnp.where(q, feat, feat_p)
    f_lq = jnp.where(q, feat_p, feat)
    # GAP to (B, C) embeddings; reference pools NCHW maps to 2048-d vectors
    def gap(x):
        if x.ndim == 4:
            return jnp.mean(x, axis=(1, 2))
        return x.reshape(x.shape[0], -1)
    qv = qual.reshape(-1, 1).astype(bool)
    s = gap(sources)
    tg = gap(targets)
    s_sel = jax.lax.stop_gradient(jnp.where(qv, s, tg))
    t_sel = jax.lax.stop_gradient(jnp.where(qv, tg, s))
    w = jnp.mean((s_sel - t_sel) ** 2, axis=1)
    per = jnp.mean((f_lq - jax.lax.stop_gradient(f_hq)
                    ).reshape(f_lq.shape[0], -1) ** 2, axis=1)
    return jnp.sum(w * per)


def feature_finetuning_loss(feat, feat_p, qual, avg_feat, label,
                            margin: float = 1.0):
    """FeatureFinetuningLoss (reference loss_fn.py:5-26): pull each sample's
    hq GAP feature toward its class center, away from the other center."""
    def gap(x):
        return jnp.mean(x, axis=(1, 2)) if x.ndim == 4 else x
    q = qual.reshape(-1, 1).astype(bool)
    f_hq = jnp.where(q, gap(feat), gap(feat_p))
    lbl = label.astype(jnp.int32)
    pos_center = avg_feat[lbl]
    neg_center = avg_feat[1 - lbl]
    per = jnp.maximum(_pairdist(f_hq, pos_center)
                      - _pairdist(f_hq, neg_center) + margin, 0.0)
    return jnp.sum(per)


def gaussian_kernel_matrix(source, target, kernel_mul: float = 2.0,
                           kernel_num: int = 5, fix_sigma=None):
    """Multi-bandwidth RBF Gram matrix (reference loss_fn.py:285-322)."""
    total = jnp.concatenate([source, target], axis=0).astype(jnp.float32)
    n = total.shape[0]
    d2 = jnp.sum((total[:, None, :] - total[None, :, :]) ** 2, axis=-1)
    if fix_sigma is not None:
        bandwidth = fix_sigma
    else:
        bandwidth = jnp.sum(jax.lax.stop_gradient(d2)) / max(n * n - n, 1)
    bandwidth = bandwidth / (kernel_mul ** (kernel_num // 2))
    k = 0.0
    for i in range(kernel_num):
        k = k + jnp.exp(-d2 / (bandwidth * (kernel_mul ** i) + 1e-12))
    return k


def mmd(sources, targets, qual=None, kernel_mul: float = 2.0,
        kernel_num: int = 5, fix_sigma=None):
    """MMD domain loss (reference loss_fn.py:324-342), batched form:
    E[K_ss] + E[K_tt] - E[K_st] - E[K_ts] over GAP'd embeddings."""
    def gap(x):
        return jnp.mean(x, axis=(1, 2)) if x.ndim == 4 else x
    s = gap(sources)
    t = gap(targets)
    if qual is not None:
        q = qual.reshape(-1, 1).astype(bool)
        s, t = jnp.where(q, s, t), jnp.where(q, t, s)
    b = s.shape[0]
    k = gaussian_kernel_matrix(s, t, kernel_mul, kernel_num, fix_sigma)
    xx = jnp.mean(k[:b, :b])
    yy = jnp.mean(k[b:, b:])
    xy = jnp.mean(k[:b, b:])
    yx = jnp.mean(k[b:, :b])
    return xx + yy - xy - yx
