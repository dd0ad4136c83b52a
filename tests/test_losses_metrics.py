"""Losses/metrics: golden parity vs torch criteria + self-consistency.

The reference has no tests (SURVEY.md §4); these follow its one good idea —
fixed-seed numerical parity against the PyTorch implementation — applied to
the loss library (reference loss_fn.py) and eval metrics
(train_CNN.py:527,885-893).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from istvt_tpu.train import losses, metrics

torch = pytest.importorskip("torch")


def test_bce_with_logits_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(16).astype(np.float32)
    y = (rng.rand(16) > 0.5).astype(np.float32)
    ours = float(losses.bce_with_logits(jnp.asarray(x), jnp.asarray(y)))
    theirs = float(torch.nn.BCEWithLogitsLoss()(
        torch.tensor(x), torch.tensor(y)))
    assert abs(ours - theirs) < 1e-6


def test_softmax_cross_entropy_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(8, 2).astype(np.float32)
    y = rng.randint(0, 2, size=8)
    ours = float(losses.softmax_cross_entropy(jnp.asarray(x), jnp.asarray(y)))
    theirs = float(torch.nn.CrossEntropyLoss()(
        torch.tensor(x), torch.tensor(y)))
    assert abs(ours - theirs) < 1e-6


def test_triplet_margin_matches_torch():
    rng = np.random.RandomState(2)
    a, p, n = (rng.randn(8, 32).astype(np.float32) for _ in range(3))
    ours = float(losses.triplet_margin(
        jnp.asarray(a), jnp.asarray(p), jnp.asarray(n), margin=1.0))
    theirs = float(torch.nn.TripletMarginLoss(margin=1.0)(
        torch.tensor(a), torch.tensor(p), torch.tensor(n)))
    assert abs(ours - theirs) < 1e-5


def test_masked_cross_entropy_empty_mask_is_zero():
    x = jnp.zeros((4, 2))
    y = jnp.zeros((4,), jnp.int32)
    assert float(losses.masked_cross_entropy(x, y, jnp.zeros((4,)))) == 0.0


def test_jigsaw_loss_coordinate_regression():
    # 4-patch (2x2) grid: perfect predictions -> ~0 loss
    idx = jnp.asarray([[0, 1, 2, 3]]).reshape(1, 4)
    pred_x = idx // 2
    pred_y = idx % 2
    pred = jnp.concatenate([pred_x, pred_y], axis=1).astype(jnp.float32)
    assert float(losses.jigsaw_loss(pred, idx)) < 1e-5
    # off-by-one in y for every patch -> distance 1 each
    pred_bad = jnp.concatenate([pred_x, pred_y + 1], axis=1).astype(jnp.float32)
    assert abs(float(losses.jigsaw_loss(pred_bad, idx)) - 1.0) < 1e-5


def test_quad_losses_run_and_are_finite():
    rng = np.random.RandomState(3)
    feats = [jnp.asarray(rng.randn(6, 16).astype(np.float32)) for _ in range(4)]
    clas = [jnp.asarray(rng.randn(6, 2).astype(np.float32)) for _ in range(4)]
    label = jnp.asarray(rng.randint(0, 2, size=6))
    v1 = float(losses.quadplet_cla_loss(feats, clas, label))
    v2 = float(losses.quad_loss(feats, feats, clas, label))
    assert np.isfinite(v1) and np.isfinite(v2)


def test_total_loss_and_cla_triplet_finite_with_onesided_labels():
    rng = np.random.RandomState(4)
    reg = [jnp.asarray(rng.randn(4, 8, 8, 3).astype(np.float32))
           for _ in range(3)]
    cla = [jnp.asarray(rng.randn(4, 2).astype(np.float32)) for _ in range(3)]
    feat = [jnp.asarray(rng.randn(4, 16).astype(np.float32)) for _ in range(3)]
    # all-fake batch: reference would hit empty selections / NaN guards
    labels = jnp.ones((4,), jnp.int32)
    assert np.isfinite(float(losses.total_loss(reg, cla, feat, labels)))
    assert np.isfinite(float(losses.cla_triplet_loss(cla, feat, labels)))


def test_mmd_zero_for_identical_distributions():
    rng = np.random.RandomState(5)
    s = jnp.asarray(rng.randn(8, 16).astype(np.float32))
    assert abs(float(losses.mmd(s, s))) < 1e-4


def test_auc_matches_naive_pairwise():
    rng = np.random.RandomState(6)
    scores = rng.randn(64).astype(np.float32)
    scores[10] = scores[20]  # force a tie
    labels = (rng.rand(64) > 0.5).astype(np.int32)

    pos = scores[labels == 1]
    neg = scores[labels == 0]
    wins = (pos[:, None] > neg[None, :]).sum() + 0.5 * (
        pos[:, None] == neg[None, :]).sum()
    naive = wins / (len(pos) * len(neg))

    ours = float(metrics.auc(jnp.asarray(scores), jnp.asarray(labels)))
    assert abs(ours - naive) < 1e-5


def test_auc_masked_matches_subset():
    # ADVICE r1: masked AUC must equal the AUC of the valid subset
    scores = jnp.asarray([0.1, 0.5, 0.9])
    labels = jnp.asarray([0, 0, 1])
    mask = jnp.asarray([0, 1, 1])
    ours = float(metrics.auc(scores, labels, mask=mask))
    assert abs(ours - 1.0) < 1e-6

    rng = np.random.RandomState(7)
    scores = rng.randn(64).astype(np.float32)
    scores[5] = scores[40] = scores[12]          # ties across the mask edge
    labels = (rng.rand(64) > 0.5).astype(np.int32)
    mask = (rng.rand(64) > 0.3).astype(np.int32)
    sub = mask.astype(bool)
    expect = float(metrics.auc(jnp.asarray(scores[sub]),
                               jnp.asarray(labels[sub])))
    got = float(metrics.auc(jnp.asarray(scores), jnp.asarray(labels),
                            mask=jnp.asarray(mask)))
    assert abs(got - expect) < 1e-5


def test_acer_metrics():
    # 2 attacks (1 accepted as live), 2 live (1 rejected)
    logits = jnp.asarray([2.0, -1.0, -0.5, 3.0])   # preds: 1,0,0,1
    labels = jnp.asarray([1, 1, 0, 0])
    c = metrics.confusion_counts(logits, labels)
    m = metrics.acer(c)
    assert abs(float(m["apcer"]) - 0.5) < 1e-6
    assert abs(float(m["bpcer"]) - 0.5) < 1e-6
    assert abs(float(m["acer"]) - 0.5) < 1e-6


def test_per_type_accuracy():
    logits = jnp.asarray([1.0, -1.0, 1.0, -1.0])
    labels = jnp.asarray([1, 0, 0, 1])          # first two correct
    types = jnp.asarray([0, 0, 1, 1])
    acc, cnt = metrics.per_type_accuracy(logits, labels, types, num_types=2)
    assert abs(float(acc[0]) - 1.0) < 1e-6
    assert abs(float(acc[1]) - 0.0) < 1e-6
    assert float(cnt[0]) == 2 and float(cnt[1]) == 2
