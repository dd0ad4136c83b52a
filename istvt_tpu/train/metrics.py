"""Evaluation metrics: accuracy, AUC, APCER/BPCER/ACER, per-type accuracy.

The reference computes accuracy by thresholding the single BCE logit at 0
(reference train_CNN.py:527,944), OULU's APCER/BPCER/ACER
(train_CNN.py:885-893), and per-manipulation-type accuracy
(train_CNN.py:976-982). AUC — the paper's headline metric — appears nowhere
in the reference code; it is added here (BASELINE.md requires AUC parity).

All metrics are jit-friendly (static shapes, no host sync); streaming
variants accumulate sufficient statistics so eval can run sharded with a
final psum.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def binary_predictions(logits):
    """Threshold the single logit at 0 (reference train_CNN.py:527)."""
    return (logits.reshape(-1) > 0).astype(jnp.int32)


def accuracy(logits, labels):
    preds = binary_predictions(logits)
    return jnp.mean((preds == labels.reshape(-1).astype(jnp.int32))
                    .astype(jnp.float32))


def confusion_counts(logits, labels, mask=None) -> Dict[str, jnp.ndarray]:
    """tp/fp/tn/fn with label 1 = fake (positive class)."""
    preds = binary_predictions(logits)
    y = labels.reshape(-1).astype(jnp.int32)
    m = jnp.ones_like(y, jnp.float32) if mask is None else \
        mask.reshape(-1).astype(jnp.float32)
    pos = (y == 1).astype(jnp.float32) * m
    neg = (y == 0).astype(jnp.float32) * m
    pp = (preds == 1).astype(jnp.float32)
    return {
        "tp": jnp.sum(pos * pp),
        "fn": jnp.sum(pos * (1 - pp)),
        "fp": jnp.sum(neg * pp),
        "tn": jnp.sum(neg * (1 - pp)),
    }


def acer(counts: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """OULU-NPU presentation-attack metrics (reference train_CNN.py:885-893):
    APCER = attacks accepted as live / attacks; BPCER = live rejected / live;
    ACER = their mean. Here label 1 = attack/fake."""
    n_attack = counts["tp"] + counts["fn"]
    n_live = counts["tn"] + counts["fp"]
    apcer = counts["fn"] / jnp.maximum(n_attack, 1.0)
    bpcer = counts["fp"] / jnp.maximum(n_live, 1.0)
    return {"apcer": apcer, "bpcer": bpcer, "acer": 0.5 * (apcer + bpcer)}


def auc(scores, labels, mask=None):
    """ROC AUC via the Mann-Whitney U statistic with average tie ranks.

    O(n log n), fully on-device (sort + scatter), exact for ties. scores are
    raw logits or probabilities; labels 1 = positive (fake)."""
    s = scores.reshape(-1).astype(jnp.float32)
    y = labels.reshape(-1).astype(jnp.float32)
    if mask is not None:
        w = mask.reshape(-1).astype(jnp.float32)
    else:
        w = jnp.ones_like(s)
    order = jnp.argsort(s)
    s_sorted = s[order]
    w_sorted = w[order]
    y_sorted = y[order]
    n = s.shape[0]
    # average rank for ties: segment by unique score values
    is_new = jnp.concatenate(
        [jnp.array([True]), s_sorted[1:] != s_sorted[:-1]])
    seg = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    # weighted (1-based) ranks: masked-out entries carry weight 0, so they
    # neither advance the rank counter nor contribute to segment averages —
    # the result equals the AUC of the masked subset exactly
    ranks1 = jnp.cumsum(w_sorted)
    seg_sum = jax.ops.segment_sum(ranks1 * w_sorted, seg, num_segments=n)
    seg_cnt = jax.ops.segment_sum(w_sorted, seg, num_segments=n)
    avg_rank = seg_sum / jnp.maximum(seg_cnt, 1.0)
    r = avg_rank[seg]
    n_pos = jnp.sum(y_sorted * w_sorted)
    n_neg = jnp.sum((1 - y_sorted) * w_sorted)
    sum_pos_ranks = jnp.sum(r * y_sorted * w_sorted)
    u = sum_pos_ranks - n_pos * (n_pos + 1) / 2.0
    return u / jnp.maximum(n_pos * n_neg, 1.0)


def per_type_accuracy(logits, labels, fake_types, num_types: int = 5):
    """Accuracy per manipulation type (reference train_CNN.py:976-982;
    types: 0 pristine, 1 Deepfakes, 2 NeuralTextures, 3 FaceSwap,
    4 Face2Face per train_CNN.py:977)."""
    preds = binary_predictions(logits)
    y = labels.reshape(-1).astype(jnp.int32)
    correct = (preds == y).astype(jnp.float32)
    t = fake_types.reshape(-1).astype(jnp.int32)
    onehot = jax.nn.one_hot(t, num_types, dtype=jnp.float32)
    per_correct = jnp.einsum("n,nk->k", correct, onehot)
    per_count = jnp.sum(onehot, axis=0)
    return per_correct / jnp.maximum(per_count, 1.0), per_count


def topk_accuracy(logits, labels, ks=(1, 5)):
    """Top-k accuracies (reference resnet3d/utils/util.py:60-71, the
    Kinetics eval metric)."""
    labels = labels.reshape(-1).astype(jnp.int32)
    order = jnp.argsort(-logits, axis=-1)
    out = {}
    for k in ks:
        hit = jnp.any(order[:, :k] == labels[:, None], axis=-1)
        out[f"top{k}"] = jnp.mean(hit.astype(jnp.float32))
    return out


class Welford:
    """Host-side streaming mean for loss/acc running averages
    (replaces the reference's running counters, train_CNN.py:534-546)."""

    def __init__(self):
        self.n = 0
        self.total = 0.0

    def update(self, value, count: int = 1):
        self.total += float(value) * count
        self.n += count

    @property
    def mean(self) -> float:
        return self.total / max(self.n, 1)
