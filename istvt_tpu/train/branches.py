"""Specialized training branches — functional ports of the reference's
per-model training loops (reference train_CNN.py:236-828).

Two non-default step shapes are first-class here:

1. `make_triplet_train_step` — TripUNet/TripEfficientNet training
   (train_CNN.py's triplet branches): the siamese model runs on
   (anchor, positive, negative) and TotalLoss / ClaTripletLoss combines
   regression + classification + triplet terms.

2. `make_adversarial_train_step` — the jigsaw/compression GAN-style
   alternation (train_CNN.py:276-377, SURVEY.md §3.2): per iteration,
   (a) the BACKBONE optimizer minimizes cla loss + λ_rec·jigsaw loss +
   λ_adv·compression loss through live features; (b) the SOLVER optimizer
   trains the jigsaw heads on stop_gradient'd features; (c) the
   COMPRESSION optimizer trains the quality discriminator on
   stop_gradient'd features. All three updates compile into ONE XLA
   program (the reference steps three torch optimizers sequentially with
   retain_graph).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from istvt_tpu.train import losses, metrics
from istvt_tpu.train.step import TrainState


def make_triplet_train_step(triple_apply: Callable, optimizer,
                            loss_kind: str = "total"):
    """triple_apply(params, state, a, p, n, train, rng) ->
    ((regs, clas, feats), new_state) with 3-element lists per output
    (the TripUNet contract, reference unet.py:225-233)."""

    def compute_loss(params, model_state, batch, rng):
        (regs, clas, feats), new_state = triple_apply(
            params, model_state, batch["clips"], batch["clips_pos"],
            batch["clips_neg"], train=True, rng=rng)
        labels = batch["labels"]

        def pool(f):
            return jnp.mean(f, axis=(1, 2)) if f.ndim == 4 else f

        # feats arrive as [stage][branch]; losses want [branch][stage]
        by_branch = [[pool(stage[b]) for stage in feats] for b in range(3)]
        if loss_kind == "total":
            loss = losses.total_loss(regs, clas, by_branch, labels)
        else:
            loss = losses.cla_triplet_loss(
                clas, [jnp.concatenate(br, axis=-1) for br in by_branch],
                labels)
        return loss, (new_state, clas[0])

    def step(ts: TrainState, batch, rng):
        (loss, (new_state, logits)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(ts.params, ts.model_state, batch,
                                        rng)
        updates, opt_state = optimizer.update(grads, ts.opt_state,
                                              ts.params)
        params = optax.apply_updates(ts.params, updates)
        m = {"loss": loss,
             "accuracy": metrics.accuracy(
                 logits[:, 1] - logits[:, 0] if logits.ndim == 2 and
                 logits.shape[-1] == 2 else logits, batch["labels"])}
        return TrainState(params, new_state, opt_state, ts.step + 1), m

    return jax.jit(step)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AdversarialState:
    backbone: TrainState
    solver_params: Any
    solver_state: Any
    solver_opt: Any
    ccls_params: Any
    ccls_opt: Any


def make_adversarial_train_step(
    ensemble_apply: Callable,
    solver_apply: Callable,
    ccls_apply: Callable,
    backbone_opt, solver_opt, ccls_opt,
    lam_rec: float = 1.0,
    lam_adv: float = 0.1,
    return_attns: bool = False,
):
    """The jigsaw+compression adversarial alternation in one jitted step.

    ensemble_apply(params, state, inputs, train, rng) ->
        ((clas, feats, s_attns, _), new_state)  — multi-branch backbone
    solver_apply(params, state, feat, train) -> (idx_pred, new_state)
    ccls_apply(params, feat) -> quality logits

    batch: {'clips' or views list, 'labels', 'perm' (jigsaw permutation),
    'qual' (0 lq / 1 hq), optionally 'views_pair' (the paired-quality
    views, reference train_CNN.py:398 `model(image[3:])`)}.

    return_attns=True surfaces the first branch's spatial-attention map
    in the metrics dict as 's_attns' (and 's_attns_p' from a
    stop-gradient forward on 'views_pair' when present) — the
    interpretability side output the reference dumps as .npy every 1000
    pair-training iterations (train_CNN.py:396-401; maps produced by the
    ensemble models, unet.py:535-552 — empty for DualNet, dual_net.py:232,
    in which case nothing is surfaced).
    """

    def backbone_loss(bb_params, bb_state, sol_params, sol_state,
                      ccls_params, batch, rng):
        views = batch["views"]
        (clas, feats, s_attns, _), new_state = ensemble_apply(
            bb_params, bb_state, views, True, rng)
        labels = batch["labels"]
        loss = sum(losses.bce_with_logits(c[:, :1], labels) for c in clas) \
            / len(clas)
        pooled = [jnp.mean(f, axis=(1, 2)) if f.ndim == 4 else f
                  for f in feats]
        # jigsaw pretext THROUGH the backbone (train_CNN.py:321-326)
        if "perm" in batch and lam_rec:
            idx_pred, _ = solver_apply(sol_params, sol_state, pooled[1],
                                       False)
            loss = loss + lam_rec * losses.jigsaw_loss(
                idx_pred, batch["perm"])
        # adversarial compression confusion (train_CNN.py:328-331)
        if "qual" in batch and lam_adv:
            for f in pooled:
                q_pred = ccls_apply(ccls_params, f)
                loss = loss + lam_adv * losses.softmax_cross_entropy(
                    q_pred, batch["qual"])
        attn = s_attns[0] if (return_attns and s_attns) else None
        return loss, (new_state, clas[0], pooled, attn)

    def step(st: AdversarialState, batch, rng):
        ts = st.backbone
        # (a) backbone update
        (loss_b, (bb_state, logits, pooled, attn)), grads = \
            jax.value_and_grad(backbone_loss, has_aux=True)(
                ts.params, ts.model_state, st.solver_params,
                st.solver_state, st.ccls_params, batch, rng)
        upd, bb_opt = backbone_opt.update(grads, ts.opt_state, ts.params)
        bb_params = optax.apply_updates(ts.params, upd)

        pooled = [jax.lax.stop_gradient(f) for f in pooled]

        # (b) solver update on detached features (train_CNN.py:339-354)
        def solver_loss(sol_params):
            idx_pred, sol_state = solver_apply(sol_params, st.solver_state,
                                               pooled[1], True)
            return losses.jigsaw_loss(idx_pred, batch["perm"]), sol_state

        loss_s = jnp.zeros(())
        sol_params, sol_opt, sol_state = (st.solver_params, st.solver_opt,
                                          st.solver_state)
        if "perm" in batch:
            (loss_s, sol_state), sgrads = jax.value_and_grad(
                solver_loss, has_aux=True)(st.solver_params)
            supd, sol_opt = solver_opt.update(sgrads, st.solver_opt,
                                              st.solver_params)
            sol_params = optax.apply_updates(st.solver_params, supd)

        # (c) compression classifier update (train_CNN.py:356-364)
        def ccls_loss(ccls_params):
            return sum(losses.softmax_cross_entropy(
                ccls_apply(ccls_params, f), batch["qual"])
                for f in pooled)

        ccls_params, ccls_opt_state = st.ccls_params, st.ccls_opt
        loss_c = jnp.zeros(())
        if "qual" in batch:
            loss_c, cgrads = jax.value_and_grad(ccls_loss)(st.ccls_params)
            cupd, ccls_opt_state = ccls_opt.update(cgrads, st.ccls_opt,
                                                   st.ccls_params)
            ccls_params = optax.apply_updates(st.ccls_params, cupd)

        new_st = AdversarialState(
            backbone=TrainState(bb_params, bb_state, bb_opt, ts.step + 1),
            solver_params=sol_params, solver_state=sol_state,
            solver_opt=sol_opt, ccls_params=ccls_params,
            ccls_opt=ccls_opt_state)
        m = {"loss": loss_b, "solver_loss": loss_s, "ccls_loss": loss_c,
             "accuracy": metrics.accuracy(logits[:, 0], batch["labels"])}
        if attn is not None:
            m["s_attns"] = attn
            if "views_pair" in batch:
                # paired-quality forward is a SIDE OUTPUT only (reference
                # train_CNN.py:398 runs it outside the loss): no grads,
                # BN state discarded
                (_, _, s_attns_p, _), _ = ensemble_apply(
                    jax.lax.stop_gradient(bb_params), bb_state,
                    batch["views_pair"], False, rng)
                if s_attns_p:
                    m["s_attns_p"] = s_attns_p[0]
        return new_st, m

    return jax.jit(step)
