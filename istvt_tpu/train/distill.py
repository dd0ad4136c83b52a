"""Knowledge distillation — train a cheaper student against a teacher.

Beyond-reference capability: "distillation" is one of the architectural
serving levers named in docs/KERNELS.md (the exact-geometry int8 forward
is roofline-closed; a shallower student serves proportionally faster —
the ST-layer stack is ~74% of serving time at depth 12). The reference
has no distillation machinery.

Design: teacher logits are computed by a separately-jitted eval forward
and injected into each batch under 'teacher_logits'; the student trains
through the standard `make_train_step` with
`losses.make_distill_loss(alpha, T)`. Because the teacher signal rides
IN the batch pytree, it composes for free with every step feature:
bf16 compute, grad_accum microbatching (the scan splits the logits with
the clips), TP/PP meshes, donation.

The teacher's params/state are ARGUMENTS of the jitted forward, never
closures — closed-over arrays embed in the axon compile payload (the
documented HTTP 413 failure above ~300 MB; CLAUDE.md).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def make_teacher_fn(teacher_model, params, state,
                    compute_dtype=None, mesh=None,
                    cam_cfg=None, cam_chunk: Optional[int] = None
                    ) -> Callable:
    """Returns batch -> teacher logits (eval mode, jitted once).

    compute_dtype: cast teacher params + input for the forward (e.g.
    jnp.bfloat16 on TPU); logits are returned as produced.

    mesh: the Trainer's device mesh when training is sharded — teacher
    params/state are replicated over it so the jitted forward composes
    with data-sharded batches (single-device teacher arrays against a
    mesh-sharded clip tensor is an incompatible-devices error).

    cam_cfg: the teacher's ISTVTConfig — when set, teacher_fn returns
    (logits, cam_s, cam_t): the teacher's OWN LRP attribution maps
    (interpret/lrp.generate_lrp), the supervision signal for
    attention-transfer distillation. Logit-only distillation can leave
    the student solving the task through an anti-localized attention
    pattern that defeats the LRP interpretability contract (measured:
    a toy distilled student puts exactly zero relevance on the
    artifact cells its teacher localizes at 1.6-2.8x uniform);
    transferring WHERE the teacher looks restores it
    (losses.make_distill_loss attn_weight).

    cam_chunk: compute the LRP cams in batch chunks of this size — at
    full geometry (300^2/depth-12) the materialized per-layer attention
    maps AND their grads are ~700 MB per clip row; a B=8 batch at once
    exceeds v5e HBM (surfaces as the opaque remote-compile HTTP 500).
    Chunks are equal-shape (batch must divide), so one compile serves
    all chunks.
    """
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        rep = NamedSharding(mesh, PartitionSpec())
        params = jax.device_put(params, rep)
        state = jax.device_put(state, rep)
    @jax.jit
    def logits_fn(p, s, x):
        if compute_dtype is not None:
            from istvt_tpu.core import tree as _tree
            p = _tree.cast(p, compute_dtype)
            x = x.astype(compute_dtype)
        out, _ = teacher_model.apply(p, s, x, train=False)
        return out

    def teacher_fn(batch):
        x = batch.get("clips", batch.get("images"))
        logits = logits_fn(params, state, x)
        if cam_cfg is None:
            return logits
        from istvt_tpu.interpret.lrp import generate_lrp
        if cam_chunk and x.shape[0] > cam_chunk:
            assert x.shape[0] % cam_chunk == 0, \
                f"cam_chunk {cam_chunk} must divide batch {x.shape[0]}"
            parts = [generate_lrp(params, state, x[i:i + cam_chunk],
                                  cam_cfg, index=0)
                     for i in range(0, x.shape[0], cam_chunk)]
            cam_s = jnp.concatenate([p[0] for p in parts])
            cam_t = jnp.concatenate([p[1] for p in parts])
        else:
            cam_s, cam_t = generate_lrp(params, state, x, cam_cfg,
                                        index=0)
        return logits, cam_s, cam_t

    return teacher_fn


def augment_with_teacher(teacher_fn: Callable,
                         student_size: Optional[int] = None,
                         student_feat_hw: Optional[int] = None) -> Callable:
    """batch_hook for Trainer(fit): adds 'teacher_logits' to each batch.

    student_size: cross-geometry distillation — the teacher scores the
    ORIGINAL clip, then the clip is bilinearly downscaled to
    (student_size, student_size) for the student. Pos-embeddings are
    per-token, so teacher and student each need their own geometry; this
    is how the composed serving recipe (full-geometry teacher ->
    reduced-geometry shallow student, docs/SERVING.md) is trained.

    When teacher_fn was built with cam_cfg (attention transfer), the
    hook also adds 'teacher_cam_s' (B, T, hw_student): the teacher's
    spatial LRP map per frame, bilinearly regridded from the teacher's
    feature grid to the student's (student_feat_hw; default: the
    teacher's own grid) and renormalized to a distribution over cells —
    consumed by losses.make_distill_loss(attn_weight=...); and
    'teacher_cam_t' (B, T): the teacher's frame-relevance marginal.
    """
    resize = None
    if student_size is not None:
        @jax.jit
        def resize(x):
            shape = (*x.shape[:-3], student_size, student_size, x.shape[-1])
            return jax.image.resize(x, shape, "bilinear")

    @jax.jit
    def regrid(cam_s, cam_t):
        b, t, hw = cam_s.shape
        ht = int(round(hw ** 0.5))
        hs = student_feat_hw or ht
        g = cam_s.reshape(b, t, ht, ht)
        if hs != ht:
            g = jax.image.resize(g, (b, t, hs, hs), "bilinear")
        g = jnp.maximum(g.reshape(b, t, hs * hs), 0.0)
        g = g / (jnp.sum(g, axis=-1, keepdims=True) + 1e-9)
        ft = jnp.maximum(jnp.sum(cam_t, axis=-1), 0.0)        # (B, T)
        ft = ft / (jnp.sum(ft, axis=-1, keepdims=True) + 1e-9)
        return g, ft

    def hook(batch):
        out = dict(batch)
        res = teacher_fn(batch)
        if isinstance(res, tuple):
            out["teacher_logits"], cam_s, cam_t = res
            out["teacher_cam_s"], out["teacher_cam_t"] = regrid(cam_s, cam_t)
        else:
            out["teacher_logits"] = res
        if resize is not None:
            key = "clips" if "clips" in batch else "images"
            out[key] = resize(batch[key])
        return out
    return hook
