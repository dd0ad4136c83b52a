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


def make_teacher_fn(teacher_model, params, state,
                    compute_dtype=None, mesh=None) -> Callable:
    """Returns batch -> teacher logits (eval mode, jitted once).

    compute_dtype: cast teacher params + input for the forward (e.g.
    jnp.bfloat16 on TPU); logits are returned as produced.

    mesh: the Trainer's device mesh when training is sharded — teacher
    params/state are replicated over it so the jitted forward composes
    with data-sharded batches (single-device teacher arrays against a
    mesh-sharded clip tensor is an incompatible-devices error).
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
        return logits_fn(params, state, x)

    return teacher_fn


def augment_with_teacher(teacher_fn: Callable,
                         student_size: Optional[int] = None) -> Callable:
    """batch_hook for Trainer(fit): adds 'teacher_logits' to each batch.

    student_size: cross-geometry distillation — the teacher scores the
    ORIGINAL clip, then the clip is bilinearly downscaled to
    (student_size, student_size) for the student. Pos-embeddings are
    per-token, so teacher and student each need their own geometry; this
    is how the composed serving recipe (full-geometry teacher ->
    reduced-geometry shallow student, docs/SERVING.md) is trained.
    """
    resize = None
    if student_size is not None:
        @jax.jit
        def resize(x):
            shape = (*x.shape[:-3], student_size, student_size, x.shape[-1])
            return jax.image.resize(x, shape, "bilinear")

    def hook(batch):
        out = dict(batch)
        out["teacher_logits"] = teacher_fn(batch)
        if resize is not None:
            key = "clips" if "clips" in batch else "images"
            out[key] = resize(batch[key])
        return out
    return hook
