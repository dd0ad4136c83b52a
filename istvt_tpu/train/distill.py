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
                    compute_dtype=None) -> Callable:
    """Returns batch -> teacher logits (eval mode, jitted once).

    compute_dtype: cast teacher params + input for the forward (e.g.
    jnp.bfloat16 on TPU); logits are returned as produced.
    """
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


def augment_with_teacher(teacher_fn: Callable) -> Callable:
    """batch_hook for Trainer(fit): adds 'teacher_logits' to each batch."""
    def hook(batch):
        out = dict(batch)
        out["teacher_logits"] = teacher_fn(batch)
        return out
    return hook
