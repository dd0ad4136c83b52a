"""Matmul/conv precision control.

JAX's DEFAULT precision lets the backend use fast reduced-precision
multiplies (bf16 passes on the TPU MXU — the CPU backend mirrors this).
That is the production path; golden parity tests against the PyTorch
reference (<=1e-3 logits, SURVEY.md §6) need full f32 accumulation.

We use `jax.default_matmul_precision` because it participates in the jit
trace-cache key (a hand-rolled global would silently hit stale executables).

Usage:
    with istvt_tpu.core.precision.highest():
        ...  # all convs/matmuls (precision=None) run at HIGHEST
"""
from __future__ import annotations

import jax


def get():
    """Framework ops pass precision=None and defer to the jax config."""
    return None


def highest():
    return jax.default_matmul_precision("highest")
