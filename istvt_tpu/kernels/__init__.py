"""Pallas TPU kernels (SURVEY.md §2.9 — the native compute-path work).

attention.py:
  fused_frame_attention_mh      — per-frame spatial attention, all heads
                                  in-VMEM (no HBM probs / head transposes)
  fused_temporal_attention      — self-subtract temporal attention over
                                  the folded (location, head) axis
  fused_frame_attention_bwd     — flash-style spatial backward
  fused_temporal_attention_bwd  — temporal backward incl. transposed
                                  self-subtract
  spatial_attention_pallas / temporal_attention_pallas — differentiable
  (custom_vjp) entry points used by nn/attention.py when
  ISTVTConfig.use_pallas is set.

mlp.py:
  fused_ff — fc1 + GELU + fc2 with VMEM-resident weights (~92% MXU).
"""
from istvt_tpu.kernels.attention import (  # noqa: F401
    fused_frame_attention,
    fused_frame_attention_bwd,
    fused_frame_attention_mh,
    fused_temporal_attention,
    fused_temporal_attention_bwd,
    spatial_attention_pallas,
    temporal_attention_pallas,
)
from istvt_tpu.kernels.mlp import fused_ff  # noqa: F401
