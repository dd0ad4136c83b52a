"""istvt_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video deepfake-detection framework.

Brand-new implementation of the capabilities of ISTVT (Interpretable
Spatial-Temporal Video Transformer for Deepfake Detection, TIFS 2023;
reference implementation Vill-Lab/2023-TIFS-ISTVT). The compute path is
functional JAX compiled by XLA with optional fused Pallas attention kernels;
parallelism is expressed as shardings over a `jax.sharding.Mesh` (data /
model axes) rather than the reference's `nn.DataParallel`.

Layout (see SURVEY.md §7):
  core/      typed configs, pytree utilities, mesh/sharding, rng, checkpointing
  nn/        functional layers (convs, norms, attention) — XLA einsum path
  kernels/   Pallas TPU kernels (fused decomposed spatial/temporal attention)
  models/    model zoo + `model_selection` registry (parity with
             reference network/models.py:240-282)
  compat/    PyTorch state_dict -> JAX pytree converters for golden parity
  data/      host-side clip pipeline (decode, face-crop, normalize, shard)
  train/     losses, metrics (acc/AUC/ACER), schedules, pjit train/eval loops
  interpret/ LRP-style relevance rollout -> spatial/temporal saliency maps
  cli/       train / eval / visualize / bench entry points
"""

__version__ = "0.1.0"
