"""Typed configuration for the whole framework.

The reference drives everything through 38 argparse flags duplicated across
three scripts (reference train_CNN.py:1016-1058, visualize_rel.py:302-343,
visualize_feat_map.py:289-330). Here a single set of frozen dataclasses is
consumed by train / eval / visualize / bench alike.
"""
from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class ISTVTConfig:
    """Geometry of the ISTVT model (reference network/vivit/vivit.py:103-208).

    Defaults reproduce the paper model: 6-frame 300x300 clips, Xception entry
    flow to a 19x19x728 feature map, 12 decomposed spatial-temporal layers,
    8 heads x 64 dim_head, one output logit.
    """

    num_frames: int = 6            # T (reference vivit.py:201)
    image_size: int = 300          # input H=W (reference train_CNN.py:1049)
    feat_hw: int = 19              # Xception low-level feature grid (300->19)
    dim: int = 728                 # token dim == Xception channel count
    depth: int = 12
    heads: int = 8
    dim_head: int = 64
    mlp_ratio: int = 4             # scale_dim (reference vivit.py:122)
    num_classes: int = 1           # single BCE logit (train_CNN.py:148)
    dropout: float = 0.0
    # NOTE no emb_dropout: the reference DSTTr constructs
    # nn.Dropout(emb_dropout) but never applies it in forward
    # (vivit.py:124 vs :130-147) — a dead knob not mirrored here.
    # compute knobs (not in reference; TPU-first additions)
    use_pallas: bool = False       # fused Pallas attention kernels
    quantize: str = "none"         # 'int8': W8A8 ST-layer GEMMs for
                                   # serving (requires use_pallas and
                                   # models/istvt.quantize_params weights)
    q8_ff: str = "full"            # int8 FF form: 'full' (fastest,
                                   # measured 263 clips/s) | 'mixed'
                                   # (int8 fc1 only, 248) | 'bf16' (232)
    stem_store: str = "f8"         # int8-serving stem activation
                                   # STORAGE dtype: 'f8' (e4m3 inter-conv
                                   # tensors; the bandwidth-bound stem
                                   # drops 14.5 -> 12.5 ms/96-frames;
                                   # accuracy gated by tests/test_quant)
                                   # | 'bf16'. Float/train paths ignore
                                   # it (compute is never f8).
    q8_attn: str = "ingest"        # int8 attention ingestion: 'ingest'
                                   # (LN/out-proj+QKV GEMMs fused INTO
                                   # the attention kernels — packed qkv
                                   # never touches HBM) | 'boundary'
                                   # (separate boundary-fused GEMM
                                   # kernels; kept for A/B)
    remat: bool = False            # jax.checkpoint each ST layer (trades
                                   # recompute FLOPs for activation memory)
    # (compute/param dtype live on TrainConfig.compute_dtype — the model
    # itself is dtype-polymorphic: it computes in whatever dtype the
    # params/inputs arrive in)

    @property
    def tokens_per_frame(self) -> int:
        # hw patches + 1 spatial CLS (reference vivit.py:136-138)
        return self.feat_hw * self.feat_hw + 1

    @property
    def inner_dim(self) -> int:
        return self.heads * self.dim_head


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout. axis 'data' = DP (batch), axis 'model' = TP."""

    data: int = -1   # -1: all devices on the data axis
    model: int = 1


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Host-side clip pipeline settings (reconstructing the external
    `dataset` package's call-site API, reference train_CNN.py:162-177).
    Normalization (mean/std 0.5, reference xception.py:12-14) lives on
    `data.transforms.Transform`; per-loader knobs (mode, workers) on the
    dataset/loader constructors — this record carries the run-level
    choices the Trainer reads (dataset family, quality, geometry)."""

    root: str = ""
    quality: str = "hq"             # 'hq' | 'lq'
    seq_len: int = 6
    input_size: int = 300
    batch_size: int = 16
    dataset: str = "ff++"           # 'ff++' | 'celeb' | 'oulu' |
                                    # 'synthetic' | 'ff++video'
    dataset_len: Optional[int] = None


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    model_name: str = "istvt"
    num_epochs: int = 40
    base_lr: float = 5e-4           # reference manual schedule train_CNN.py:209-211
    optimizer: str = "adamw"        # 'adamw' | 'sgd'
    weight_decay: float = 0.01      # torch AdamW default
    momentum: float = 0.9
    seed: int = 0
    warmup_epochs: int = 20
    checkpoint_dir: str = "./output"
    log_every: int = 1000           # reference prints every 1000 iters
    # NOTE: BN stats are ALWAYS global-batch under the mesh — a jnp.mean
    # over the batch axis of a 'data'-sharded array is the global mean by
    # SPMD semantics (XLA inserts the all-reduce), so there is no
    # per-replica-BN mode to toggle and no sync_bn flag.
    debug_nans: bool = False        # enable jax_debug_nans in Trainer
    compute_dtype: str = "float32"  # 'bfloat16': bf16 forward/backward
                                    # against f32 master params
