"""Golden parity: ViViT baseline vs the reference torch modules.

reference network/vivit/vivit.py:29-81 can't be imported (circular
models_copy import), so the test composes the same factorized
spatial->temporal architecture from the importable attention modules
(network/vivit/module.py Attention/FeedForward/PreNorm, following
vivit.py:10-25 Transformer and :29-81 ViViT) with identical weights."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from istvt_tpu.core import precision
from istvt_tpu.core.config import ISTVTConfig
from istvt_tpu.models import vivit as jvivit

torch = pytest.importorskip("torch")

DEPTH = 2
DIM = 64
HEADS = 4
DIM_HEAD = 16
T = 3
GRID = 4  # feature grid -> 16 patch tokens + 1 CLS


def _build_torch(reference_path):
    import torch.nn as nn
    from network.vivit.module import Attention, FeedForward, PreNorm

    torch.manual_seed(0)
    n_patches = GRID * GRID

    class Transformer(nn.Module):   # vivit.py:10-25
        def __init__(self):
            super().__init__()
            self.layers = nn.ModuleList([])
            self.norm = nn.LayerNorm(DIM)
            for _ in range(DEPTH):
                self.layers.append(nn.ModuleList([
                    PreNorm(DIM, Attention(DIM, heads=HEADS,
                                           dim_head=DIM_HEAD)),
                    PreNorm(DIM, FeedForward(DIM, DIM * 4)),
                ]))

        def forward(self, x):
            for attn, ff in self.layers:
                x = attn(x) + x
                x = ff(x) + x
            return self.norm(x)

    class ViViT(nn.Module):         # vivit.py:29-81 (patch_size=1 path)
        def __init__(self):
            super().__init__()
            self.pos_embedding = nn.Parameter(
                torch.randn(1, T, n_patches + 1, DIM))
            self.space_token = nn.Parameter(torch.randn(1, 1, DIM))
            self.space_transformer = Transformer()
            self.temporal_token = nn.Parameter(torch.randn(1, 1, DIM))
            self.temporal_transformer = Transformer()
            self.mlp_head = nn.Sequential(nn.LayerNorm(DIM),
                                          nn.Linear(DIM, 1))

        def forward(self, feats):   # feats (B, T, n, DIM)
            b, t, n, _ = feats.shape
            cls_s = self.space_token.expand(b, -1, -1)[:, None].expand(
                b, t, 1, DIM)
            x = torch.cat((cls_s, feats), dim=2)
            x = x + self.pos_embedding[:, :, : n + 1]
            x = x.reshape(b * t, n + 1, DIM)
            x = self.space_transformer(x)
            x = x[:, 0].reshape(b, t, DIM)
            cls_t = self.temporal_token.expand(b, -1, -1)
            x = torch.cat((cls_t, x), dim=1)
            x = self.temporal_transformer(x)
            return self.mlp_head(x[:, 0])

    return ViViT().eval()


def _tr_from_torch(sd, prefix):
    from istvt_tpu.compat.torch_import import linear_w, vec
    layers = []
    for i in range(DEPTH):
        pre = f"{prefix}.layers.{i}"
        layers.append({
            "attn": {
                "norm": {"scale": vec(sd[f"{pre}.0.norm.weight"]),
                         "bias": vec(sd[f"{pre}.0.norm.bias"])},
                "to_qkv": {"w": linear_w(sd[f"{pre}.0.fn.to_qkv.weight"])},
                "to_out": {"w": linear_w(sd[f"{pre}.0.fn.to_out.0.weight"]),
                           "b": vec(sd[f"{pre}.0.fn.to_out.0.bias"])},
            },
            "ff": {
                "norm": {"scale": vec(sd[f"{pre}.1.norm.weight"]),
                         "bias": vec(sd[f"{pre}.1.norm.bias"])},
                "fc1": {"w": linear_w(sd[f"{pre}.1.fn.net.0.weight"]),
                        "b": vec(sd[f"{pre}.1.fn.net.0.bias"])},
                "fc2": {"w": linear_w(sd[f"{pre}.1.fn.net.3.weight"]),
                        "b": vec(sd[f"{pre}.1.fn.net.3.bias"])},
            },
        })
    return {"layers": layers,
            "norm": {"scale": vec(sd[f"{prefix}.norm.weight"]),
                     "bias": vec(sd[f"{prefix}.norm.bias"])}}


def test_vivit_logit_parity(reference_path):
    from istvt_tpu.compat.torch_import import linear_w, vec

    tm = _build_torch(reference_path)
    sd = tm.state_dict()
    params = {
        "pos_embedding": vec(sd["pos_embedding"]),
        "space_token": vec(sd["space_token"]),
        "temporal_token": vec(sd["temporal_token"]),
        "space_transformer": _tr_from_torch(sd, "space_transformer"),
        "temporal_transformer": _tr_from_torch(sd, "temporal_transformer"),
        "mlp_head": {
            "norm": {"scale": vec(sd["mlp_head.0.weight"]),
                     "bias": vec(sd["mlp_head.0.bias"])},
            "fc": {"w": linear_w(sd["mlp_head.1.weight"]),
                   "b": vec(sd["mlp_head.1.bias"])},
        },
    }
    cfg = ISTVTConfig(num_frames=T, feat_hw=GRID, dim=DIM, depth=DEPTH,
                      heads=HEADS, dim_head=DIM_HEAD, num_classes=1)
    feats = np.random.RandomState(0).randn(2, T, GRID, GRID, DIM).astype(
        np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(feats.reshape(2, T, GRID * GRID, DIM))
                  ).numpy()
    with precision.highest():
        got = jvivit.vivit_apply(params, jnp.asarray(feats), cfg)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)
