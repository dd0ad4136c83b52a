"""LRP golden harness (VERDICT r1 #3): the JAX relevance rollout
(istvt_tpu/interpret/lrp.py) vs an independent torch-side Chefer-style
`transformer_attribution` computed on the SAME composed reference DSTTr
used by test_istvt_parity.py, with identical weights.

The torch side captures every post-softmax attention map A and its
gradient dlogit/dA from the REFERENCE modules' own forward code (a
temporary `torch.Tensor.softmax` wrapper with retain_grad — no
reimplementation of the attention math), then rolls relevance out with
the tfe engine's rule (SURVEY.md §2.7.2; contract
reference visualize_rel.py:257-259):

    Ā_l = mean_h[(dA ⊙ A)+];  R = N(Ā_L + I) ··· N(Ā_1 + I)

with N row-normalizing (compute_rollout_attention), split into the
decomposed spatial rollout (per frame row) and temporal rollout (per
spatial location) exactly as the reference's (cam_s, cam_t) outputs.

A behavioral test additionally checks that after overfitting the
synthetic temporal artifact, the cams LOCALIZE a fixed artifact patch.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from istvt_tpu.compat.torch_import import dsttr_from_torch, xception_from_torch
from istvt_tpu.core import precision
from istvt_tpu.core.config import ISTVTConfig
from istvt_tpu.interpret.lrp import generate_lrp

torch = pytest.importorskip("torch")

DEPTH = 2


def _capture_attention_maps(model, feats_t, index=0):
    """Run the torch model capturing every post-softmax map + gradient.

    Returns (logits, list of (A, dA)) in forward order. A temporal map is
    (B, H, 362, T+1, T+1); a spatial map is (B, H, T+1, 362, 362)
    (reference module.py:85-90, 199-204)."""
    captured = []
    orig = torch.Tensor.softmax

    def patched(self, dim=-1, *a, **k):
        out = orig(self, dim, *a, **k)
        if out.requires_grad:
            out.retain_grad()
            captured.append(out)
        return out

    torch.Tensor.softmax = patched
    try:
        logits = model(feats_t)
        logits[:, index].sum().backward()
    finally:
        torch.Tensor.softmax = orig
    return logits, [(a.detach(), a.grad.detach()) for a in captured]


def _rollout_t(abars):
    """Chefer compute_rollout_attention: row-normalized (Ā+I) product."""
    n = abars[0].shape[-1]
    eye = torch.eye(n, dtype=abars[0].dtype)
    r = None
    for a in abars:
        m = a + eye
        m = m / m.sum(dim=-1, keepdim=True)
        r = m if r is None else torch.einsum("...ij,...jk->...ik", m, r)
    return r


def _torch_transformer_attribution(maps):
    """maps: [(A, dA)] in forward order [t0, s0, t1, s1, ...] -> the
    decomposed (cam_s, cam_t), each (B, T, hw)."""
    abars_t, abars_s = [], []
    for a, g in maps:
        abar = (g * a).clamp(min=0).mean(dim=1)     # mean over heads
        # temporal (B, S, T1, T1) has small trailing dims; spatial
        # (B, T1, S, S) has the 362-wide tail
        if a.shape[-1] < a.shape[-3]:
            abars_t.append(abar)
        else:
            abars_s.append(abar)
    r_s = _rollout_t(abars_s)                       # (B, T1, S, S)
    cam_s = r_s[:, 1:, 0, 1:]                       # (B, T, hw)
    r_t = _rollout_t(abars_t)                       # (B, S, T1, T1)
    cam_t = r_t[:, 1:, 0, 1:].transpose(1, 2)       # (B, T, hw)
    return cam_s, cam_t


def test_lrp_matches_torch_chefer_rollout(reference_path):
    """Full XceptionVidTr: identical weights + input on both sides; the
    JAX generate_lrp cams must equal the torch hook-based rollout."""
    from test_istvt_parity import _build_torch_dsttr
    import network.xception as rx

    torch.manual_seed(1)
    xcep = rx.Xception(num_classes=2)
    xcep.eval()
    with torch.no_grad():
        for mod in xcep.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.copy_(torch.randn(mod.num_features) * 0.05)
                mod.running_var.copy_(torch.rand(mod.num_features) + 0.5)
    dsttr = _build_torch_dsttr(reference_path, depth=DEPTH)

    rng = np.random.RandomState(3)
    clips = rng.rand(1, 6, 3, 300, 300).astype(np.float32) * 2 - 1

    bt = torch.from_numpy(clips).flatten(0, 1)
    with torch.no_grad():
        feats = xcep.low_level_features(bt).reshape(1, 6, 728, 19, 19)
    ref_logits, maps = _capture_attention_maps(dsttr, feats)
    assert len(maps) == 2 * DEPTH
    cam_s_ref, cam_t_ref = _torch_transformer_attribution(maps)

    xp, xs = xception_from_torch(xcep.state_dict())
    vp = dsttr_from_torch(dsttr.state_dict(), depth=DEPTH)
    params, state = {"xcep": xp, "vit": vp}, {"xcep": xs}
    cfg = ISTVTConfig(depth=DEPTH)
    clips_j = jnp.asarray(clips.transpose(0, 1, 3, 4, 2))
    with precision.highest():
        cam_s, cam_t = generate_lrp(params, state, clips_j, cfg, index=0,
                                    method="transformer_attribution")
    assert cam_s.shape == cam_t.shape == (1, 6, 361)
    np.testing.assert_allclose(np.asarray(cam_s), cam_s_ref.numpy(),
                               atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(cam_t), cam_t_ref.numpy(),
                               atol=2e-4, rtol=2e-3)


def test_lrp_localizes_synthetic_artifact():
    """Behavioral check: overfit a tiny ISTVT on clips whose 'fake' class
    has per-frame-independent noise in a FIXED patch; the relevance cams
    of a fake clip must concentrate on that patch's feature cells."""
    from istvt_tpu.models.registry import model_selection
    from istvt_tpu.train import step as S
    from istvt_tpu.train.schedule import cosine_schedule
    from istvt_tpu.core.config import TrainConfig

    size, fhw, t = 72, 5, 3
    cell = size / fhw                    # ~14.4 px per feature cell
    lo, hi = int(cell * 1), int(cell * 4)  # patch covers cells 1..3

    def make_batch(n, seed):
        rng = np.random.default_rng(seed)
        clips, labels = [], []
        for i in range(n):
            base = rng.normal(0, 0.3, (size, size, 3)).astype(np.float32)
            clip = np.stack([np.roll(base, s, axis=1) for s in range(t)])
            if i % 2 == 1:
                clip[:, lo:hi, lo:hi] += rng.normal(
                    0, 1.0, (t, hi - lo, hi - lo, 3)).astype(np.float32)
            clips.append(clip)
            labels.append(i % 2)
        return {"clips": jnp.asarray(np.stack(clips)),
                "labels": jnp.asarray(np.asarray(labels, np.int32))}

    # depth 2: with a single layer the clamped CLS-row grad⊙A can
    # degenerate to exactly zero (no cross-layer mixing); two layers give
    # the rollout its product structure and the cams localize strongly
    # (measured inside/outside contrast ~170x for cam_s, ~8x for cam_t)
    cfg = ISTVTConfig(num_frames=t, image_size=size, feat_hw=fhw, depth=2)
    model = model_selection("istvt", num_out_classes=1, cfg=cfg)
    opt = S.make_optimizer(TrainConfig(), cosine_schedule(3e-4, 10_000))
    ts = S.create_train_state(model, jax.random.PRNGKey(0), opt)
    step = S.make_train_step(model, opt, donate=False)
    batch = make_batch(16, seed=0)
    rng = jax.random.PRNGKey(1)
    for _ in range(30):
        rng, srng = jax.random.split(rng)
        ts, m = step(ts, batch, srng)
    assert float(m["loss"]) < 0.3, float(m["loss"])

    fake = make_batch(2, seed=7)["clips"][1:2]      # one fake clip
    cam_s, cam_t = generate_lrp(ts.params, ts.model_state, fake, cfg)
    # feature-grid mask of the patch cells (cells 1..3 in both axes)
    mask = np.zeros((fhw, fhw), bool)
    mask[1:4, 1:4] = True
    for name, cam in (("cam_s", cam_s), ("cam_t", cam_t)):
        grid = np.asarray(cam)[0].mean(0).reshape(fhw, fhw)
        inside = grid[mask].mean()
        outside = grid[~mask].mean()
        assert inside > outside, (name, inside, outside, grid)
