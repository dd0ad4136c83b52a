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


def _zrule_t(f, inputs, r_out, split=False):
    """Torch generic z-rule (mirror of interpret/full_lrp.zrule, written
    against torch.autograd): R_i = x_i ⊙ ∂f/∂x_i^T [R / (f(x)+ε)]."""
    xs = [x.detach().clone().requires_grad_(True) for x in inputs]
    z = f(*xs)
    s = r_out / (z + 1e-9 * torch.where(z >= 0, torch.ones_like(z),
                                        -torch.ones_like(z)))
    gs = torch.autograd.grad(z, xs, grad_outputs=s)
    k = 0.5 if split else 1.0
    out = tuple(x.detach() * g * k for x, g in zip(xs, gs))
    return out if len(out) > 1 else out[0]


def _torch_full_lrp_rel_attns(dsttr, feats_t, index=0):
    """ε-rule relevance propagation over the composed reference DSTTr
    (torch side, torch.autograd vjps): returns per-layer relevance of the
    post-softmax maps, temporal in (b, h, hw, t1, t1) and spatial in
    (b, h, t1, S, S) — the reference modules' own layouts
    (module.py:85-90, 199-204)."""
    import torch.nn.functional as F  # noqa: F401

    dim, heads, hw1 = 728, 8, 19 * 19 + 1
    b, t = feats_t.shape[0], feats_t.shape[1]
    t1, S = t + 1, hw1
    n = (t1) * S

    def ln_det(mod, u):
        mu = u.mean(-1, keepdim=True).detach()
        var = u.var(-1, unbiased=False, keepdim=True).detach()
        return (u - mu) / torch.sqrt(var + mod.eps) * mod.weight + mod.bias

    # token building (constants w.r.t. the walk)
    with torch.no_grad():
        x = feats_t.flatten(3).transpose(2, 3)
        cls_space = dsttr.space_token.expand(b, t, 1, dim)
        x = torch.cat((cls_space, x), dim=2)
        x = x + dsttr.pos_embedding[:, :, :x.shape[2]]
        cls_temporal = dsttr.temporal_token.expand(b, 1, x.shape[2], dim)
        x = torch.cat((cls_temporal, x), dim=1).reshape(b, n, dim)

    def t_stages(pn):
        fn = pn.fn
        w_qk, w_v = fn.to_qk.weight, fn.to_v.weight
        out_lin = fn.to_out[0]
        scale = 64 ** -0.5

        def qk_path(h):
            qk = h @ w_qk.T
            u = qk.reshape(b, t1, S, -1)
            sub = torch.cat((u[:, :2], u[:, 2:] - u[:, 1:-1]), dim=1)
            q, k = sub.reshape(b, n, -1).chunk(2, dim=-1)
            # 'b (t hw) (h d) -> b h hw t d' (module.py:196-197)
            q = q.reshape(b, t1, S, heads, 64).permute(0, 3, 2, 1, 4)
            k = k.reshape(b, t1, S, heads, 64).permute(0, 3, 2, 1, 4)
            return q, k

        def v_path(h):
            v = h @ w_v.T
            return v.reshape(b, t1, S, heads, 64).permute(0, 3, 2, 1, 4)

        def qk_dots(q, k):
            return torch.einsum("bhsid,bhsjd->bhsij", q, k) * scale

        def pv(a, v):
            return torch.einsum("bhsij,bhsjd->bhsid", a, v)

        def out_path(ctx):
            merged = ctx.permute(0, 3, 2, 1, 4).reshape(b, n, -1)
            return merged @ out_lin.weight.T + out_lin.bias

        return qk_path, v_path, qk_dots, pv, out_path

    def s_stages(pn):
        fn = pn.fn
        w_qkv = fn.to_qkv.weight
        out_lin = fn.to_out[0]
        scale = 64 ** -0.5

        def qkv_path(h):
            qkv = h @ w_qkv.T
            q, k, v = qkv.chunk(3, dim=-1)
            # 'b (t hw) (h d) -> b h t hw d' (module.py:84)
            shape = lambda u: u.reshape(b, t1, S, heads, 64) \
                .permute(0, 3, 1, 2, 4)
            return shape(q), shape(k), shape(v)

        def qk_dots(q, k):
            return torch.einsum("bhtid,bhtjd->bhtij", q, k) * scale

        def pv(a, v):
            return torch.einsum("bhtij,bhtjd->bhtid", a, v)

        def out_path(ctx):
            merged = ctx.permute(0, 2, 3, 1, 4).reshape(b, n, -1)
            return merged @ out_lin.weight.T + out_lin.bias

        return qkv_path, qk_dots, pv, out_path

    # ---- forward, saving intermediates
    saved = []
    with torch.no_grad():
        for pn_t, pn_s, pn_f in dsttr.transformer.layers:
            sv = {"x_in": x}
            hn_t = ln_det(pn_t.norm, x)
            qk_path, v_path, qk_dots, pv_t, out_t_path = t_stages(pn_t)
            q, k = qk_path(hn_t)
            v = v_path(hn_t)
            dots = qk_dots(q, k)
            attn = dots.softmax(dim=-1)
            ctx = pv_t(attn, v)
            out_t = out_t_path(ctx)
            sv.update(hn_t=hn_t, q_t=q, k_t=k, v_t=v, dots_t=dots,
                      attn_t=attn, ctx_t=ctx, out_t=out_t)
            hn_s = ln_det(pn_s.norm, out_t)
            qkv_path, qk_dots_s, pv_s, out_s_path = s_stages(pn_s)
            qs, ks, vs = qkv_path(hn_s)
            dots_s = qk_dots_s(qs, ks)
            attn_s = dots_s.softmax(dim=-1)
            ctx_s = pv_s(attn_s, vs)
            out_s = out_s_path(ctx_s)
            sv.update(hn_s=hn_s, q_s=qs, k_s=ks, v_s=vs, dots_s=dots_s,
                      attn_s=attn_s, ctx_s=ctx_s, out_s=out_s)
            x_attn = out_s + x
            hn_f = ln_det(pn_f.norm, x_attn)
            fc1, fc2 = pn_f.fn.net[0], pn_f.fn.net[3]
            h1 = hn_f @ fc1.weight.T + fc1.bias
            g1 = torch.nn.functional.gelu(h1)
            f_out = g1 @ fc2.weight.T + fc2.bias
            sv.update(x_attn=x_attn, hn_f=hn_f, h1=h1, g1=g1, f_out=f_out,
                      fc1=fc1, fc2=fc2, pn_t=pn_t, pn_s=pn_s, pn_f=pn_f)
            saved.append(sv)
            x = f_out + x_attn
        x_fin = ln_det(dsttr.transformer.norm, x)
        grid = x_fin.reshape(b, t1, S, dim)
        cls = grid[:, 0, 0]
        head_ln, head_fc = dsttr.mlp_head[0], dsttr.mlp_head[1]
        head_n = ln_det(head_ln, cls)
        logits = head_n @ head_fc.weight.T + head_fc.bias

    # ---- relevance walk
    r = torch.zeros_like(logits)
    r[:, index] = 1.0
    r = _zrule_t(lambda h: h @ head_fc.weight.T + head_fc.bias, (head_n,),
                 r)
    r = _zrule_t(lambda c: ln_det(head_ln, c), (cls,), r)
    r = _zrule_t(lambda g: g[:, 0, 0], (grid,), r).reshape(b, n, dim)
    r = _zrule_t(lambda u: ln_det(dsttr.transformer.norm, u),
                 (saved[-1]["f_out"] + saved[-1]["x_attn"],), r)

    rel_t, rel_s = [], []
    for sv in reversed(saved):
        r_f, r_xa = _zrule_t(lambda a, c: a + c,
                             (sv["f_out"], sv["x_attn"]), r)
        fc1, fc2 = sv["fc1"], sv["fc2"]
        r_g1 = _zrule_t(lambda u: u @ fc2.weight.T + fc2.bias,
                        (sv["g1"],), r_f)
        r_h1 = _zrule_t(torch.nn.functional.gelu, (sv["h1"],), r_g1)
        r_hnf = _zrule_t(lambda u: u @ fc1.weight.T + fc1.bias,
                         (sv["hn_f"],), r_h1)
        r_xa = r_xa + _zrule_t(
            lambda u: ln_det(sv["pn_f"].norm, u), (sv["x_attn"],), r_hnf)
        r_outs, r_xin = _zrule_t(lambda a, c: a + c,
                                 (sv["out_s"], sv["x_in"]), r_xa)
        # spatial branch
        qkv_path, qk_dots_s, pv_s, out_s_path = s_stages(sv["pn_s"])
        r_ctx = _zrule_t(out_s_path, (sv["ctx_s"],), r_outs)
        r_as, r_vs = _zrule_t(pv_s, (sv["attn_s"], sv["v_s"]), r_ctx,
                              split=True)
        rel_s.append(r_as)
        r_dots = _zrule_t(lambda dd: dd.softmax(dim=-1), (sv["dots_s"],),
                          r_as)
        r_qs, r_ks = _zrule_t(qk_dots_s, (sv["q_s"], sv["k_s"]), r_dots,
                              split=True)
        hn_s = sv["hn_s"].detach().clone().requires_grad_(True)
        z = qkv_path(hn_s)
        ss = tuple(_r / (zz + 1e-9) for _r, zz in
                   zip((r_qs, r_ks, r_vs), z))
        (g,) = torch.autograd.grad(z, (hn_s,), grad_outputs=ss)
        r_hns = hn_s.detach() * g
        r_outt = _zrule_t(lambda u: ln_det(sv["pn_s"].norm, u),
                          (sv["out_t"],), r_hns)
        # temporal branch
        qk_path, v_path, qk_dots_t, pv_t, out_t_path = t_stages(sv["pn_t"])
        r_ctx_t = _zrule_t(out_t_path, (sv["ctx_t"],), r_outt)
        r_at, r_vt = _zrule_t(pv_t, (sv["attn_t"], sv["v_t"]), r_ctx_t,
                              split=True)
        rel_t.append(r_at)
        r_dots_t = _zrule_t(lambda dd: dd.softmax(dim=-1),
                            (sv["dots_t"],), r_at)
        r_qt, r_kt = _zrule_t(qk_dots_t, (sv["q_t"], sv["k_t"]),
                              r_dots_t, split=True)
        hn_t = sv["hn_t"].detach().clone().requires_grad_(True)
        z_qk = qk_path(hn_t)
        g_qk = torch.autograd.grad(
            z_qk, (hn_t,),
            grad_outputs=(r_qt / (z_qk[0] + 1e-9),
                          r_kt / (z_qk[1] + 1e-9)))[0]
        hn_t2 = sv["hn_t"].detach().clone().requires_grad_(True)
        z_v = v_path(hn_t2)
        g_v = torch.autograd.grad(z_v, (hn_t2,),
                                  grad_outputs=r_vt / (z_v + 1e-9))[0]
        r_hnt = sv["hn_t"].detach() * (g_qk + g_v)
        r = r_xin + _zrule_t(lambda u: ln_det(sv["pn_t"].norm, u),
                             (sv["x_in"],), r_hnt)
    rel_t.reverse()
    rel_s.reverse()
    return rel_t, rel_s


def test_full_lrp_matches_torch_relprop(reference_path):
    """VERDICT r2 #3: the ε-rule relevance propagation cross-checked by an
    INDEPENDENT torch-side relprop over the composed reference DSTTr
    (torch.autograd vjps + the reference modules' own weights/layouts):
    per-layer attention relevances and the final full_lrp cams agree."""
    from test_istvt_parity import _build_torch_dsttr
    from istvt_tpu.interpret.full_lrp import generate_full_lrp

    DEPTH_L = 2
    dsttr = _build_torch_dsttr(reference_path, depth=DEPTH_L)
    rng = np.random.RandomState(5)
    feats = rng.randn(1, 6, 728, 19, 19).astype(np.float32) * 0.5
    feats_t = torch.from_numpy(feats)

    rel_t_ref, rel_s_ref = _torch_full_lrp_rel_attns(dsttr, feats_t,
                                                     index=0)
    _, maps = _capture_attention_maps(_unfreeze(dsttr), feats_t)
    grads_t = [g for a, g in maps if a.shape[-1] < a.shape[-3]]
    grads_s = [g for a, g in maps if a.shape[-1] >= a.shape[-3]]
    abars_s = [(g * r).clamp(min=0).mean(dim=1)
               for g, r in zip(grads_s, rel_s_ref)]
    abars_t = [(g * r).clamp(min=0).mean(dim=1)
               for g, r in zip(grads_t, rel_t_ref)]
    r_s = _rollout_t(abars_s)
    cam_s_ref = r_s[:, 1:, 0, 1:]
    r_t = _rollout_t(abars_t)
    cam_t_ref = r_t[:, 1:, 0, 1:].transpose(1, 2)

    vp = dsttr_from_torch(dsttr.state_dict(), depth=DEPTH_L)
    cfg = ISTVTConfig(depth=DEPTH_L)
    feats_j = jnp.asarray(feats.transpose(0, 1, 3, 4, 2))
    with precision.highest():
        cam_s, cam_t = generate_full_lrp(
            {"vit": vp, "xcep": {}}, {"xcep": {}}, feats_j, cfg, index=0,
            from_features=True)
    assert cam_s.shape == (1, 6, 361)
    np.testing.assert_allclose(np.asarray(cam_s), cam_s_ref.numpy(),
                               atol=5e-4, rtol=5e-3)
    np.testing.assert_allclose(np.asarray(cam_t), cam_t_ref.numpy(),
                               atol=5e-4, rtol=5e-3)


def _unfreeze(m):
    for p in m.parameters():
        p.requires_grad_(True)
    return m


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
