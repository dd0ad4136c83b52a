"""Full ε-rule LRP for ISTVT — per-module relevance propagation.

`interpret/lrp.py` implements the gradient-weighted attention ROLLOUT
(grad ⊙ A). This module implements relevance propagation PROPER: starting
from a one-hot relevance at the target logit, relevance is propagated
backward through every module of the DSTTr with conservation rules
(behavioral spec SURVEY.md §2.7.2: "relevance is propagated … through
LayerNorm/Linear/softmax-attention with conservation rules"; reference
call site visualize_rel.py:257-259, method="transformer_attribution" via
the external `tfe` engine, which follows Chefer et al. CVPR 2021).

Rules (Chefer's generic relprop, = ε-rule on linear modules):

  generic z-rule   R_x = x ⊙ ∂f/∂x^T [ R / (f(x) + ε·sign) ]
    - for Linear/LayerNorm-affine this IS the ε-rule
      R_j = Σ_k x_j w_jk R_k / (z_k + ε);
    - for residual adds it splits R proportionally to each summand's
      contribution;
    - for GELU/softmax it is the gradient-weighted (Deep-Taylor) rule.
  bilinear split   for z = A·V (and q·kᵀ), the raw rule assigns total
    relevance to EACH operand; both sides are halved so
    Σ R_A + Σ R_V = Σ R_out (Chefer's matmul relprop).

The per-layer relevance of each post-softmax attention map, R_A, is the
quantity the tfe engine combines with the map's gradient:

  cam_l = E_h[(∇A ⊙ R_A)+],  rollout  R = N(cam_L + I)···N(cam_1 + I)

which differs from interpret/lrp.py exactly by using R_A (propagated
relevance) in place of A itself. Exposed as method='full_lrp' from
cli/visualize.py next to the rollout methods.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from istvt_tpu.core.config import ISTVTConfig
from istvt_tpu.models import istvt, xception
from istvt_tpu.nn.attention import self_subtract
from istvt_tpu.nn.layers import gelu, linear

_EPS = 1e-9


def _safe_div(r, z):
    return r / (z + _EPS * jnp.where(z >= 0, 1.0, -1.0))


def _ln_detached(p, x, eps: float = 1e-5):
    """LayerNorm with μ/σ DETACHED (stop_gradient): forward-identical to
    nn.layers.layernorm, but under the z-rule it relprops as the affine
    map x ↦ (x-μ)·γ/σ̂ + β. Full LayerNorm is 0-homogeneous (shift- and
    scale-invariant), so Euler's theorem gives x·∂LN/∂x ≡ 0 — the raw
    generic rule annihilates ALL relevance at every LN. Detaching the
    statistics is the standard LRP treatment (Ali et al. 2022, "XAI for
    Transformers"): the map becomes linear in x and the ε-rule conserves."""
    mu = jax.lax.stop_gradient(jnp.mean(x, axis=-1, keepdims=True))
    var = jax.lax.stop_gradient(
        jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True))
    inv = jax.lax.rsqrt(var + eps)
    return (x - mu) * inv * p["scale"] + p["bias"]


def zrule(f, inputs: Tuple, r_out, split: bool = False):
    """Generic relprop: R_i = x_i ⊙ vjp_f(R / (f(x)+ε))_i.

    split=True halves each operand's relevance (bilinear ops, where the
    raw rule hands the FULL output relevance to every operand)."""
    z, vjp = jax.vjp(f, *inputs)
    s = _safe_div(r_out, z)
    cs = vjp(s)
    scale = 0.5 if split else 1.0
    rs = tuple(x * c * scale for x, c in zip(inputs, cs))
    return rs if len(rs) > 1 else rs[0]


# ---------------------------------------------------------------------------
# Instrumented forward (eval mode, unfused math) + relprop walk.
# Mirrors models/istvt.dsttr_apply's unfused path (vivit.py:132-148 law
# x = attn_s(attn_t(LN·)) + x; x = ff(LN·) + x) with every intermediate
# kept for the backward relevance walk.


def _attention_forward(p, hn, heads, s, temporal: bool):
    """One decomposed attention branch on the normalized stream hn.
    Returns (out, saved) with every relprop intermediate."""
    b, n, d = hn.shape
    t1 = n // s
    if temporal:
        qk = linear({"w": p["to_qk"]["w"]}, hn)
        v = linear({"w": p["to_v"]["w"]}, hn)
        inner = v.shape[-1]
        qk_sub = self_subtract(qk.reshape(b, t1, s, 2 * inner))
        qk_sub = qk_sub.reshape(b, n, 2 * inner)
        q, k = jnp.split(qk_sub, 2, axis=-1)
        q = q.reshape(b, t1, s, heads, -1)
        k = k.reshape(b, t1, s, heads, -1)
        v4 = v.reshape(b, t1, s, heads, -1)
        scale = q.shape[-1] ** -0.5
        dots = jnp.einsum("bishd,bjshd->bshij", q, k,
                          preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(dots, axis=-1)
        ctx = jnp.einsum("bshij,bjshd->bishd", attn, v4,
                         preferred_element_type=jnp.float32)
    else:
        qkv = linear({"w": p["to_qkv"]["w"]}, hn)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        inner = v.shape[-1]
        q = q.reshape(b, t1, s, heads, -1)
        k = k.reshape(b, t1, s, heads, -1)
        v4 = v.reshape(b, t1, s, heads, -1)
        scale = q.shape[-1] ** -0.5
        dots = jnp.einsum("btihd,btjhd->bthij", q, k,
                          preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(dots, axis=-1)
        ctx = jnp.einsum("bthij,btjhd->btihd", attn, v4,
                         preferred_element_type=jnp.float32)
    merged = ctx.reshape(b, n, inner)
    out = linear(p["to_out"], merged)
    saved = {"hn": hn, "q": q, "k": k, "v4": v4, "dots": dots,
             "attn": attn, "ctx": ctx, "merged": merged}
    return out, saved


def _attention_relprop(p, saved, r_out, heads, s, temporal: bool):
    """Relevance through one attention branch. Returns (R_hn, R_A)."""
    b = saved["hn"].shape[0]
    n = saved["hn"].shape[1]
    t1 = n // s
    inner = saved["merged"].shape[-1]
    # out = merged @ W_out + b  (ε-rule)
    r_merged = zrule(lambda m: linear(p["to_out"], m),
                     (saved["merged"],), r_out)
    r_ctx = r_merged.reshape(saved["ctx"].shape)
    # ctx = attn · v  (bilinear split)
    if temporal:
        pv = lambda a, vv: jnp.einsum("bshij,bjshd->bishd", a, vv,
                                      preferred_element_type=jnp.float32)
    else:
        pv = lambda a, vv: jnp.einsum("bthij,btjhd->btihd", a, vv,
                                      preferred_element_type=jnp.float32)
    r_attn, r_v4 = zrule(pv, (saved["attn"], saved["v4"]), r_ctx,
                         split=True)
    r_a = r_attn  # relevance AT the post-softmax map (per head)
    # softmax (gradient rule)
    r_dots = zrule(lambda dd: jax.nn.softmax(dd, axis=-1),
                   (saved["dots"],), r_attn)
    # dots = q·kᵀ · scale  (bilinear split; scale is a constant factor)
    scale = saved["q"].shape[-1] ** -0.5
    if temporal:
        qk_f = lambda qq, kk: jnp.einsum(
            "bishd,bjshd->bshij", qq, kk,
            preferred_element_type=jnp.float32) * scale
    else:
        qk_f = lambda qq, kk: jnp.einsum(
            "btihd,btjhd->bthij", qq, kk,
            preferred_element_type=jnp.float32) * scale
    r_q, r_k = zrule(qk_f, (saved["q"], saved["k"]), r_dots, split=True)

    hn = saved["hn"]
    if temporal:
        # back through self-subtract + the separate qk / v projections
        def qk_path(h):
            qk = linear({"w": p["to_qk"]["w"]}, h)
            qs = self_subtract(qk.reshape(b, t1, s, -1)).reshape(b, n, -1)
            q, k = jnp.split(qs, 2, axis=-1)
            return (q.reshape(b, t1, s, heads, -1),
                    k.reshape(b, t1, s, heads, -1))

        def v_path(h):
            return linear({"w": p["to_v"]["w"]}, h) \
                .reshape(b, t1, s, heads, -1)

        z_qk, vjp_qk = jax.vjp(qk_path, hn)
        s_qk = (_safe_div(r_q, z_qk[0]), _safe_div(r_k, z_qk[1]))
        (c_qk,) = vjp_qk(s_qk)
        z_v, vjp_v = jax.vjp(v_path, hn)
        (c_v,) = vjp_v(_safe_div(r_v4, z_v))
        r_hn = hn * (c_qk + c_v)
    else:
        def qkv_path(h):
            qkv = linear({"w": p["to_qkv"]["w"]}, h)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            return (q.reshape(b, t1, s, heads, -1),
                    k.reshape(b, t1, s, heads, -1),
                    v.reshape(b, t1, s, heads, -1))

        z, vjp = jax.vjp(qkv_path, hn)
        (c,) = vjp((_safe_div(r_q, z[0]), _safe_div(r_k, z[1]),
                    _safe_div(r_v4, z[2])))
        r_hn = hn * c
    return r_hn, r_a


def dsttr_full_lrp(p, feats, cfg: ISTVTConfig, index: int = 0):
    """Instrumented DSTTr forward + ε-rule relevance walk.

    feats: (B, T, H, W, C). Returns (rel_attns {'t': [...], 's': [...]}
    per-layer relevance of each post-softmax map in the public
    (B, H, S, T+1, T+1) / (B, H, T+1, S, S) orders, logits, and the
    per-stage relevance sums for conservation checks)."""
    b, t, hh, ww, d = feats.shape
    n1 = hh * ww
    s = n1 + 1
    heads = cfg.heads
    x = feats.reshape(b, t, n1, d)
    cls_space = jnp.broadcast_to(p["space_token"].astype(x.dtype),
                                 (b, t, 1, d))
    x = jnp.concatenate([cls_space, x], axis=2)
    x = x + p["pos_embedding"][:, :t, :s].astype(x.dtype)
    cls_temporal = jnp.broadcast_to(
        p["temporal_token"].astype(x.dtype)[:, :, None, :], (b, 1, s, d))
    x = jnp.concatenate([cls_temporal, x], axis=1).reshape(b, (t + 1) * s, d)

    # ---- forward, saving per-layer intermediates
    layers_saved = []
    for layer in p["layers"]:
        hn_t = _ln_detached(layer["attn_t"]["norm"], x)
        out_t, sv_t = _attention_forward(layer["attn_t"], hn_t, heads, s,
                                         temporal=True)
        hn_s = _ln_detached(layer["attn_s"]["norm"], out_t)
        out_s, sv_s = _attention_forward(layer["attn_s"], hn_s, heads, s,
                                         temporal=False)
        x_attn = out_s + x
        hn_f = _ln_detached(layer["ff"]["norm"], x_attn)
        h1 = linear(layer["ff"]["fc1"], hn_f)
        g1 = gelu(h1)
        f_out = linear(layer["ff"]["fc2"], g1)
        x_new = f_out + x_attn
        layers_saved.append({
            "x_in": x, "hn_t": hn_t, "out_t": out_t, "sv_t": sv_t,
            "hn_s": hn_s, "out_s": out_s, "sv_s": sv_s,
            "x_attn": x_attn, "hn_f": hn_f, "h1": h1, "g1": g1,
            "f_out": f_out,
        })
        x = x_new

    x_fin = _ln_detached(p["norm"], x)
    grid = x_fin.reshape(b, t + 1, s, d)
    cls = grid[:, 0, 0]
    head_n = _ln_detached(p["mlp_head"]["norm"], cls)
    logits = linear(p["mlp_head"]["fc"], head_n)

    # ---- relevance walk
    r_logit = jnp.zeros_like(logits).at[:, index].set(1.0)
    r = zrule(lambda h: linear(p["mlp_head"]["fc"], h), (head_n,), r_logit)
    r = zrule(lambda c: _ln_detached(p["mlp_head"]["norm"], c), (cls,), r)
    # scatter the CLS relevance back into the token grid
    r = zrule(lambda g: g[:, 0, 0], (grid,), r)
    r = r.reshape(b, (t + 1) * s, d)
    r = zrule(lambda u: _ln_detached(p["norm"], u), (x,), r)

    rel_attns: Dict[str, List] = {"t": [], "s": []}
    sums = [jnp.sum(r)]
    for layer, sv in zip(reversed(p["layers"]), reversed(layers_saved)):
        # x_new = f_out + x_attn
        r_f, r_xa = zrule(lambda a, c: a + c, (sv["f_out"], sv["x_attn"]),
                          r)
        # FF chain fc2∘gelu∘fc1∘LN (ε-rule / gradient rules)
        r_g1 = zrule(lambda u: linear(layer["ff"]["fc2"], u), (sv["g1"],),
                     r_f)
        r_h1 = zrule(gelu, (sv["h1"],), r_g1)
        r_hnf = zrule(lambda u: linear(layer["ff"]["fc1"], u),
                      (sv["hn_f"],), r_h1)
        r_xa2 = zrule(lambda u: _ln_detached(layer["ff"]["norm"], u),
                      (sv["x_attn"],), r_hnf)
        r_xa = r_xa + r_xa2
        # x_attn = out_s + x_in
        r_outs, r_xin = zrule(lambda a, c: a + c,
                              (sv["out_s"], sv["x_in"]), r_xa)
        # spatial attention
        r_hns, r_as = _attention_relprop(layer["attn_s"], sv["sv_s"],
                                         r_outs, heads, s, temporal=False)
        rel_attns["s"].append(jnp.transpose(r_as, (0, 2, 1, 3, 4)))
        r_outt = zrule(lambda u: _ln_detached(layer["attn_s"]["norm"], u),
                       (sv["out_t"],), r_hns)
        # temporal attention
        r_hnt, r_at = _attention_relprop(layer["attn_t"], sv["sv_t"],
                                         r_outt, heads, s, temporal=True)
        rel_attns["t"].append(jnp.transpose(r_at, (0, 2, 1, 3, 4)))
        r_xin2 = zrule(lambda u: _ln_detached(layer["attn_t"]["norm"], u),
                       (sv["x_in"],), r_hnt)
        r = r_xin + r_xin2
        sums.append(jnp.sum(r))

    rel_attns["t"].reverse()
    rel_attns["s"].reverse()
    return rel_attns, logits, jnp.stack(sums)


def _feature_attn_grads(vit_params, feats, cfg: ISTVTConfig, index: int):
    """dlogit/dA for every layer, from the feature grid (no stem) — the
    attn_bias trick of interpret/lrp.attention_maps_and_grads applied to
    dsttr_apply directly."""
    b, t = feats.shape[0], feats.shape[1]
    s = cfg.tokens_per_frame
    h = cfg.heads
    zero_bias = {
        "t": [jnp.zeros((b, h, s, t + 1, t + 1), jnp.float32)
              for _ in range(cfg.depth)],
        "s": [jnp.zeros((b, h, t + 1, s, s), jnp.float32)
              for _ in range(cfg.depth)],
    }

    def f(bias):
        logits, _ = istvt.dsttr_apply(vit_params, feats, cfg, train=False,
                                      attn_bias=bias, return_attn=True)
        return jnp.sum(logits[:, index])

    return jax.grad(f)(zero_bias)


@partial(jax.jit, static_argnames=("cfg", "index", "from_features"))
def generate_full_lrp(params, state, clips,
                      cfg: ISTVTConfig = ISTVTConfig(), index: int = 0,
                      from_features: bool = False
                      ) -> Tuple[jax.Array, jax.Array]:
    """Full ε-rule LRP cams: -> (cam_s (B,T,hw), cam_t (B,T,hw)).

    Propagates a one-hot relevance from logit `index` backward through
    every DSTTr module (ε-rule Linear/LayerNorm, bilinear attention
    splits), combines each layer's attention-map RELEVANCE with its
    gradient per the tfe engine's transformer_attribution
    (cam = E_h[(∇A ⊙ R_A)+]) and rolls out exactly like
    interpret/lrp.generate_lrp.

    from_features=True treats `clips` as the (B, T, h, w, C) Xception
    feature grid (stem skipped) — used by the DSTTr-level golden tests."""
    from istvt_tpu.interpret.lrp import _rollout, attention_maps_and_grads

    if from_features:
        feats = clips
        grads = _feature_attn_grads(params["vit"], feats, cfg, index)
    else:
        b, t = clips.shape[0], clips.shape[1]
        x = clips.reshape(b * t, *clips.shape[2:])
        feats, _ = xception.low_level_features(params["xcep"],
                                               state["xcep"], x, False)
        fh = feats.shape[1]
        feats = feats.reshape(b, t, fh, fh, feats.shape[-1])
        _, grads, _ = attention_maps_and_grads(params, state, clips, cfg,
                                               index)

    rel_attns, _, _ = dsttr_full_lrp(params["vit"], feats, cfg, index)
    abars_s = [jnp.mean(jnp.maximum(g * r, 0.0), axis=1)
               for g, r in zip(grads["s"], rel_attns["s"])]
    abars_t = [jnp.mean(jnp.maximum(g * r, 0.0), axis=1)
               for g, r in zip(grads["t"], rel_attns["t"])]
    r_s = _rollout(abars_s)
    cam_s = r_s[:, 1:, 0, 1:]
    r_t = _rollout(abars_t)
    cam_t = jnp.transpose(r_t[:, 1:, 0, 1:], (0, 2, 1))
    return cam_s, cam_t
