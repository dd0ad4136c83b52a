"""Relevance attribution for ISTVT — JAX reimplementation of the external
`tfe` LRP engine (Chefer-style transformer attribution; behavioral spec
SURVEY.md §2.7: `LRP(model).generate_LRP(input, method=
"transformer_attribution", index) -> (cam_s, cam_t)`, call sites reference
visualize_rel.py:206,257-259).

Mechanism. The PyTorch engine hooks every attention to store the
post-softmax map A and its gradient dlogit/dA, then rolls relevance out
across layers:  R <- R + mean_h[(grad ⊙ A)+] · R  starting from identity
(Chefer et al., "Transformer Interpretability Beyond Attention
Visualization", CVPR 2021). Here the gradients come from a zero-valued
`attn_bias` perturbation built into the model (istvt_tpu/models/istvt.py):
d logit / d bias == d logit / d A, with no hooks and one jittable program.

ISTVT's decomposition yields TWO rollouts (matching the reference's
outputs, visualize_rel.py:258-259,261,279):
  * spatial  — per frame t: S×S maps (S = hw+1 tokens) across 12 layers;
               cam_s[b, t] = final R's spatial-CLS row over patch tokens
               -> (B, T, hw) per-frame spatial saliency;
  * temporal — per location s: (T+1)×(T+1) maps; cam_t[b, :, s] = final
               R's temporal-CLS row over frame rows
               -> (B, T, hw) per-frame temporal saliency.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from istvt_tpu.core.config import ISTVTConfig
from istvt_tpu.models import istvt


def _head_agg(attn, grad):
    """Ā = E_h[(grad ⊙ A)+] (Chefer rule 6)."""
    cam = grad * attn
    return jnp.mean(jnp.maximum(cam, 0.0), axis=1)  # mean over heads


def _rollout(abars):
    """Chefer rollout: R = N(Ā_L + I)···N(Ā_1 + I) where N row-normalizes
    (compute_rollout_attention in the tfe engine — residual connections
    enter as the identity term and every layer matrix is re-stochasticized
    so relevance is conserved across the product). abars: (..., N, N)."""
    n = abars[0].shape[-1]
    eye = jnp.eye(n, dtype=abars[0].dtype)
    r = None
    for a in abars:
        m = a + eye
        m = m / jnp.sum(m, axis=-1, keepdims=True)
        r = m if r is None else jnp.einsum("...ij,...jk->...ik", m, r)
    return r


def attention_maps_and_grads(params, state, clips, cfg: ISTVTConfig,
                             index: int = 0):
    """Forward + backward in one program: returns (attns, grads, logits)
    where attns/grads are {'t': [L x (B,H,S,T+1,T+1)],
    's': [L x (B,H,T+1,S,S)]}."""
    b, t = clips.shape[0], clips.shape[1]
    s = cfg.tokens_per_frame
    h = cfg.heads
    zero_bias = {
        "t": [jnp.zeros((b, h, s, t + 1, t + 1), jnp.float32)
              for _ in range(cfg.depth)],
        "s": [jnp.zeros((b, h, t + 1, s, s), jnp.float32)
              for _ in range(cfg.depth)],
    }

    def f(bias):
        (logits, attns), _ = istvt.apply(
            params, state, clips, cfg, train=False,
            attn_bias=bias, return_attn=True)
        return jnp.sum(logits[:, index]), (attns, logits)

    grads, (attns, logits) = jax.grad(f, has_aux=True)(zero_bias)
    return attns, grads, logits


@partial(jax.jit, static_argnames=("cfg", "index", "method"))
def generate_lrp(params, state, clips, cfg: ISTVTConfig = ISTVTConfig(),
                 index: int = 0, method: str = "transformer_attribution"
                 ) -> Tuple[jax.Array, jax.Array]:
    """-> (cam_s (B,T,hw), cam_t (B,T,hw)), hw = feat_hw².

    method:
      'transformer_attribution' — gradient-weighted rollout (default, the
        reference's method string, visualize_rel.py:257);
      'rollout' — plain attention rollout (no gradients);
      'last_layer' — final layer's CLS attention only.

    Interpretation caveats (measured on tiny models, r4):
      * gradient-weighted maps keep only POSITIVE evidence for logit
        `index` (Chefer rule 6) — a clip the model scores as real yields
        near-zero fake-relevance and the rollout degenerates to the
        identity (cam ~ 0). Check the logit sign before reading a map.
      * cam_s needs depth >= 2 to attribute real frames: the head reads
        x[:, 0, 0] and each layer runs temporal->spatial attention, so at
        depth=1 the spatial maps of frame rows 1..T cannot influence the
        logit (their grads are exactly zero by architecture).
    """
    attns, grads, _ = attention_maps_and_grads(params, state, clips, cfg,
                                               index)
    t1 = attns["t"][0].shape[-1]          # T+1
    s = attns["s"][0].shape[-1]           # hw+1

    if method == "rollout":
        abars_s = [jnp.mean(a, axis=1) for a in attns["s"]]
        abars_t = [jnp.mean(a, axis=1) for a in attns["t"]]
    elif method == "last_layer":
        abars_s = [_head_agg(attns["s"][-1], grads["s"][-1])]
        abars_t = [_head_agg(attns["t"][-1], grads["t"][-1])]
    else:  # transformer_attribution
        abars_s = [_head_agg(a, g) for a, g in zip(attns["s"], grads["s"])]
        abars_t = [_head_agg(a, g) for a, g in zip(attns["t"], grads["t"])]

    # spatial rollout per frame row: (B, T+1, S, S)
    r_s = _rollout(abars_s)
    # relevance of patches from the spatial CLS of real frames 1..T
    cam_s = r_s[:, 1:, 0, 1:]                                 # (B, T, hw)

    # temporal rollout per spatial location: (B, S, T+1, T+1)
    r_t = _rollout(abars_t)
    # relevance of real frames from the temporal-CLS row at patch locations
    cam_t = r_t[:, 1:, 0, 1:]                                 # (B, hw, T)
    cam_t = jnp.transpose(cam_t, (0, 2, 1))                   # (B, T, hw)
    return cam_s, cam_t


def generate_feature_relevance(params, state, clips,
                               cfg: ISTVTConfig = ISTVTConfig(),
                               index: int = 0):
    """Input-feature relevance via gradient×input on the Xception feature
    grid — the analog of the reference's raw feature-map dumps
    (visualize_feat_map.py:228-236) with relevance weighting."""
    b, t, hh, ww, c = clips.shape

    def f(clips):
        logits, _ = istvt.apply(params, state, clips, cfg, train=False)
        return jnp.sum(logits[:, index])

    g = jax.grad(f)(clips)
    return jnp.sum(jnp.abs(g * clips), axis=-1)   # (B, T, H, W)
