"""ISTVT — Interpretable Spatial-Temporal Video Transformer.

TPU-native re-implementation of the reference's flagship model
(XceptionVidTr, reference network/vivit/vivit.py:193-208):

  clips (B, T, 300, 300, 3)
    -> Xception low_level_features per frame -> (B, T, 19, 19, 728)
    -> DSTTr (decomposed spatial-temporal transformer, vivit.py:103-148):
         tokens = channels at each spatial position (no patch projection),
         per-frame spatial CLS prepended, learned pos-embedding added,
         a temporal-CLS *frame* concatenated -> grid (T+1) x 362,
         12 x [x = attn_s(attn_t(x)) + x; x = ff(x) + x]   (vivit.py:97-100)
         with attn_t = self-subtract TemporalResidualAttention and
         attn_s = per-frame SpatialOnlyAttention (module.py:66-93,174-208)
    -> classification from x[:, 0, 0] (temporal-CLS ∩ spatial-CLS row)
    -> LayerNorm + Linear head -> 1 logit.

Interpretability hooks: `apply(..., return_attn=True)` returns every
layer's post-softmax attention maps, and `attn_bias` lets callers inject
zero-valued perturbations whose gradients are d logit / d attention —
the inputs to the LRP-style relevance rollout (istvt_tpu/interpret/lrp.py),
replacing the reference's external `tfe` hook machinery (SURVEY.md §2.7).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from istvt_tpu.core.config import ISTVTConfig
from istvt_tpu.models import xception
from istvt_tpu.nn import attention as A
from istvt_tpu.nn.layers import (
    dropout,
    gelu,
    layernorm,
    layernorm_init,
    linear,
    linear_init,
)


# ---------------------------------------------------------------------------
# DSTTr


def dsttr_init(key, cfg: ISTVTConfig):
    """Parameters for the decomposed ST transformer (vivit.py:103-130)."""
    d, inner = cfg.dim, cfg.inner_dim
    n1 = cfg.tokens_per_frame
    keys = jax.random.split(key, cfg.depth + 5)
    p: Dict[str, Any] = {
        # torch.randn inits (vivit.py:119-121)
        "pos_embedding": jax.random.normal(keys[0], (1, cfg.num_frames, n1, d)),
        "space_token": jax.random.normal(keys[1], (1, 1, d)),
        "temporal_token": jax.random.normal(keys[2], (1, 1, d)),
        "layers": [],
    }
    for i in range(cfg.depth):
        lk = jax.random.split(keys[3 + i], 8)
        layer = {
            "attn_t": {
                "norm": layernorm_init(d),
                "to_qk": linear_init(lk[0], d, inner * 2, bias=False),
                "to_v": linear_init(lk[1], d, inner, bias=False),
                "to_out": linear_init(lk[2], inner, d),
            },
            "attn_s": {
                "norm": layernorm_init(d),
                "to_qkv": linear_init(lk[3], d, inner * 3, bias=False),
                "to_out": linear_init(lk[4], inner, d),
            },
            "ff": {
                "norm": layernorm_init(d),
                "fc1": linear_init(lk[5], d, d * cfg.mlp_ratio),
                "fc2": linear_init(lk[6], d * cfg.mlp_ratio, d),
            },
        }
        p["layers"].append(layer)
    p["norm"] = layernorm_init(d)
    p["mlp_head"] = {"norm": layernorm_init(d),
                     "fc": linear_init(keys[-1], d, cfg.num_classes)}
    return p


def quantize_params(params):
    """Attach int8 serving weights to a trained ISTVT params tree.

    For every ST layer, the projection/FF GEMM weights (where ~90% of the
    model's FLOPs are) get per-output-channel int8 copies under a 'q8'
    key (kernels/quant.py scheme); LN/softmax/stem/head stay float. Run
    once at load time; apply with ISTVTConfig(use_pallas=True,
    quantize='int8'). The float weights remain in the tree (the q8 path
    never reads them, but attention biases / norms do).
    """
    from istvt_tpu.kernels.quant import quantize_weight

    p = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    for layer in p["vit"]["layers"] if "vit" in p else p["layers"]:
        at, asp, ff = layer["attn_t"], layer["attn_s"], layer["ff"]
        w_packed = jnp.concatenate([at["to_qk"]["w"], at["to_v"]["w"]],
                                   axis=1)
        qw, qs = quantize_weight(w_packed)
        ow, os_ = quantize_weight(at["to_out"]["w"])
        at["q8"] = {"qkv_wq": qw, "qkv_ws": qs, "out_wq": ow, "out_ws": os_}
        qw, qs = quantize_weight(asp["to_qkv"]["w"])
        ow, os_ = quantize_weight(asp["to_out"]["w"])
        asp["q8"] = {"qkv_wq": qw, "qkv_ws": qs, "out_wq": ow,
                     "out_ws": os_}
        w1, s1 = quantize_weight(ff["fc1"]["w"])
        w2, s2 = quantize_weight(ff["fc2"]["w"])
        ff["q8"] = {"w1q": w1, "w1s": s1, "w2q": w2, "w2s": s2}
    return p


def _tp_pack_layer(layer, mp: int):
    """Trace-time re-pack of one ST layer for MANUAL tensor parallelism
    inside the pipeline shard_map (TP×PP composition — parallel/pp.py).

    The packed-qkv column order is [q|k|v] with heads head-major inside
    each block (nn/attention.temporal_block_fused layout); a contiguous
    1/mp chunk of that axis would mix whole q/k/v blocks, not heads. So
    permute columns to (mp, 3, heads/mp, dh)-major: contiguous chunk r
    is then exactly rank r's local packed [q|k|v] layout for heads//mp
    heads, and shard_map's P(None, 'model') in_spec hands every rank a
    kernel-ready slice. to_out/fc2 rows and fc1 columns are already
    contiguous-chunkable. Pure reshapes/transposes — exact, and XLA
    folds them into the (one-time-per-step) weight layout pass.
    """
    def permute(w):
        di, i3 = w.shape
        i = i3 // 3
        return (w.reshape(di, 3, mp, i // mp)
                 .transpose(0, 2, 1, 3).reshape(di, i3))

    at, asp, ff = layer["attn_t"], layer["attn_s"], layer["ff"]
    w3 = jnp.concatenate([at["to_qk"]["w"], at["to_v"]["w"]], axis=1)
    return {
        "t": {"norm": at["norm"], "qkv_w": permute(w3),
              "out_w": at["to_out"]["w"], "out_b": at["to_out"]["b"]},
        "s": {"norm": asp["norm"], "qkv_w": permute(asp["to_qkv"]["w"]),
              "out_w": asp["to_out"]["w"], "out_b": asp["to_out"]["b"]},
        "ff": {"norm": ff["norm"], "fc1": ff["fc1"], "fc2": ff["fc2"]},
    }


def _tp_pack_specs():
    """PartitionSpecs (model axis only; parallel/pp.py adds the stacked
    pipe axis) for a `_tp_pack_layer` tree: Megatron column/row rules
    matching parallel/sharding.py."""
    from jax.sharding import PartitionSpec as P

    from istvt_tpu.core.mesh import MODEL_AXIS as M
    norm = {"scale": P(), "bias": P()}
    attn = lambda: {"norm": norm, "qkv_w": P(None, M),
                    "out_w": P(M, None), "out_b": P()}
    return {
        "t": attn(),
        "s": attn(),
        "ff": {"norm": norm, "fc1": {"w": P(None, M), "b": P(M)},
               "fc2": {"w": P(M, None), "b": P()}},
    }


def _feed_forward(p, x, cfg: ISTVTConfig, train: bool, rng):
    """GELU MLP dim -> 4*dim -> dim (reference module.py:23-34)."""
    from istvt_tpu.parallel import tp as _tp
    if cfg.use_pallas and (not train or cfg.dropout == 0.0) \
            and not _tp.active():
        # fused fc1+gelu+fc2 kernel (hidden tile never touches HBM);
        # only valid when no dropout splits the two matmuls and fc1/fc2
        # are unsharded (under TP the XLA path partitions the GEMMs)
        from istvt_tpu.kernels.mlp import fused_ff
        return fused_ff(x, p["fc1"]["w"], p["fc1"]["b"],
                        p["fc2"]["w"], p["fc2"]["b"])
    k1 = k2 = None
    if rng is not None:
        k1, k2 = jax.random.split(rng)
    h = linear(p["fc1"], x)
    h = gelu(h)
    h = dropout(k1, h, cfg.dropout, train)
    h = linear(p["fc2"], h)
    h = dropout(k2, h, cfg.dropout, train)
    return h


def dsttr_apply(
    p,
    feats: jax.Array,
    cfg: ISTVTConfig,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    attn_bias: Optional[Dict[str, List[jax.Array]]] = None,
    return_attn: bool = False,
):
    """feats: (B, T, H, W, C) per-frame feature maps -> (B, num_classes).

    Follows reference vivit.py:132-148 exactly; see module docstring.
    """
    b, t, hh, ww, d = feats.shape
    n = hh * ww
    s = n + 1
    x = feats.reshape(b, t, n, d)  # 'b t h w c -> b t (h w) c'

    cls_space = jnp.broadcast_to(p["space_token"].astype(x.dtype), (b, t, 1, d))
    x = jnp.concatenate([cls_space, x], axis=2)              # (b, t, s, d)
    # reference slices only the token axis (vivit.py:138); we also slice t so
    # shorter clips than the configured num_frames degrade gracefully
    x = x + p["pos_embedding"][:, :t, :s].astype(x.dtype)
    cls_temporal = jnp.broadcast_to(
        p["temporal_token"].astype(x.dtype)[:, :, None, :], (b, 1, s, d))
    x = jnp.concatenate([cls_temporal, x], axis=1)            # (b, t+1, s, d)

    attns: Dict[str, List[jax.Array]] = {"t": [], "s": []}
    # Attention maps are only materialized when the caller needs them
    # (LRP rollout / attn_bias grads) — the hot path skips them.
    need_attn = return_attn or attn_bias is not None

    # Fused-kernel path: pad the token axis to a sublane multiple (8) so
    # every (B, N, ·) <-> (B, T+1, S, ·) reshape at a kernel boundary is
    # tile-aligned and FREE (S=362 splits cost ~16 ms/batch in retiling
    # copies otherwise). Pad tokens are masked out of spatial-attention
    # keys (kernels/attention.py n_valid) and isolated everywhere else
    # (LN/FF per-token, temporal attention per-location) — bit-exact
    # w.r.t. the unpadded computation on the real tokens.
    # Under tensor parallelism (parallel/tp.scope active at trace time)
    # the fully-fused LN+GEMM blocks are skipped — their VMEM-resident
    # weights are model-sharded, which only the attention cores support
    # (shard_map over heads, parallel/tp.py); the projection GEMMs take
    # the XLA einsum path, which the SPMD partitioner shards natively.
    from istvt_tpu.parallel import tp as _tp
    fused_blocks = cfg.use_pallas and not need_attn and not _tp.active()
    # int8 serving path: W8A8 projection GEMMs (quantize_params must have
    # attached 'q8' weights); train/bias/attn-map paths stay float
    use_q8 = (fused_blocks and not train and cfg.quantize == "int8"
              and "q8" in p["layers"][0]["attn_t"])
    if cfg.quantize == "int8" and not train and not use_q8:
        # loud, not silent: a config that CLAIMS int8 serving but runs
        # float (missing quantize_params, or a path — TP / attn-maps /
        # pallas-off — that can't take the q8 kernels) would otherwise
        # mislabel every benchmark and serving deployment
        import warnings
        why = ("params lack the 'q8' subtree (run quantize_params)"
               if fused_blocks else
               "the fused-kernel path is off (use_pallas/TP/attn-map)")
        warnings.warn(f"cfg.quantize='int8' but running FLOAT: {why}",
                      stacklevel=2)
    s_valid = s
    if fused_blocks and s % 8 != 0:
        pad = (-s) % 8
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        s = s + pad
    x = x.reshape(b, (t + 1) * s, d)

    def run_layer(x, layer, bias_t, bias_s, frng):
        # x = attn_s(attn_t(x)) + x, both PreNorm (vivit.py:98-99)
        if use_q8 and cfg.q8_ff == "full":
            # Default int8 chain with the layer-BOUNDARY fusions
            # (kernels/quant.py r3): the temporal out-projection feeds
            # the spatial LN+QKV GEMM and the spatial out-projection
            # (+residual) feeds the FF block inside ONE kernel each, so
            # neither (N, 728) intermediate touches HBM (~3.6 ms/batch
            # of traffic at B=16). Quantization points identical to the
            # unfused chain.
            from istvt_tpu.kernels.attention import (
                spatial_attention_packed, temporal_attention_packed)
            from istvt_tpu.kernels.quant import (
                ln_matmul_q8, ln_qkv_q8_temporal_attention,
                matmul_q8_ln_matmul_q8, matmul_q8_res_ln_ff_q8_full,
                mm_q8_ln_qkv_q8_spatial_attention)
            at, asp, pf = layer["attn_t"], layer["attn_s"], layer["ff"]
            q_t, q_s, q_f = at["q8"], asp["q8"], pf["q8"]
            bq, nq = x.shape[0], x.shape[1]
            t1 = nq // s
            if cfg.q8_attn == "layer":
                # Stage-3 mega-kernel: the ENTIRE layer runs as one
                # Pallas program per batch element; only x enters/leaves
                # HBM (kernels/quant.st_layer_q8).
                from istvt_tpu.kernels.quant import st_layer_q8
                x = st_layer_q8(x.reshape(bq, t1, s, d), layer,
                                cfg.heads, s_valid)
                return x.reshape(bq, nq, d), None, None
            if cfg.q8_attn == "ingest":
                # Stage-2 fusion: the LN+QKV / out-proj+LN+QKV GEMMs run
                # INSIDE the attention kernels, so neither (N, 3I)
                # packed-qkv tensor ever touches HBM (~6 GB/batch gone
                # over 12 layers at B=16).
                inner = q_t["qkv_wq"].shape[1] // 3
                a_t = ln_qkv_q8_temporal_attention(
                    x.reshape(bq, t1, s, d), at["norm"]["scale"],
                    at["norm"]["bias"], q_t["qkv_wq"], q_t["qkv_ws"],
                    cfg.heads)
                a_s = mm_q8_ln_qkv_q8_spatial_attention(
                    a_t.reshape(bq * t1, s, inner), q_t["out_wq"],
                    q_t["out_ws"], at["to_out"]["b"],
                    asp["norm"]["scale"], asp["norm"]["bias"],
                    q_s["qkv_wq"], q_s["qkv_ws"], cfg.heads, s_valid)
            else:
                qkv_t = ln_matmul_q8(x, at["norm"]["scale"],
                                     at["norm"]["bias"],
                                     q_t["qkv_wq"], q_t["qkv_ws"])
                inner = qkv_t.shape[-1] // 3
                a_t = temporal_attention_packed(
                    qkv_t.reshape(bq, t1, s, 3 * inner), cfg.heads)
                qkv_s = matmul_q8_ln_matmul_q8(
                    a_t.reshape(bq, nq, inner), q_t["out_wq"],
                    q_t["out_ws"], at["to_out"]["b"],
                    asp["norm"]["scale"], asp["norm"]["bias"],
                    q_s["qkv_wq"], q_s["qkv_ws"])
                a_s = spatial_attention_packed(
                    qkv_s.reshape(bq * t1, s, 3 * inner), cfg.heads,
                    s_valid)
            x = matmul_q8_res_ln_ff_q8_full(
                a_s.reshape(bq, nq, inner), x, q_s["out_wq"],
                q_s["out_ws"], asp["to_out"]["b"], pf["norm"]["scale"],
                pf["norm"]["bias"], q_f["w1q"], q_f["w1s"],
                pf["fc1"]["b"], q_f["w2q"], q_f["w2s"], pf["fc2"]["b"])
            return x, None, None
        if use_q8:
            from istvt_tpu.kernels.mlp import ln_ff_residual
            out_t = A.temporal_block_q8(layer["attn_t"],
                                        layer["attn_t"]["q8"], x,
                                        cfg.heads, s)
            x = A.spatial_block_q8(layer["attn_s"], layer["attn_s"]["q8"],
                                   out_t, cfg.heads, s, residual=x,
                                   n_valid=s_valid)
            # FF variants kept for A/B and accuracy studies — interleaved
            # same-process A/B on the chip (r2): full 263.1 clips/s,
            # mixed (bf16 fc2) 248.0, bf16 FF 231.9. cfg.q8_ff is a
            # config field, not an env var, so it participates in jit
            # caching; the 'full' default takes the boundary-fused chain
            # above instead of this composition.
            pf = layer["ff"]
            ff_mode = cfg.q8_ff
            if ff_mode == "mixed":
                from istvt_tpu.kernels.quant import ln_ff_residual_q8
                q = pf["q8"]
                x = ln_ff_residual_q8(x, pf["norm"]["scale"],
                                      pf["norm"]["bias"], q["w1q"],
                                      q["w1s"], pf["fc1"]["b"],
                                      pf["fc2"]["w"], pf["fc2"]["b"])
                return x, None, None
            if ff_mode == "bf16":
                x = ln_ff_residual(x, pf["norm"]["scale"],
                                   pf["norm"]["bias"],
                                   pf["fc1"]["w"], pf["fc1"]["b"],
                                   pf["fc2"]["w"], pf["fc2"]["b"])
                return x, None, None
            from istvt_tpu.kernels.quant import ln_ff_residual_q8_full
            q = pf["q8"]
            x = ln_ff_residual_q8_full(
                x, pf["norm"]["scale"], pf["norm"]["bias"],
                q["w1q"], q["w1s"], pf["fc1"]["b"],
                q["w2q"], q["w2s"], pf["fc2"]["b"])
            return x, None, None
        if fused_blocks:
            # fully fused hot path: LN+QKV GEMMs, attention, out-GEMMs
            # and the residual adds all run as Pallas kernels; nothing
            # but x enters/leaves HBM per branch
            out_t = A.temporal_block_fused(layer["attn_t"], x,
                                           cfg.heads, s)
            x = A.spatial_block_fused(layer["attn_s"], out_t,
                                      cfg.heads, s, residual=x,
                                      n_valid=s_valid)
            if not train or cfg.dropout == 0.0:
                from istvt_tpu.kernels.mlp import ln_ff_residual
                pf = layer["ff"]
                x = ln_ff_residual(x, pf["norm"]["scale"],
                                   pf["norm"]["bias"],
                                   pf["fc1"]["w"], pf["fc1"]["b"],
                                   pf["fc2"]["w"], pf["fc2"]["b"])
                return x, None, None
            f = _feed_forward(layer["ff"],
                              layernorm(layer["ff"]["norm"], x), cfg,
                              train, frng)
            return f + x, None, None
        hn_t = layernorm(layer["attn_t"]["norm"], x)
        res_t = A.temporal_residual_attention(
            layer["attn_t"], hn_t, cfg.heads, s,
            return_attn=need_attn, attn_bias=bias_t,
            use_pallas=cfg.use_pallas)
        out_t, at = res_t if need_attn else (res_t, None)
        hn_s = layernorm(layer["attn_s"]["norm"], out_t)
        res_s = A.spatial_only_attention(
            layer["attn_s"], hn_s, cfg.heads, s,
            return_attn=need_attn, attn_bias=bias_s,
            use_pallas=cfg.use_pallas)
        out_s, asp = res_s if need_attn else (res_s, None)
        x = out_s + x
        f = _feed_forward(layer["ff"],
                          layernorm(layer["ff"]["norm"], x), cfg, train,
                          frng)
        return f + x, at, asp

    if cfg.remat and not need_attn:
        # recompute each layer in the backward pass instead of storing
        # its activations (SURVEY.md: jax.checkpoint/remat for memory)
        run_layer = jax.checkpoint(run_layer, static_argnums=())

    from istvt_tpu.parallel import pp as _pp
    if _pp.active() and not need_attn and (rng is None or cfg.dropout == 0.0):
        # GPipe pipeline over the identical ST layers (parallel/pp.py):
        # contiguous stages on the 'pipe' mesh axis, microbatches flowing
        # over ppermute. Attention-map/dropout paths fall through to the
        # sequential loop (still correct under the mesh — jit replicates
        # the layer compute over the pipe axis there).
        if _tp.active():
            # TP×PP composition: inside the pipe shard_map the SPMD
            # partitioner can't shard the GEMMs, so the layer body is
            # hand-written Megatron — column-parallel LN->QKV on this
            # rank's head shard, the packed attention core on heads//mp
            # local heads (exact: every head / (s,h) location attends
            # independently, reference module.py:80-87,174-208), then
            # row-parallel out/fc2 partial sums psum'd over 'model'.
            mesh_tp, model_axis, _ = _tp.current()
            mp = mesh_tp.shape[model_axis]
            assert cfg.heads % mp == 0, (
                f"TP×PP needs heads ({cfg.heads}) divisible by the "
                f"model axis ({mp})")
            from istvt_tpu.kernels.attention import (
                _spatial_packed_reference, _temporal_packed_reference,
                spatial_attention_packed, temporal_attention_packed)
            core_t = (temporal_attention_packed if cfg.use_pallas
                      else _temporal_packed_reference)
            core_s = (spatial_attention_packed if cfg.use_pallas
                      else _spatial_packed_reference)
            h_local = cfg.heads // mp

            def mm(u, w):
                return linear({"w": w}, u)

            def run_layer_manual_tp(lp, xv):
                bq, nq, _ = xv.shape
                t1 = nq // s
                hn = layernorm(lp["t"]["norm"], xv)
                qkv = mm(hn, lp["t"]["qkv_w"])
                il = qkv.shape[-1] // 3
                a = core_t(qkv.reshape(bq, t1, s, 3 * il), h_local)
                out_t = jax.lax.psum(
                    mm(a.reshape(bq, nq, il), lp["t"]["out_w"]),
                    model_axis) + lp["t"]["out_b"].astype(xv.dtype)
                hn = layernorm(lp["s"]["norm"], out_t)
                qkv = mm(hn, lp["s"]["qkv_w"])
                a = core_s(qkv.reshape(bq * t1, s, 3 * il), h_local,
                           s_valid if s_valid < s else -1)
                xv = jax.lax.psum(
                    mm(a.reshape(bq, nq, il), lp["s"]["out_w"]),
                    model_axis) + lp["s"]["out_b"].astype(xv.dtype) + xv
                hn = layernorm(lp["ff"]["norm"], xv)
                h1 = gelu(mm(hn, lp["ff"]["fc1"]["w"])
                          + lp["ff"]["fc1"]["b"].astype(xv.dtype))
                return jax.lax.psum(
                    mm(h1, lp["ff"]["fc2"]["w"]),
                    model_axis) + lp["ff"]["fc2"]["b"].astype(xv.dtype) + xv

            if cfg.remat:
                run_layer_manual_tp = jax.checkpoint(run_layer_manual_tp)
            x = _pp.pipeline_layers(
                x, [_tp_pack_layer(l, mp) for l in p["layers"]],
                run_layer_manual_tp, param_specs=_tp_pack_specs())
        else:
            x = _pp.pipeline_layers(
                x, p["layers"],
                lambda lp, xv: run_layer(xv, lp, None, None, None)[0])
    else:
        for i, layer in enumerate(p["layers"]):
            frng = None
            if rng is not None:
                rng, frng = jax.random.split(rng)
            bias_t = attn_bias["t"][i] if attn_bias is not None else None
            bias_s = attn_bias["s"][i] if attn_bias is not None else None
            x, at, asp = run_layer(x, layer, bias_t, bias_s, frng)
            if return_attn:
                attns["t"].append(at)
                attns["s"].append(asp)

    x = layernorm(p["norm"], x)
    x = x.reshape(b, t + 1, s, d)
    cls = x[:, 0, 0]                                         # (vivit.py:146)
    out = layernorm(p["mlp_head"]["norm"], cls)
    out = linear(p["mlp_head"]["fc"], out)
    return (out, attns) if return_attn else out


# ---------------------------------------------------------------------------
# Full model: Xception stem + DSTTr


def init(key, cfg: ISTVTConfig = ISTVTConfig()):
    k1, k2 = jax.random.split(key)
    xp, xs = xception.init(k1, xception.XceptionConfig(num_classes=2))
    vp = dsttr_init(k2, cfg)
    return {"xcep": xp, "vit": vp}, {"xcep": xs}


# feature-grid side length of the Xception stem per input size; the
# stem's conv/pool arithmetic is NOT a clean /16 (56 -> 4, not 3), so
# unknown sizes are resolved by abstract shape evaluation (no FLOPs).
# Every entry is asserted against the real stem by
# tests/test_distill.py::test_infer_feat_hw_matches_stem.
_FEAT_HW = {300: 19, 299: 19, 256: 16, 224: 14, 75: 5, 72: 5, 56: 4,
            48: 3}


def infer_feat_hw(image_size: int) -> int:
    """feat_hw (spatial token grid side) for a given input size.

    Replaces the hand-maintained size->feat_hw dicts in the CLIs: known
    sizes hit a table, anything else runs `jax.eval_shape` through the
    real stem (shape-only tracing — no compile, no data).
    """
    hw = _FEAT_HW.get(image_size)
    if hw is None:
        p, s = jax.eval_shape(
            lambda k: xception.init(k, xception.XceptionConfig(
                num_classes=2)), jax.random.PRNGKey(0))
        feats, _ = jax.eval_shape(
            lambda p_, s_, x_: xception.low_level_features(p_, s_, x_,
                                                           False),
            p, s,
            jax.ShapeDtypeStruct((1, image_size, image_size, 3),
                                 jnp.float32))
        hw = _FEAT_HW[image_size] = int(feats.shape[1])
    return hw


def apply(params, state, clips, cfg: ISTVTConfig = ISTVTConfig(),
          train: bool = False, rng: Optional[jax.Array] = None,
          attn_bias=None, return_attn: bool = False):
    """clips: (B, T, H, W, 3) NHWC -> (logits (B, num_classes), new_state).

    Mirrors XceptionVidTr.forward (reference vivit.py:202-208): frames are
    folded into the batch for the per-frame CNN stem, then unfolded for the
    spatio-temporal transformer.
    """
    b, t, hh, ww, c = clips.shape
    x = clips.reshape(b * t, hh, ww, c)
    if cfg.remat and train:
        # the 300² entry-flow activations (B·T frames at 147²x64/128ch)
        # dominate backward-pass HBM at large batch — B=32 training
        # exceeds the 16 GB chip without rematerializing the stem
        up = cfg.use_pallas
        stem = jax.checkpoint(
            lambda p_, s_, x_: xception.low_level_features(
                p_, s_, x_, True, use_pallas=up))
        feats, ns = stem(params["xcep"], state["xcep"], x)
    else:
        # int8 serving stores inter-conv stem activations as f8_e4m3:
        # the stem is ~100% HBM-bandwidth-bound and XLA fuses the
        # converts into the conv fusions (models/xception.block_apply)
        store = jnp.float8_e4m3fn if (not train and
                                      cfg.quantize == "int8" and
                                      cfg.stem_store == "f8") else None
        feats, ns = xception.low_level_features(
            params["xcep"], state["xcep"], x, train,
            use_pallas=cfg.use_pallas, store_dtype=store)
    fh = feats.shape[1]
    feats = feats.reshape(b, t, fh, fh, feats.shape[-1])
    out = dsttr_apply(params["vit"], feats, cfg, train=train, rng=rng,
                      attn_bias=attn_bias, return_attn=return_attn)
    new_state = {"xcep": ns}
    if return_attn:
        logits, attns = out
        return (logits, attns), new_state
    return out, new_state
