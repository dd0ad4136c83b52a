"""MAT — Multi-Attentional texture networks (TPU-native).

Rebuild of reference network/vivit/texture.py:13-319 (the MAT family kept
in-tree for texture-branch experiments):

  * attention_map     (:13-34)  conv -> ELU+1 attention maps with a fixed
                                border mask (zeros 2px frame on a 24x24
                                reference grid, nearest-resized)
  * attention_pooling (:37-59)  einsum bilinear pooling of feature maps by
                                attention maps with L1/L2 norm options
  * texture_enhance_v1(:61-91)  dense 4-step residual texture branch on
                                the high-pass (x - avgpool) residue
  * texture_enhance_v2(:93-141) per-attention grouped variant
  * auxiliary_loss_v1/v2(:143-219) attention-center losses with EMA
                                feature centers; the reference's
                                torch.distributed.all_reduce of centers
                                (:166-168,205-207) becomes lax.pmean when
                                an axis_name is given
  * MAT / netrunc     (:222-315) full model over staged Xception features

The reference file EXECUTES a model at import time (:317-319) and has a
broken `from xception import xception` (:6) — bugs not reproduced.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from istvt_tpu.models import xception
from istvt_tpu.nn.layers import (
    batchnorm,
    batchnorm_init,
    conv2d,
    conv2d_init,
    dropout,
    linear,
    linear_init,
    relu,
)


def hardswish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def _resize(x, hw, method):
    return jax.image.resize(x, (x.shape[0], hw[0], hw[1], x.shape[-1]),
                            method=method)


# ---------------------------------------------------------------------------
# staged Xception features (reference network/vivit/xception.py:102-142)


def staged_features(p, s, x, train: bool = False, escape: str = ""):
    """-> dict of stage outputs {'b0'..'b12', 'final', 'logits'} (NHWC)."""
    from istvt_tpu.nn.layers import (global_avg_pool, max_pool2d,
                                     separable_conv2d)
    layers: Dict[str, jax.Array] = {}
    ns = dict(s)
    y = conv2d(p["conv1"], x, stride=2, padding=0)
    y, ns["bn1"] = batchnorm(p["bn1"], s["bn1"], y, train)
    y = relu(y)
    y = conv2d(p["conv2"], y, stride=1, padding=0)
    y, ns["bn2"] = batchnorm(p["bn2"], s["bn2"], y, train)
    layers["b0"] = y
    if escape == "b0":
        return layers, ns
    y = relu(y)
    for i in range(1, 13):
        name = f"block{i}"
        y, ns[name] = xception.block_apply(p[name], s[name], y,
                                           xception.BLOCK_SPECS[i - 1],
                                           train)
        layers[f"b{i}"] = y
        if escape == f"b{i}":
            return layers, ns
    y = separable_conv2d(p["conv3"], y, stride=1, padding=1)
    y, ns["bn3"] = batchnorm(p["bn3"], s["bn3"], y, train)
    y = relu(y)
    y = separable_conv2d(p["conv4"], y, stride=1, padding=1)
    y, ns["bn4"] = batchnorm(p["bn4"], s["bn4"], y, train)
    layers["final"] = y
    if escape == "final":
        return layers, ns
    y = relu(y)
    layers["logits"] = linear(p["fc"], jnp.mean(y, axis=(1, 2)))
    return layers, ns


# ---------------------------------------------------------------------------
# attention map + pooling


def attention_map_init(key, in_channels, out_channels):
    k1, k2 = jax.random.split(key)
    p = {"conv_extract": conv2d_init(k1, in_channels, in_channels, 3,
                                     bias=True),
         "conv2": conv2d_init(k2, in_channels, out_channels, 1)}
    s = {}
    p["bn1"], s["bn1"] = batchnorm_init(in_channels)
    p["bn2"], s["bn2"] = batchnorm_init(out_channels)
    return p, s


def attention_map_apply(p, s, x, train: bool = False):
    """(reference texture.py:24-34): ELU+1 maps, border 2/24 masked out."""
    ns = {}
    y = conv2d(p["conv_extract"], x, padding=1)
    y, ns["bn1"] = batchnorm(p["bn1"], s["bn1"], y, train)
    y = relu(y)
    y = conv2d(p["conv2"], y)
    y, ns["bn2"] = batchnorm(p["bn2"], s["bn2"], y, train)
    y = jax.nn.elu(y) + 1.0
    h, w = y.shape[1], y.shape[2]
    base = jnp.zeros((24, 24)).at[2:-2, 2:-2].set(1.0)
    mask = jax.image.resize(base, (h, w), method="nearest")
    return y * mask[None, :, :, None], ns


def attention_pooling(features, attentions, norm: int = 2):
    """Bilinear pooling (reference texture.py:37-59).
    features (B,H,W,N) or (B,M,H,W,N); attentions (B,H,W,M) -> (B,M,N)."""
    fh = features.shape[1] if features.ndim == 4 else features.shape[2]
    fw = features.shape[2] if features.ndim == 4 else features.shape[3]
    if attentions.shape[1] != fh or attentions.shape[2] != fw:
        attentions = _resize(attentions, (fh, fw), "bilinear")
    if norm == 1:
        attentions = attentions + 1e-8
    if features.ndim == 4:
        fm = jnp.einsum("bhwm,bhwn->bmn", attentions, features)
    else:
        fm = jnp.einsum("bhwm,bmhwn->bmn", attentions, features)
    if norm == 1:
        w = jnp.sum(attentions, axis=(1, 2))[..., None]
        fm = fm / w
    elif norm == 2:
        fm = fm / jnp.maximum(jnp.linalg.norm(fm, axis=-1, keepdims=True),
                              1e-12)
    elif norm == 3:
        w = jnp.sum(attentions, axis=(1, 2))[..., None] + 1e-8
        fm = fm / w
    return fm


# ---------------------------------------------------------------------------
# texture enhancement


def texture_enhance_v1_init(key, num_features):
    n = num_features
    ks = jax.random.split(key, 5)
    p = {"conv0": conv2d_init(ks[0], n, n, 1, bias=True),
         "conv1": conv2d_init(ks[1], n, n, 3, bias=True),
         "conv2": conv2d_init(ks[2], 2 * n, n, 3, bias=True),
         "conv3": conv2d_init(ks[3], 3 * n, n, 3, bias=True),
         "conv_last": conv2d_init(ks[4], 4 * n, 4 * n, 1, bias=True)}
    s = {}
    for name, ch in (("bn1", n), ("bn2", 2 * n), ("bn3", 3 * n),
                     ("bn4", 4 * n), ("bn_last", 4 * n)):
        p[name], s[name] = batchnorm_init(ch)
    return p, s


def texture_enhance_v1_apply(p, s, fmaps, attention_size=(1, 1),
                             train: bool = False):
    """Dense high-pass texture branch (reference texture.py:76-91).
    fmaps NHWC -> (enhanced (B,H,W,4N), downsampled (B,ah,aw,N))."""
    ns = {}
    b, h, w, n = fmaps.shape
    ah, aw = (int(h * attention_size[0]), int(w * attention_size[1])) \
        if isinstance(attention_size, tuple) else attention_size
    d = _resize(fmaps, (max(ah, 1), max(aw, 1)), "linear")
    fmaps = fmaps - _resize(d, (h, w), "nearest")
    f0 = conv2d(p["conv0"], fmaps)
    y, ns["bn1"] = batchnorm(p["bn1"], s["bn1"], f0, train)
    f1 = conv2d(p["conv1"], relu(y), padding=1)
    f1_ = jnp.concatenate([f0, f1], axis=-1)
    y, ns["bn2"] = batchnorm(p["bn2"], s["bn2"], f1_, train)
    f2 = conv2d(p["conv2"], relu(y), padding=1)
    f2_ = jnp.concatenate([f1_, f2], axis=-1)
    y, ns["bn3"] = batchnorm(p["bn3"], s["bn3"], f2_, train)
    f3 = conv2d(p["conv3"], relu(y), padding=1)
    f3_ = jnp.concatenate([f2_, f3], axis=-1)
    y, ns["bn4"] = batchnorm(p["bn4"], s["bn4"], f3_, train)
    y = conv2d(p["conv_last"], relu(y))
    y, ns["bn_last"] = batchnorm(p["bn_last"], s["bn_last"], y, train)
    return (y, d), ns


def texture_enhance_v2_init(key, num_features, num_attentions):
    n, m = num_features, num_attentions
    ks = jax.random.split(key, 6)
    p = {"conv_extract": conv2d_init(ks[0], n, n, 3, bias=True),
         "conv0": conv2d_init(ks[1], n * m, n * m, 5, groups=m, bias=True),
         "conv1": conv2d_init(ks[2], n * m, n * m, 3, groups=m, bias=True),
         "conv2": conv2d_init(ks[3], 2 * n * m, n * m, 3, groups=m,
                              bias=True),
         "conv3": conv2d_init(ks[4], 3 * n * m, n * m, 3, groups=m,
                              bias=True),
         "conv_last": conv2d_init(ks[5], 4 * n * m, n * m, 1, groups=m,
                                  bias=True)}
    s = {}
    for name, ch in (("bn1", n * m), ("bn2", 2 * n * m), ("bn3", 3 * n * m),
                     ("bn4", 4 * n * m), ("bn_last", n * m)):
        p[name], s[name] = batchnorm_init(ch)
    return p, s


def _gcat(a, b, m):
    """Per-attention-group channel concat (reference texture.py:113-116)."""
    bsz, h, w, _ = a.shape
    a = a.reshape(bsz, h, w, m, -1)
    b = b.reshape(bsz, h, w, m, -1)
    return jnp.concatenate([a, b], axis=-1).reshape(bsz, h, w, -1)


def texture_enhance_v2_apply(p, s, fmaps, attention_maps=(1, 1),
                             train: bool = False, m: int = 1):
    """Grouped per-attention texture branch (reference texture.py:118-141).
    -> (enhanced (B,M,H,W,N), downsampled (B,ah,aw,N))."""
    ns = {}
    b, h, w, n = fmaps.shape
    if isinstance(attention_maps, tuple):
        ah, aw = int(h * attention_maps[0]), int(w * attention_maps[1])
    else:
        ah, aw = attention_maps.shape[1], attention_maps.shape[2]
    fmaps = conv2d(p["conv_extract"], fmaps, padding=1)
    d = _resize(fmaps, (max(ah, 1), max(aw, 1)), "linear")
    if h > d.shape[1]:
        fmaps = fmaps - _resize(d, (h, w), "nearest")
    if isinstance(attention_maps, tuple):
        fm = jnp.tile(fmaps, (1, 1, 1, m))
    else:
        att = jnp.tanh(_resize(jax.lax.stop_gradient(attention_maps),
                               (h, w), "bilinear"))
        fm = (fmaps[..., None, :] * att[..., :, None]).reshape(b, h, w, -1)
    f0 = conv2d(p["conv0"], fm, padding=2, groups=m)
    y, ns["bn1"] = batchnorm(p["bn1"], s["bn1"], f0, train)
    f1 = conv2d(p["conv1"], relu(y), padding=1, groups=m)
    f1_ = _gcat(f0, f1, m)
    y, ns["bn2"] = batchnorm(p["bn2"], s["bn2"], f1_, train)
    f2 = conv2d(p["conv2"], relu(y), padding=1, groups=m)
    f2_ = _gcat(f1_, f2, m)
    y, ns["bn3"] = batchnorm(p["bn3"], s["bn3"], f2_, train)
    f3 = conv2d(p["conv3"], relu(y), padding=1, groups=m)
    f3_ = _gcat(f2_, f3, m)
    y, ns["bn4"] = batchnorm(p["bn4"], s["bn4"], f3_, train)
    y = conv2d(p["conv_last"], relu(y), groups=m)
    y, ns["bn_last"] = batchnorm(p["bn_last"], s["bn_last"], y, train)
    y = relu(y)
    y = y.reshape(b, h, w, m, n).transpose(0, 3, 1, 2, 4)   # (B,M,H,W,N)
    return (y, d), ns


# ---------------------------------------------------------------------------
# auxiliary (attention-center) losses


def auxiliary_loss_init(m: int, n: int,
                        inner_margin=(0.1, 5.0)):
    """State: EMA feature centers (reference register_buffer
    texture.py:145-151)."""
    return {"feature_centers": jnp.zeros((m, n)),
            "inner_margin": jnp.asarray(inner_margin, jnp.float32)}


def auxiliary_loss_v2(state, feature_map_d, attentions, y,
                      alpha: float = 0.05, margin: float = 1.0,
                      train: bool = True, axis_name: Optional[str] = None):
    """(reference texture.py:143-181). Returns (loss, feature_matrix,
    new_state). Under a mapped axis, center momenta reduce with lax.pmean
    — the SPMD form of the reference's guarded all_reduce (:166-168)."""
    fm = attention_pooling(feature_map_d, attentions, norm=0)
    centers = state["feature_centers"]
    momentum = fm - centers
    real_mask = (y == 0).astype(jnp.float32).reshape(-1, 1, 1)
    fcts = alpha * jnp.mean(momentum * real_mask, axis=0) + centers
    new_centers = jax.lax.stop_gradient(fcts)
    if axis_name is not None:
        new_centers = jax.lax.pmean(new_centers, axis_name)
    new_state = dict(state)
    if train:
        new_state["feature_centers"] = new_centers
    inner = state["inner_margin"][y.astype(jnp.int32)]
    intra = jnp.mean(relu(
        jnp.linalg.norm((fm - fcts).reshape(fm.shape[0], -1), axis=-1)
        * jnp.sign(inner) - inner))
    m = fcts.shape[0]
    diff = fcts[:, None] - fcts[None, :]
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
    pair_mask = jnp.triu(jnp.ones((m, m)), 1)
    inter = jnp.sum(relu(margin - dist) * pair_mask)
    return intra + inter, fm, new_state


# ---------------------------------------------------------------------------
# MAT / netrunc


def mat_init(key, num_classes: int = 2, m: int = 100, mid_dims: int = 256,
             feature_layer: str = "b3", attention_layer: str = "final"):
    ks = jax.random.split(key, 7)
    p: Dict = {}
    s: Dict = {}
    p["net"], s["net"] = xception.init(ks[0],
                                       xception.XceptionConfig(num_classes=num_classes))
    feat_ch = {"b0": 64, "b1": 128, "b2": 256, "b3": 728, "final": 2048}
    nf = feat_ch.get(feature_layer, 728)
    na = feat_ch.get(attention_layer, 2048)
    p["attentions"], s["attentions"] = attention_map_init(ks[1], na, m)
    p["texture"], s["texture"] = texture_enhance_v2_init(ks[2], nf, m)
    p["proj_local1"] = linear_init(ks[3], m * nf, mid_dims)
    p["proj_local2"] = linear_init(jax.random.fold_in(ks[3], 1), mid_dims,
                                   mid_dims)
    p["project_final"] = linear_init(ks[4], 2048, mid_dims)
    p["ensemble_fc1"] = linear_init(ks[5], mid_dims * 2, mid_dims)
    p["ensemble_fc2"] = linear_init(ks[6], mid_dims, num_classes)
    cfg = {"m": m, "feature_layer": feature_layer,
           "attention_layer": attention_layer, "num_features": nf,
           "mid_dims": mid_dims}
    return p, s, cfg


def mat_apply(p, s, x, cfg, train: bool = False, rng=None,
              dropout_rate: float = 0.5, drop_final_rate: float = 0.5):
    """Full MAT forward (reference texture.py:258-282 + the ensemble
    head defined at :252-255): attention-pooled texture features + global
    final feature -> joint classifier."""
    ns: Dict = {}
    layers, ns["net"] = staged_features(p["net"], s["net"], x, train)
    fmaps = layers[cfg["feature_layer"]]
    raw_att = layers[cfg["attention_layer"]]
    att, ns["attentions"] = attention_map_apply(p["attentions"],
                                                s["attentions"], raw_att,
                                                train)
    k1 = k2 = None
    if rng is not None:
        k1, k2 = jax.random.split(rng)
    # attention dropout mask (B, 1, 1, M) — Dropout2d over attention index
    b = x.shape[0]
    dmask = dropout(k1, jnp.ones((b, 1, 1, cfg["m"])), dropout_rate, train)
    (enh, fmaps_d), ns["texture"] = texture_enhance_v2_apply(
        p["texture"], s["texture"], fmaps, att, train, m=cfg["m"])
    fmaps_d = fmaps_d - jnp.mean(fmaps_d, axis=(1, 2), keepdims=True)
    fmaps_d = fmaps_d / (jnp.std(fmaps_d, axis=(1, 2), keepdims=True) + 1e-8)
    fm = attention_pooling(enh.transpose(0, 1, 2, 3, 4), att, norm=2)
    fm = fm * dmask[:, 0, 0, :, None]
    feature_matrix = fm.reshape(b, -1)
    local = linear(p["proj_local2"],
                   hardswish(linear(p["proj_local1"], feature_matrix)))
    final = jnp.mean(relu(layers["final"]), axis=(1, 2))
    final = dropout(k2, final, drop_final_rate, train)
    glob = hardswish(linear(p["project_final"], final))
    both = jnp.concatenate([local, glob], axis=-1)
    logits = linear(p["ensemble_fc2"],
                    hardswish(linear(p["ensemble_fc1"], both)))
    return (logits, {"attention_maps": att, "feature_matrix": fm,
                     "feature_maps_d": fmaps_d}), ns


def netrunc_init(key, num_classes: int = 2, feature_layer: str = "b3"):
    ks = jax.random.split(key, 3)
    p: Dict = {}
    s: Dict = {}
    p["net"], s["net"] = xception.init(ks[0], xception.XceptionConfig())
    nf = {"b0": 64, "b1": 128, "b2": 256, "b3": 728}.get(feature_layer, 728)
    p["texture"], s["texture"] = texture_enhance_v2_init(ks[1], nf, 1)
    p["fc"] = linear_init(ks[2], nf, num_classes)
    return p, s, {"feature_layer": feature_layer}


def netrunc_apply(p, s, x, cfg, train: bool = False, rng=None,
                  drop: float = 0.5):
    """Truncated texture classifier (reference texture.py:290-315)."""
    ns: Dict = {}
    layers, ns["net"] = staged_features(p["net"], s["net"], x, train,
                                        escape=cfg["feature_layer"])
    fmaps = layers[cfg["feature_layer"]]
    (enh, _), ns["texture"] = texture_enhance_v2_apply(
        p["texture"], s["texture"], fmaps, (0.2, 0.2), train, m=1)
    pooled = jnp.mean(enh[:, 0], axis=(1, 2))
    pooled = dropout(rng, pooled, drop, train)
    return linear(p["fc"], pooled), ns
