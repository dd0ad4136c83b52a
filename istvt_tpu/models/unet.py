"""UNet zoo — residual-map UNets, siamese wrappers, pretext solvers
(TPU-native rebuild of reference network/unet.py ~993 LoC, unet_.py,
unet_nest.py, layers.py).

Components (reference cites):
  * DoubleConv / Down / Up / UpSingle / OutConv  (unet.py:13-127)
  * ModifiedUNet: UNet regresses a residual map; a classifier backbone
    (EfficientNet-b2 or ResNet18) classifies x+residual ('add') or
    x*sigmoid(residual) ('mul')                  (unet.py:129-204)
  * TripUNet / TripEfficientNet siamese triple wrappers (:206-281)
  * JigsawSolver / JigsawSolverConv pretext heads (:325-371)
  * CompressionCls quality discriminator          (:384-411)
  * QuadnetEncoder / ReEncoder / Decoder family   (:637-921)
  * UNet++ (nested dense skip UNet)               (unet_nest.py:6-92)
  * ChannelAttention / SpatialAttention (CBAM)    (:460-492)
  * BranchWeightGenerator                         (:957-994)

Siamese weight sharing is free in JAX: one param tree applied to N inputs.
The reference loops branches in Python per call (unet.py:645-651); here
branches fold into the batch axis so XLA sees ONE big conv/matmul stream.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from istvt_tpu.models import efficientnet as effnet
from istvt_tpu.models import resnet2d
from istvt_tpu.nn.layers import (
    batchnorm,
    batchnorm_init,
    conv2d,
    conv2d_init,
    linear,
    linear_init,
    max_pool2d,
    relu,
    swish,
)


# ---------------------------------------------------------------------------
# building blocks (reference unet.py:13-127)


def double_conv_init(key, cin, cout, cmid=None):
    cmid = cmid or cout
    k1, k2 = jax.random.split(key)
    p, s = {}, {}
    p["conv1"] = conv2d_init(k1, cin, cmid, 3, bias=True)
    p["bn1"], s["bn1"] = batchnorm_init(cmid)
    p["conv2"] = conv2d_init(k2, cmid, cout, 3, bias=True)
    p["bn2"], s["bn2"] = batchnorm_init(cout)
    return p, s


def double_conv(p, s, x, train, use_swish=False):
    act = swish if use_swish else relu
    ns = {}
    x = conv2d(p["conv1"], x, padding=1)
    x, ns["bn1"] = batchnorm(p["bn1"], s["bn1"], x, train)
    x = act(x)
    x = conv2d(p["conv2"], x, padding=1)
    x, ns["bn2"] = batchnorm(p["bn2"], s["bn2"], x, train)
    return act(x), ns


def bilinear_up2(x):
    """2x bilinear upsample (align_corners=True Upsample, unet.py:77)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), method="bilinear")


def up_cat(p, s, x1, x2, train):
    """Upsample x1, pad to x2's grid, concat skip, DoubleConv
    (reference Up, unet.py:69-96)."""
    x1 = bilinear_up2(x1)
    dh = x2.shape[1] - x1.shape[1]
    dw = x2.shape[2] - x1.shape[2]
    x1 = jnp.pad(x1, ((0, 0), (dh // 2, dh - dh // 2),
                      (dw // 2, dw - dw // 2), (0, 0)))
    return double_conv(p, s, jnp.concatenate([x2, x1], axis=-1), train)


def up_single(p, s, x, train, use_swish=False):
    """Upsample then DoubleConv, no skip (reference UpSingle :98-116)."""
    return double_conv(p, s, bilinear_up2(x), train, use_swish)


# ---------------------------------------------------------------------------
# ModifiedUNet (reference unet.py:129-168)

UNET_CH = (16, 32, 64, 128)


def modified_unet_init(key, n_channels=3, n_classes=3, bilinear=True,
                       mode="add", classifier="efficientnet-b2"):
    factor = 2 if bilinear else 1
    ks = jax.random.split(key, 12)
    p: Dict = {}
    s: Dict = {}
    p["inc"], s["inc"] = double_conv_init(ks[0], n_channels, 16)
    chans = [16, 32, 64, 128, 256 // factor]
    for i in range(4):
        p[f"down{i+1}"], s[f"down{i+1}"] = double_conv_init(
            ks[1 + i], chans[i], chans[i + 1])
    up_specs = [(256, 128 // factor, 128), (128, 64 // factor, 64),
                (64, 32 // factor, 32), (32, 16, None)]
    for i, (cin, cout, cmid) in enumerate(up_specs):
        p[f"up{i+1}"], s[f"up{i+1}"] = double_conv_init(
            ks[5 + i], cin, cout, cmid)
    p["out"] = conv2d_init(ks[9], 16, n_classes, 1, bias=True)
    if classifier == "resnet18":
        cp, cs, ccfg = resnet2d.init(ks[10], 18, 2)
    else:
        cp, cs, ccfg = None, None, None
        ep, es, ecfg = effnet.init(ks[10], "efficientnet-b2",
                                   include_head=False)
        cp = {"backbone": ep, "fc": linear_init(ks[11], 1408, 2)}
        cs = es
        ccfg = ecfg
    p["cls"], s["cls"] = cp, cs
    cfg = {"mode": mode, "classifier": classifier, "cls_cfg": ccfg}
    return p, s, cfg


def modified_unet_apply(p, s, x, cfg, train=False, rng=None):
    """-> (regression map, classification logits, [e5,d1..d4] feats)."""
    ns: Dict = {}
    e1, ns["inc"] = double_conv(p["inc"], s["inc"], x, train)
    e = e1
    encs = [e1]
    for i in range(4):
        e = max_pool2d(e, 2, 2, 0)
        e, ns[f"down{i+1}"] = double_conv(p[f"down{i+1}"], s[f"down{i+1}"],
                                          e, train)
        encs.append(e)
    e1, e2, e3, e4, e5 = encs
    d1, ns["up1"] = up_cat(p["up1"], s["up1"], e5, e4, train)
    d2, ns["up2"] = up_cat(p["up2"], s["up2"], d1, e3, train)
    d3, ns["up3"] = up_cat(p["up3"], s["up3"], d2, e2, train)
    d4, ns["up4"] = up_cat(p["up4"], s["up4"], d3, e1, train)
    regression = conv2d(p["out"], d4)
    if cfg["mode"] == "mul":
        cls_in = x * jax.nn.sigmoid(regression)
    else:
        cls_in = x + regression
    if cfg["classifier"] == "resnet18":
        cla, ns["cls"] = resnet2d.apply(p["cls"], s["cls"], cls_in,
                                        cfg["cls_cfg"], train, rng)
    else:
        feats, cns = effnet.extract_features(p["cls"]["backbone"], s["cls"],
                                             cls_in, cfg["cls_cfg"], train,
                                             rng)
        ns["cls"] = cns
        cla = linear(p["cls"]["fc"], jnp.mean(feats, axis=(1, 2)))
    return (regression, cla, [e5, d1, d2, d3, d4]), ns


def triple_apply(apply_fn, params, state, anchor, positive, negative,
                 **kw):
    """Siamese triple (reference TripUNet forward, unet.py:225-233):
    fold the 3 branches into the batch so the backbone runs ONCE."""
    b = anchor.shape[0]
    x = jnp.concatenate([anchor, positive, negative], axis=0)
    out, ns = apply_fn(params, state, x, **kw)

    def split3(u):
        return [u[:b], u[b:2 * b], u[2 * b:]]

    return jax.tree_util.tree_map(
        lambda u: split3(u) if hasattr(u, "shape") and u.shape[0] == 3 * b
        else u, out, is_leaf=lambda u: hasattr(u, "shape")), ns


# ---------------------------------------------------------------------------
# Trip/Quad EfficientNet feature wrappers (reference unet.py:241-281,637-658)


def trip_efficientnet_init(key, num_classes=2):
    k1, k2 = jax.random.split(key)
    ep, es, ecfg = effnet.init(k1, "efficientnet-b2", include_head=False)
    p = {"backbone": ep, "fc": linear_init(k2, 1408, num_classes)}
    return p, es, {"cls_cfg": ecfg}


def trip_efficientnet_apply(p, s, inputs: Sequence, cfg, train=False,
                            rng=None):
    """-> (feats list, clas list) per branch (reference unet.py:246-253)."""
    b = inputs[0].shape[0]
    x = jnp.concatenate(list(inputs), axis=0)
    fmap, ns = effnet.extract_features(p["backbone"], s, x, cfg["cls_cfg"],
                                       train, rng)
    feat = jnp.mean(fmap, axis=(1, 2))
    cla = linear(p["fc"], feat)
    n = len(inputs)
    feats = [feat[i * b:(i + 1) * b] for i in range(n)]
    clas = [cla[i * b:(i + 1) * b] for i in range(n)]
    return (feats, clas), ns


def quadnet_encoder_init(key, id_len=896, model="efficientnet-b4",
                         use_full=False, head="linear"):
    """Quadnet encoder family (reference unet.py:637-924):

      head='linear': QuadnetEncoder / QuadEfficientNetLite — pooled
        feature splits into identity [:id_len] / texture [id_len:],
        fc classifies the id half (or full).
      head='dfc':    QuadEfficientNetLiteDoubleFC — fc->tanh->fc->tanh->fc.
      head='conv':   QuadEfficientNet — conv_g/conv_id 1x1 + BN + swish
        heads over the feature map; classify pooled id stream.
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    ep, es, ecfg = effnet.init(k1, model, include_head=False)
    width = effnet.PARAMS[model][0]
    feat_dim = effnet.round_filters(1280, width)
    p: Dict = {"backbone": ep}
    s: Dict = {"backbone": es}
    if head == "conv":
        half = feat_dim // 2
        p["conv_g"] = conv2d_init(k2, feat_dim, half, 1, bias=True)
        p["conv_id"] = conv2d_init(k3, feat_dim, half, 1, bias=True)
        p["bn_g"], s["bn_g"] = batchnorm_init(half)
        p["bn_id"], s["bn_id"] = batchnorm_init(half)
        p["fc"] = linear_init(k4, half, 2)
        id_len = half
    elif head == "dfc":
        fc_in = feat_dim if use_full else id_len
        p["fc"] = linear_init(k2, fc_in, 512)
        p["fc2"] = linear_init(k3, 512, 256)
        p["fc3"] = linear_init(k4, 256, 2)
    else:
        fc_in = feat_dim if use_full else id_len
        p["fc"] = linear_init(k2, fc_in, 2)
    return p, s, {"cls_cfg": ecfg, "id_len": id_len, "use_full": use_full,
                  "head": head}


def quadnet_encoder_apply(p, s, inputs: Sequence, cfg, train=False,
                          rng=None):
    """-> (gs, ids, clas, gs_full, ids_full) (reference unet.py:660-795,
    864-924); see quadnet_encoder_init for head variants."""
    b = inputs[0].shape[0]
    x = jnp.concatenate(list(inputs), axis=0)
    bs = s["backbone"] if "backbone" in s else s
    fmap, bns = effnet.extract_features(p["backbone"], bs, x,
                                        cfg["cls_cfg"], train, rng)
    ns: Dict = {"backbone": bns}
    head = cfg.get("head", "linear")
    if head == "conv":
        # (reference unet.py:660-694): bn(conv(x)) -> swish streams
        g_map = conv2d(p["conv_g"], fmap)
        g_map, ns["bn_g"] = batchnorm(p["bn_g"], s["bn_g"], g_map, train)
        g_map = swish(g_map)
        id_map = conv2d(p["conv_id"], fmap)
        id_map, ns["bn_id"] = batchnorm(p["bn_id"], s["bn_id"], id_map,
                                        train)
        id_map = swish(id_map)
        gv = g_map.reshape(g_map.shape[0], -1)
        idv = id_map.reshape(id_map.shape[0], -1)
        cla = linear(p["fc"], jnp.mean(id_map, axis=(1, 2)))
        id_full, g_full = id_map, g_map
    else:
        v = jnp.mean(fmap, axis=(1, 2))
        idl = cfg["id_len"]
        id_full, g_full = fmap[..., :idl], fmap[..., idl:]
        idv, gv = v[:, :idl], v[:, idl:]
        feat = v if cfg["use_full"] else idv
        if head == "dfc":
            h = jnp.tanh(linear(p["fc"], feat))
            h = jnp.tanh(linear(p["fc2"], h))
            cla = linear(p["fc3"], h)
        else:
            cla = linear(p["fc"], feat)
    n = len(inputs)

    def sp(u):
        return [u[i * b:(i + 1) * b] for i in range(n)]

    return (sp(gv), sp(idv), sp(cla), sp(g_full), sp(id_full)), ns


def quadnet_decoder_init(key, cin=1408, cout=3):
    """1x1 conv 320 + 5 UpSingle stages -> image (reference unet.py:811-828)."""
    ks = jax.random.split(key, 7)
    p: Dict = {"conv_in": conv2d_init(ks[0], cin, 320, 1, bias=True)}
    s: Dict = {}
    p["bn_in"], s["bn_in"] = batchnorm_init(320)
    specs = [(320, 112, 192), (112, 80, None), (80, 40, None),
             (40, 16, 24), (16, cout, 32)]
    for i, (ci, co, cm) in enumerate(specs):
        p[f"up{i}"], s[f"up{i}"] = double_conv_init(ks[1 + i], ci, co, cm)
    p["bn_out"], s["bn_out"] = batchnorm_init(cout)
    return p, s


def quadnet_decoder_apply(p, s, x, train=False, use_swish=False):
    act = swish if use_swish else relu
    ns: Dict = {}
    x = conv2d(p["conv_in"], x)
    x, ns["bn_in"] = batchnorm(p["bn_in"], s["bn_in"], x, train)
    x = act(x)
    for i in range(5):
        x, ns[f"up{i}"] = up_single(p[f"up{i}"], s[f"up{i}"], x, train,
                                    use_swish)
    x, ns["bn_out"] = batchnorm(p["bn_out"], s["bn_out"], x, train)
    return swish(x), ns


def quadnet_landmark_decoder_init(key, cin=896):
    """QuadnetLandmarkDecoder / QuadnetRecDecoder (reference
    unet.py:830-862): like QuadnetDecoder but 896-ch input, 1-ch output,
    NO trailing BN+swish."""
    p, s = quadnet_decoder_init(key, cin=cin, cout=1)
    p.pop("bn_out")
    s.pop("bn_out")
    return p, s


def quadnet_landmark_decoder_apply(p, s, x, train=False, use_swish=True):
    act = swish if use_swish else relu
    ns: Dict = {}
    x = conv2d(p["conv_in"], x)
    x, ns["bn_in"] = batchnorm(p["bn_in"], s["bn_in"], x, train)
    x = act(x)
    for i in range(5):
        x, ns[f"up{i}"] = up_single(p[f"up{i}"], s[f"up{i}"], x, train,
                                    use_swish)
    return x, ns


# ---------------------------------------------------------------------------
# pretext heads (reference unet.py:325-411)


def jigsaw_solver_init(key, out_count, in_channels=1408):
    ks = jax.random.split(key, 4)
    p = {
        "fc1": linear_init(ks[0], in_channels, 1408),
        "fc2": linear_init(ks[1], 1408, 1408),
        "fc3": linear_init(ks[2], 1408, 704),
        "fc4": linear_init(ks[3], 704, out_count * 2),
    }
    s = {}
    for i, ch in ((1, 1408), (2, 1408), (3, 704), (4, out_count * 2)):
        p[f"bn{i}"], s[f"bn{i}"] = batchnorm_init(ch)
    return p, s


def jigsaw_solver_apply(p, s, x, train=False):
    """Feature map -> per-patch (x, y) coordinate regression
    (reference unet.py:325-352; loss at loss_fn.py:262-278)."""
    ns = {}
    if x.ndim == 4:
        x = jnp.mean(x, axis=(1, 2))
    for i in range(1, 5):
        x = linear(p[f"fc{i}"], x)
        x, ns[f"bn{i}"] = batchnorm(p[f"bn{i}"], s[f"bn{i}"], x, train)
        if i < 4:
            x = relu(x)
    return x, ns


def jigsaw_solver_conv_init(key, out_count, in_channels=1408,
                            grid_hw=10):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": conv2d_init(k1, in_channels, 1, 1, bias=True),
        "fc": linear_init(k2, grid_hw * grid_hw, out_count * 2),
    }


def jigsaw_solver_conv_apply(p, x):
    """(reference unet.py:354-371; BNs commented out upstream)."""
    y = relu(conv2d(p["conv1"], x))
    return linear(p["fc"], y.reshape(y.shape[0], -1))


def compression_cls_init(key, in_channel=2048):
    ks = jax.random.split(key, 4)
    return {
        "fc1": linear_init(ks[0], in_channel, 1024),
        "fc2": linear_init(ks[1], 1024, 512),
        "fc3": linear_init(ks[2], 512, 256),
        "fc4": linear_init(ks[3], 256, 2),
    }


def compression_cls_apply(p, x):
    """hq/lq quality discriminator (reference unet.py:384-411; its BNs are
    commented out in the reference forward)."""
    if x.ndim == 4:
        x = jnp.mean(x, axis=(1, 2))
    for i in range(1, 4):
        x = relu(linear(p[f"fc{i}"], x))
    return linear(p["fc4"], x)


# ---------------------------------------------------------------------------
# CBAM-style attentions + branch weighting (reference unet.py:460-492,957-994)


def channel_attention_init(key, channels, reduction=16):
    k1, k2 = jax.random.split(key)
    mid = max(channels // reduction, 1)
    return {"fc1": conv2d_init(k1, channels, mid, 1, bias=True),
            "fc2": conv2d_init(k2, mid, channels, 1, bias=True)}


def channel_attention(p, x):
    avg = jnp.mean(x, axis=(1, 2), keepdims=True)
    mx = jnp.max(x, axis=(1, 2), keepdims=True)
    att = conv2d(p["fc2"], relu(conv2d(p["fc1"], avg))) + \
        conv2d(p["fc2"], relu(conv2d(p["fc1"], mx)))
    return x * jax.nn.sigmoid(att)


def spatial_attention_init(key, kernel_size=7):
    return {"conv": conv2d_init(key, 2, 1, kernel_size, bias=True)}


def spatial_attention(p, x):
    avg = jnp.mean(x, axis=-1, keepdims=True)
    mx = jnp.max(x, axis=-1, keepdims=True)
    att = conv2d(p["conv"], jnp.concatenate([avg, mx], axis=-1),
                 padding=p["conv"]["w"].shape[0] // 2)
    return x * jax.nn.sigmoid(att)


def branch_weight_generator_init(key, in_dim, n_branches=3):
    k1, k2 = jax.random.split(key)
    return {"fc1": linear_init(k1, in_dim, in_dim // 2),
            "fc2": linear_init(k2, in_dim // 2, n_branches)}


def branch_weight_generator(p, feats: Sequence):
    """Softmax weights over ensemble branches from concat'd GAP features
    (reference unet.py:957-994)."""
    x = jnp.concatenate([jnp.mean(f, axis=(1, 2)) if f.ndim == 4 else f
                         for f in feats], axis=-1)
    w = linear(p["fc2"], relu(linear(p["fc1"], x)))
    return jax.nn.softmax(w, axis=-1)


# ---------------------------------------------------------------------------
# multi-branch ensembles (reference unet.py:283-322,413-458,515-635)
# Branch backbones are NOT weight-shared (nn.ModuleList of separate nets).


def ensemble_en_init(key, num_nets=3, model="efficientnet-b2",
                     num_classes=2, with_jigsaw=False,
                     with_compression=False):
    """EnsembleEN / JigsawEnsembleEN (reference unet.py:413-458):
    per-branch EfficientNet + fc head; optional jigsaw solvers on branches
    1 (3x3 grid) and 2 (5x5) and per-branch CompressionCls."""
    width = effnet.PARAMS[model][0]
    feat_dim = effnet.round_filters(1280, width)
    ks = jax.random.split(key, num_nets * 3 + 2)
    p: Dict = {"nets": [], "fcs": []}
    s: Dict = {"nets": []}
    cfgs = []
    for i in range(num_nets):
        ep, es, ecfg = effnet.init(ks[3 * i], model, include_head=False)
        p["nets"].append(ep)
        s["nets"].append(es)
        cfgs.append(ecfg)
        p["fcs"].append(linear_init(ks[3 * i + 1], feat_dim, num_classes))
    if with_compression:
        p["ccls"] = [compression_cls_init(ks[3 * i + 2], feat_dim)
                     for i in range(num_nets)]
    if with_jigsaw:
        p["solver_3"], s["solver_3"] = jigsaw_solver_init(ks[-2], 9, feat_dim)
        p["solver_5"], s["solver_5"] = jigsaw_solver_init(ks[-1], 25,
                                                          feat_dim)
    return p, s, {"cfgs": cfgs, "feat_dim": feat_dim}


def ensemble_en_apply(p, s, inputs: Sequence, cfg, train=False, rng=None):
    """-> (clas, feats[, idxs, c_clas]) per branch."""
    ns: Dict = {"nets": []}
    clas, feats, idxs, c_clas = [], [], [], []
    for i, x in enumerate(inputs):
        fmap, bns = effnet.extract_features(p["nets"][i], s["nets"][i], x,
                                            cfg["cfgs"][i], train, rng)
        ns["nets"].append(bns)
        feat = jnp.mean(fmap, axis=(1, 2))
        feats.append(fmap)
        clas.append(linear(p["fcs"][i], feat))
        if "solver_3" in p and i == 1:
            out, ns["solver_3"] = jigsaw_solver_apply(p["solver_3"],
                                                      s["solver_3"], feat,
                                                      train)
            idxs.append(out)
        if "solver_5" in p and i == 2:
            out, ns["solver_5"] = jigsaw_solver_apply(p["solver_5"],
                                                      s["solver_5"], feat,
                                                      train)
            idxs.append(out)
        if "ccls" in p:
            c_clas.append(compression_cls_apply(p["ccls"][i], feat))
    return (clas, feats, idxs, c_clas), ns


def ensemble_xcep_init(key, num_nets=3):
    """EnsembleXcep (reference unet.py:515-563): per-branch Xception with
    spatial attention over the 2048-ch feature map + fc(2048 -> 1)."""
    from istvt_tpu.models import xception
    ks = jax.random.split(key, num_nets * 3)
    p: Dict = {"nets": [], "fcs": [], "s_attns": []}
    s: Dict = {"nets": []}
    for i in range(num_nets):
        xp, xs = xception.init(ks[3 * i], xception.XceptionConfig())
        p["nets"].append(xp)
        s["nets"].append(xs)
        p["fcs"].append(linear_init(ks[3 * i + 1], 2048, 1))
        p["s_attns"].append(spatial_attention_init(ks[3 * i + 2]))
    return p, s


def ensemble_xcep_apply(p, s, inputs: Sequence, train=False, rng=None,
                        drop=0.5):
    """-> (clas, feats, s_attns, []) (reference unet.py:535-552) — the
    spatial-attention maps are the interpretability side output saved as
    .npy during pair training (train_CNN.py:396-401)."""
    from istvt_tpu.models import xception
    from istvt_tpu.nn.layers import dropout as _drop
    ns: Dict = {"nets": []}
    clas, feats, s_attns = [], [], []
    for i, x in enumerate(inputs):
        feat, bns = xception.features(p["nets"][i], s["nets"][i], x, train)
        ns["nets"].append(bns)
        avg = jnp.mean(feat, axis=-1, keepdims=True)
        mx = jnp.max(feat, axis=-1, keepdims=True)
        att = conv2d(p["s_attns"][i]["conv"],
                     jnp.concatenate([avg, mx], axis=-1), padding=3)
        att = jax.nn.sigmoid(att)
        feat = feat * att
        feats.append(feat)
        s_attns.append(att)
        pooled = _drop(rng, jnp.mean(feat, axis=(1, 2)), drop, train)
        clas.append(linear(p["fcs"][i], pooled))
    return (clas, feats, s_attns, []), ns


def fusion_en_init(key, num_nets=3, model="efficientnet-b2"):
    """FusionEfficientNet (reference unet.py:601-635): branch logits are
    concatenated and fused by fc(2*num_nets -> 2)."""
    p, s, cfg = ensemble_en_init(key, num_nets, model)
    p["fusion_fc"] = linear_init(jax.random.fold_in(key, 7),
                                 2 * num_nets, 2)
    return p, s, cfg


def fusion_en_apply(p, s, inputs, cfg, train=False, rng=None):
    (clas, feats, _, _), ns = ensemble_en_apply(p, s, inputs, cfg, train,
                                                rng)
    branch_cls = jnp.concatenate(clas, axis=-1)
    return (linear(p["fusion_fc"], branch_cls), clas), ns


def recombine_features(gs, ids, imgs, label):
    """Quadnet real/fake feature regrouping (reference
    network/utils.py:32-42): branches 0/2 hold the (real-view, fake-view)
    pair whose roles swap with the label; returns
    (g_real, id_fake, g_fake, id_real, img_fake, img_real). Static-shape
    rowwise select replaces the reference's boolean concat."""
    def pick(a, b):
        l = label.reshape(-1, *([1] * (a.ndim - 1))).astype(bool)
        return jnp.where(l, b, a)

    g_real = pick(gs[0], gs[2])
    id_real = pick(ids[0], ids[2])
    g_fake = pick(gs[2], gs[0])
    id_fake = pick(ids[2], ids[0])
    img_real = pick(imgs[0], imgs[2])
    img_fake = pick(imgs[2], imgs[0])
    return g_real, id_fake, g_fake, id_real, img_fake, img_real


# ---------------------------------------------------------------------------
# domain-generalization heads (reference unet_.py:392-523)


def domain_cls_init(key, in_channel=2048, num_domain=5):
    ks = jax.random.split(key, 4)
    return {"fc1": linear_init(ks[0], in_channel, 2048),
            "fc2": linear_init(ks[1], 2048, 1024),
            "fc3": linear_init(ks[2], 1024, 512),
            "fc4": linear_init(ks[3], 512, num_domain)}


def domain_cls_apply(p, x):
    """Manipulation-domain classifier head (reference unet_.py:392-411)."""
    if x.ndim == 4:
        x = jnp.mean(x, axis=(1, 2))
    for i in range(1, 4):
        x = swish(linear(p[f"fc{i}"], x))
    return linear(p["fc4"], x)


def cross_attention_xception_init(key, num_nets=2):
    """CrossAttentionXception (reference unet_.py:496-523; registry keys
    'mixed_xcep'/'xception_dg'): two Xceptions whose block-3 features feed
    a cross-attention conv (sigmoid 3x3 over the concat — reference
    unet_.py:460-466; the mixing application itself is commented out
    upstream and mirrored here as an auxiliary output)."""
    from istvt_tpu.models import xception
    ks = jax.random.split(key, num_nets * 2 + 1)
    p: Dict = {"nets": [], "fcs": []}
    s: Dict = {"nets": []}
    for i in range(num_nets):
        xp, xs = xception.init(ks[2 * i], xception.XceptionConfig())
        p["nets"].append(xp)
        s["nets"].append(xs)
        p["fcs"].append(linear_init(ks[2 * i + 1], 2048, 2))
    p["mix"] = conv2d_init(ks[-1], 728 * 2, 728, 3, bias=True)
    return p, s


def cross_attention_xception_apply(p, s, inputs, train=False, rng=None,
                                   drop=0.5, return_feat=False):
    from istvt_tpu.models import xception
    from istvt_tpu.nn.layers import dropout as _drop
    ns: Dict = {"nets": [dict(ss) for ss in s["nets"]]}
    low0, n0 = xception.mid_features(p["nets"][0], s["nets"][0], inputs[0],
                                     3, train)
    low1, n1 = xception.mid_features(p["nets"][1], s["nets"][1], inputs[1],
                                     3, train)
    att = jax.nn.sigmoid(conv2d(p["mix"],
                                jnp.concatenate([low0, low1], axis=-1),
                                padding=1))
    feat0, n0 = xception.tail_features(p["nets"][0], n0, low0, 4, train)
    feat1, n1 = xception.tail_features(p["nets"][1], n1, low1, 4, train)
    ns["nets"] = [n0, n1]
    cla0 = linear(p["fcs"][0],
                  _drop(rng, jnp.mean(feat0, axis=(1, 2)), drop, train))
    cla1 = linear(p["fcs"][1],
                  _drop(rng, jnp.mean(feat1, axis=(1, 2)), drop, train))
    if return_feat:
        return ([cla0, cla1], [feat0, feat1], att), ns
    return ([cla0, cla1], att), ns


# ---------------------------------------------------------------------------
# UNet++ (reference unet_nest.py:6-92)


def unet_nested_init(key, in_channels=3, n_classes=2,
                     filters=(16, 32, 64, 128, 256)):
    p: Dict = {}
    s: Dict = {}
    ks = iter(jax.random.split(key, 40))
    f = filters
    # backbone column X_{i,0}
    prev = in_channels
    for i in range(5):
        p[f"x{i}0"], s[f"x{i}0"] = double_conv_init(next(ks), prev, f[i])
        prev = f[i]
    # nested nodes X_{i,j}: input = j*fi (dense skips) + up(f_{i+1})
    for j in range(1, 5):
        for i in range(5 - j):
            cin = f[i] * j + f[i + 1]
            p[f"x{i}{j}"], s[f"x{i}{j}"] = double_conv_init(next(ks), cin,
                                                            f[i])
    p["final"] = conv2d_init(next(ks), f[0], n_classes, 1, bias=True)
    return p, s, {"filters": filters}


def unet_nested_apply(p, s, x, cfg, train=False, deep_supervision=False):
    """Dense nested skips (Zhou et al. UNet++; reference unet_nest.py)."""
    ns: Dict = {}
    grid: Dict[Tuple[int, int], jax.Array] = {}
    h = x
    for i in range(5):
        if i > 0:
            h = max_pool2d(h, 2, 2, 0)
        h, ns[f"x{i}0"] = double_conv(p[f"x{i}0"], s[f"x{i}0"], h, train)
        grid[(i, 0)] = h
        h = grid[(i, 0)]
    for j in range(1, 5):
        for i in range(5 - j):
            skips = [grid[(i, k)] for k in range(j)]
            up = bilinear_up2(grid[(i + 1, j - 1)])
            dh = skips[0].shape[1] - up.shape[1]
            dw = skips[0].shape[2] - up.shape[2]
            up = jnp.pad(up, ((0, 0), (dh // 2, dh - dh // 2),
                              (dw // 2, dw - dw // 2), (0, 0)))
            cat = jnp.concatenate(skips + [up], axis=-1)
            out, ns[f"x{i}{j}"] = double_conv(p[f"x{i}{j}"], s[f"x{i}{j}"],
                                              cat, train)
            grid[(i, j)] = out
    return conv2d(p["final"], grid[(0, 4)]), ns
