"""PyTorch state_dict -> JAX pytree converters.

Used for (a) golden parity tests against the reference implementation and
(b) ingesting the published pretrained checkpoints. Replicates the
reference's own weight surgery: Keras-ported pointwise weights arrive as
(O, I) and must gain two trailing unit dims (reference
network/xception.py:429-438), and 'fc' is renamed 'last_linear' (:403).

Layout conversions (torch -> ours):
  conv   (O, I/g, kH, kW) -> HWIO (kH, kW, I/g, O)
  depthw (C, 1, kH, kW)   -> (kH, kW, 1, C)
  linear (O, I)           -> (I, O)
"""
from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np
import jax.numpy as jnp


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def conv_w(t) -> jnp.ndarray:
    return jnp.asarray(_np(t).transpose(2, 3, 1, 0))


def pointwise_w(t) -> jnp.ndarray:
    a = _np(t)
    if a.ndim == 2:  # Keras-ported ckpt (reference xception.py:429-433)
        a = a[:, :, None, None]
    return jnp.asarray(a.transpose(2, 3, 1, 0))


def linear_w(t) -> jnp.ndarray:
    return jnp.asarray(_np(t).T)


def vec(t) -> jnp.ndarray:
    return jnp.asarray(_np(t))


def _bn(sd: Mapping[str, Any], prefix: str):
    p = {"scale": vec(sd[f"{prefix}.weight"]), "bias": vec(sd[f"{prefix}.bias"])}
    s = {"mean": vec(sd[f"{prefix}.running_mean"]),
         "var": vec(sd[f"{prefix}.running_var"])}
    return p, s


def _sep(sd: Mapping[str, Any], prefix: str):
    return {"dw": {"w": conv_w(sd[f"{prefix}.conv1.weight"])},
            "pw": {"w": pointwise_w(sd[f"{prefix}.pointwise.weight"])}}


def xception_from_torch(sd: Mapping[str, Any]):
    """Convert a reference-Xception state_dict (network/xception.py:104-220)
    to our (params, state). Accepts either 'fc' or 'last_linear' head keys."""
    sd = dict(sd)
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}
    p["conv1"] = {"w": conv_w(sd["conv1.weight"])}
    p["bn1"], s["bn1"] = _bn(sd, "bn1")
    p["conv2"] = {"w": conv_w(sd["conv2.weight"])}
    p["bn2"], s["bn2"] = _bn(sd, "bn2")

    for b in range(1, 13):
        pre = f"block{b}"
        # rep indices holding SeparableConv2d / BatchNorm modules vary with
        # start_with_relu (reference xception.py:63-89); recover them by scan.
        sep_idx = sorted({int(m.group(1)) for k in sd
                          if (m := re.match(rf"{pre}\.rep\.(\d+)\.conv1\.weight$", k))})
        bn_idx = sorted({int(m.group(1)) for k in sd
                         if (m := re.match(rf"{pre}\.rep\.(\d+)\.running_mean$", k))})
        bp: Dict[str, Any] = {"rep": []}
        bs: Dict[str, Any] = {"rep": []}
        for si, bi in zip(sep_idx, bn_idx):
            bnp, bns = _bn(sd, f"{pre}.rep.{bi}")
            bp["rep"].append({"sep": _sep(sd, f"{pre}.rep.{si}"), "bn": bnp})
            bs["rep"].append({"bn": bns})
        if f"{pre}.skip.weight" in sd:
            bp["skip"] = {"w": conv_w(sd[f"{pre}.skip.weight"])}
            bp["skipbn"], bs["skipbn"] = _bn(sd, f"{pre}.skipbn")
        p[pre], s[pre] = bp, bs

    p["conv3"] = _sep(sd, "conv3")
    p["bn3"], s["bn3"] = _bn(sd, "bn3")
    p["conv4"] = _sep(sd, "conv4")
    p["bn4"], s["bn4"] = _bn(sd, "bn4")
    head = "last_linear" if "last_linear.weight" in sd else "fc"
    if f"{head}.weight" in sd:
        p["fc"] = {"w": linear_w(sd[f"{head}.weight"]),
                   "b": vec(sd[f"{head}.bias"])}
    return p, s


# ---------------------------------------------------------------------------
# DSTTr / ISTVT transformer


def _prenorm(sd, prefix):
    return {"scale": vec(sd[f"{prefix}.norm.weight"]),
            "bias": vec(sd[f"{prefix}.norm.bias"])}


def _lin(sd, prefix, bias=True):
    p = {"w": linear_w(sd[f"{prefix}.weight"])}
    if bias and f"{prefix}.bias" in sd:
        p["b"] = vec(sd[f"{prefix}.bias"])
    return p


def dsttr_from_torch(sd: Mapping[str, Any], depth: int = 12):
    """Convert a torch DSTTr state_dict (reference network/vivit/vivit.py:103-148
    composed of module.py attention blocks) to our params pytree.

    Expected torch module tree:
      pos_embedding, space_token, temporal_token,
      transformer.layers.{i}.0 = PreNorm(TemporalResidualAttention)
      transformer.layers.{i}.1 = PreNorm(SpatialOnlyAttention)
      transformer.layers.{i}.2 = PreNorm(FeedForward)
      transformer.norm, mlp_head.0 (LayerNorm), mlp_head.1 (Linear)
    """
    sd = dict(sd)
    p: Dict[str, Any] = {
        "pos_embedding": vec(sd["pos_embedding"]),
        "space_token": vec(sd["space_token"]),
        "temporal_token": vec(sd["temporal_token"]),
        "layers": [],
    }
    for i in range(depth):
        pre = f"transformer.layers.{i}"
        layer = {
            "attn_t": {
                "norm": _prenorm(sd, f"{pre}.0"),
                "to_qk": _lin(sd, f"{pre}.0.fn.to_qk", bias=False),
                "to_v": _lin(sd, f"{pre}.0.fn.to_v", bias=False),
                "to_out": _lin(sd, f"{pre}.0.fn.to_out.0"),
            },
            "attn_s": {
                "norm": _prenorm(sd, f"{pre}.1"),
                "to_qkv": _lin(sd, f"{pre}.1.fn.to_qkv", bias=False),
                "to_out": _lin(sd, f"{pre}.1.fn.to_out.0"),
            },
            "ff": {
                "norm": _prenorm(sd, f"{pre}.2"),
                "fc1": _lin(sd, f"{pre}.2.fn.net.0"),
                "fc2": _lin(sd, f"{pre}.2.fn.net.3"),
            },
        }
        p["layers"].append(layer)
    p["norm"] = {"scale": vec(sd["transformer.norm.weight"]),
                 "bias": vec(sd["transformer.norm.bias"])}
    p["mlp_head"] = {
        "norm": {"scale": vec(sd["mlp_head.0.weight"]),
                 "bias": vec(sd["mlp_head.0.bias"])},
        "fc": _lin(sd, "mlp_head.1"),
    }
    return p


def conv3d_w(t) -> jnp.ndarray:
    """(O, I, kT, kH, kW) -> DHWIO (kT, kH, kW, I, O)."""
    return jnp.asarray(_np(t).transpose(2, 3, 4, 1, 0))


def resnet3d_from_torch(sd: Mapping[str, Any], layers, kind: str):
    """Generic 3D-ResNet state_dict (reference network/resnet_3d.py) or
    I3D (reference network/resnet3d/models/resnet.py) -> params/state."""
    p: Dict[str, Any] = {"conv1": {"w": conv3d_w(sd["conv1.weight"])}}
    s: Dict[str, Any] = {}
    p["bn1"], s["bn1"] = _bn(sd, "bn1")
    n_convs = 3 if kind in ("bottleneck", "i3d") else 2
    for li, n_blocks in enumerate(layers):
        lname = f"layer{li + 1}"
        p[lname], s[lname] = [], []
        for bi in range(n_blocks):
            pre = f"{lname}.{bi}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for ci in range(1, n_convs + 1):
                bp[f"conv{ci}"] = {"w": conv3d_w(sd[f"{pre}.conv{ci}.weight"])}
                bp[f"bn{ci}"], bs[f"bn{ci}"] = _bn(sd, f"{pre}.bn{ci}")
            if f"{pre}.downsample.0.weight" in sd:
                bp["down"] = {"w": conv3d_w(sd[f"{pre}.downsample.0.weight"])}
                bp["downbn"], bs["downbn"] = _bn(sd, f"{pre}.downsample.1")
            if f"{pre}.nl.theta.weight" in sd:
                nlp: Dict[str, Any] = {}
                nls: Dict[str, Any] = {}
                for c in ("theta", "phi", "g", "out"):
                    nlp[c] = {"w": conv3d_w(sd[f"{pre}.nl.{c}.weight"]),
                              "b": vec(sd[f"{pre}.nl.{c}.bias"])}
                nlp["bn"], nls["bn"] = _bn(sd, f"{pre}.nl.bn")
                bp["nl"], bs["nl"] = nlp, nls
            p[lname].append(bp)
            s[lname].append(bs)
    if "fc.weight" in sd:
        p["fc"] = {"w": linear_w(sd["fc.weight"]), "b": vec(sd["fc.bias"])}
    return p, s


def resnet2d_from_torch(sd: Mapping[str, Any], depth: int = 18):
    """torchvision-style resnet18/34/50/101 state_dict -> (params, state)
    for models/resnet2d (reference network/models.py:59-63 wraps
    `torchvision.models.resnet18/50(pretrained=True)`; key layout is
    torchvision's: conv1/bn1, layer{L}.{B}.conv{i}/bn{i}, downsample.0/1,
    fc)."""
    from istvt_tpu.models.resnet2d import LAYERS

    kind, layers = LAYERS[depth]
    n_convs = 3 if kind == "bottleneck" else 2
    p: Dict[str, Any] = {"conv1": {"w": conv_w(sd["conv1.weight"])}}
    s: Dict[str, Any] = {}
    p["bn1"], s["bn1"] = _bn(sd, "bn1")
    for li, n_blocks in enumerate(layers):
        lname = f"layer{li + 1}"
        p[lname], s[lname] = [], []
        for bi in range(n_blocks):
            pre = f"{lname}.{bi}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for ci in range(1, n_convs + 1):
                bp[f"conv{ci}"] = {"w": conv_w(sd[f"{pre}.conv{ci}.weight"])}
                bp[f"bn{ci}"], bs[f"bn{ci}"] = _bn(sd, f"{pre}.bn{ci}")
            if f"{pre}.downsample.0.weight" in sd:
                bp["down"] = {"w": conv_w(sd[f"{pre}.downsample.0.weight"])}
                bp["downbn"], bs["downbn"] = _bn(sd, f"{pre}.downsample.1")
            p[lname].append(bp)
            s[lname].append(bs)
    if "fc.weight" in sd:
        p["fc"] = {"w": linear_w(sd["fc.weight"]), "b": vec(sd["fc.bias"])}
    return p, s


def efficientnet_from_torch(sd: Mapping[str, Any]):
    """EfficientNet(_cdc) state_dict (reference network/efficientnet_cdc.py)
    -> (params, state). Depthwise convs: torch (C,1,kh,kw) -> HWIO (kh,kw,1,C)."""
    p: Dict[str, Any] = {"conv_stem": {"w": conv_w(sd["_conv_stem.weight"])}}
    s: Dict[str, Any] = {}
    p["bn0"], s["bn0"] = _bn(sd, "_bn0")
    p["blocks"], s["blocks"] = [], []
    i = 0
    while f"_blocks.{i}._depthwise_conv.weight" in sd:
        pre = f"_blocks.{i}"
        bp: Dict[str, Any] = {}
        bs: Dict[str, Any] = {}
        if f"{pre}._expand_conv.weight" in sd:
            bp["expand"] = {"w": conv_w(sd[f"{pre}._expand_conv.weight"])}
            bp["bn0"], bs["bn0"] = _bn(sd, f"{pre}._bn0")
        bp["dw"] = {"w": conv_w(sd[f"{pre}._depthwise_conv.weight"])}
        bp["bn1"], bs["bn1"] = _bn(sd, f"{pre}._bn1")
        bp["se_reduce"] = {"w": conv_w(sd[f"{pre}._se_reduce.weight"]),
                           "b": vec(sd[f"{pre}._se_reduce.bias"])}
        bp["se_expand"] = {"w": conv_w(sd[f"{pre}._se_expand.weight"]),
                           "b": vec(sd[f"{pre}._se_expand.bias"])}
        bp["project"] = {"w": conv_w(sd[f"{pre}._project_conv.weight"])}
        bp["bn2"], bs["bn2"] = _bn(sd, f"{pre}._bn2")
        p["blocks"].append(bp)
        s["blocks"].append(bs)
        i += 1
    p["conv_head"] = {"w": conv_w(sd["_conv_head.weight"])}
    p["bn1"], s["bn1"] = _bn(sd, "_bn1")
    if "_fc.weight" in sd:
        p["fc"] = {"w": linear_w(sd["_fc.weight"]), "b": vec(sd["_fc.bias"])}
    return p, s


def meso4_from_torch(sd: Mapping[str, Any]):
    """Meso4 state_dict (reference network/mesonet.py:11-64) -> (params,
    state). Shared bn1/bn2 convert once."""
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}
    for c in ("conv1", "conv2", "conv3", "conv4"):
        p[c] = {"w": conv_w(sd[f"{c}.weight"])}
    for bn in ("bn1", "bn2"):
        p[bn], s[bn] = _bn(sd, bn)
    for fc in ("fc1", "fc2"):
        p[fc] = {"w": linear_w(sd[f"{fc}.weight"]), "b": vec(sd[f"{fc}.bias"])}
    return p, s


def mesoinception4_from_torch(sd: Mapping[str, Any]):
    """MesoInception4 state_dict (reference mesonet.py:67-162)."""
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}
    for i, inc in ((1, "inc1"), (2, "inc2")):
        p[inc] = {
            "c1": {"w": conv_w(sd[f"Incption{i}_conv1.weight"])},
            "c2a": {"w": conv_w(sd[f"Incption{i}_conv2_1.weight"])},
            "c2b": {"w": conv_w(sd[f"Incption{i}_conv2_2.weight"])},
            "c3a": {"w": conv_w(sd[f"Incption{i}_conv3_1.weight"])},
            "c3b": {"w": conv_w(sd[f"Incption{i}_conv3_2.weight"])},
            "c4a": {"w": conv_w(sd[f"Incption{i}_conv4_1.weight"])},
            "c4b": {"w": conv_w(sd[f"Incption{i}_conv4_2.weight"])},
        }
        p[f"bn_{inc}"], s[f"bn_{inc}"] = _bn(sd, f"Incption{i}_bn")
    p["conv1"] = {"w": conv_w(sd["conv1.weight"])}
    p["conv2"] = {"w": conv_w(sd["conv2.weight"])}
    p["bn1"], s["bn1"] = _bn(sd, "bn1")
    for fc in ("fc1", "fc2"):
        p[fc] = {"w": linear_w(sd[f"{fc}.weight"]), "b": vec(sd[f"{fc}.bias"])}
    return p, s


def istvt_from_torch(sd: Mapping[str, Any], depth: int = 12):
    """Full XceptionVidTr (reference vivit.py:193-208): 'xcep.model.*' stem
    (TransferModel wraps Xception as .model, reference models_copy.py:40-47)
    + 'vit.*' DSTTr."""
    sd = dict(sd)
    xcep_sd = {}
    for k, v in sd.items():
        if k.startswith("xcep.model."):
            xcep_sd[k[len("xcep.model."):]] = v
        elif k.startswith("xcep."):
            xcep_sd[k[len("xcep."):]] = v
    vit_sd = {k[len("vit."):]: v for k, v in sd.items() if k.startswith("vit.")}
    xp, xs = xception_from_torch(xcep_sd)
    vp = dsttr_from_torch(vit_sd, depth=depth)
    return {"xcep": xp, "vit": vp}, {"xcep": xs}


# ---------------------------------------------------------------------------
# DualNet (reference network/dual_net.py:163-232)


def dualnet_xcep_state_dict(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Reference `get_xcep_state_dict` surgery (dual_net.py:280-287):
    2-D pointwise weights unsqueezed to 4-D convs, fc head stripped —
    the form a DualNet branch loads with strict=False. Returned torch-side
    (numpy) so it can seed either framework."""
    out = {}
    for k, v in sd.items():
        if "fc" in k or "last_linear" in k:
            continue
        a = _np(v)
        if "pointwise" in k and a.ndim == 2:
            a = a[:, :, None, None]
        out[k] = a
    return out


def seed_xception_branch(params, state, imagenet_sd: Mapping[str, Any]):
    """load_state_dict(strict=False) semantics (dual_net.py:192,199):
    overwrite every branch param whose torch counterpart exists AND shape-
    matches (conv1 differs when in_channels != 3; fc is stripped)."""
    donor_p, donor_s = xception_from_torch(dualnet_xcep_state_dict(imagenet_sd))

    def merge(ours, theirs):
        if isinstance(ours, dict):
            return {k: merge(v, theirs[k]) if k in theirs else v
                    for k, v in ours.items()}
        if isinstance(ours, list):
            return [merge(o, t) for o, t in zip(ours, theirs)]
        return theirs if getattr(theirs, "shape", None) == ours.shape else ours

    return merge(params, donor_p), merge(state, donor_s)


def dualnet_from_torch(sd: Mapping[str, Any]):
    """Convert a FULL reference DualNet state_dict (dual_net.py:163-232:
    FAD_head/LFS_head learnable band filters, two Xception branches,
    SequentialPolarizedSelfAttention fusion, fc(4096->1)) to our
    (params, state). DCT matrices / fixed band supports are buffers
    recomputed on device (models/dualnet.py), not loaded."""
    sd = dict(sd)
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}
    p["fad_head"] = {"learnable": [
        vec(sd[f"FAD_head.filters.{i}.learnable"]) for i in range(4)]}
    p["lfs_head"] = {"learnable": [
        vec(sd[f"LFS_head.filters.{i}.learnable"])
        for i in range(sum(1 for k in sd
                           if re.match(r"LFS_head\.filters\.\d+\.learnable$", k)))]}
    for branch, ours in (("FAD_xcep", "fad_xcep"), ("LFS_xcep", "lfs_xcep")):
        sub = {k[len(branch) + 1:]: v for k, v in sd.items()
               if k.startswith(branch + ".")}
        p[ours], s[ours] = xception_from_torch(sub)
        p[ours].pop("fc", None)  # branch heads unused (GAP-cat-fc instead)
    fu: Dict[str, Any] = {}
    for name in ("ch_wv", "ch_wq", "ch_wz", "sp_wv", "sp_wq"):
        fu[name] = {"w": conv_w(sd[f"fusion.{name}.weight"])}
        if f"fusion.{name}.bias" in sd:
            fu[name]["b"] = vec(sd[f"fusion.{name}.bias"])
    fu["ln"] = {"scale": vec(sd["fusion.ln.weight"]),
                "bias": vec(sd["fusion.ln.bias"])}
    p["fusion"] = fu
    p["fc"] = {"w": linear_w(sd["fc.weight"]), "b": vec(sd["fc.bias"])}
    return p, s


# ---------------------------------------------------------------------------
# I3D caffe2 checkpoint ingestion
# (reference network/resnet3d/utils/convert_weights.py:1-74)


_C2_SUFFIX = {"b": "bias", "w": "weight", "s": "weight",
              "rm": "running_mean", "riv": "running_var"}
_C2_DIRECT = {
    "conv1_w": "conv1.weight",
    "res_conv1_bn_s": "bn1.weight",
    "res_conv1_bn_b": "bn1.bias",
    "res_conv1_bn_rm": "bn1.running_mean",
    "res_conv1_bn_riv": "bn1.running_var",
    "pred_w": "fc.weight",
    "pred_b": "fc.bias",
}


def i3d_torch_keys_from_caffe2(blobs: Mapping[str, Any]) -> Dict[str, Any]:
    """Rename caffe2 I3D-R50(-NL) blobs to torch-module keys — the same
    regex mapping the reference's convert_weights.py builds (its key_map
    goes torch->c2; this is the forward application c2->torch)."""
    m2num = dict(zip("abc", [1, 2, 3]))
    conv_pat = re.compile(r"res(.)_(.)_branch2(.)_(.*)$")
    ds_pat = re.compile(r"res(.)_(.)_branch1_(.*)$")
    nl_pat = re.compile(r"nonlocal_conv(.)_(.)_(.*)_([^_]+)$")
    out: Dict[str, Any] = {}
    for key, val in blobs.items():
        if "momentum" in key:
            continue
        if key in _C2_DIRECT:
            out[_C2_DIRECT[key]] = val
            continue
        m = conv_pat.match(key)
        if m:
            layer, block, module, rest = m.groups()
            name = "bn" if rest.startswith("bn_") else "conv"
            suffix = _C2_SUFFIX[key.split("_")[-1]]
            out[f"layer{int(layer) - 1}.{block}.{name}"
                f"{m2num[module]}.{suffix}"] = val
            continue
        m = ds_pat.match(key)
        if m:
            layer, block, rest = m.groups()
            module = 0 if key.endswith("_w") else 1
            suffix = _C2_SUFFIX[key.split("_")[-1]]
            out[f"layer{int(layer) - 1}.{block}.downsample.{module}."
                f"{suffix}"] = val
            continue
        m = nl_pat.match(key)
        if m:
            layer, block, module, sfx = m.groups()
            out[f"layer{int(layer) - 1}.{block}.nl.{module}."
                f"{_C2_SUFFIX[sfx]}"] = val
    return out


def i3d_from_caffe2(blobs: Mapping[str, Any], layers=(3, 4, 6, 3)):
    """caffe2 pickle blobs (e.g. i3d_baseline_32x2_IN_pretrain_400k.pkl
    ['blobs']) -> our I3D (params, state), via the torch key renaming +
    resnet3d_from_torch."""
    return resnet3d_from_torch(i3d_torch_keys_from_caffe2(blobs), layers,
                               "i3d")
