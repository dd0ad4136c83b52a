"""Golden parity: alt attention variants vs the reference torch modules
(network/vivit/module.py is importable — these run the ACTUAL reference
code with identical weights)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from istvt_tpu.compat.torch_import import linear_w, vec
from istvt_tpu.core import precision
from istvt_tpu.nn import attention as A

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_module(reference_path):
    import importlib
    return importlib.import_module("network.vivit.module")


def test_temporal_only_attention_parity(ref_module):
    torch.manual_seed(0)
    dim, heads, dim_head, t1, s = 32, 2, 8, 4, 362
    tm = ref_module.TemporalOnlyAttention(dim, heads=heads,
                                          dim_head=dim_head).eval()
    sd = tm.state_dict()
    p = {"to_qkv": {"w": linear_w(sd["to_qkv.weight"])},
         "to_out": {"w": linear_w(sd["to_out.0.weight"]),
                    "b": vec(sd["to_out.0.bias"])}}
    x = np.random.RandomState(0).randn(1, t1 * s, dim).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(x)).numpy()
    with precision.highest():
        got = A.temporal_only_attention(p, jnp.asarray(x), heads, s)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)


def test_temporal_residual_attention_parity(ref_module):
    torch.manual_seed(1)
    dim, heads, dim_head, t1, s = 32, 2, 8, 4, 362
    tm = ref_module.TemporalResidualAttention(dim, heads=heads,
                                              dim_head=dim_head).eval()
    sd = tm.state_dict()
    p = {"to_qk": {"w": linear_w(sd["to_qk.weight"])},
         "to_v": {"w": linear_w(sd["to_v.weight"])},
         "to_out": {"w": linear_w(sd["to_out.0.weight"]),
                    "b": vec(sd["to_out.0.bias"])}}
    x = np.random.RandomState(1).randn(1, t1 * s, dim).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(x)).numpy()
    with precision.highest():
        got = A.temporal_residual_attention(p, jnp.asarray(x), heads, s)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)


def test_spatial_only_attention_parity(ref_module):
    torch.manual_seed(2)
    dim, heads, dim_head, t1, s = 32, 2, 8, 3, 362
    tm = ref_module.SpatialOnlyAttention(dim, heads=heads,
                                         dim_head=dim_head).eval()
    sd = tm.state_dict()
    p = {"to_qkv": {"w": linear_w(sd["to_qkv.weight"])},
         "to_out": {"w": linear_w(sd["to_out.0.weight"]),
                    "b": vec(sd["to_out.0.bias"])}}
    x = np.random.RandomState(2).randn(1, t1 * s, dim).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(x)).numpy()
    with precision.highest():
        got = A.spatial_only_attention(p, jnp.asarray(x), heads, s)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)


def test_re_attention_parity(ref_module):
    torch.manual_seed(3)
    dim, heads, dim_head = 32, 4, 8
    tm = ref_module.ReAttention(dim, heads=heads, dim_head=dim_head).eval()
    sd = tm.state_dict()
    p = {"to_qkv": {"w": linear_w(sd["to_qkv.weight"])},
         "reattn_weights": vec(sd["reattn_weights"]),
         "reattn_norm_scale": vec(sd["reattn_norm.1.weight"]),
         "reattn_norm_bias": vec(sd["reattn_norm.1.bias"])}
    x = np.random.RandomState(3).randn(2, 9, dim).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(x)).numpy()
    with precision.highest():
        got = A.re_attention(p, jnp.asarray(x), heads)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)


def test_lc_attention_parity(ref_module):
    torch.manual_seed(4)
    dim, heads, dim_head = 32, 2, 8
    tm = ref_module.LCAttention(dim, heads=heads, dim_head=dim_head).eval()
    sd = tm.state_dict()
    p = {"to_qkv": {"w": linear_w(sd["to_qkv.weight"])},
         "to_out": {"w": linear_w(sd["to_out.0.weight"]),
                    "b": vec(sd["to_out.0.bias"])}}
    x = np.random.RandomState(4).randn(2, 9, dim).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(x)).numpy()
    with precision.highest():
        got = A.lc_attention(p, jnp.asarray(x), heads)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)


def test_local_spatial_attention_parity(ref_module):
    torch.manual_seed(5)
    dim, heads, dim_head = 16, 2, 8
    tm = ref_module.LocalSpatialAttention(dim, heads=heads,
                                          dim_head=dim_head).eval()
    sd = tm.state_dict()
    p = {"to_qkv": {"w": linear_w(sd["to_qkv.weight"])},
         "to_out": {"w": linear_w(sd["to_out.0.weight"]),
                    "b": vec(sd["to_out.0.bias"])}}
    # reference module.py:117-118 squeeze() crashes at batch 1 and reads
    # patch 0 as the "CLS"; b=2 + reference_bug_compat mirrors it exactly
    t1, s = 2, 19 * 19 + 1
    x = np.random.RandomState(5).randn(2, t1 * s, dim).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(x)).numpy()
    with precision.highest():
        got = A.local_spatial_attention(p, jnp.asarray(x), heads, grid=19,
                                        reference_bug_compat=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-3, rtol=1e-3)


def test_leff_parity(ref_module):
    torch.manual_seed(6)
    dim, scale, grid = 16, 4, 14
    tm = ref_module.LeFF(dim=dim, scale=scale).eval()
    sd = tm.state_dict()
    from istvt_tpu.compat.torch_import import conv_w
    p = {"up": {"w": linear_w(sd["up_proj.0.weight"]),
                "b": vec(sd["up_proj.0.bias"])},
         "dw": {"w": conv_w(sd["depth_conv.0.weight"])},
         "down": {"w": linear_w(sd["down_proj.0.weight"]),
                  "b": vec(sd["down_proj.0.bias"])}}
    s = {}
    p["bn1"] = {"scale": vec(sd["up_proj.2.weight"]),
                "bias": vec(sd["up_proj.2.bias"])}
    s["bn1"] = {"mean": vec(sd["up_proj.2.running_mean"]),
                "var": vec(sd["up_proj.2.running_var"])}
    p["bn2"] = {"scale": vec(sd["depth_conv.1.weight"]),
                "bias": vec(sd["depth_conv.1.bias"])}
    s["bn2"] = {"mean": vec(sd["depth_conv.1.running_mean"]),
                "var": vec(sd["depth_conv.1.running_var"])}
    p["bn3"] = {"scale": vec(sd["down_proj.2.weight"]),
                "bias": vec(sd["down_proj.2.bias"])}
    s["bn3"] = {"mean": vec(sd["down_proj.2.running_mean"]),
                "var": vec(sd["down_proj.2.running_var"])}
    x = np.random.RandomState(6).randn(2, grid * grid, dim).astype(
        np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(x)).numpy()
    with precision.highest():
        got, _ = A.leff(p, s, jnp.asarray(x), grid=grid)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)
