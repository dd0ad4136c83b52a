"""Golden parity: EfficientNet vs the reference's vendored implementation
(reference network/efficientnet_cdc.py, eval mode, same weights)."""
import numpy as np
import pytest

import jax.numpy as jnp

from istvt_tpu.compat.torch_import import efficientnet_from_torch
from istvt_tpu.core import precision
from istvt_tpu.models import efficientnet as effnet

torch = pytest.importorskip("torch")


def test_efficientnet_b0_logit_parity(reference_path):
    import importlib
    ref = importlib.import_module("network.efficientnet_cdc")
    torch.manual_seed(0)
    tm = ref.EfficientNet_cdc.from_name("efficientnet-b0").eval()
    tm.set_swish(memory_efficient=False)
    params, state = efficientnet_from_torch(tm.state_dict())
    _, _, cfg = effnet.init(__import__("jax").random.PRNGKey(0),
                            model_name="efficientnet-b0")

    x = np.random.RandomState(0).randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(x)).numpy()
    with precision.highest():
        got, _ = effnet.apply(params, state,
                              jnp.asarray(x.transpose(0, 2, 3, 1)), cfg,
                              train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3, rtol=2e-3)


def test_block_scaling_matches_reference_rounding():
    # b3: width 1.2 -> stem 40, head 1536 (reference round_filters)
    assert effnet.round_filters(32, 1.2) == 40
    assert effnet.round_filters(1280, 1.2) == 1536
    assert effnet.round_repeats(3, 1.4) == 5
    blocks = effnet.scaled_blocks("efficientnet-b3")
    assert blocks[0].input_filters == 40
    assert blocks[-1].output_filters == 384


def test_cdc_conv_formulation():
    """y_cdc = conv(x, W) - theta * conv(x, sum_kk W): check against an
    explicit loop-free numpy evaluation on a stride-1 SAME conv."""
    import jax
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 8, 3), jnp.float32)
    p = {"w": jnp.asarray(rng.randn(3, 3, 3, 4), jnp.float32)}
    y0 = effnet.same_conv(p, x, stride=1, cdc_theta=0.0)
    y1 = effnet.same_conv(p, x, stride=1, cdc_theta=0.7)
    assert not np.allclose(np.asarray(y0), np.asarray(y1))
    # the difference must equal 0.7 * (1x1 conv with the kernel sum),
    # up to the pad/crop alignment on the interior
    w_sum = jnp.sum(p["w"], axis=(0, 1), keepdims=True)
    diff_full = jnp.einsum("bhwc,ijco->bhwo", x, w_sum)
    got = np.asarray(y0 - y1)[:, 1:-1, 1:-1]
    want = 0.7 * np.asarray(diff_full)[:, 1:-1, 1:-1]
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_registry_efficientnet():
    import jax
    from istvt_tpu.models.registry import model_selection
    m = model_selection("efficientnet_cdc", num_out_classes=1)
    p, s = m.init(jax.random.PRNGKey(0))
    out, _ = m.apply(p, s, jnp.zeros((1, 64, 64, 3)), train=False)
    assert out.shape == (1, 1)
