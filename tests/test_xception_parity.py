"""Golden parity: our JAX Xception vs the reference torch Xception.

Loads the SAME weights into both (via compat.torch_import) and asserts
activations match to <=1e-3 (SURVEY.md §4 north-star; the idea generalizes
reference network/resnet3d/utils/layer_by_layer.py's caffe2-vs-torch check).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from istvt_tpu.compat.torch_import import xception_from_torch
from istvt_tpu.core import precision
from istvt_tpu.models import xception as jx

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def torch_xception(reference_path):
    import network.xception as rx

    m = rx.Xception(num_classes=1000)
    m.eval()
    # BN running stats default to (0, 1); randomize them so eval-mode
    # normalization is actually exercised.
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.copy_(torch.randn(mod.num_features, generator=g) * 0.1)
                mod.running_var.copy_(torch.rand(mod.num_features, generator=g) + 0.5)
                mod.weight.copy_(torch.randn(mod.num_features, generator=g) * 0.2 + 1)
                mod.bias.copy_(torch.randn(mod.num_features, generator=g) * 0.1)
    return m


@pytest.fixture(scope="module")
def jax_params(torch_xception):
    return xception_from_torch(torch_xception.state_dict())


def _input(shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


def test_low_level_features_parity(torch_xception, jax_params):
    x = _input((2, 3, 300, 300))
    with torch.no_grad():
        ref = torch_xception.low_level_features(torch.from_numpy(x)).numpy()
    p, s = jax_params
    with precision.highest():
        got, _ = jax.jit(lambda p, s, v: jx.low_level_features(p, s, v))(
            p, s, jnp.asarray(x.transpose(0, 2, 3, 1)))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == ref.shape == (2, 728, 19, 19)
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)


def test_full_forward_parity(torch_xception, jax_params):
    x = _input((2, 3, 300, 300), seed=1)
    tm = torch_xception
    tm.last_linear = tm.fc  # reference loader surgery (xception.py:403)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    p, s = jax_params
    with precision.highest():
        got, _ = jax.jit(lambda p, s, v: jx.forward(p, s, v))(
            p, s, jnp.asarray(x.transpose(0, 2, 3, 1)))
    got = np.asarray(got)
    assert got.shape == ref.shape == (2, 1000)
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-3)


def test_entry_flow_shapes(jax_params):
    p, s = jax_params
    x = jnp.zeros((1, 300, 300, 3))
    y, _ = jx.low_level_features(p, s, x)
    assert y.shape == (1, 19, 19, 728)
