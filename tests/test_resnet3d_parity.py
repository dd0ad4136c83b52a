"""Golden parity: 3D ResNets vs the PyTorch reference
(reference network/resnet_3d.py, network/resnet3d/models/resnet.py)."""
import numpy as np
import pytest

import jax.numpy as jnp

from istvt_tpu.compat.torch_import import resnet3d_from_torch
from istvt_tpu.core import precision
from istvt_tpu.models import resnet3d as r3d

torch = pytest.importorskip("torch")


def test_generic_resnet3d_10_parity(reference_path):
    import importlib
    ref = importlib.import_module("network.resnet_3d")
    torch.manual_seed(0)
    tm = ref.generate_model(10, n_classes=1).eval()
    params, state = resnet3d_from_torch(tm.state_dict(), (1, 1, 1, 1),
                                        "basic")
    _, _, cfg = r3d.init(torch_seed_key(), model_depth=10, n_classes=1)

    x = np.random.RandomState(0).randn(1, 3, 4, 32, 32).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(x)).numpy()
    xj = jnp.asarray(x.transpose(0, 2, 3, 4, 1))  # NCDHW -> NDHWC
    with precision.highest():
        got, _ = r3d.apply(params, state, xj, cfg, train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-3, rtol=1e-3)


def test_i3d_r50_nl_parity(reference_path):
    import importlib
    ref = importlib.import_module("network.resnet3d.models.resnet")
    torch.manual_seed(0)
    tm = ref.I3Res50(num_classes=4, use_nl=True).eval()
    params, state = resnet3d_from_torch(tm.state_dict(), (3, 4, 6, 3), "i3d")
    _, _, cfg = r3d.i3d_init(torch_seed_key(), num_classes=4, use_nl=True)

    x = np.random.RandomState(1).randn(1, 3, 8, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = tm.forward_single(torch.tensor(x)).numpy()
    xj = jnp.asarray(x.transpose(0, 2, 3, 4, 1))
    with precision.highest():
        got, _ = r3d.i3d_apply(params, state, xj, cfg, train=False, drop=0.0)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3, rtol=2e-3)


def torch_seed_key():
    import jax
    return jax.random.PRNGKey(0)


def test_i3d_forward_multi_shape():
    import jax
    params, state, cfg = r3d.i3d_init(jax.random.PRNGKey(0), num_classes=4)
    x = jnp.zeros((1, 2, 2, 8, 64, 64, 3))
    out = r3d.i3d_forward_multi(params, state, x, cfg)
    assert out.shape == (1, 4)


def test_registry_resnet3d():
    import jax
    from istvt_tpu.models.registry import model_selection
    m = model_selection("resnet3d_10", num_out_classes=1)
    p, s = m.init(jax.random.PRNGKey(0))
    out, _ = m.apply(p, s, jnp.zeros((1, 4, 32, 32, 3)), train=False)
    assert out.shape == (1, 1)
