"""Golden parity: MesoNet vs the PyTorch reference implementation
(reference network/mesonet.py), same weights via compat converters."""
import numpy as np
import pytest

import jax.numpy as jnp

from istvt_tpu.compat.torch_import import (
    meso4_from_torch,
    mesoinception4_from_torch,
)
from istvt_tpu.core import precision
from istvt_tpu.models import mesonet

torch = pytest.importorskip("torch")


def _load_ref(reference_path):
    import importlib
    import sys
    import types
    sys.path.insert(0, reference_path)
    # the reference imports torchvision (unused by MesoNet) — stub it
    sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    return importlib.import_module("network.mesonet")


@pytest.mark.parametrize("name", ["meso4", "mesoincep"])
def test_mesonet_logit_parity(reference_path, name):
    ref = _load_ref(reference_path)
    torch.manual_seed(0)
    if name == "meso4":
        tm = ref.Meso4(num_classes=2).eval()
        params, state = meso4_from_torch(tm.state_dict())
        apply_fn = mesonet.meso4_apply
    else:
        tm = ref.MesoInception4(num_classes=2).eval()
        params, state = mesoinception4_from_torch(tm.state_dict())
        apply_fn = mesonet.mesoinception4_apply

    x = np.random.RandomState(0).randn(2, 3, 256, 256).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(x)).numpy()
    with precision.highest():
        got, _ = apply_fn(params, state, jnp.asarray(x.transpose(0, 2, 3, 1)),
                          train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-3, rtol=1e-3)


def test_mesonet_registry():
    import jax
    from istvt_tpu.models.registry import model_selection
    m = model_selection("mesonet", num_out_classes=2)
    p, s = m.init(jax.random.PRNGKey(0))
    out, ns = m.apply(p, s, jnp.zeros((1, 256, 256, 3)), train=False)
    assert out.shape == (1, 2)
    m2 = model_selection("mesoincep", num_out_classes=2)
    p2, s2 = m2.init(jax.random.PRNGKey(0))
    out2, _ = m2.apply(p2, s2, jnp.zeros((1, 256, 256, 3)), train=False)
    assert out2.shape == (1, 2)
