"""Golden parity: 2D ResNets (torchvision resnet18/50 architecture) vs a
torch-side reference.

The reference wraps `torchvision.models.resnet18/50(pretrained=True)`
(reference network/models.py:59-63). torchvision is not installed in this
environment, so the torch side is built here, module-for-module identical
to torchvision's ResNet (BasicBlock / Bottleneck-v1.5 with stride on
conv2, 7x7 s2 p3 stem, maxpool 3 s2 p1, avgpool, fc) — the state_dict key
layout matches torchvision's exactly, which is what
`compat.torch_import.resnet2d_from_torch` consumes."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from istvt_tpu.compat.torch_import import resnet2d_from_torch
from istvt_tpu.core import precision
from istvt_tpu.models import resnet2d as r2d

torch = pytest.importorskip("torch")
nn = torch.nn


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = None
        if stride != 1 or cin != planes:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes, 1, stride, bias=False),
                nn.BatchNorm2d(planes))

    def forward(self, x):
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        r = x if self.downsample is None else self.downsample(x)
        return torch.relu(y + r)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        # torchvision ResNet v1.5: stride lives on the 3x3
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = None
        if stride != 1 or cin != planes * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4))

    def forward(self, x):
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        r = x if self.downsample is None else self.downsample(x)
        return torch.relu(y + r)


class TorchResNet(nn.Module):
    def __init__(self, depth, num_classes=2):
        super().__init__()
        kind, layers = r2d.LAYERS[depth]
        block = Bottleneck if kind == "bottleneck" else BasicBlock
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        cin = 64
        for li, (n, planes) in enumerate(zip(layers, (64, 128, 256, 512))):
            blocks = []
            for bi in range(n):
                stride = 2 if (li > 0 and bi == 0) else 1
                blocks.append(block(cin, planes, stride))
                cin = planes * block.expansion
            setattr(self, f"layer{li + 1}", nn.Sequential(*blocks))
        self.fc = nn.Linear(cin, num_classes)

    def forward(self, x):
        y = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        for li in range(1, 5):
            y = getattr(self, f"layer{li}")(y)
        return self.fc(y.mean(dim=(2, 3)))


def _randomize_bn_stats(tm, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in tm.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                             generator=g) * 0.1)
            m.running_var.copy_(
                torch.rand(m.running_var.shape, generator=g) + 0.5)


@pytest.mark.parametrize("depth", [18, 50])
def test_resnet2d_parity(depth):
    torch.manual_seed(depth)
    tm = TorchResNet(depth, num_classes=2).eval()
    with torch.no_grad():
        _randomize_bn_stats(tm, seed=depth)
    params, state = resnet2d_from_torch(tm.state_dict(), depth)
    _, _, cfg = r2d.init(jax.random.PRNGKey(0), depth, 2)

    x = np.random.RandomState(1).randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(x)).numpy()
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))  # NCHW -> NHWC
    with precision.highest():
        got, _ = r2d.apply(params, state, xj, cfg, train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-3, rtol=1e-3)


def test_resnet2d_zoo_dropout_head():
    """Zoo builders carry the TransferModel Dropout->fc head (reference
    network/models.py:66-71): train-mode logits differ across rng, eval
    logits are deterministic."""
    from istvt_tpu.models.registry import model_selection

    m = model_selection("resnet18", num_out_classes=2, dropout=0.5)
    p, s = m.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3),
                    jnp.float32)
    e1, _ = m.apply(p, s, x, train=False)
    e2, _ = m.apply(p, s, x, train=False)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2))
    t1, _ = m.apply(p, s, x, train=True, rng=jax.random.PRNGKey(1))
    t2, _ = m.apply(p, s, x, train=True, rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(t1), np.asarray(t2))
