"""Backbone parity: flax ResNet-101 / 3D ResNeXt-101 vs torch twins.

Torch twins are built inline from the published architectures (torchvision
V1 bottleneck ResNet; Kinetics 3D-ResNets ResNeXt with expansion 2,
cardinality 32). Random torch weights are ported through the state-dict
porting functions and outputs must agree — validating both the flax
architecture and the weight-porting path used for pretrained checkpoints.

Tiny layer counts (1,1,1,1) keep runtime low; the porting code is
layer-structured so correctness extends to (3,4,23,3).
"""

import pytest

import numpy as np
import torch
import torch.nn as nn

import jax.numpy as jnp

from dualvgr_tpu.models.backbones.resnet2d import ResNet101, port_resnet101_state_dict
from dualvgr_tpu.models.backbones.resnext3d import (
    ResNeXt101_3D,
    port_resnext101_state_dict,
)

pytestmark = pytest.mark.slow


class TorchBottleneck(nn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU()
        self.downsample = downsample

    def forward(self, x):
        r = self.downsample(x) if self.downsample is not None else x
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + r)


class TorchResNet(nn.Module):
    def __init__(self, layers):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make(64, layers[0], 1)
        self.layer2 = self._make(128, layers[1], 2)
        self.layer3 = self._make(256, layers[2], 2)
        self.layer4 = self._make(512, layers[3], 2)

    def _make(self, planes, blocks, stride):
        downsample = nn.Sequential(
            nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride, bias=False),
            nn.BatchNorm2d(planes * 4),
        )
        layers = [TorchBottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        layers += [TorchBottleneck(self.inplanes, planes) for _ in range(blocks - 1)]
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return x.mean(dim=(2, 3))


class TorchNeXtBlock3D(nn.Module):
    def __init__(self, inplanes, planes, cardinality=32, stride=1, downsample=None):
        super().__init__()
        mid = cardinality * (planes // 32)
        self.conv1 = nn.Conv3d(inplanes, mid, 1, bias=False)
        self.bn1 = nn.BatchNorm3d(mid)
        self.conv2 = nn.Conv3d(mid, mid, 3, stride=stride, padding=1, groups=cardinality, bias=False)
        self.bn2 = nn.BatchNorm3d(mid)
        self.conv3 = nn.Conv3d(mid, planes * 2, 1, bias=False)
        self.bn3 = nn.BatchNorm3d(planes * 2)
        self.relu = nn.ReLU()
        self.downsample = downsample

    def forward(self, x):
        r = self.downsample(x) if self.downsample is not None else x
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + r)


class TorchResNeXt3D(nn.Module):
    def __init__(self, layers, cardinality=32):
        super().__init__()
        self.inplanes = 64
        self.cardinality = cardinality
        self.conv1 = nn.Conv3d(3, 64, 7, stride=(1, 2, 2), padding=3, bias=False)
        self.bn1 = nn.BatchNorm3d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool3d(3, stride=2, padding=1)
        self.layer1 = self._make(128, layers[0], 1)
        self.layer2 = self._make(256, layers[1], 2)
        self.layer3 = self._make(512, layers[2], 2)
        self.layer4 = self._make(1024, layers[3], 2)

    def _make(self, planes, blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes * 2:
            downsample = nn.Sequential(
                nn.Conv3d(self.inplanes, planes * 2, 1, stride=stride, bias=False),
                nn.BatchNorm3d(planes * 2),
            )
        layers = [TorchNeXtBlock3D(self.inplanes, planes, self.cardinality, stride, downsample)]
        self.inplanes = planes * 2
        layers += [
            TorchNeXtBlock3D(self.inplanes, planes, self.cardinality)
            for _ in range(blocks - 1)
        ]
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return x.mean(dim=(2, 3, 4))


def _randomize_bn_stats(m):
    for mod in m.modules():
        if isinstance(mod, (nn.BatchNorm2d, nn.BatchNorm3d)):
            with torch.no_grad():
                mod.running_mean.normal_(0, 0.1)
                mod.running_var.uniform_(0.5, 1.5)
                mod.weight.normal_(1.0, 0.1)
                mod.bias.normal_(0, 0.1)


def test_resnet2d_port_matches_torch(rng):
    layers = (1, 1, 1, 1)
    torch.manual_seed(0)
    twin = TorchResNet(layers).eval()
    _randomize_bn_stats(twin)
    x = rng.rand(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = twin(torch.from_numpy(x)).numpy()

    variables = port_resnet101_state_dict(twin.state_dict(), layers=layers)
    model = ResNet101(layers=layers)
    got = np.asarray(
        model.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_resnext3d_port_matches_torch(rng):
    layers = (1, 1, 1, 1)
    torch.manual_seed(1)
    twin = TorchResNeXt3D(layers).eval()
    _randomize_bn_stats(twin)
    x = rng.rand(2, 3, 16, 32, 32).astype(np.float32) * 255.0  # raw pixels
    with torch.no_grad():
        want = twin(torch.from_numpy(x)).numpy()

    variables = port_resnext101_state_dict(twin.state_dict(), layers=layers)
    model = ResNeXt101_3D(layers=layers)
    got = np.asarray(
        model.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1))),
        )
    )
    np.testing.assert_allclose(got, want, atol=3e-3, rtol=1e-4)


def test_resnext3d_dataparallel_prefix(rng):
    layers = (1, 1, 1, 1)
    torch.manual_seed(2)
    twin = TorchResNeXt3D(layers).eval()
    sd = {"module." + k: v for k, v in twin.state_dict().items()}
    v1 = port_resnext101_state_dict(sd, layers=layers)
    v2 = port_resnext101_state_dict(twin.state_dict(), layers=layers)
    a = np.asarray(v1["params"]["conv1"]["kernel"])
    b = np.asarray(v2["params"]["conv1"]["kernel"])
    np.testing.assert_array_equal(a, b)


def test_grouped_conv3d_lowerings_agree(rng):
    """blockdiag == grouped == nn-style grouped conv, strided and not."""
    import jax
    import jax.numpy as jnp

    from dualvgr_tpu.models.backbones.resnext3d import GroupedConv3D

    for c, stride in ((64, 1), (64, 2)):
        x = jnp.asarray(rng.randn(2, 4, 6, 6, c).astype(np.float32))
        mods = {
            impl: GroupedConv3D(c, groups=32, stride=stride, impl=impl)
            for impl in ("grouped", "blockdiag", "auto")
        }
        v = mods["grouped"].init(jax.random.PRNGKey(0), x)
        outs = {impl: m.apply(v, x) for impl, m in mods.items()}
        np.testing.assert_allclose(
            np.asarray(outs["blockdiag"]), np.asarray(outs["grouped"]), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(outs["auto"]), np.asarray(outs["grouped"]), atol=1e-5
        )


def test_stem_conv3d_folds_match_base(rng):
    """s2d and t2d stem foldings == the direct 7x7x7 stride-(1,2,2) conv."""
    import jax
    import jax.numpy as jnp

    from dualvgr_tpu.models.backbones.resnext3d import StemConv3D

    auto = StemConv3D(8)
    base = StemConv3D(8, impl="base")
    # odd T: auto -> s2d
    x = jnp.asarray(rng.randn(2, 5, 16, 16, 3).astype(np.float32))
    v = base.init(jax.random.PRNGKey(1), x)
    np.testing.assert_allclose(
        np.asarray(auto.apply(v, x)), np.asarray(base.apply(v, x)), atol=1e-5
    )
    # even T: auto stays on s2d (t2d loses in-network — see the StemConv3D
    # docstring); both explicit foldings must still match the direct conv
    xe = jnp.asarray(rng.randn(2, 6, 16, 16, 3).astype(np.float32))
    want = np.asarray(base.apply(v, xe))
    np.testing.assert_allclose(np.asarray(auto.apply(v, xe)), want, atol=1e-5)
    for impl in ("s2d", "t2d"):
        np.testing.assert_allclose(
            np.asarray(StemConv3D(8, impl=impl).apply(v, xe)), want, atol=1e-5,
            err_msg=impl,
        )
    # explicit t2d with odd T falls back to s2d (even-T pair folding only)
    np.testing.assert_allclose(
        np.asarray(StemConv3D(8, impl="t2d").apply(v, x)),
        np.asarray(base.apply(v, x)), atol=1e-5,
    )
    # odd spatial dims fall back to the direct conv
    xo = jnp.asarray(rng.randn(2, 5, 15, 15, 3).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(auto.apply(v, xo)), np.asarray(base.apply(v, xo)), atol=1e-5
    )


def test_backbone_bf16_close_to_fp32(rng):
    import jax
    import jax.numpy as jnp

    from dualvgr_tpu.models.backbones.resnext3d import ResNeXt101_3D

    m = ResNeXt101_3D(layers=(1, 1, 1, 1))
    x = rng.randn(2, 4, 32, 32, 3).astype(np.float32)
    v = m.init(jax.random.PRNGKey(0), np.zeros((1, 4, 32, 32, 3), np.float32))
    a = m.apply(v, x)
    b = ResNeXt101_3D(layers=(1, 1, 1, 1), compute_dtype="bfloat16").apply(v, x)
    assert a.dtype == b.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-2)
