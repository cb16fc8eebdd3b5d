"""3D CNN zoo: the reference's alternative Kinetics backbones in flax.

The reference ships four unused alternatives to the ResNeXt-101 motion
backbone (reference preprocess/models/{resnet,wide_resnet,pre_act_resnet,
densenet}.py, from the Kinetics 3D-ResNets collection). Provided here for
component-inventory completeness with the same constructor surface:

* ``resnet3d_10/18/34`` (BasicBlock) and ``resnet3d_50/101/152/200``
  (Bottleneck, expansion 4),
* ``wide_resnet3d_50(k=2)`` (WideBottleneck, expansion 2, planes x k),
* ``pre_act_resnet3d_*`` (pre-activation ordering: BN -> ReLU -> conv),
* ``densenet3d_121/169/201/264`` (growth 32, BN-ReLU-1x1-BN-ReLU-3x3 dense
  layers, avg-pool transitions).

Shared conventions with the live motion backbone (resnext3d.py): 7^3 stem
conv with stride (1, 2, 2), 3^3 max pool stride 2, type-B projection
shortcuts, global average pool, inference path in NDHWC, feature output
(``last_fc=False`` semantics). Shortcut type 'A' (zero-padded identity,
reference resnet.py:17-27) is also supported for the ResNet variants.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

_P3 = ((1, 1), (1, 1), (1, 1))


def _bn(name):
    return nn.BatchNorm(use_running_average=True, epsilon=1e-5, name=name)


def _shortcut_a(x, out_ch, stride):
    """Type-A shortcut: strided avg-pool + zero-padded channels
    (reference resnet.py:17-27)."""
    if stride != 1:
        x = nn.avg_pool(x, (1, 1, 1), strides=(stride,) * 3)
    pad = out_ch - x.shape[-1]
    if pad > 0:
        x = jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, pad),))
    return x


class BasicBlock3D(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    shortcut_type: str = "B"
    expansion: int = 1

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * self.expansion
        s = (self.stride,) * 3
        y = nn.Conv(self.planes, (3, 3, 3), strides=s, padding=_P3, use_bias=False, name="conv1")(x)
        y = nn.relu(_bn("bn1")(y))
        y = nn.Conv(self.planes, (3, 3, 3), padding=_P3, use_bias=False, name="conv2")(y)
        y = _bn("bn2")(y)
        if self.downsample:
            if self.shortcut_type == "A":
                r = _shortcut_a(x, out_ch, self.stride)
            else:
                r = nn.Conv(out_ch, (1, 1, 1), strides=s, use_bias=False, name="downsample_conv")(x)
                r = _bn("downsample_bn")(r)
        else:
            r = x
        return nn.relu(y + r)


class Bottleneck3D(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    shortcut_type: str = "B"
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * self.expansion
        s = (self.stride,) * 3
        y = nn.Conv(self.planes, (1, 1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(_bn("bn1")(y))
        y = nn.Conv(self.planes, (3, 3, 3), strides=s, padding=_P3, use_bias=False, name="conv2")(y)
        y = nn.relu(_bn("bn2")(y))
        y = nn.Conv(out_ch, (1, 1, 1), use_bias=False, name="conv3")(y)
        y = _bn("bn3")(y)
        if self.downsample:
            if self.shortcut_type == "A":
                r = _shortcut_a(x, out_ch, self.stride)
            else:
                r = nn.Conv(out_ch, (1, 1, 1), strides=s, use_bias=False, name="downsample_conv")(x)
                r = _bn("downsample_bn")(r)
        else:
            r = x
        return nn.relu(y + r)


class PreActBottleneck3D(nn.Module):
    """Pre-activation ordering (reference pre_act_resnet.py:62-99)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * self.expansion
        s = (self.stride,) * 3
        y = nn.relu(_bn("bn1")(x))
        y = nn.Conv(self.planes, (1, 1, 1), use_bias=False, name="conv1")(y)
        y = nn.relu(_bn("bn2")(y))
        y = nn.Conv(self.planes, (3, 3, 3), strides=s, padding=_P3, use_bias=False, name="conv2")(y)
        y = nn.relu(_bn("bn3")(y))
        y = nn.Conv(out_ch, (1, 1, 1), use_bias=False, name="conv3")(y)
        if self.downsample:
            r = nn.Conv(out_ch, (1, 1, 1), strides=s, use_bias=False, name="downsample_conv")(x)
        else:
            r = x
        return y + r


class ResNet3D(nn.Module):
    """Generic 3D ResNet feature extractor: (B, T, H, W, 3) -> (B, C)."""

    layers: Sequence[int] = (3, 4, 6, 3)
    block: str = "bottleneck"  # 'basic' | 'bottleneck' | 'preact_bottleneck'
    widen: int = 1  # wide_resnet k
    shortcut_type: str = "B"

    @nn.compact
    def __call__(self, x):
        blocks = {
            "basic": BasicBlock3D,
            "bottleneck": Bottleneck3D,
            "preact_bottleneck": PreActBottleneck3D,
        }
        block_cls = blocks[self.block]
        expansion = {"basic": 1, "bottleneck": 4, "preact_bottleneck": 4}[self.block]
        if self.widen > 1:
            expansion = 2  # WideBottleneck (reference wide_resnet.py:30-31)

        y = nn.Conv(64, (7, 7, 7), strides=(1, 2, 2), padding=((3, 3),) * 3, use_bias=False, name="conv1")(x)
        y = nn.relu(_bn("bn1")(y))
        y = nn.max_pool(y, (3, 3, 3), strides=(2, 2, 2), padding=_P3)
        inplanes = 64
        for stage, n in enumerate(self.layers):
            planes = 64 * (2 ** stage) * self.widen
            for b in range(n):
                stride = 2 if (stage > 0 and b == 0) else 1
                downsample = b == 0 and (stride != 1 or inplanes != planes * expansion)
                kwargs = dict(
                    planes=planes, stride=stride, downsample=downsample,
                    expansion=expansion, name=f"layer{stage + 1}_{b}",
                )
                if self.block != "preact_bottleneck":
                    kwargs["shortcut_type"] = self.shortcut_type
                y = block_cls(**kwargs)(y)
                inplanes = planes * expansion
        return jnp.mean(y, axis=(1, 2, 3))


class DenseNet3D(nn.Module):
    """3D DenseNet feature extractor (reference preprocess/models/densenet.py)."""

    block_config: Sequence[int] = (6, 12, 24, 16)  # densenet121
    growth_rate: int = 32
    num_init_features: int = 64
    bn_size: int = 4

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(
            self.num_init_features, (7, 7, 7), strides=(1, 2, 2),
            padding=((3, 3),) * 3, use_bias=False, name="conv0",
        )(x)
        y = nn.relu(_bn("norm0")(y))
        y = nn.max_pool(y, (3, 3, 3), strides=(2, 2, 2), padding=_P3)
        features = self.num_init_features
        for i, n_layers in enumerate(self.block_config):
            for j in range(n_layers):
                inp = y
                z = nn.relu(_bn(f"block{i}_layer{j}_norm1")(inp))
                z = nn.Conv(self.bn_size * self.growth_rate, (1, 1, 1), use_bias=False,
                            name=f"block{i}_layer{j}_conv1")(z)
                z = nn.relu(_bn(f"block{i}_layer{j}_norm2")(z))
                z = nn.Conv(self.growth_rate, (3, 3, 3), padding=_P3, use_bias=False,
                            name=f"block{i}_layer{j}_conv2")(z)
                y = jnp.concatenate([inp, z], axis=-1)
                features += self.growth_rate
            if i != len(self.block_config) - 1:
                y = nn.relu(_bn(f"transition{i}_norm")(y))
                features //= 2
                y = nn.Conv(features, (1, 1, 1), use_bias=False, name=f"transition{i}_conv")(y)
                y = nn.avg_pool(y, (2, 2, 2), strides=(2, 2, 2))
        y = nn.relu(_bn("norm_final")(y))
        return jnp.mean(y, axis=(1, 2, 3))


# ---- constructor surface mirroring the reference factories -----------------

def resnet3d_10(**kw):
    return ResNet3D(layers=(1, 1, 1, 1), block="basic", **kw)

def resnet3d_18(**kw):
    return ResNet3D(layers=(2, 2, 2, 2), block="basic", **kw)

def resnet3d_34(**kw):
    return ResNet3D(layers=(3, 4, 6, 3), block="basic", **kw)

def resnet3d_50(**kw):
    return ResNet3D(layers=(3, 4, 6, 3), block="bottleneck", **kw)

def resnet3d_101(**kw):
    return ResNet3D(layers=(3, 4, 23, 3), block="bottleneck", **kw)

def resnet3d_152(**kw):
    return ResNet3D(layers=(3, 8, 36, 3), block="bottleneck", **kw)

def resnet3d_200(**kw):
    return ResNet3D(layers=(3, 24, 36, 3), block="bottleneck", **kw)

def wide_resnet3d_50(k: int = 2, **kw):
    return ResNet3D(layers=(3, 4, 6, 3), block="bottleneck", widen=k, **kw)

def pre_act_resnet3d_50(**kw):
    return ResNet3D(layers=(3, 4, 6, 3), block="preact_bottleneck", **kw)

def pre_act_resnet3d_101(**kw):
    return ResNet3D(layers=(3, 4, 23, 3), block="preact_bottleneck", **kw)

def densenet3d_121(**kw):
    return DenseNet3D(block_config=(6, 12, 24, 16), **kw)

def densenet3d_169(**kw):
    return DenseNet3D(block_config=(6, 12, 32, 32), **kw)

def densenet3d_201(**kw):
    return DenseNet3D(block_config=(6, 12, 48, 32), **kw)

def densenet3d_264(**kw):
    return DenseNet3D(block_config=(6, 12, 64, 48), **kw)
