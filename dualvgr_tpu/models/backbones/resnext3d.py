"""3D ResNeXt-101 (Kinetics) in flax — motion backbone.

Architecture per the reference's Kinetics 3D-ResNets zoo
(reference preprocess/models/resnext.py:30-138): ResNeXtBottleneck with
expansion 2 and cardinality 32, layers [3, 4, 23, 3], 7^3 stem conv with
stride (1, 2, 2), 3^3 max pool stride 2, stage planes 128/256/512/1024,
type-B (projection) shortcuts, global average pool; with ``last_fc=False``
the output is the pooled 2048-d feature the reference extracts
(preprocess_features.py:31-41, 182-186).

Inference path in NDHWC layout. ``port_resnext101_state_dict`` maps the
Kinetics checkpoint state_dict (with DataParallel ``module.`` prefixes,
preprocess_features.py:38-39) onto the flax variables.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

_P3 = ((1, 1), (1, 1), (1, 1))


class ResNeXtBottleneck3D(nn.Module):
    """1x1x1 -> grouped 3x3x3 (stride here) -> 1x1x1, expansion 2."""

    planes: int
    cardinality: int = 32
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        mid = self.cardinality * (self.planes // 32)
        s = (self.stride,) * 3
        residual = x
        y = nn.Conv(mid, (1, 1, 1), use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            mid, (3, 3, 3), strides=s, padding=_P3,
            feature_group_count=self.cardinality, use_bias=False, name="conv2",
        )(y)
        y = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes * 2, (1, 1, 1), use_bias=False, name="conv3")(y)
        y = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn3")(y)
        if self.downsample:
            residual = nn.Conv(
                self.planes * 2, (1, 1, 1), strides=s, use_bias=False,
                name="downsample_conv",
            )(x)
            residual = nn.BatchNorm(
                use_running_average=True, epsilon=1e-5, name="downsample_bn"
            )(residual)
        return nn.relu(y + residual)


class ResNeXt101_3D(nn.Module):
    """(B, T, H, W, 3) NDHWC float -> (B, 2048)."""

    layers: Sequence[int] = (3, 4, 23, 3)
    cardinality: int = 32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(
            64, (7, 7, 7), strides=(1, 2, 2), padding=((3, 3), (3, 3), (3, 3)),
            use_bias=False, name="conv1",
        )(x)
        y = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn1")(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3, 3), strides=(2, 2, 2), padding=_P3)
        planes = (128, 256, 512, 1024)
        inplanes = 64
        for stage, (p, n) in enumerate(zip(planes, self.layers)):
            for block in range(n):
                stride = 2 if (stage > 0 and block == 0) else 1
                downsample = block == 0 and (stride != 1 or inplanes != p * 2)
                y = ResNeXtBottleneck3D(
                    p, cardinality=self.cardinality, stride=stride,
                    downsample=downsample, name=f"layer{stage + 1}_{block}",
                )(y)
                inplanes = p * 2
        return jnp.mean(y, axis=(1, 2, 3))  # (B, 2048)


def _conv_kernel3d(w: np.ndarray) -> np.ndarray:
    """torch (O, I/g, T, H, W) -> flax (T, H, W, I/g, O)."""
    return np.transpose(w, (2, 3, 4, 1, 0))


def _bn(params, stats, sd, prefix):
    params["scale"] = np.asarray(sd[f"{prefix}.weight"])
    params["bias"] = np.asarray(sd[f"{prefix}.bias"])
    stats["mean"] = np.asarray(sd[f"{prefix}.running_mean"])
    stats["var"] = np.asarray(sd[f"{prefix}.running_var"])


def port_resnext101_state_dict(sd: dict, layers=(3, 4, 23, 3)) -> dict:
    """Kinetics resnext-101 state_dict (optionally 'module.'-prefixed from
    nn.DataParallel) -> flax variables for ResNeXt101_3D."""
    sd = {
        k[len("module."):] if k.startswith("module.") else k: (
            v.numpy() if hasattr(v, "numpy") else np.asarray(v)
        )
        for k, v in sd.items()
    }
    params: dict = {"conv1": {"kernel": _conv_kernel3d(sd["conv1.weight"])}}
    stats: dict = {}
    params["bn1"], stats["bn1"] = {}, {}
    _bn(params["bn1"], stats["bn1"], sd, "bn1")

    for stage, n in enumerate(layers, start=1):
        for block in range(n):
            name = f"layer{stage}_{block}"
            t = f"layer{stage}.{block}"
            p: dict = {}
            s: dict = {}
            for i in (1, 2, 3):
                p[f"conv{i}"] = {"kernel": _conv_kernel3d(sd[f"{t}.conv{i}.weight"])}
                p[f"bn{i}"], s[f"bn{i}"] = {}, {}
                _bn(p[f"bn{i}"], s[f"bn{i}"], sd, f"{t}.bn{i}")
            if f"{t}.downsample.0.weight" in sd:
                p["downsample_conv"] = {
                    "kernel": _conv_kernel3d(sd[f"{t}.downsample.0.weight"])
                }
                p["downsample_bn"], s["downsample_bn"] = {}, {}
                _bn(p["downsample_bn"], s["downsample_bn"], sd, f"{t}.downsample.1")
            params[name] = p
            stats[name] = s
    return {"params": params, "batch_stats": stats}
