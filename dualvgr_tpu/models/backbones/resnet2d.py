"""ResNet-101 (torchvision V1 architecture) in flax — appearance backbone.

The reference extracts per-frame appearance features with torchvision's
pretrained ResNet-101, FC stripped, output (B, 2048)
(reference preprocess/preprocess_features.py:19-28, 44-64).

This is an inference-path implementation (BatchNorm uses ported running
stats) in NHWC layout — the TPU-native conv layout. ``port_resnet101_state_dict``
maps a torchvision ``resnet101().state_dict()`` onto the flax variables so
pretrained weights drop in; tests validate the port against a torch twin
with random weights (tests/test_backbones.py).
"""

from __future__ import annotations

import functools
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class _TypedNN:
    """Partial-application shim: `nn.Conv`/`nn.BatchNorm` with the module's
    compute dtype bound, everything else passed through. Lets the layer
    bodies read exactly as before while honoring ``compute_dtype``."""

    def __init__(self, dtype):
        self._dtype = dtype

    def __getattr__(self, name):
        attr = getattr(nn, name)
        if self._dtype is not None and name in ("Conv", "BatchNorm"):
            return functools.partial(attr, dtype=self._dtype)
        return attr


@functools.lru_cache(maxsize=None)
def _typed(compute_dtype: str) -> _TypedNN:
    return _TypedNN(None if compute_dtype == "float32" else jnp.dtype(compute_dtype))


class Bottleneck(nn.Module):
    """torchvision V1 bottleneck: 1x1 -> 3x3 (stride here) -> 1x1, expansion 4."""

    planes: int
    stride: int = 1
    downsample: bool = False
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        nn = _typed(self.compute_dtype)
        residual = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)), use_bias=False, name="conv2",
        )(y)
        y = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=False, name="conv3")(y)
        y = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn3")(y)
        if self.downsample:
            residual = nn.Conv(
                self.planes * 4, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="downsample_conv",
            )(x)
            residual = nn.BatchNorm(
                use_running_average=True, epsilon=1e-5, name="downsample_bn"
            )(residual)
        return nn.relu(y + residual)


class ResNet101(nn.Module):
    """Feature extractor: (B, H, W, 3) NHWC float -> (B, 2048).

    ``compute_dtype="bfloat16"`` runs every conv + BN in bf16 (params stay
    fp32; flax casts per call) — the inference mixed-precision path for
    offline extraction; the output feature is cast back to the input dtype.
    """

    layers: Sequence[int] = (3, 4, 23, 3)
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        in_dtype = x.dtype
        nn = _typed(self.compute_dtype)
        y = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
            use_bias=False, name="conv1",
        )(x)
        y = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn1")(y)
        y = nn.relu(y)
        # torch MaxPool2d(3, stride=2, padding=1)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        planes = (64, 128, 256, 512)
        for stage, (p, n) in enumerate(zip(planes, self.layers)):
            for block in range(n):
                stride = 2 if (stage > 0 and block == 0) else 1
                downsample = block == 0  # first block always projects (even stage 0: 64->256)
                y = Bottleneck(
                    p, stride=stride, downsample=downsample,
                    compute_dtype=self.compute_dtype,
                    name=f"layer{stage + 1}_{block}",
                )(y)
        # global average pool -> (B, 2048); fp32 reduction + output
        return jnp.mean(y.astype(in_dtype), axis=(1, 2))


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _bn(params, stats, sd, prefix):
    params["scale"] = np.asarray(sd[f"{prefix}.weight"])
    params["bias"] = np.asarray(sd[f"{prefix}.bias"])
    stats["mean"] = np.asarray(sd[f"{prefix}.running_mean"])
    stats["var"] = np.asarray(sd[f"{prefix}.running_var"])


def port_resnet101_state_dict(sd: dict, layers=(3, 4, 23, 3)) -> dict:
    """torchvision resnet101 state_dict -> flax variables for ResNet101."""
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v)) for k, v in sd.items()}
    params: dict = {}
    stats: dict = {}

    params["conv1"] = {"kernel": _conv_kernel(sd["conv1.weight"])}
    params["bn1"], stats["bn1"] = {}, {}
    _bn(params["bn1"], stats["bn1"], sd, "bn1")
    for stage, n in enumerate(layers, start=1):
        for block in range(n):
            name = f"layer{stage}_{block}"
            t = f"layer{stage}.{block}"
            p: dict = {}
            s: dict = {}
            for i in (1, 2, 3):
                p[f"conv{i}"] = {"kernel": _conv_kernel(sd[f"{t}.conv{i}.weight"])}
                p[f"bn{i}"], s[f"bn{i}"] = {}, {}
                _bn(p[f"bn{i}"], s[f"bn{i}"], sd, f"{t}.bn{i}")
            if f"{t}.downsample.0.weight" in sd:
                p["downsample_conv"] = {
                    "kernel": _conv_kernel(sd[f"{t}.downsample.0.weight"])
                }
                p["downsample_bn"], s["downsample_bn"] = {}, {}
                _bn(p["downsample_bn"], s["downsample_bn"], sd, f"{t}.downsample.1")
            params[name] = p
            stats[name] = s

    return {"params": params, "batch_stats": stats}


# the reference's ImageNet normalization — INCLUDING its std blue-channel
# typo 0.224 (should be 0.225; preprocess_features.py:53). Reproduced for
# bit-compatible features.
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD_REF = np.array([0.229, 0.224, 0.224], np.float32)
