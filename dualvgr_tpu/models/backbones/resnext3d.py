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
import jax
import jax.numpy as jnp
import numpy as np

from dualvgr_tpu.models.backbones.resnet2d import _typed

_P3 = ((1, 1), (1, 1), (1, 1))


class GroupedConv3D(nn.Module):
    """Cardinality-G 3x3x3 conv with a TPU-measured lowering choice.

    The parameter keeps the grouped shape (3, 3, 3, C/G, C) — checkpoint
    ports are unchanged — but the forward may run it as a DENSE conv with
    a block-diagonal kernel: XLA's grouped-conv path collapses at small
    group widths (measured ~1% MXU at width 4; benchmarks/groupedconv_probe.py),
    where the dense lowering is 3.6x faster at layer1 and ~2.8x on the
    strided blocks DESPITE doing G times the multiply-adds. Zero blocks
    contribute exact zeros, so the result is bit-comparable.

    impl="auto" picks per the probe: block-diagonal iff width <= 4
    (C <= 128) or (strided and C <= 512); grouped otherwise (stride-1
    blocks at width >= 8 run fine grouped: 0.05-0.10 ms).
    """

    features: int
    groups: int = 32
    stride: int = 1
    impl: str = "auto"  # "auto" | "grouped" | "blockdiag"
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        g = self.groups
        w_in = c_in // g
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, 3, w_in, self.features),
        )
        if self.compute_dtype != "float32":
            dt = jnp.dtype(self.compute_dtype)
            x, kernel = x.astype(dt), kernel.astype(dt)
        impl = self.impl
        if impl == "auto":
            # in-situ prefix timing showed the strided 512-channel block is
            # FASTER grouped inside the full network (layer3 delta 2.49 ms
            # grouped vs 3.19 ms blockdiag) even though the isolated op
            # measured the other way — layout transitions dominate there
            blockdiag = (c_in <= 128) or (self.stride > 1 and c_in <= 256)
            impl = "blockdiag" if blockdiag else "grouped"
        dn = ("NDHWC", "DHWIO", "NDHWC")
        if impl == "blockdiag":
            w_out = self.features // g
            eye = jnp.eye(g, dtype=kernel.dtype)
            # kd[p, h, i, g', j] = kernel[p, i, g', j] * eye[h, g']
            kd = eye[None, :, None, :, None] * kernel.reshape(
                27, 1, w_in, g, w_out
            )
            kd = kd.reshape(3, 3, 3, g * w_in, self.features)
            return jax.lax.conv_general_dilated(
                x, kd, (self.stride,) * 3, _P3, dimension_numbers=dn
            )
        return jax.lax.conv_general_dilated(
            x, kernel, (self.stride,) * 3, _P3,
            dimension_numbers=dn, feature_group_count=g,
        )


class StemConv3D(nn.Module):
    """The 7x7x7 stride-(1,2,2) stem conv from 3 input channels.

    Parameter shape stays (7, 7, 7, 3, features) (checkpoint-port
    compatible) but the forward folds strides/taps into channels to fill
    the 128-lane MXU (C_in=3 fills 3/128 lanes directly):

    * SPACE-TO-DEPTH: the HxW stride-2 folds into channels ((..., H, W, 3)
      -> (..., H/2, W/2, 12)); the 7x7 spatial taps become 4x4 on the
      folded grid (tap dh lives at folded (R, pr) with dh = 2R + pr - 1;
      the one invalid slot is zero). Measured 9.09 -> 6.60 ms at batch 32
      (benchmarks/stem_probe.py).
    * TIME-TO-DEPTH on top (impl="t2d", NOT picked by "auto"): padded
      input-T pairs fold into channels (12 -> 24) and output-T pairs into
      output channels (F -> 2F), so the 7 T-taps become 4 folded taps
      (kt = 2*ft + pt - q; one invalid slot per output parity q). The conv
      is then (4, 4, 4) from 24 channels: K = 4*4*4*24 = 1536 = 12 exact
      128-lane tiles and N = 2F = 128 exact, at 8/7 the FLOPs — it
      sidesteps the measured XLA collapse on 7-tap 3D convs and wins the
      ISOLATED stem timing (6.60 -> 5.40 ms fp32 / 4.65 bf16 at batch 32,
      benchmarks/stem_probe.py) but LOSES inside the full network at the
      production batch (interleaved same-process A/B at batch 128,
      benchmarks/extraction_bench.py --stem-ab: 2,149 -> 1,921 clips/s
      fp32, 2,935 -> 2,767 bf16) — the output's (t-pair, channel-parity)
      un-interleave transpose breaks the stem->bn->relu->maxpool fusion
      that the s2d layout gets for free. "auto" therefore stays on s2d;
      t2d remains selectable and parity-tested.

    All foldings are exact to fp round-off (stem_probe verifies against
    the direct conv on device; tests/test_backbones.py on CPU). impl
    "auto" picks s2d when H, W are even, falling back to the direct conv
    otherwise.
    """

    features: int = 64
    compute_dtype: str = "float32"
    impl: str = "auto"  # "auto" | "t2d" | "s2d" | "base"

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (7, 7, 7, 3, self.features)
        )
        if self.compute_dtype != "float32":
            dt = jnp.dtype(self.compute_dtype)
            x, kernel = x.astype(dt), kernel.astype(dt)
        b, t, h, w, c = x.shape
        f = self.features
        dn = ("NDHWC", "DHWIO", "NDHWC")
        impl = self.impl
        if impl == "auto":
            impl = "base" if (h % 2 or w % 2) else "s2d"
        if impl == "t2d" and t % 2:
            impl = "s2d"  # T-pair folding needs even T
        if impl == "base":
            return jax.lax.conv_general_dilated(
                x, kernel, (1, 2, 2), [(3, 3)] * 3, dimension_numbers=dn
            )
        # fold 2x2 spatial into channels, layout (pr, pc, ch)
        xf = x.reshape(b, t, h // 2, 2, w // 2, 2, c)
        xf = xf.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, t, h // 2, w // 2, 4 * c)
        # kernel: gather dh = 2R + pr - 1 via a zero-padded tap axis
        kp = jnp.pad(kernel, ((0, 0), (1, 0), (1, 0), (0, 0), (0, 0)))
        idx = jnp.arange(8).reshape(4, 2)  # [R, pr] -> dh + 1
        kd = kp[:, idx][:, :, :, idx]  # (7, 4, 2, 4, 2, 3, F)
        kd = kd.transpose(0, 1, 3, 2, 4, 5, 6).reshape(7, 4, 4, 4 * c, f)
        if impl == "s2d":
            return jax.lax.conv_general_dilated(
                xf, kd, (1, 1, 1), [(3, 3), (2, 1), (2, 1)], dimension_numbers=dn
            )
        # t2d: fold padded-T pairs into channels and output-T parity into
        # output channels; kt2[ft, ., ., (pt, ci), (q, co)] = kd[2ft+pt-q]
        # (gathered via a zero-padded tap axis: index j <-> kt = j - 1)
        kq = jnp.pad(kd, ((1, 1), (0, 0), (0, 0), (0, 0), (0, 0)))  # (9,4,4,4c,F)
        tap = (
            2 * jnp.arange(4)[:, None, None]
            + jnp.arange(2)[None, :, None]
            - jnp.arange(2)[None, None, :]
            + 1
        )  # (ft, pt, q) -> padded tap index in 0..8
        kt2 = kq[tap]  # (4, 2, 2, 4, 4, 4c, F)
        kt2 = kt2.transpose(0, 3, 4, 1, 5, 2, 6).reshape(4, 4, 4, 8 * c, 2 * f)
        xp = jnp.pad(xf, ((0, 0), (3, 3), (0, 0), (0, 0), (0, 0)))
        x2 = xp.reshape(b, (t + 6) // 2, 2, h // 2, w // 2, 4 * c)
        x2 = x2.transpose(0, 1, 3, 4, 2, 5).reshape(
            b, (t + 6) // 2, h // 2, w // 2, 8 * c
        )
        y = jax.lax.conv_general_dilated(
            x2, kt2, (1, 1, 1), [(0, 0), (2, 1), (2, 1)], dimension_numbers=dn
        )  # (b, t/2, h/2', w/2', 2F)
        y = y.reshape(b, t // 2, h // 2, w // 2, 2, f)
        return y.transpose(0, 1, 4, 2, 3, 5).reshape(b, t, h // 2, w // 2, f)


class ResNeXtBottleneck3D(nn.Module):
    """1x1x1 -> grouped 3x3x3 (stride here) -> 1x1x1, expansion 2."""

    planes: int
    cardinality: int = 32
    stride: int = 1
    downsample: bool = False
    compute_dtype: str = "float32"
    conv2_impl: str = "auto"

    @nn.compact
    def __call__(self, x):
        nn = _typed(self.compute_dtype)
        mid = self.cardinality * (self.planes // 32)
        s = (self.stride,) * 3
        residual = x
        y = nn.Conv(mid, (1, 1, 1), use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn1")(y)
        y = nn.relu(y)
        y = GroupedConv3D(
            mid, self.cardinality, self.stride, self.conv2_impl,
            compute_dtype=self.compute_dtype, name="conv2",
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
    """(B, T, H, W, 3) NDHWC float -> (B, 2048).

    ``max_stages`` truncates after the stem (0) or stage N in {1..4} —
    used by benchmarks to attribute per-stage cost; 4 = the full network.
    """

    layers: Sequence[int] = (3, 4, 23, 3)
    cardinality: int = 32
    max_stages: int = 4
    compute_dtype: str = "float32"
    # lowering overrides ("auto" = the TPU-measured heuristics; "grouped" /
    # "base" = the reference-shaped direct lowerings, used e.g. to compute
    # the honest useful-FLOPs denominator for MFU)
    conv2_impl: str = "auto"
    stem_impl: str = "auto"

    @nn.compact
    def __call__(self, x):
        in_dtype = x.dtype
        nn = _typed(self.compute_dtype)
        y = StemConv3D(64, self.compute_dtype, self.stem_impl, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn1")(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3, 3), strides=(2, 2, 2), padding=_P3)
        planes = (128, 256, 512, 1024)
        inplanes = 64
        for stage, (p, n) in enumerate(zip(planes, self.layers)):
            if stage >= self.max_stages:
                break
            for block in range(n):
                stride = 2 if (stage > 0 and block == 0) else 1
                downsample = block == 0 and (stride != 1 or inplanes != p * 2)
                y = ResNeXtBottleneck3D(
                    p, cardinality=self.cardinality, stride=stride,
                    downsample=downsample, compute_dtype=self.compute_dtype,
                    conv2_impl=self.conv2_impl,
                    name=f"layer{stage + 1}_{block}",
                )(y)
                inplanes = p * 2
        # fp32 pool reduction + output regardless of compute dtype
        return jnp.mean(y.astype(in_dtype), axis=(1, 2, 3))  # (B, C)


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
