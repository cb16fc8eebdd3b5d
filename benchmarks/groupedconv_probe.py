"""Probe: where the 3D ResNeXt motion backbone's time actually goes, and
which grouped-conv lowering is fastest at each real shape.

The r2 diagnosis ("cardinality-32 grouped convs map poorly to the 128-lane
MXU") fixed the symptom (9.9% MFU) but not the split: the bottleneck could
be the grouped 3x3x3 convs, the dense 1x1x1 convs at small spatial extents,
or elementwise/BN bandwidth. This probe times, on the real chip:

  1. each stage of the backbone in isolation (stem, layer1..4, pool),
  2. the grouped conv at each stage's real shape under candidate lowerings:
       a. nn.Conv feature_group_count (the current implementation)
       b. dense conv with a block-diagonal kernel (32x the FLOPs, but
          dense convs hit the MXU's fast path)
       c. group-batched einsum over unfolded 3-tap slabs (contraction
          spans taps x group width; spatial rides the lane dim)
  3. fp32 vs bf16 for the whole backbone.

Prints one JSON dict. Run alone (single-tenant chip):
    python benchmarks/groupedconv_probe.py [--clips 32] [--steps 10]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_time(fn, x, steps):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(x, n):
        def body(i, carry):
            acc, eps = carry
            out = fn(x + eps)
            s = out.sum().astype(jnp.float32)
            return acc + s, (s * 1e-30).astype(x.dtype)

        acc, _ = jax.lax.fori_loop(
            0, n, body, (jnp.zeros((), "float32"), jnp.zeros((), x.dtype))
        )
        return acc

    float(chained(x, 1))
    float(chained(x, steps + 1))
    # min the long runs and the launch-overhead baselines SEPARATELY:
    # min-of-differences selects noise outliers (negative times) when the
    # per-step work is small relative to tunnel jitter
    t1s, tns = [], []
    for _ in range(4):
        t0 = time.perf_counter()
        float(chained(x, 1))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(chained(x, steps + 1))
        tns.append(time.perf_counter() - t0)
    return max(min(tns) - min(t1s), 0.0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=32)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--skip-stages", action="store_true")
    ap.add_argument("--stages", default="", help="comma list to run (default all)")
    ap.add_argument("--cands", default="", help="comma list of candidates (default all)")
    ap.add_argument("--no-backbone", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.RandomState(0)
    B = args.clips
    out = {"clips": B}

    # real per-stage shapes of ResNeXt101_3D on (B, 16, 112, 112, 3):
    # (T, H, W, mid_channels, stride of the grouped conv, n_blocks)
    stages = [
        ("layer1", 8, 28, 28, 128, 1, 3),
        ("layer2", 8, 28, 28, 256, 2, 1),  # first block: stride 2 (in 28 -> out 14)
        ("layer2b", 4, 14, 14, 256, 1, 3),
        ("layer3", 4, 14, 14, 512, 2, 1),
        ("layer3b", 2, 7, 7, 512, 1, 22),
        ("layer4", 2, 7, 7, 1024, 2, 1),
        ("layer4b", 1, 4, 4, 1024, 1, 2),
    ]
    G = 32

    def grouped_nnconv(x, k, stride):
        return jax.lax.conv_general_dilated(
            x, k, (stride,) * 3, [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=G,
        )

    def blockdiag_dense(x, k, stride):
        # k: (3,3,3, w, C) grouped -> dense (3,3,3, C, C) block-diagonal
        w = k.shape[3]
        C = k.shape[4]
        kd = jnp.zeros((3, 3, 3, C, C), k.dtype)
        for g in range(G):
            kd = kd.at[..., g * w:(g + 1) * w, g * w:(g + 1) * w].set(
                k[..., :, g * w:(g + 1) * w]
            )
        return jax.lax.conv_general_dilated(
            x, kd, (stride,) * 3, [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    def group_einsum(x, k, stride):
        """Unfold the 27 taps as 9 shifted 3-tap T-slabs and contract
        (tap, w_in) per group with spatial in the trailing dim."""
        b, t, h, wdt, c = x.shape
        wg = c // G
        # pad spatially, gather 27 shifted views (compiler fuses the slices)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        to = (t + 2 - 3) // stride + 1 if stride > 1 else t
        ho = (h + 2 - 3) // stride + 1 if stride > 1 else h
        wo = (wdt + 2 - 3) // stride + 1 if stride > 1 else wdt
        views = []
        for dt in range(3):
            for dh in range(3):
                for dw in range(3):
                    v = jax.lax.slice(
                        xp,
                        (0, dt, dh, dw, 0),
                        (b, dt + (to - 1) * stride + 1, dh + (ho - 1) * stride + 1,
                         dw + (wo - 1) * stride + 1, c),
                        (1, stride, stride, stride, 1),
                    )
                    views.append(v)
        patches = jnp.stack(views, axis=-2)  # (B, To, Ho, Wo, 27, C)
        patches = patches.reshape(b, to, ho, wo, 27, G, wg)
        kk = k.reshape(27, wg, G, wg)  # (tap, w_in, G, w_out)
        return jnp.einsum("bthwpgi,pigo->bthwgo", patches, kk).reshape(
            b, to, ho, wo, c
        )

    # einsum (27-tap patch materialization) measured 11-58 ms/stage — HBM
    # dead on arrival, and its layer3 compile crashed the TPU worker; it
    # stays available via --cands einsum but is out of the default set
    candidates = {
        "nnconv": grouped_nnconv,
        "blockdiag": blockdiag_dense,
    }
    if "einsum" in args.cands:
        candidates["einsum"] = group_einsum

    want_stages = set(filter(None, args.stages.split(",")))
    want_cands = set(filter(None, args.cands.split(",")))
    for name, t, h, wdt, c, stride, nblocks in stages:
        if want_stages and name not in want_stages:
            continue
        wg = c // G
        x = jnp.asarray(rng.randn(B, t, h, wdt, c).astype(np.float32))
        k_grouped = jnp.asarray(
            (rng.randn(3, 3, 3, wg, c) * 0.05).astype(np.float32)
        )
        row = {"n_blocks": nblocks}
        for cname, fn in candidates.items():
            if want_cands and cname not in want_cands:
                continue
            if cname == "blockdiag" and c > 512:
                row[cname] = None  # 32x flops at 1024 ch: pointless, skip
                continue
            try:
                per = chain_time(functools.partial(fn, k=k_grouped, stride=stride), x, args.steps)
                row[cname] = round(per * 1e3, 3)
            except Exception as e:  # pragma: no cover
                row[cname] = f"error: {type(e).__name__}"
            print(f"# {name}/{cname}: {row.get(cname)}", flush=True)
        # bf16 variant of the baseline path
        if not want_cands or "nnconv_bf16" in want_cands:
            xb = x.astype(jnp.bfloat16)
            kb = k_grouped.astype(jnp.bfloat16)
            try:
                per = chain_time(functools.partial(grouped_nnconv, k=kb, stride=stride), xb, args.steps)
                row["nnconv_bf16"] = round(per * 1e3, 3)
            except Exception as e:  # pragma: no cover
                row["nnconv_bf16"] = f"error: {type(e).__name__}"
            print(f"# {name}/nnconv_bf16: {row.get('nnconv_bf16')}", flush=True)
        out[name] = row

    # whole-backbone fp32 vs bf16, plus stage-prefix attribution: timing
    # max_stages = 0 (stem+pool), 1, 2, 3, 4 and differencing assigns the
    # wall time to each stage of the real network
    if not args.no_backbone:
        from dualvgr_tpu.models.backbones.resnext3d import ResNeXt101_3D

        cpu0 = jax.devices("cpu")[0]
        dtype = os.environ.get("PROBE_DTYPE", "float32")
        clips = jnp.asarray(rng.randn(B, 16, 112, 112, 3).astype(np.float32))
        prev = 0.0
        for k in range(5):
            model = ResNeXt101_3D(max_stages=k, compute_dtype=dtype)
            with jax.default_device(cpu0):
                variables = model.init(
                    jax.random.PRNGKey(1), np.zeros((1, 16, 112, 112, 3), np.float32)
                )
            variables = jax.device_put(variables, jax.devices()[0])
            per = chain_time(lambda x, m=model, v=variables: m.apply(v, x), clips, args.steps)
            label = ("stem" if k == 0 else f"prefix_l{k}") + (
                "" if dtype == "float32" else "_" + dtype
            )
            out[f"{label}_ms"] = round(per * 1e3, 2)
            out[f"{label}_delta_ms"] = round((per - prev) * 1e3, 2)
            print(f"# {label}: {per * 1e3:.2f} ms (delta {(per - prev) * 1e3:.2f})",
                  flush=True)
            prev = per
            if k == 4:
                out["backbone_fp32_ms"] = round(per * 1e3, 2)
                out["backbone_fp32_clips_per_sec"] = round(B / per, 1)
                vb = jax.tree_util.tree_map(
                    lambda a: a.astype(jnp.bfloat16), variables
                )
                clips16 = clips.astype(jnp.bfloat16)
                per16 = chain_time(
                    lambda x: model.apply(vb, x), clips16, args.steps
                )
                out["backbone_bf16_ms"] = round(per16 * 1e3, 2)
                out["backbone_bf16_clips_per_sec"] = round(B / per16, 1)
                print(f"# backbone bf16: {per16 * 1e3:.2f} ms", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
