"""Feature-extraction backbone throughput on the real chip.

The reference extracts features ONE VIDEO AT A TIME on a GPU
(/root/reference/preprocess/preprocess_features.py:143-203: per-video clip
loop, batch=1). This framework batches frames/clips from many videos into
one static-shape jit invocation sharded over the device mesh
(preprocess/preprocess_features.py). This bench measures the resulting
device-side backbone throughput — the extraction pipeline's compute bound —
with the same dependency-chained methodology as bench.py (random weights:
throughput is weight-independent).

Reported per backbone: inputs/sec (frames for ResNet-101 appearance,
16-frame clips for R3D ResNeXt-101 motion), videos/sec at the flagship 16
clips x 16 frames, and MFU from XLA's own HLO cost analysis.

    python benchmarks/extraction_bench.py [--frames 256] [--clips 32]
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

PEAK_TFLOPS = float(os.environ.get("BENCH_PEAK_TFLOPS", "197"))


def chain_time(fn, x, steps):
    import jax
    import jax.numpy as jnp

    # n is DYNAMIC (while-loop lowering): one compile serves both the
    # 1-iteration and the (steps+1)-iteration timing — these CNN programs
    # take minutes each to compile on a tunneled backend
    @jax.jit
    def chained(x, n):
        def body(i, carry):
            acc, eps = carry
            out = fn(x + eps)
            s = out.sum()
            return acc + s, s * 1e-30

        acc, _ = jax.lax.fori_loop(
            0, n, body, (jnp.zeros((), "float32"), jnp.zeros((), "float32"))
        )
        return acc

    float(chained(x, 1))
    float(chained(x, steps + 1))
    # min long runs and baselines separately (min-of-differences selects
    # jitter outliers for fast ops)
    t1s, tns = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(x, 1))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(chained(x, steps + 1))
        tns.append(time.perf_counter() - t0)
    return max(min(tns) - min(t1s), 0.0) / steps


def analytic_flops(fn, x):
    """Matmul+conv FLOPs of one application, from XLA's cost analysis."""
    import jax

    return jax.jit(fn).lower(x).compile().cost_analysis()["flops"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=256, help="appearance batch (frames)")
    ap.add_argument("--clips", type=int, default=32, help="motion batch (16-frame clips)")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument(
        "--stem-ab", action="store_true",
        help="also time the motion net with stem_impl s2d vs t2d, interleaved",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dualvgr_tpu.models.backbones.resnet2d import ResNet101
    from dualvgr_tpu.models.backbones.resnext3d import ResNeXt101_3D

    rng = np.random.RandomState(0)
    out = {}

    cpu0 = jax.devices("cpu")[0]

    # ---- appearance: ResNet-101 on 224^2 frames (NHWC) ----
    app_model = ResNet101()
    frames = jnp.asarray(rng.randn(args.frames, 224, 224, 3).astype(np.float32))
    with jax.default_device(cpu0):  # init compile on host, not the tunnel
        app_vars = app_model.init(jax.random.PRNGKey(0), np.zeros((1, 224, 224, 3), np.float32))
    app_vars = jax.device_put(app_vars, jax.devices()[0])

    def app_fn(x):
        return app_model.apply(app_vars, x)

    per = chain_time(app_fn, frames, args.steps)
    fps = args.frames / per
    flops = analytic_flops(app_fn, frames) / args.frames
    out["resnet101_frames_per_sec"] = round(fps, 1)
    out["resnet101_videos_per_sec_16x16"] = round(fps / 256, 2)  # 16 clips x 16 frames
    out["resnet101_gflops_per_frame"] = round(flops / 1e9, 2)
    out["resnet101_mfu"] = round(flops * fps / (PEAK_TFLOPS * 1e12), 4)

    # ---- motion: 3D ResNeXt-101 on (16, 112, 112) clips (NDHWC) ----
    mot_model = ResNeXt101_3D()
    clips = jnp.asarray(rng.randn(args.clips, 16, 112, 112, 3).astype(np.float32))
    with jax.default_device(cpu0):
        mot_vars = mot_model.init(jax.random.PRNGKey(1), np.zeros((1, 16, 112, 112, 3), np.float32))
    mot_vars = jax.device_put(mot_vars, jax.devices()[0])

    def mot_fn(x):
        return mot_model.apply(mot_vars, x)

    per = chain_time(mot_fn, clips, args.steps)
    cps = args.clips / per
    # useful-FLOPs denominator from the DIRECT lowerings: the shipped model
    # may run grouped convs as block-diagonal dense (32x the multiplies on
    # zeros) and the s2d stem (~1.3x taps) — counting those would flatter
    # MFU with wasted flops
    mot_ref = ResNeXt101_3D(conv2_impl="grouped", stem_impl="base")
    flops = analytic_flops(lambda x: mot_ref.apply(mot_vars, x), clips) / args.clips
    out["resnext3d_clips_per_sec"] = round(cps, 1)
    out["resnext3d_videos_per_sec_16clips"] = round(cps / 16, 2)
    out["resnext3d_gflops_per_clip"] = round(flops / 1e9, 2)
    out["resnext3d_mfu"] = round(flops * cps / (PEAK_TFLOPS * 1e12), 4)

    # bf16 inference variants (--compute-dtype bfloat16 on the extraction
    # CLI): same useful FLOPs, half the MXU/HBM cost per op
    app16 = ResNet101(compute_dtype="bfloat16")
    per = chain_time(lambda x: app16.apply(app_vars, x), frames, args.steps)
    fps16 = args.frames / per
    out["resnet101_bf16_frames_per_sec"] = round(fps16, 1)
    out["resnet101_bf16_mfu"] = round(
        out["resnet101_gflops_per_frame"] * 1e9 * fps16 / (PEAK_TFLOPS * 1e12), 4
    )
    mot16 = ResNeXt101_3D(compute_dtype="bfloat16")
    per = chain_time(lambda x: mot16.apply(mot_vars, x), clips, args.steps)
    cps16 = args.clips / per
    out["resnext3d_bf16_clips_per_sec"] = round(cps16, 1)
    out["resnext3d_bf16_mfu"] = round(flops * cps16 / (PEAK_TFLOPS * 1e12), 4)
    v_app16 = fps16 / 256
    v_mot16 = cps16 / 16
    out["videos_per_sec_both_features_bf16"] = round(
        1.0 / (1.0 / v_app16 + 1.0 / v_mot16), 2
    )

    # end-to-end device bound: a video needs BOTH feature types
    v_app = out["resnet101_videos_per_sec_16x16"]
    v_mot = out["resnext3d_videos_per_sec_16clips"]
    out["videos_per_sec_both_features"] = round(1.0 / (1.0 / v_app + 1.0 / v_mot), 2)
    out["peak_tflops"] = PEAK_TFLOPS

    if args.stem_ab:
        # interleaved in-network stem A/B (s2d vs t2d), same process — the
        # only drift-robust comparison through the tunnel (between-process
        # variance ~±5-8% swamps single-digit stem deltas)
        for impl in ("s2d", "t2d"):
            for dt, tag in (("float32", ""), ("bfloat16", "_bf16")):
                m = ResNeXt101_3D(compute_dtype=dt, stem_impl=impl)
                per = chain_time(lambda x, m=m: m.apply(mot_vars, x), clips, args.steps)
                out[f"stem_{impl}{tag}_clips_per_sec"] = round(args.clips / per, 1)
        print(json.dumps({k: v for k, v in out.items() if k.startswith("stem_")}))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
