"""Feature-extraction CLI: videos -> clip features -> HDF5, on TPU.

Reference surface (reference preprocess/preprocess_features.py:206-277):

    python preprocess/preprocess_features.py --dataset svqa --model resnet101 \
        --annotation_file .../train_qa.json --video_dir .../videos/ \
        --ckpt resnet101.pth --num_clips 8

plus proper flags for the paths the reference hardcodes (its
annotation/video paths are absolute per-user constants flagged TODO,
preprocess_features.py:240-268).

Pipeline parity (behavioral, feature agreement within conv-stack tolerance):

* clip sampling: ``num_clips`` centers at linspace(0, T, num_clips+2)
  [1:num_clips+1]; each clip is 16 consecutive frames centered there with
  boundary frames replicated; PIL BICUBIC resize to 224^2 (appearance) or
  112^2 (motion) (reference :67-140),
* appearance: per-frame ResNet-101 on (x/255 - mean)/std with the
  reference's std blue-channel typo 0.224 reproduced (:53),
* motion: 3D ResNeXt-101 on RAW 0-255 pixels (no normalization, :182-186),
* HDF5 schema: ``resnet_features`` float32 (N, num_clips, 16, 2048) or
  ``resnext_features`` (N, num_clips, 2048), plus ``ids`` (:158-198),
* the video list is shuffled with the seeded RNG like the reference (:244).

TPU-native changes: the reference runs one video at a time on one GPU
(batch = 1 video); here frames/clips from ``--videos_per_batch`` videos are
batched into one static-shape jit invocation and sharded over the device
mesh, decoupling host video decode (threaded) from device inference.
"""

from __future__ import annotations

import argparse
import os
import queue
import random
import sys
import threading
import time

import h5py
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from preprocess.datautils import msrvtt_qa, msvd_qa, svqa  # noqa: E402


def decode_video_rgb(path: str):
    """Full-video decode to a list of RGB frames (reference :80-91)."""
    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    if cap.isOpened():
        rval, frame = cap.read()
        while rval:
            b, g, r = cv2.split(frame)
            frames.append(cv2.merge([r, g, b]))
            rval, frame = cap.read()
    cap.release()
    return frames


def extract_clips_with_consecutive_frames(
    path, num_clips, num_frames_per_clip, image_size, motion_layout,
):
    """Exact reproduction of the reference sampler (reference :67-140).

    Returns (clips ndarray, valid). Appearance layout (clips, F, 3, H, W);
    motion layout (clips, 3, F, H, W). Broken videos return zeros+False
    (reference :174,:188 writes zero features for invalid videos).
    """
    from PIL import Image

    f = num_frames_per_clip
    try:
        video_data = decode_video_rgb(path)
        if not video_data:
            raise ValueError("no frames")
    except Exception:
        print(f"file {path} error")
        if motion_layout:
            return np.zeros((num_clips, 3, f, *image_size), np.float32), False
        return np.zeros((num_clips, f, 3, *image_size), np.float32), False

    total_frames = len(video_data)
    clips = []
    for i in np.linspace(0, total_frames, num_clips + 2, dtype=np.int32)[1 : num_clips + 1]:
        clip_start = int(i) - f // 2
        clip_end = int(i) + f // 2
        if clip_start < 0:
            clip_start = 0
        if clip_end > total_frames:
            clip_end = total_frames - 1
        clip = list(video_data[clip_start:clip_end])
        shortage = f - (clip_end - clip_start)
        if clip_start == 0 and shortage > 0:
            clip = [video_data[clip_start]] * shortage + clip
        if clip_end == (total_frames - 1) and f - len(clip) > 0:
            clip = clip + [video_data[clip_end]] * (f - len(clip))
        # safety: degenerate very-short videos
        while len(clip) < f:
            clip.append(clip[-1])
        clip = clip[:f]

        new_clip = []
        for j in range(f):
            img = Image.fromarray(clip[j])
            img = img.resize(image_size, Image.BICUBIC)
            new_clip.append(np.transpose(np.asarray(img), (2, 0, 1)))  # CHW
        new_clip = np.asarray(new_clip, np.float32)  # (F, 3, H, W)
        if motion_layout:
            new_clip = np.transpose(new_clip, (1, 0, 2, 3))  # (3, F, H, W)
        clips.append(new_clip)
    return np.asarray(clips, np.float32), True


def build_appearance_extractor(ckpt_path, mesh, compute_dtype="float32"):
    import jax
    import jax.numpy as jnp

    from dualvgr_tpu.models.backbones import ResNet101, port_resnet101_state_dict
    from dualvgr_tpu.models.backbones.resnet2d import IMAGENET_MEAN, IMAGENET_STD_REF
    from dualvgr_tpu.parallel import replicate, shard_batch

    model = ResNet101(compute_dtype=compute_dtype)
    if ckpt_path:
        import torch

        sd = torch.load(ckpt_path, map_location="cpu")
        if not isinstance(sd, dict) or "conv1.weight" not in sd:
            sd = sd.get("state_dict", sd)
        variables = port_resnet101_state_dict(sd)
        variables = jax.tree_util.tree_map(jnp.asarray, variables)
    else:
        print("WARNING: no --ckpt given; using random ResNet-101 weights")
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    variables = replicate(variables, mesh)
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD_REF)

    @jax.jit
    def run(variables, frames):  # frames (B, F=16? no: B, 3, H, W) torch layout
        x = frames.transpose(0, 2, 3, 1)  # NCHW -> NHWC
        x = (x / 255.0 - mean) / std
        return model.apply(variables, x)

    def extract(frames_np):  # (B, 3, H, W) float32 raw 0-255
        out = run(variables, shard_batch(jnp.asarray(frames_np), mesh))
        return np.asarray(out)

    return extract


def build_motion_extractor(ckpt_path, mesh, compute_dtype="float32"):
    import jax
    import jax.numpy as jnp

    from dualvgr_tpu.models.backbones import ResNeXt101_3D, port_resnext101_state_dict
    from dualvgr_tpu.parallel import replicate, shard_batch

    model = ResNeXt101_3D(compute_dtype=compute_dtype)
    if ckpt_path:
        import torch

        sd = torch.load(ckpt_path, map_location="cpu")
        sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
        variables = port_resnext101_state_dict(sd)
        variables = jax.tree_util.tree_map(jnp.asarray, variables)
    else:
        print("WARNING: no --ckpt given; using random ResNeXt-101 weights")
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 112, 112, 3)))
    variables = replicate(variables, mesh)

    @jax.jit
    def run(variables, clips):  # (B, 3, F, H, W) torch layout, RAW 0-255
        x = clips.transpose(0, 2, 3, 4, 1)  # NCDHW -> NDHWC
        return model.apply(variables, x)  # no normalization (reference :182-186)

    def extract(clips_np):
        out = run(variables, shard_batch(jnp.asarray(clips_np), mesh))
        return np.asarray(out)

    return extract


def generate_h5(args, video_paths):
    """Decode (threaded) -> batched sharded inference -> incremental H5."""
    from dualvgr_tpu.parallel import data_mesh

    mesh = data_mesh()
    appearance = args.feature_type == "appearance"
    f = 16
    image_size = (args.image_height, args.image_width)
    dataset_name = "resnet_features" if appearance else "resnext_features"
    extractor = (
        build_appearance_extractor(args.ckpt, mesh, getattr(args, "compute_dtype", "float32"))
        if appearance
        else build_motion_extractor(args.ckpt, mesh, getattr(args, "compute_dtype", "float32"))
    )

    # threaded decode pipeline: a pool of decoder threads (cv2 releases the
    # GIL) feeding the device in submission order
    q: queue.Queue = queue.Queue(maxsize=max(args.videos_per_batch * 2, args.decode_threads * 2))
    sentinel = object()

    def producer():
        from concurrent.futures import ThreadPoolExecutor

        def decode(item):
            path, vid = item
            clips, valid = extract_clips_with_consecutive_frames(
                path, args.num_clips, f, image_size, motion_layout=not appearance
            )
            return vid, clips, valid

        with ThreadPoolExecutor(max_workers=max(args.decode_threads, 1)) as pool:
            for result in pool.map(decode, video_paths):
                q.put(result)
        q.put(sentinel)

    threading.Thread(target=producer, daemon=True).start()

    n = len(video_paths)
    t_start = time.monotonic()
    os.makedirs(os.path.dirname(os.path.abspath(args.outfile)), exist_ok=True)
    with h5py.File(args.outfile, "w") as fd:
        if appearance:
            feat_ds = fd.create_dataset(
                dataset_name, (n, args.num_clips, f, 2048), dtype=np.float32
            )
        else:
            feat_ds = fd.create_dataset(
                dataset_name, (n, args.num_clips, 2048), dtype=np.float32
            )
        ids_ds = fd.create_dataset("ids", (n,), dtype=np.int64)

        buf_vids, buf_clips, buf_valid = [], [], []
        written = 0

        def flush():
            nonlocal written
            if not buf_vids:
                return
            batch = np.concatenate(buf_clips, axis=0)
            if appearance:
                # (V*C, F, 3, H, W) -> frames (V*C*F, 3, H, W)
                vc = batch.shape[0]
                frames = batch.reshape(vc * f, 3, *image_size)
                # pad to mesh divisibility
                pad = (-len(frames)) % mesh.size
                if pad:
                    frames = np.concatenate([frames, frames[:pad]], 0)
                feats = extractor(frames)[: vc * f]
                feats = feats.reshape(len(buf_vids), args.num_clips, f, 2048)
            else:
                vc = batch.shape[0]
                pad = (-vc) % mesh.size
                if pad:
                    batch2 = np.concatenate([batch, batch[:pad]], 0)
                else:
                    batch2 = batch
                feats = extractor(batch2)[:vc]
                feats = feats.reshape(len(buf_vids), args.num_clips, 2048)
            for k, (vid, ok) in enumerate(zip(buf_vids, buf_valid)):
                # broken videos get zero FEATURES (reference :174,:188 writes
                # np.zeros rows), not features-of-zero-frames
                feat_ds[written] = feats[k] if ok else 0.0
                ids_ds[written] = int(vid) if str(vid).isdigit() else hash(vid) % (2**62)
                written += 1
            buf_vids.clear()
            buf_clips.clear()
            buf_valid.clear()

        while True:
            item = q.get()
            if item is sentinel:
                break
            vid, clips, valid = item
            buf_vids.append(vid)
            buf_clips.append(clips)
            buf_valid.append(valid)
            if len(buf_vids) >= args.videos_per_batch:
                flush()
                done = written
                per_video = (time.monotonic() - t_start) / max(done, 1)
                eta = per_video * (n - done)
                print(
                    f"{done}/{n} videos, {per_video:.3f}s/video, ETA {eta:.0f}s",
                    flush=True,
                )
        flush()
    print(f"wrote {n} videos to {args.outfile}")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--gpu_id", type=int, default=0, help="accepted for parity; unused")
    parser.add_argument("--dataset", default="svqa", choices=["svqa", "msvd-qa", "msrvtt-qa"])
    parser.add_argument("--model", default="resnet101", choices=["resnet101", "resnext101"])
    parser.add_argument("--num_clips", type=int, default=24)
    parser.add_argument("--image_height", type=int, default=224)
    parser.add_argument("--image_width", type=int, default=224)
    parser.add_argument("--annotation_file", type=str, required=True,
                        help="annotation json; may contain {mode} for msvd/msrvtt")
    parser.add_argument("--video_dir", type=str, required=True)
    parser.add_argument("--video_name_mapping", type=str, default="",
                        help="msvd youtube_mapping.txt")
    parser.add_argument("--ckpt", type=str, default="",
                        help="torch .pth weights (torchvision resnet101 / Kinetics resnext-101)")
    parser.add_argument("--outfile", type=str, default="data/{dataset}/{dataset}_{type}_feat.h5")
    parser.add_argument("--videos_per_batch", type=int, default=4)
    parser.add_argument("--decode_threads", type=int, default=8)
    parser.add_argument("--seed", type=int, default=666)
    parser.add_argument(
        "--compute-dtype", default="float32", choices=["float32", "bfloat16"],
        help="backbone inference dtype; bfloat16 runs 1.4-1.6x faster with "
             "<2%% relative feature error / >0.995 per-frame cosine vs fp32 "
             "(tested: tests/test_preprocess_e2e.py::"
             "test_bf16_extraction_close_to_fp32)",
    )
    args = parser.parse_args(argv)

    if args.model == "resnet101":
        args.feature_type = "appearance"
    else:
        args.feature_type = "motion"
        args.image_height = args.image_width = 112

    args.outfile = args.outfile.format(dataset=args.dataset, type=args.feature_type)
    random.seed(args.seed)
    np.random.seed(args.seed)

    mod = {"svqa": svqa, "msvd-qa": msvd_qa, "msrvtt-qa": msrvtt_qa}[args.dataset]
    video_paths = mod.load_video_paths(args)
    random.shuffle(video_paths)  # reference shuffles the processing order (:244)
    generate_h5(args, video_paths)


if __name__ == "__main__":
    main()
