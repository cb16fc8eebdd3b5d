"""Host input-pipeline benchmark: batch assembly fp32 vs bfloat16 transfer.

Measures what cfg.tpu.transfer_dtype actually buys on the host side of the
pipeline (the device side is free: the upcast fuses into the model's first
elementwise pass):

* one-time store build (HDF5 read, + RNE cast for bf16),
* per-batch gather of `--batch` random rows (the flagship train step's
  assembly work), min-of-N over fresh random row sets,
* bytes shipped per batch — the number that matters on a real TPU VM,
  where host->device DMA (~tens of GB/s) moves the flagship fp32
  appearance batch (537 MB) in roughly the time of the 27 ms train step;
  bf16 halves it (dualvgr_tpu/data/features.py).

Run:  python benchmarks/loader_bench.py [--videos 512] [--batch 256]
Writes one JSON line per configuration. Host-only (no TPU needed).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import h5py
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dualvgr_tpu.data import native
from dualvgr_tpu.data.features import FeatureStore


def make_h5(path: str, n_videos: int, clips: int, frames: int, dim: int) -> None:
    rng = np.random.RandomState(0)
    with h5py.File(path, "w") as f:
        d = f.create_dataset(
            "resnet_features", (n_videos, clips, frames, dim), dtype=np.float32
        )
        for i in range(0, n_videos, 64):  # chunked fill keeps RAM flat
            j = min(i + 64, n_videos)
            d[i:j] = rng.randn(j - i, clips, frames, dim).astype(np.float32)
        f.create_dataset("ids", data=np.arange(n_videos))


def bench_store(path: str, store_dtype: str, batch: int, repeats: int) -> dict:
    t0 = time.perf_counter()
    store = FeatureStore(path, "resnet_features", cache_gb=64.0, store_dtype=store_dtype)
    build_s = time.perf_counter() - t0
    assert store.cached

    rng = np.random.RandomState(1)
    n = store.shape[0]
    row_sets = [rng.randint(0, n, size=batch).astype(np.int64) for _ in range(repeats)]
    # warm up (first call may compile/load the native lib)
    store.gather(row_sets[0])
    times = []
    for rows in row_sets:
        t0 = time.perf_counter()
        out = store.gather(rows)
        times.append(time.perf_counter() - t0)
    batch_bytes = out.dtype.itemsize * out.size
    best = min(times)
    store.close()
    return {
        "metric": "loader_batch_assembly",
        "store_dtype": store_dtype,
        "batch": batch,
        "build_s": round(build_s, 3),
        "ms_per_batch": round(best * 1e3, 2),
        "mb_per_batch": round(batch_bytes / 1e6, 1),
        "effective_gb_per_s": round(batch_bytes / best / 1e9, 2),
        "native_gather": native.available(),
    }


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--videos", type=int, default=512)
    p.add_argument("--clips", type=int, default=16)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--dim", type=int, default=2048)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--repeats", type=int, default=10)
    args = p.parse_args(argv)

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "bench_appearance_feat.h5")
        make_h5(path, args.videos, args.clips, args.frames, args.dim)
        for dt in ("float32", "bfloat16"):
            print(json.dumps(bench_store(path, dt, args.batch, args.repeats)))


if __name__ == "__main__":
    main()
