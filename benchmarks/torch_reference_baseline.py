"""Measure the reference-architecture PyTorch eval throughput (baseline).

Runs the torch twin (benchmarks/torch_twin.py) at the flagship MSRVTT-QA
shapes (vision 2048, module 768, 16 clips x 16 frames, 4k answers) in eval
mode on this host's CPU and writes benchmarks/baseline.json with:

* ``torch_cpu_qa_per_sec``: measured on this host,
* ``reference_qa_per_sec``: the baseline bench.py compares against =
  measured CPU throughput x GPU_UPLIFT (default 30x, a generous uplift for
  an A100 on this LSTM+GAT-heavy fp32 workload; the reference publishes no
  throughput numbers or hardware statement, see BASELINE.md).

Usage: python benchmarks/torch_reference_baseline.py [--batch 64] [--iters 3]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np
import torch

from benchmarks.torch_twin import TorchDualVGR

GPU_UPLIFT = 30.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args()

    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    b, t = args.batch, 24
    twin = TorchDualVGR(
        vision_dim=2048, module_dim=768, word_dim=300, vocab_size=8000,
        num_answers=4000, num_of_nodes=16, graph_layers=1, unit_layers=1,
    ).eval()

    app = torch.from_numpy(rng.randn(b, 16, 16, 2048).astype(np.float32))
    mot = torch.from_numpy(rng.randn(b, 16, 2048).astype(np.float32))
    q = torch.from_numpy(rng.randint(1, 8000, (b, t)).astype(np.int64))
    qlen = torch.from_numpy(rng.randint(4, t + 1, (b,)).astype(np.int64))

    with torch.no_grad():
        twin(app, mot, q, qlen)  # warmup
        t0 = time.perf_counter()
        for _ in range(args.iters):
            twin(app, mot, q, qlen)
        dt = (time.perf_counter() - t0) / args.iters

    qa_per_sec = b / dt
    out = {
        "torch_cpu_qa_per_sec": round(qa_per_sec, 2),
        "gpu_uplift": GPU_UPLIFT,
        "reference_qa_per_sec": round(qa_per_sec * GPU_UPLIFT, 2),
        "batch": b,
        "host": os.uname().nodename,
        "torch": torch.__version__,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "baseline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
