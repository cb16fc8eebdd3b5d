"""Measure the ACTUAL reference implementation's eval throughput on CPU.

Imports the reference DualVGR from /root/reference (the real
model/models.py:36-83 forward, not a re-implementation) with the same
CPU-safe patches tests/test_reference_port.py uses (torch.Tensor.to ignores
the hardcoded 'cuda:1' pins at models.py:118-119 / model/utils.py:72;
easydict stubbed), builds it at the flagship MSRVTT-QA shapes
(configs/msrvtt_qa_DualVGR_16.yml: vision_dim 2048, module_dim 768,
16 clips x 16 frames, vocab 8000, 4000 answers), and times eval forwards.

Writes benchmarks/baseline.json with:
  reference_measured_cpu_qa_per_sec  -- measured here, the honest denominator
  gpu_uplift                         -- documented CPU->A100 heuristic
  reference_qa_per_sec               -- measured_cpu * gpu_uplift (bench.py reads this)
  a100_roofline_qa_per_sec           -- analytic UPPER bound: forward FLOPs/QA
                                        vs A100 peak (the reference can do no
                                        better than this on its own hardware)

Usage: python benchmarks/reference_cpu_baseline.py [--batch 64] [--steps 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

REFERENCE = "/root/reference"

# A100 peak dense TFLOPS: 312 bf16/tf32-structured, 19.5 fp32 FMA-counted;
# torch LSTM/GAT fp32 workloads run tf32 matmuls at up to 156 TFLOPS dense.
A100_PEAK_TF32 = 156e12
GPU_UPLIFT = 30.0


def import_reference():
    import torch

    sys.path.insert(0, REFERENCE)
    if "easydict" not in sys.modules:
        m = types.ModuleType("easydict")

        class EasyDict(dict):
            __getattr__ = dict.__getitem__

            def __setattr__(self, k, v):
                self[k] = v

        m.EasyDict = EasyDict
        sys.modules["easydict"] = m

    orig_to = torch.Tensor.to

    def cpu_to(self, *a, **k):
        if a and isinstance(a[0], str) and a[0].startswith("cuda"):
            return self
        return orig_to(self, *a, **k)

    torch.Tensor.to = cpu_to
    import model.models as modelset

    return modelset


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--warmup", type=int, default=2)
    args = ap.parse_args()

    import numpy as np
    import torch

    torch.set_num_threads(os.cpu_count() or 8)
    modelset = import_reference()

    vocab = {
        "question_token_to_idx": {f"w{i}": i for i in range(8000)},
        "answer_token_to_idx": {f"a{i}": i for i in range(4000)},
    }
    torch.manual_seed(0)
    ref = modelset.DualVGR(
        vision_dim=2048, module_dim=768, word_dim=300, vocab=vocab,
        num_of_nodes=16, graph_module="GAT", graph_layers=1, unit_layers=1,
    ).eval()

    b, t = args.batch, 24
    rng = np.random.RandomState(0)
    app = torch.from_numpy(rng.randn(b, 16, 16, 2048).astype(np.float32))
    mot = torch.from_numpy(rng.randn(b, 16, 2048).astype(np.float32))
    q = rng.randint(1, 8000, (b, t)).astype(np.int64)
    qlen = rng.randint(4, t + 1, (b,)).astype(np.int64)
    qlen[0] = t  # pack_padded needs the max length present
    for i in range(b):
        q[i, qlen[i]:] = 0
    q = torch.from_numpy(q)
    qlen = torch.from_numpy(qlen)

    with torch.no_grad():
        for _ in range(args.warmup):
            ref(app, mot, q, qlen)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            ref(app, mot, q, qlen)
        dt = (time.perf_counter() - t0) / args.steps

    qa_per_sec = b / dt

    # analytic A100 upper bound from the per-QA forward FLOPs of this exact
    # workload (see dualvgr_tpu/utils/flops.py for the derivation)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from dualvgr_tpu.utils.flops import dualvgr_forward_flops

    flops_per_qa = dualvgr_forward_flops(
        vision_dim=2048, module_dim=768, word_dim=300, num_answers=4000,
        num_of_nodes=16, frames_per_clip=16, q_len=t,
        unit_layers=1, graph_layers=1,
    )
    roofline_qa = A100_PEAK_TF32 / flops_per_qa

    out = {
        "reference_measured_cpu_qa_per_sec": round(qa_per_sec, 2),
        "gpu_uplift": GPU_UPLIFT,
        "reference_qa_per_sec": round(qa_per_sec * GPU_UPLIFT, 2),
        "a100_roofline_qa_per_sec": round(roofline_qa, 2),
        "flops_per_qa": flops_per_qa,
        "batch": b,
        "steps": args.steps,
        "sec_per_batch": round(dt, 4),
        "threads": torch.get_num_threads(),
        "torch": torch.__version__,
        "source": "actual reference model/models.py forward (CPU-patched)",
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "baseline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
