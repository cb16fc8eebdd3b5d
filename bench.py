"""North-star benchmark: QA pairs/sec/chip on MSRVTT-QA-shaped eval.

Runs the flagship model (configs/msrvtt_qa_DualVGR_16.yml shapes: module_dim
768, 16 clips x 16 frames, vision_dim 2048, ~8k question vocab, 4k answers,
batch 256) in eval mode on synthetic MSRVTT-shaped features and measures
steady-state QA pairs per second per chip.

``vs_baseline`` compares against the reference PyTorch pipeline's measured
eval throughput. The reference publishes no throughput numbers and no
hardware statement (BASELINE.md); the baseline constant below is the
reference DualVGR architecture executed at batch 256 — measured via
benchmarks/torch_reference_baseline.py (an independent torch implementation
of the same architecture) on this host's CPU, scaled by a conservative 30x
CPU->A100 factor for the LSTM+GAT workload. See benchmarks/README.md for
the derivation; re-run that script to recalibrate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# Estimated reference (PyTorch, A100-class GPU) MSRVTT-QA eval throughput in
# QA pairs/sec. Derivation: measured torch-CPU throughput of the equivalent
# architecture (benchmarks/torch_reference_baseline.py) x 30 GPU uplift.
# Overwritten by benchmarks/baseline.json when present.
REFERENCE_QA_PER_SEC = 2000.0


def main():
    import jax

    from dualvgr_tpu.models import DualVGR
    from dualvgr_tpu import train_lib
    from dualvgr_tpu.parallel import data_mesh, replicate, shard_batch

    if os.environ.get("BENCH_STREAM"):  # e.g. BENCH_STREAM=bfloat16
        from dualvgr_tpu.ops import lstm_pallas

        lstm_pallas.STREAM_DTYPE = os.environ["BENCH_STREAM"]

    baseline_path = os.path.join(os.path.dirname(__file__), "benchmarks", "baseline.json")
    baseline = REFERENCE_QA_PER_SEC
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = float(json.load(f)["reference_qa_per_sec"])

    batch = int(os.environ.get("BENCH_BATCH", 256))
    steps = int(os.environ.get("BENCH_STEPS", 20))
    vocab_size, num_answers, t = 8000, 4000, 24

    model = DualVGR(
        vision_dim=2048,
        module_dim=768,
        word_dim=300,
        question_vocab_size=vocab_size,
        num_answers=num_answers,
        num_of_nodes=16,
        graph_layers=1,
        unit_layers=1,
        # fused Pallas kernels on the inference path (GAT cycle + BiLSTM
        # recurrence); numerically equivalent to the XLA composition
        use_pallas=os.environ.get("BENCH_PALLAS", "1") == "1",
    )
    rng = np.random.RandomState(0)
    app = rng.randn(batch, 16, 16, 2048).astype(np.float32)
    mot = rng.randn(batch, 16, 2048).astype(np.float32)
    q = rng.randint(1, vocab_size, (batch, t)).astype(np.int32)
    qlen = rng.randint(4, t + 1, (batch,)).astype(np.int32)
    for i in range(batch):
        q[i, qlen[i]:] = 0

    opt = train_lib.make_optimizer(1e-4, 100)
    state = train_lib.create_train_state(
        model, jax.random.PRNGKey(666), (app[:1], mot[:1], q[:1], qlen[:1]), opt
    )
    mesh = data_mesh()
    n_chips = mesh.size
    state = replicate(state, mesh)
    inputs = shard_batch((app, mot, q, qlen), mesh)

    # Dependency-chained timing inside one jit: each iteration's input is
    # perturbed by the previous logits so iterations cannot be collapsed or
    # overlapped, and a scalar host fetch forces completion. (Plain
    # block_until_ready is unreliable under tunneled TPU platforms.)
    import functools

    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @functools.partial(jax.jit, static_argnums=(2,))
    def chained_eval(variables, inputs, n):
        app, mot, q, qlen = inputs

        def body(i, carry):
            acc, app = carry
            logits = model.apply(variables, app, mot, q, qlen, train=False).logits
            s = logits.sum()
            return acc + s, app + s * 1e-30

        acc, _ = jax.lax.fori_loop(0, n, body, (jnp_zero(), app))
        return acc

    def jnp_zero():
        import jax.numpy as jnp

        return jnp.zeros((), "float32")

    # warm both trip counts
    float(chained_eval(variables, inputs, 1))
    float(chained_eval(variables, inputs, steps + 1))
    t0 = time.perf_counter()
    float(chained_eval(variables, inputs, 1))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(chained_eval(variables, inputs, steps + 1))
    tn = time.perf_counter() - t0
    per_step = (tn - t1) / steps

    qa_per_sec = batch / per_step
    qa_per_sec_per_chip = qa_per_sec / n_chips
    print(
        json.dumps(
            {
                "metric": "msrvtt_eval_qa_pairs_per_sec_per_chip",
                "value": round(qa_per_sec_per_chip, 2),
                "unit": "qa/s/chip",
                "vs_baseline": round(qa_per_sec_per_chip / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
