"""Serving latency/throughput curve: eval step vs batch size on one chip.

Production serving cares about the latency-throughput tradeoff, not just
peak batch-256 throughput: a request batcher needs to know how much
throughput each latency budget buys. This sweeps the jitted eval forward
(Pallas kernels + optional bf16 streaming — the serving configuration)
over batch sizes and reports per-batch latency and QA/s.

Methodology: dependency-chained ``lax.fori_loop`` per batch size (plain
``block_until_ready`` does not block under tunneled TPU platforms), the
chain perturbing the visual inputs + embedding table so no input branch is
hoisted (see bench.py). ``ms_per_batch`` is the floor estimator
(min(t_{n+1}) − min(t_1))/steps over all rounds — identical to
bench._per_step; min over PAIRWISE per-round differences is biased low
(it cherry-picks rounds whose 1-iteration overhead probe stalled) and is
used only for the p50/p99 drift percentiles, where a spread is wanted.
Numbers are DEVICE step time; the p99 reflects sustained drift (clocks,
tunnel), not per-request queueing jitter (the chained loop has none; a
real TPU VM adds PCIe/DMA input transfer, overlapped by the prefetch
pipeline).

Run: python benchmarks/serving_latency.py [--batches 8,32,64,128,256,512]
     [--compute-dtype bfloat16] [--steps 30] [--out PATH]
Artifact: benchmarks/serving_latency.json (real-chip run; cited by the
README's serving claim).
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

from bench import _per_step  # noqa: E402 — the one floor estimator


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,32,64,128,256,512")
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--repeats", type=int, default=16)
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "serving_latency.json"),
        help="artifact path ('' to skip writing)",
    )
    args = ap.parse_args()

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dualvgr_tpu.models import DualVGR

    vocab_size, num_answers, t = 8000, 4000, 24
    model = DualVGR(
        vision_dim=2048, module_dim=768, word_dim=300,
        question_vocab_size=vocab_size, num_answers=num_answers,
        num_of_nodes=16, graph_layers=1, unit_layers=1,
        use_pallas=not args.no_pallas,
        compute_dtype=args.compute_dtype,
    )
    rng = np.random.RandomState(0)
    kapp, kmot = jax.random.split(jax.random.PRNGKey(0))
    bmax = max(int(b) for b in args.batches.split(","))
    app = jax.random.normal(kapp, (bmax, 16, 16, 2048), jnp.float32)
    mot = jax.random.normal(kmot, (bmax, 16, 2048), jnp.float32)
    q = rng.randint(1, vocab_size, (bmax, t)).astype(np.int32)
    qlen = rng.randint(4, t + 1, (bmax,)).astype(np.int32)
    for i in range(bmax):
        q[i, qlen[i]:] = 0
    q, qlen = jnp.asarray(q), jnp.asarray(qlen)

    variables = model.init(
        {"params": jax.random.PRNGKey(666), "dropout": jax.random.PRNGKey(0)},
        app[:1], mot[:1], q[:1], qlen[:1], train=False,
    )

    def _perturbed(variables, eps):
        p = dict(variables["params"])
        li = dict(p["linguistic_input_unit"])
        li["encoder_embed"] = {"embedding": li["encoder_embed"]["embedding"] + eps}
        p["linguistic_input_unit"] = li
        return {**variables, "params": p}

    @functools.partial(jax.jit, static_argnums=(5,))
    def chained(variables, a0, m0, qq, ql, n):
        def body(i, carry):
            acc, eps = carry
            v = _perturbed(variables, eps)
            logits = model.apply(v, a0 + eps, m0 + eps, qq, ql, train=False).logits
            s = logits.sum()
            return acc + s, s * 1e-30

        acc, _ = jax.lax.fori_loop(
            0, n, body, (jnp.zeros((), "float32"), jnp.zeros((), "float32"))
        )
        return acc

    rows = []
    for b in (int(x) for x in args.batches.split(",")):
        a, m, qq, ql = app[:b], mot[:b], q[:b], qlen[:b]
        float(chained(variables, a, m, qq, ql, 1))
        float(chained(variables, a, m, qq, ql, args.steps + 1))
        pairs, samples = [], []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            float(chained(variables, a, m, qq, ql, 1))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(chained(variables, a, m, qq, ql, args.steps + 1))
            tn = time.perf_counter() - t0
            pairs.append((t1, tn))
            # per-round sample for the drift percentiles only (pairwise
            # subtraction is fine for a SPREAD; it is biased for a floor)
            samples.append(max(tn - t1, 0.0) / args.steps * 1e3)
        # THE floor estimator — bench's own, imported so the two committed
        # artifacts (serving_latency.json, BENCH_r*.json) can never be
        # produced by silently divergent copies; its fallbacks guarantee
        # a positive result (tests/test_bench_estimator.py)
        ms = _per_step(pairs, args.steps) * 1e3
        p50 = float(np.percentile(samples, 50))
        if ms > p50 > 0.0:  # a floor above the median is a stall artifact
            ms = p50
        if p50 <= 0.0:  # degenerate sweep: keep the artifact writable
            p50 = ms
        row = {
            "batch": b,
            "ms_per_batch": round(ms, 3),
            "ms_p50": round(p50, 3),
            "ms_p99": round(float(np.percentile(samples, 99)), 3),
            "qa_per_sec": round(b / ms * 1e3, 1),
            "qa_per_sec_p50": round(b / p50 * 1e3, 1),
        }
        rows.append(row)
        print(
            f"# batch {b}: {row['ms_per_batch']} ms (p50 {row['ms_p50']}, "
            f"p99 {row['ms_p99']}), {row['qa_per_sec']} QA/s", flush=True,
        )
    out = {
        "compute_dtype": args.compute_dtype,
        "pallas": not args.no_pallas,
        "steps_per_sample": args.steps,
        "rounds": args.repeats,
        "methodology": (
            "ms_per_batch = (min(t_{n+1}) - min(t_1))/n over rounds of a "
            "dependency-chained fori_loop (bench._per_step floor; device "
            "step time); p50/p99 over per-round pairwise samples span "
            "round-to-round drift, not per-request jitter"
        ),
        "sweep": rows,
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
        print(f"# wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
