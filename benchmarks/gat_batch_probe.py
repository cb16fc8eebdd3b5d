"""In-network A/B: stacked-bank GAT execution (DualVGR.batch_gats) on TPU.

Times the FULL jitted train step (the unit stack runs the XLA composition
during training) and the XLA-path eval forward, with batch_gats False vs
True INTERLEAVED in one process (each repeat round times every
configuration once, min over rounds) — the only measurement the tunnel's
±5% between-process drift can't corrupt. Both configurations share one
parameter tree (batch_gats does not change the params structure).

    python benchmarks/gat_batch_probe.py [--batch 256] [--steps 10] [--repeats 5]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--pallas", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dualvgr_tpu.models import DualVGR
    from dualvgr_tpu import train_lib
    from dualvgr_tpu.parallel import data_mesh, replicate, shard_batch

    b, t, vocab, answers = args.batch, 24, 8000, 4000

    def mk_model(batch_gats):
        return DualVGR(
            vision_dim=2048, module_dim=768, word_dim=300,
            question_vocab_size=vocab, num_answers=answers, num_of_nodes=16,
            graph_layers=1, unit_layers=1, use_pallas=bool(args.pallas),
            batch_gats=batch_gats,
        )

    models = {"per_module": mk_model(False), "batched": mk_model(True)}

    rng = np.random.RandomState(0)
    app = rng.randn(b, 16, 16, 2048).astype(np.float32)
    mot = rng.randn(b, 16, 2048).astype(np.float32)
    q = rng.randint(1, vocab, (b, t)).astype(np.int32)
    qlen = rng.randint(4, t + 1, (b,)).astype(np.int32)
    for i in range(b):
        q[i, qlen[i]:] = 0
    ans = rng.randint(0, answers, (b,)).astype(np.int32)
    valid = np.ones((b,), np.float32)

    opt = train_lib.make_optimizer(1e-4, 100)
    state = train_lib.create_train_state(
        models["per_module"], jax.random.key(666, impl="rbg"),
        (app[:1], mot[:1], q[:1], qlen[:1]), opt,
    )
    mesh = data_mesh()
    state = replicate(state, mesh)
    batch = shard_batch((app, mot, q, qlen, ans, valid), mesh)
    appd, motd, qd, qlend, ansd, validd = batch

    # --- chained full train step per configuration -------------------------
    def make_train(model):
        @functools.partial(jax.jit, static_argnums=(2,))
        def chained(st, bt, n):
            a, m_, qq, ql, an, vl = bt

            def body(i, carry):
                acc, eps, s = carry
                s2, metrics = train_lib.train_step(
                    s, (a + eps, m_ + eps, qq, ql, an, vl),
                    model=model, optimizer=opt, alpha=1.0, beta=1e-8,
                )
                return acc + metrics["loss"], metrics["loss"] * 1e-30, s2

            acc, _, _ = jax.lax.fori_loop(
                0, n, body, (jnp.zeros(()), jnp.zeros(()), st)
            )
            return acc

        return chained

    # --- chained XLA-path eval forward per configuration -------------------
    def make_eval(batch_gats):
        model = DualVGR(
            vision_dim=2048, module_dim=768, word_dim=300,
            question_vocab_size=vocab, num_answers=answers, num_of_nodes=16,
            graph_layers=1, unit_layers=1, use_pallas=False,
            batch_gats=batch_gats,
        )

        @functools.partial(jax.jit, static_argnums=(2,))
        def chained(variables, inputs, n):
            a, m_, qq, ql = inputs

            def body(i, carry):
                acc, eps = carry
                emb = variables["params"]["linguistic_input_unit"][
                    "encoder_embed"]["embedding"]
                v = dict(variables)
                v["params"] = dict(variables["params"])
                v["params"]["linguistic_input_unit"] = dict(
                    variables["params"]["linguistic_input_unit"])
                v["params"]["linguistic_input_unit"]["encoder_embed"] = {
                    "embedding": emb + eps}
                out = model.apply(v, a + eps, m_ + eps, qq, ql, train=False)
                s = out.logits.sum()
                return acc + s, s * 1e-30

            acc, _ = jax.lax.fori_loop(0, n, body, (jnp.zeros(()), jnp.zeros(())))
            return acc

        return chained

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    eval_inputs = (appd, motd, qd, qlend)

    def measure(fn, fargs, n):
        t0 = time.perf_counter()
        float(fn(*fargs, 1))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(fn(*fargs, n + 1))
        tn = time.perf_counter() - t0
        return (tn - t1) / n

    cases = {}
    for name, model in models.items():
        cases[f"train_{name}"] = (make_train(model), (state, batch))
    cases["eval_xla_per_module"] = (make_eval(False), (variables, eval_inputs))
    cases["eval_xla_batched"] = (make_eval(True), (variables, eval_inputs))

    # warm BOTH traces per configuration (jit keys on the static n: the
    # 1-step baseline and the (steps+1)-chain compile separately), then
    # interleave timing rounds so even --repeats 1 measures step time
    for name, (fn, fargs) in cases.items():
        print(f"compile {name}...", file=sys.stderr)
        float(fn(*fargs, 1))
        float(fn(*fargs, args.steps + 1))

    best = {k: float("inf") for k in cases}
    for r in range(args.repeats):
        for name, (fn, fargs) in cases.items():
            best[name] = min(best[name], measure(fn, fargs, args.steps))

    ms = {k: round(v * 1e3, 3) for k, v in best.items()}
    out = {
        "batch": b,
        "pallas_train": bool(args.pallas),
        "ms": ms,
        "train_speedup": round(ms["train_per_module"] / ms["train_batched"], 4),
        "eval_xla_speedup": round(
            ms["eval_xla_per_module"] / ms["eval_xla_batched"], 4
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
