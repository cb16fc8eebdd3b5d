"""North-star benchmark: QA pairs/sec/chip on MSRVTT-QA-shaped eval + train.

Runs the flagship model (configs/msrvtt_qa_DualVGR_16.yml shapes: module_dim
768, 16 clips x 16 frames, vision_dim 2048, ~8k question vocab, 4k answers,
batch 256) on synthetic MSRVTT-shaped features and measures steady-state QA
pairs per second per chip for the eval forward and the full train step
(forward + CE/common/HSIC losses + backward + Adam).

The headline ``value`` is the SHIPPED DEFAULT serving path — Pallas kernels
+ ``compute_dtype: auto`` -> bfloat16 on TPU — which is bitwise-identical
to fp32 eval on trained weights (benchmarks/precision_probe.py measured the
MXU executes fp32 DEFAULT matmuls as one bf16 pass;
benchmarks/fastpath_accuracy.json measured 0 argmax flips on the trained
fixture). fp32 numbers are reported alongside with unchanged key semantics
(``eval_fp32_qa_per_sec_per_chip``, ``train_qa_per_sec_per_chip``) so
cross-round artifact comparison stays trivial.

``vs_baseline`` compares against the ACTUAL reference implementation's
measured CPU throughput (benchmarks/reference_cpu_baseline.py imports
/root/reference's own model/models.py forward) scaled by a documented 30x
CPU->A100 uplift; benchmarks/baseline.json also carries the analytic A100
roofline bound for the same workload. Re-run that script to recalibrate.

Before timing a ``use_pallas`` configuration, two ON-DEVICE equivalence
gates run on the real chip (not interpret mode): eval logits Pallas == XLA
(atol 1e-3) and one train-step loss + PER-MODULE gradient norms Pallas ==
XLA (each top-level module's grad norm within BENCH_GRAD_TOL rel, default
2e-3 — a per-module comparison catches a single-module backward bug that
one global norm, dominated by the ~1e6-magnitude HSIC gradients, can hide).
The bench fails loudly if either diverges.

fp32 and bf16 timings are INTERLEAVED in one process (each repeat round
times every configuration once, min over rounds per configuration) so the
fp32-vs-bf16 comparison is robust to the tunnel's multi-percent drift —
the two paths share the same process, compile cache and thermal state.
bf16 here means DualVGR(compute_dtype="bfloat16"): a distinct model
instance (no mutable dtype global), streaming bf16 operands into every wide
matmul with fp32 accumulation.

MFU is computed from the analytic matmul FLOPs of the workload
(dualvgr_tpu/utils/flops.py, cross-checked against XLA cost analysis in
tests/test_flops.py) against the chip's peak (default 197 TFLOPS, v5e bf16;
override with BENCH_PEAK_TFLOPS).

Prints ONE JSON line; the primary triple stays {"metric", "value", "unit",
"vs_baseline"}, extra keys carry MFU/train/gate evidence.
"""

from __future__ import annotations

import functools
import json
import os
import time

import numpy as np

# Fallback if benchmarks/baseline.json is missing: measured reference CPU
# qa/s (actual /root/reference code, single-core host) x 30 GPU uplift.
REFERENCE_QA_PER_SEC = 592.0
PEAK_TFLOPS = float(os.environ.get("BENCH_PEAK_TFLOPS", "197"))
_T_START = time.time()


def _measure_once(fn, args, steps):
    """One (t_n - t_1)/steps sample of a chained fn (already warmed)."""
    t0 = time.perf_counter()
    float(fn(*args, 1))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(fn(*args, steps + 1))
    tn = time.perf_counter() - t0
    return (tn - t1) / steps


def _time_interleaved(named, repeats=5):
    """Interleaved min-of-N timing over {name: (fn, args, steps)}.

    Every repeat round measures EVERY configuration once before the next
    round starts, so slow drift (tunnel load, clocks) hits all
    configurations equally — the fp32-vs-bf16 deltas stay honest.
    fn(*args, n) must run n chained iterations inside ONE jit and return a
    scalar; plain block_until_ready is unreliable under tunneled platforms,
    so completion is forced by fetching the scalar to the host; the
    1-iteration run subtracts launch/fetch overhead.
    """
    for fn, args, steps in named.values():  # warm/compile pass
        float(fn(*args, 1))
        float(fn(*args, steps + 1))
    raw = {k: [] for k in named}
    for _ in range(repeats):
        for k, (fn, args, steps) in named.items():
            raw[k].append(_measure_once(fn, args, steps))
    best = {k: min(v) for k, v in raw.items()}
    return best, raw


def _stage(msg):
    import sys

    print(f"# bench +{time.time() - _T_START:.0f}s {msg}", file=sys.stderr)


def _require_devices(timeout_s: float):
    """Fail FAST if backend init hangs (a dead axon tunnel blocks
    jax.devices() indefinitely — observed >3 h; a live one answers in
    seconds). Runs discovery in a daemon thread so a hang can't wedge the
    caller; once it returns, the backend is initialized for the process."""
    import threading

    import jax

    out: list = []
    err: list = []

    def probe():
        try:
            out.append(jax.devices())
        except Exception as e:  # noqa: BLE001 — report, then die
            err.append(e)

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    if err:
        raise SystemExit(f"bench: backend init failed: {err[0]!r}")
    if not out:
        raise SystemExit(
            f"bench: no JAX devices after {timeout_s:.0f}s — backend/tunnel "
            "down? (override with BENCH_DEVICE_TIMEOUT)"
        )
    return out[0]


def main():
    import jax
    import jax.numpy as jnp

    _require_devices(float(os.environ.get("BENCH_DEVICE_TIMEOUT", "600")))

    # first-compile of the flagship programs costs minutes on a tunneled
    # backend; the persistent cache makes repeat bench runs start in seconds
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dualvgr_tpu.models import DualVGR
    from dualvgr_tpu import train_lib
    from dualvgr_tpu.parallel import data_mesh, replicate, shard_batch
    from dualvgr_tpu.utils.flops import dualvgr_forward_flops, dualvgr_train_flops

    baseline_path = os.path.join(os.path.dirname(__file__), "benchmarks", "baseline.json")
    baseline = REFERENCE_QA_PER_SEC
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = float(json.load(f)["reference_qa_per_sec"])

    batch = int(os.environ.get("BENCH_BATCH", 256))
    steps = int(os.environ.get("BENCH_STEPS", 20))
    train_steps = int(os.environ.get("BENCH_TRAIN_STEPS", 10))
    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"
    vocab_size, num_answers, t = 8000, 4000, 24
    shape_kw = dict(
        vision_dim=2048, module_dim=768, word_dim=300,
        num_of_nodes=16, graph_layers=1, unit_layers=1,
    )

    model = DualVGR(
        question_vocab_size=vocab_size, num_answers=num_answers,
        use_pallas=use_pallas, **shape_kw,
    )
    model_xla = DualVGR(
        question_vocab_size=vocab_size, num_answers=num_answers,
        use_pallas=False, **shape_kw,
    )
    model16 = DualVGR(
        question_vocab_size=vocab_size, num_answers=num_answers,
        use_pallas=use_pallas, compute_dtype="bfloat16", **shape_kw,
    )
    rng = np.random.RandomState(0)
    # big feature tensors are generated ON DEVICE: uploading the 0.5 GB
    # appearance batch through a tunneled host->device path costs ~100 s
    # per run and measures nothing (real serving streams from the loader's
    # prefetch pipeline). Question/label arrays are tiny and stay host-side.
    kapp, kmot = jax.random.split(jax.random.PRNGKey(0))
    app = jax.random.normal(kapp, (batch, 16, 16, 2048), jnp.float32)
    mot = jax.random.normal(kmot, (batch, 16, 2048), jnp.float32)
    q = rng.randint(1, vocab_size, (batch, t)).astype(np.int32)
    qlen = rng.randint(4, t + 1, (batch,)).astype(np.int32)
    for i in range(batch):
        q[i, qlen[i]:] = 0
    answers = rng.randint(0, num_answers, (batch,)).astype(np.int32)
    valid = np.ones((batch,), np.float32)

    opt = train_lib.make_optimizer(1e-4, 100)
    # rbg: the hardware PRNG the flagship configs ship with (tpu.prng_impl;
    # dropout mask generation off the threefry critical path)
    root_key = jax.random.key(666, impl=os.environ.get("BENCH_PRNG", "rbg"))
    state = train_lib.create_train_state(
        model, root_key, (app[:1], mot[:1], q[:1], qlen[:1]), opt
    )
    _stage("state init done")
    mesh = data_mesh()
    n_chips = mesh.size
    state = replicate(state, mesh)
    inputs = shard_batch((app, mot, q, qlen), mesh)
    labels = shard_batch((answers, valid), mesh)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    # ---- on-device Pallas == XLA gates (real chip, not interpret mode) ----
    gates = {"eval": "skipped", "train_grads": "skipped"}
    lx = None
    if use_pallas:
        @jax.jit
        def both_logits(variables, inputs):
            a, m, qq, ql = inputs
            lp = model.apply(variables, a, m, qq, ql, train=False).logits
            lx = model_xla.apply(variables, a, m, qq, ql, train=False).logits
            return lp, lx

        lp, lx = both_logits(variables, inputs)
        lp, lx = np.asarray(lp), np.asarray(lx)
        err = float(np.max(np.abs(lp - lx)))
        assert np.allclose(lp, lx, atol=1e-3), (
            f"on-device Pallas eval logits diverge from XLA: max abs err {err}"
        )
        gates["eval"] = f"ok max_abs_err={err:.2e}"

        import optax

        def loss_and_module_gnorms(m_):
            def f(state, b):
                def loss_fn(params):
                    out, _ = m_.apply(
                        {"params": params, "batch_stats": state.batch_stats},
                        b[0], b[1], b[2], b[3], b[5], train=True,
                        rngs={"dropout": jax.random.PRNGKey(7)},
                        mutable=["batch_stats"],
                    )
                    from dualvgr_tpu.ops.losses import dualvgr_total_loss

                    total, _aux = dualvgr_total_loss(
                        out.logits, b[4], out.aq_fusion, out.com_app,
                        out.mq_fusion, out.com_motion,
                        alpha=1.0, beta=1e-8, num_of_nodes=16, valid=b[5],
                    )
                    return total

                loss, grads = jax.value_and_grad(loss_fn)(state.params)
                # per-top-level-module gradient norms: a single-module
                # backward bug can't hide behind the global norm
                gnorms = {k: optax.global_norm(v) for k, v in grads.items()}
                return loss, gnorms

            return jax.jit(f)

        loss_p, gn_p = loss_and_module_gnorms(model)(state, inputs + labels)
        loss_x, gn_x = loss_and_module_gnorms(model_xla)(state, inputs + labels)
        loss_p, loss_x = float(loss_p), float(loss_x)
        rel_l = abs(loss_p - loss_x) / max(abs(loss_x), 1e-9)
        grad_tol = float(os.environ.get("BENCH_GRAD_TOL", "2e-3"))
        rel_by_module = {
            k: abs(float(gn_p[k]) - float(gn_x[k])) / max(abs(float(gn_x[k])), 1e-9)
            for k in gn_x
        }
        bad = {k: v for k, v in rel_by_module.items() if v >= grad_tol}
        assert rel_l < 1e-3 and not bad, (
            f"on-device Pallas train step diverges from XLA: "
            f"loss {loss_p} vs {loss_x} (rel {rel_l:.2e}), "
            f"per-module grad-norm rel errs over tol {grad_tol}: "
            f"{ {k: f'{v:.2e}' for k, v in (bad or rel_by_module).items()} }"
        )
        worst_mod = max(rel_by_module, key=rel_by_module.get)
        gates["train_grads"] = (
            f"ok rel_loss={rel_l:.2e} per-module gnorm rel<= "
            f"{rel_by_module[worst_mod]:.2e} ({worst_mod}); "
            + " ".join(f"{k}={v:.1e}" for k, v in sorted(rel_by_module.items()))
        )
        _stage("gates done")

    # ---- chained timing programs ----
    # The chain must feed EVERY independent input path of the model, or XLA
    # hoists the untouched path out of the fori_loop as loop-invariant and
    # the measurement silently drops it. Perturbing only the appearance
    # tensor (the r01 methodology) let the whole question encoder be
    # computed once (~0.9 ms/step flattered); perturbing weight leaves
    # instead lets input-only subgraphs (tanh of the features, the
    # unperturbed direction's projection) be hoisted — measured 3 ms/step
    # flattered. So the chain perturbs the visual INPUT tensors themselves
    # (one fused elementwise pass over them per iteration — the same work a
    # real serving step does to materialize fresh inputs, and XLA fuses the
    # add into the consumer) plus the embedding table, which every
    # question-path op depends on (the tokens are ints and stay fixed).
    def _perturbed_vars(variables, eps):
        p = dict(variables["params"])
        li = dict(p["linguistic_input_unit"])
        li["encoder_embed"] = {
            "embedding": li["encoder_embed"]["embedding"] + eps
        }
        p["linguistic_input_unit"] = li
        return {**variables, "params": p}

    def make_chained_eval(m_):
        @functools.partial(jax.jit, static_argnums=(2,))
        def chained_eval(variables, inputs, n):
            a0, m0, qq, ql = inputs

            def body(i, carry):
                acc, eps = carry
                v = _perturbed_vars(variables, eps)
                logits = m_.apply(v, a0 + eps, m0 + eps, qq, ql, train=False).logits
                s = logits.sum()
                return acc + s, s * 1e-30

            acc, _ = jax.lax.fori_loop(
                0, n, body, (jnp.zeros((), "float32"), jnp.zeros((), "float32"))
            )
            return acc

        return chained_eval

    def make_chained_train(m_):
        @functools.partial(jax.jit, static_argnums=(2,))
        def chained_train(state, b, n):
            def body(i, st):
                st, _metrics = train_lib.train_step(
                    st, b, model=m_, optimizer=opt, alpha=1.0, beta=1e-8
                )
                return st

            st = jax.lax.fori_loop(0, n, body, state)
            # the fetched scalar must depend on the UPDATED params or XLA
            # DCEs the whole optimizer update
            return jnp.sum(st.params["visual_motion_input_unit"]["proj"]["kernel"])

        return chained_train

    train_batch = inputs + labels
    plans = {
        "eval": (make_chained_eval(model), (variables, inputs), steps),
        "train": (make_chained_train(model), (state, train_batch), train_steps),
    }

    # ---- trained-weights agreement gates (round-3 verdict item 1) ----
    # benchmarks/fastpath_accuracy.py leaves a bundle of TRAINED params +
    # a real val micro-batch; when present, the fast-path agreement is
    # re-measured there instead of only at random init (where 4k-way logits
    # are near-tied and argmax agreement is a worst case). When the bundle is
    # absent (fresh checkout) or the clock budget is hit, the skip is
    # recorded LOUDLY in the JSON ("trained_gates": "skipped: ...") so a
    # reader never mistakes a missing gate for a passing one.
    # NOTE: trained_bf16_max_abs_err == 0.0 is the EXPECTED on-chip value —
    # TPU fp32 matmuls default to a single bf16 MXU pass, so the eval-path
    # streaming is bitwise-identical (benchmarks/precision_probe.py).
    trained = {}
    bundle_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "benchmarks", "fastpath_trained.msgpack",
    )
    if not os.path.exists(bundle_path):
        trained["trained_gates"] = (
            "skipped: bundle absent — run benchmarks/fastpath_accuracy.py"
        )
    elif time.time() - _T_START >= float(
        os.environ.get("BENCH_TIME_BUDGET", "420")
    ):
        trained["trained_gates"] = "skipped: BENCH_TIME_BUDGET exhausted"
    else:
        import flax.serialization

        from dualvgr_tpu.models import DualVGR as _DualVGR

        with open(bundle_path, "rb") as f:
            bundle = flax.serialization.msgpack_restore(f.read())
        mk = {
            k: (int(v) if isinstance(v, (int, np.integer)) else v)
            for k, v in bundle["model_kwargs"].items()
        }
        vb = bundle["val_batch"]
        t_inputs = tuple(
            jnp.asarray(vb[k]) for k in ("app", "mot", "q", "qlen")
        )
        t_vars = {
            "params": bundle["params"],
            "batch_stats": bundle.get("batch_stats") or {},
        }

        def _t_logits(m_):
            return np.asarray(
                jax.jit(
                    lambda v, i: m_.apply(
                        v, i[0], i[1], i[2], i[3], train=False
                    ).logits
                )(t_vars, t_inputs)
            )

        t_anchor = _t_logits(_DualVGR(use_pallas=False, **mk))
        t16 = _t_logits(
            _DualVGR(use_pallas=False, compute_dtype="bfloat16", **mk)
        )
        trained = {
            "trained_n": int(t_anchor.shape[0]),
            "trained_bf16_argmax_agreement": round(
                float((t16.argmax(-1) == t_anchor.argmax(-1)).mean()), 4
            ),
            "trained_bf16_max_abs_err": round(
                float(np.max(np.abs(t16 - t_anchor))), 5
            ),
        }
        if use_pallas:
            tp_ = _t_logits(_DualVGR(use_pallas=True, **mk))
            trained["trained_pallas_argmax_agreement"] = round(
                float((tp_.argmax(-1) == t_anchor.argmax(-1)).mean()), 4
            )
            trained["trained_pallas_max_abs_err"] = round(
                float(np.max(np.abs(tp_ - t_anchor))), 5
            )
        trained["trained_gates"] = "ok"
        _stage("trained-weights gates done")

    # ---- bf16 compute_dtype (interleaved with fp32) ----
    # Measures the mixed-precision path (bf16 operands in every wide matmul,
    # fp32 accumulate/params/recurrence) and its numeric distance from fp32.
    # Since round 4 this IS the headline: tpu.compute_dtype defaults to
    # "auto" -> bfloat16 on TPU, and the bf16 eval path is BITWISE-identical
    # to fp32 on trained weights (benchmarks/precision_probe.py,
    # benchmarks/fastpath_accuracy.json: 0 argmax flips) — the fp32 numbers
    # stay as secondary keys with unchanged semantics for cross-round
    # comparison.
    over_budget = time.time() - _T_START > float(
        os.environ.get("BENCH_TIME_BUDGET", "420")
    )
    if over_budget:
        # cold compile cache ate the wall clock: guarantee the headline
        # metric still prints by skipping the secondary bf16 measurements
        # (the persistent cache makes the next run fast and complete)
        _stage("over time budget, skipping bf16 secondary metrics")
    bf16 = {}
    with_bf16 = not over_budget and os.environ.get("BENCH_BF16", "1") == "1"
    if with_bf16:
        lo16 = np.asarray(
            jax.jit(
                lambda v, i: model16.apply(
                    v, i[0], i[1], i[2], i[3], train=False
                ).logits
            )(variables, inputs)
        )
        ref_logits = lx if lx is not None else np.asarray(
            jax.jit(
                lambda v, i: model_xla.apply(
                    v, i[0], i[1], i[2], i[3], train=False
                ).logits
            )(variables, inputs)
        )
        bf16_err = float(np.max(np.abs(lo16 - ref_logits)))
        bf16_agree = float((lo16.argmax(-1) == ref_logits.argmax(-1)).mean())
        plans["eval_bf16"] = (
            make_chained_eval(model16), (variables, inputs), steps
        )
        plans["train_bf16"] = (
            make_chained_train(model16), (state, train_batch), train_steps
        )

    per, raw = _time_interleaved(plans)
    _stage("interleaved timing done")

    eval_per_step = per["eval"]
    train_per_step = per["train"]
    eval_qa_per_sec_chip = batch / eval_per_step / n_chips
    train_qa_per_sec_chip = batch / train_per_step / n_chips

    # ---- MFU from analytic matmul FLOPs ----
    fkw = dict(
        vision_dim=2048, module_dim=768, word_dim=300, num_answers=num_answers,
        num_of_nodes=16, frames_per_clip=16, q_len=t,
        unit_layers=1, graph_layers=1,
    )
    eval_flops_qa = dualvgr_forward_flops(**fkw)
    train_flops_qa = dualvgr_train_flops(**fkw)
    peak = PEAK_TFLOPS * 1e12
    eval_mfu = eval_flops_qa * eval_qa_per_sec_chip / peak
    train_mfu = train_flops_qa * train_qa_per_sec_chip / peak
    if with_bf16:
        qps16 = batch / per["eval_bf16"] / n_chips
        tqps16 = batch / per["train_bf16"] / n_chips
        bf16 = {
            "eval_bf16_qa_per_sec_per_chip": round(qps16, 2),
            "eval_bf16_mfu": round(eval_flops_qa * qps16 / peak, 4),
            "train_bf16_qa_per_sec_per_chip": round(tqps16, 2),
            "train_bf16_mfu": round(train_flops_qa * tqps16 / peak, 4),
            "bf16_vs_fp32_max_abs_err": round(bf16_err, 5),
            "bf16_argmax_agreement": round(bf16_agree, 4),
        }

    # headline = the SHIPPED DEFAULT serving path (use_pallas auto +
    # compute_dtype auto -> bf16 on TPU; accuracy-identical to fp32 on
    # trained weights). Falls back to the fp32 measurement when the bf16
    # secondary was skipped (over budget / BENCH_BF16=0).
    headline_qps = qps16 if with_bf16 else eval_qa_per_sec_chip
    headline_path = (
        ("pallas+" if use_pallas else "xla+")
        + ("bf16(default)" if with_bf16 else "fp32(bf16 skipped)")
    )
    print(
        json.dumps(
            {
                "metric": "msrvtt_eval_qa_pairs_per_sec_per_chip",
                "value": round(headline_qps, 2),
                "unit": "qa/s/chip",
                "vs_baseline": round(headline_qps / baseline, 3),
                "headline_path": headline_path,
                "eval_fp32_qa_per_sec_per_chip": round(eval_qa_per_sec_chip, 2),
                "flops_per_qa": eval_flops_qa,
                "eval_mfu": round(eval_mfu, 4),
                "train_qa_per_sec_per_chip": round(train_qa_per_sec_chip, 2),
                "train_step_ms": round(train_per_step * 1e3, 2),
                "train_flops_per_qa": train_flops_qa,
                "train_mfu": round(train_mfu, 4),
                "peak_tflops": PEAK_TFLOPS,
                "baseline_qa_per_sec": baseline,
                "pallas_gate": gates["eval"],
                "train_grad_gate": gates["train_grads"],
                # per-round raw per-step times (ms) for every configuration:
                # lets a reader separate real regressions from tunnel drift
                # (the headline is the min; the spread is the drift)
                "raw_ms_per_round": {
                    k: [round(t * 1e3, 3) for t in v] for k, v in raw.items()
                },
                **trained,
                **bf16,
            }
        )
    )


if __name__ == "__main__":
    main()
