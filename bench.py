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

Stage order is PRIORITY order, with a budget check between stages, so a
cold compile cache degrades the artifact from the tail, never the head
(the r04 driver run skipped exactly the shipped-default claims because
secondary work ran first — BENCH_r04.json postmortem):

  1. state init       CPU-EAGER flax init + device_put + on-device opt.init
                      (no TPU compile; the on-device init program alone
                      cost 161 s cold through the tunnel)
  2. HEADLINE timing  chained eval + train under pallas+bf16 (the shipped
                      default), warmed and sampled FIRST
  3. trained gates    bf16/Pallas argmax agreement + max-abs-err on TRAINED
                      weights (benchmarks/fastpath_trained.msgpack;
                      regenerated on demand when absent and budget allows)
  4. drift canary     a fixed chained (8192,2048)x(2048,1536)x(1536,2048)
                      matmul program timed every run — separates real
                      regressions from tunnel/clock drift across rounds.
                      NOT first: its per-process program-load/first-exec
                      over the tunnel measured 30-324 s across runs, and
                      the headline + trained gates must never wait on it
                      (a 324 s canary stall once pushed both out of budget)
  5. fp32 timing      fp32 eval + train warmed, then ALL configurations
                      re-timed in interleaved rounds (each round measures
                      every configuration once -> the fp32-vs-bf16 deltas
                      are robust to multi-percent tunnel drift)
  6. random-init gates on-device Pallas == XLA: eval logits (atol 1e-3) and
                      one train step's loss + PER-MODULE gradient norms
                      (rel tol BENCH_GRAD_TOL, default 2e-3 — per-module
                      catches a single-module backward bug the global norm,
                      dominated by ~1e6-magnitude HSIC gradients, can hide)

Skipped stages are recorded LOUDLY in the JSON (never silently absent); a
FAILED gate is recorded in its field and the process exits rc=1 AFTER
printing the JSON, so evidence is never lost to an assert.

Timing methodology: each configuration is a single jitted program running n
chained iterations in one ``lax.fori_loop`` (n is a TRACED argument — one
compile serves every n; plain block_until_ready is unreliable under
tunneled platforms, so completion is forced by fetching a scalar that
depends on every iteration). The chain must feed EVERY independent input
path of the model or XLA hoists the untouched path out of the loop as
loop-invariant (measured: 3 ms/step flattered) — so it perturbs the visual
input tensors and the embedding table each iteration. The 1-iteration run
subtracts launch/fetch overhead; min over interleaved rounds.

MFU is computed from the analytic matmul FLOPs of the workload
(dualvgr_tpu/utils/flops.py, cross-checked against XLA cost analysis in
tests/test_flops.py) against the chip's peak (default 197 TFLOPS, v5e bf16;
override with BENCH_PEAK_TFLOPS).

Prints ONE JSON line; the primary triple stays {"metric", "value", "unit",
"vs_baseline"}, extra keys carry MFU/train/gate/canary evidence.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Fallback if benchmarks/baseline.json is missing: measured reference CPU
# qa/s (actual /root/reference code, single-core host) x 30 GPU uplift.
REFERENCE_QA_PER_SEC = 592.0
PEAK_TFLOPS = float(os.environ.get("BENCH_PEAK_TFLOPS", "197"))
_T_START = time.time()


def _budget() -> float:
    return float(os.environ.get("BENCH_TIME_BUDGET", "420"))


def _remaining() -> float:
    return _budget() - (time.time() - _T_START)


def _over_budget(reserve: float = 0.0) -> bool:
    """Single budget predicate for every stage (same boundary semantics)."""
    return _remaining() <= reserve


def _measure_once(fn, args, steps):
    """One (t_1, t_{n+1}) pair of a chained fn (already warmed)."""
    t0 = time.perf_counter()
    float(fn(*args, 1))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(fn(*args, steps + 1))
    tn = time.perf_counter() - t0
    return t1, tn


def _per_step(pairs, steps):
    """(min(t_{n+1}) - min(t_1)) / steps over (t1, tn) sample pairs.

    Subtracting PAIRWISE and taking the min of differences is biased LOW:
    it cherry-picks the round whose 1-iteration overhead probe happened to
    be slow (the canary measured 112% of peak that way — physically
    impossible). min(tn) - min(t1) takes each term's own best case; both
    are floors of the same constant overhead + k iterations, so the
    difference is the cleanest n-iteration estimate the host clock gives.

    If a tunnel stall inflates every t1 probe past min(tn) the floor
    collapses to <= 0 — or to a barely-positive sliver reporting an
    impossible rate; fall back to the median pairwise difference rather
    than report either (or divide by zero downstream). In clean data the
    floor tracks the median within ~10%, so the half-median sanity cap
    never engages.
    """
    est = (min(tn for _, tn in pairs) - min(t1 for t1, _ in pairs)) / steps
    diffs = sorted(max(tn - t1, 0.0) / steps for t1, tn in pairs)
    median = diffs[len(diffs) // 2]
    if est <= 0.0 or est < 0.5 * median:
        est = median
    if est <= 0.0:  # every probe outran its n-step run: report the loose
        est = min(tn for _, tn in pairs) / steps  # overestimate, never 0/inf
    return est


def _time_interleaved(named, repeats=5, raw=None):
    """Interleaved timing over {name: (fn, args, steps)}.

    Every repeat round measures EVERY configuration once before the next
    round starts, so slow drift (tunnel load, clocks) hits all
    configurations equally — the fp32-vs-bf16 deltas stay honest. ``raw``
    lets earlier priority samples (the headline-securing pass) fold into
    the per-configuration estimate.
    """
    raw = {k: list((raw or {}).get(k, [])) for k in named}
    for _ in range(repeats):
        for k, (fn, args, steps) in named.items():
            raw[k].append(_measure_once(fn, args, steps))
    best = {k: _per_step(v, named[k][2]) for k, v in raw.items()}
    return best, raw


def _stage(msg):
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


def _fast_create_state(model_xla, opt, seed, prng_impl, example_host, device):
    """TrainState at flagship shapes WITHOUT compiling the init program.

    The on-device flax init compiled for 161 s cold through the tunnel
    (BENCH_r04.json); running the same init EAGERLY on the host CPU backend
    (~22 s, zero XLA compiles) and shipping the ~107 MB of params over
    (~1 s at the measured 93 MB/s) is 6x faster. Distribution-identical,
    not bitwise: under the default rbg impl the drawn bits are
    backend-defined (XLA RngBitGenerator), so CPU-eager weights differ
    from what on-device init would draw — irrelevant here because every
    gate compares two programs on the SAME weights within one run; exact
    gate values just aren't comparable against pre-r5 device-init rounds.
    The Adam moments are zeros_like trees — created on device by a
    trivially-compiled opt.init. Set BENCH_INIT=device to restore the old
    on-device path.
    """
    import jax

    from dualvgr_tpu import train_lib

    if os.environ.get("BENCH_INIT", "cpu") == "device":
        return train_lib.create_train_state(
            model_xla, jax.random.key(seed, impl=prng_impl), example_host, opt
        )

    import jax.numpy as jnp

    app, mot, q, qlen = example_host
    cpu = jax.devices("cpu")[0]
    with jax.disable_jit(), jax.default_device(cpu):
        # the key is created ON the CPU: committed arrays win eager
        # placement over default_device, so a TPU-resident key routes every
        # eager init op through the tunnel — and even device_put'ing a
        # TPU key back costs ~2 min behind the queued input generation.
        # (The KEY is deterministic in seed+impl; the values later DRAWN
        # from it are backend-defined under rbg — see docstring.)
        root_key = jax.random.key(seed, impl=prng_impl)
        init_rng, state_rng = jax.random.split(root_key)
        variables = model_xla.init(
            {"params": init_rng, "dropout": init_rng},
            np.asarray(app), np.asarray(mot), np.asarray(q), np.asarray(qlen),
            train=False,
        )
    _stage("cpu eager init done")
    params = jax.device_put(variables["params"], device)
    batch_stats = jax.device_put(variables.get("batch_stats", {}), device)
    opt_state = jax.jit(opt.init)(params)
    jax.block_until_ready(opt_state)
    _stage("params shipped + opt.init done")
    return train_lib.TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        rng=jax.device_put(state_rng, device),
    )


def _canary(steps: int = 100, repeats: int = 4):
    """Fixed chained-matmul drift canary: (8192,2048)@(2048,1536) then
    @(1536,2048), tanh between, n iterations in one program. Its ms/iter is
    independent of this repo's model code, so cross-round artifact deltas
    split into (canary moved -> tunnel/clock drift) vs (canary flat, model
    moved -> real regression). ~103.1 analytic GFLOP per iteration; 100
    chained iterations (~52 ms) so the launch/fetch overhead subtraction is
    a few percent of the chain, not comparable to it."""
    import jax
    import jax.numpy as jnp

    x = jax.random.normal(jax.random.PRNGKey(1), (8192, 2048), jnp.float32)
    w1 = jax.random.normal(jax.random.PRNGKey(2), (2048, 1536), jnp.float32) * 0.02
    w2 = jax.random.normal(jax.random.PRNGKey(3), (1536, 2048), jnp.float32) * 0.02

    @jax.jit
    def chained(x, w1, w2, n):
        def body(i, c):
            return jnp.tanh(jnp.tanh(c @ w1) @ w2)

        return jax.lax.fori_loop(0, n, body, x).sum()

    float(chained(x, w1, w2, 1))  # compile + warm
    pairs = [_measure_once(chained, (x, w1, w2), steps) for _ in range(repeats)]
    t = _per_step(pairs, steps)
    flops = 2 * 8192 * 2048 * 1536 * 2
    return {
        "canary_ms": round(t * 1e3, 3),
        "canary_tflops": round(flops / t / 1e12, 2),
        "canary_raw_ms": [
            round((tn - t1) / steps * 1e3, 3) for t1, tn in pairs
        ],
    }


def main():
    import functools

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

    _stage("imports + backend up")

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
    # appearance batch through a tunneled host->device path measures nothing
    # (real serving streams from the loader's prefetch pipeline).
    # Question/label arrays are tiny and stay host-side.
    kapp, kmot = jax.random.split(jax.random.PRNGKey(0))
    app = jax.random.normal(kapp, (batch, 16, 16, 2048), jnp.float32)
    mot = jax.random.normal(kmot, (batch, 16, 2048), jnp.float32)
    jax.block_until_ready(mot)
    _stage("on-device inputs generated")
    q = rng.randint(1, vocab_size, (batch, t)).astype(np.int32)
    qlen = rng.randint(4, t + 1, (batch,)).astype(np.int32)
    for i in range(batch):
        q[i, qlen[i]:] = 0
    answers = rng.randint(0, num_answers, (batch,)).astype(np.int32)
    valid = np.ones((batch,), np.float32)

    opt = train_lib.make_optimizer(1e-4, 100)
    example_host = (
        np.zeros((1, 16, 16, 2048), np.float32),
        np.zeros((1, 16, 2048), np.float32),
        q[:1], qlen[:1],
    )
    # rbg: the hardware PRNG the flagship configs ship with (tpu.prng_impl;
    # dropout mask generation off the threefry critical path)
    state = _fast_create_state(
        model_xla, opt, 666, os.environ.get("BENCH_PRNG", "rbg"),
        example_host, jax.devices()[0],
    )
    _stage("state init done")
    mesh = data_mesh()
    n_chips = mesh.size
    state = replicate(state, mesh)
    inputs = shard_batch((app, mot, q, qlen), mesh)
    labels = shard_batch((answers, valid), mesh)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    train_batch = inputs + labels

    # ---- chained timing programs ----
    # Every independent input path must be perturbed per-iteration (visual
    # INPUT tensors + the embedding table every question-path op depends on)
    # or XLA hoists the untouched subgraph out of the loop — see module
    # docstring. ``n`` is a traced argument: ONE compile per configuration
    # serves both the 1-iteration overhead probe and the n-step chain.
    def _perturbed_vars(variables, eps):
        p = dict(variables["params"])
        li = dict(p["linguistic_input_unit"])
        li["encoder_embed"] = {
            "embedding": li["encoder_embed"]["embedding"] + eps
        }
        p["linguistic_input_unit"] = li
        return {**variables, "params": p}

    def make_chained_eval(m_):
        @jax.jit
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
        @jax.jit
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

    skips: dict = {}
    failures: list = []

    # ---- stage 2: HEADLINE (pallas + bf16, the shipped default) first ----
    plans = {
        "eval_bf16": (make_chained_eval(model16), (variables, inputs), steps),
        "train_bf16": (make_chained_train(model16), (state, train_batch), train_steps),
    }
    raw: dict = {k: [] for k in plans}
    for k, (fn, args, n) in plans.items():
        float(fn(*args, 1))  # compile + warm
        raw[k].append(_measure_once(fn, args, n))
    _stage("bf16 headline warmed + sampled")

    # ---- stage 3: trained-weights agreement gates ----
    # benchmarks/fastpath_accuracy.py leaves a bundle of TRAINED params + a
    # real val micro-batch; the fast-path agreement is re-measured there
    # instead of only at random init (where 4k-way logits are near-tied and
    # argmax agreement is a worst case). Absent bundle: regenerated on the
    # spot when the budget allows (it is gitignored — a 121 MB blob has no
    # business in git history), else skipped LOUDLY with the recipe.
    # NOTE: trained_bf16_max_abs_err == 0.0 is the EXPECTED on-chip value —
    # TPU fp32 matmuls default to a single bf16 MXU pass, so the eval-path
    # streaming is bitwise-identical (benchmarks/precision_probe.py).
    # Runs BEFORE the canary and fp32: with the bundle on disk it costs
    # ~25 s warm, and it is the round's second-most-important claim.
    trained = _trained_gates(use_pallas, failures)
    if "trained_gates" in trained and trained["trained_gates"].startswith("ok"):
        _stage("trained-weights gates done")

    # ---- stage 4: drift canary (variable tunnel cost — see docstring) ----
    canary = _canary()
    _stage(f"canary done ({canary['canary_ms']} ms, {canary['canary_tflops']} tflops)")

    # ---- stage 5: fp32 secondary, then interleaved rounds over all ----
    with_fp32 = not _over_budget()
    if with_fp32:
        plans["eval"] = (make_chained_eval(model), (variables, inputs), steps)
        plans["train"] = (make_chained_train(model), (state, train_batch), train_steps)
        for k in ("eval", "train"):
            fn, args, n = plans[k]
            float(fn(*args, 1))
            raw[k] = [_measure_once(fn, args, n)]
        _stage("fp32 warmed")
    else:
        skips["fp32_timing"] = (
            f"skipped: BENCH_TIME_BUDGET exhausted after bf16 headline "
            f"({_remaining():.0f}s left)"
        )
        _stage("over budget: fp32 timing skipped")
    per, raw = _time_interleaved(plans, raw=raw)
    _stage("interleaved timing done")

    # ---- MFU from analytic matmul FLOPs ----
    fkw = dict(
        vision_dim=2048, module_dim=768, word_dim=300, num_answers=num_answers,
        num_of_nodes=16, frames_per_clip=16, q_len=t,
        unit_layers=1, graph_layers=1,
    )
    eval_flops_qa = dualvgr_forward_flops(**fkw)
    train_flops_qa = dualvgr_train_flops(**fkw)
    peak = PEAK_TFLOPS * 1e12

    qps16 = batch / per["eval_bf16"] / n_chips
    tqps16 = batch / per["train_bf16"] / n_chips
    bf16 = {
        "eval_bf16_qa_per_sec_per_chip": round(qps16, 2),
        "eval_bf16_mfu": round(eval_flops_qa * qps16 / peak, 4),
        "train_bf16_qa_per_sec_per_chip": round(tqps16, 2),
        "train_bf16_mfu": round(train_flops_qa * tqps16 / peak, 4),
        "train_bf16_step_ms": round(per["train_bf16"] * 1e3, 2),
    }
    fp32 = {}
    if with_fp32:
        eval_qps = batch / per["eval"] / n_chips
        train_qps = batch / per["train"] / n_chips
        fp32 = {
            "eval_fp32_qa_per_sec_per_chip": round(eval_qps, 2),
            "eval_mfu": round(eval_flops_qa * eval_qps / peak, 4),
            "train_qa_per_sec_per_chip": round(train_qps, 2),
            "train_step_ms": round(per["train"] * 1e3, 2),
            "train_mfu": round(train_flops_qa * train_qps / peak, 4),
        }

    # ---- stage 6: on-device Pallas == XLA gates at random init ----
    gates = {"eval": "skipped: BENCH_PALLAS=0", "train_grads": "skipped: BENCH_PALLAS=0"}
    if use_pallas:
        gates = _random_init_gates(
            model, model_xla, state, variables, inputs, labels, failures
        )

    lines = {
        "metric": "msrvtt_eval_qa_pairs_per_sec_per_chip",
        "value": round(qps16, 2),
        "unit": "qa/s/chip",
        "vs_baseline": round(qps16 / baseline, 3),
        "headline_path": ("pallas+" if use_pallas else "xla+") + "bf16(default)",
        "flops_per_qa": eval_flops_qa,
        "train_flops_per_qa": train_flops_qa,
        "peak_tflops": PEAK_TFLOPS,
        "baseline_qa_per_sec": baseline,
        **canary,
        **bf16,
        **fp32,
        **skips,
        "pallas_gate": gates["eval"],
        "train_grad_gate": gates["train_grads"],
        # per-round raw per-step times (ms) for every configuration: lets a
        # reader separate real regressions from tunnel drift (the headline
        # uses min(t_n)-min(t_1); the spread here is the drift)
        "raw_ms_per_round": {
            k: [round((tn - t1) / plans[k][2] * 1e3, 3) for t1, tn in v]
            for k, v in raw.items()
        },
        **trained,
        "wall_s": round(time.time() - _T_START, 1),
        "time_budget_s": _budget(),
    }
    print(json.dumps(lines))
    if failures:
        print(f"# bench FAILED gates: {failures}", file=sys.stderr)
        sys.exit(1)


def _trained_gates(use_pallas: bool, failures: list) -> dict:
    """bf16/Pallas argmax agreement + max-abs-err on TRAINED weights.

    Never raises: every failure mode lands in the returned dict (and
    ``failures`` for a non-ok exit code) so the JSON always prints with an
    explicit status — a reader can never mistake a missing gate for a
    passing one."""
    import jax
    import jax.numpy as jnp

    bundle_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "benchmarks", "fastpath_trained.msgpack",
    )
    regen_reserve = float(os.environ.get("BENCH_REGEN_RESERVE", "240"))
    if not os.path.exists(bundle_path):
        if _over_budget(regen_reserve):
            return {
                "trained_gates": (
                    "skipped: bundle absent and budget too low to regenerate "
                    f"({_remaining():.0f}s < {regen_reserve:.0f}s reserve) — "
                    "run benchmarks/fastpath_accuracy.py"
                )
            }
        try:
            from benchmarks.fastpath_accuracy import regenerate_bundle

            regenerate_bundle(bundle_path)
            _stage("trained bundle regenerated")
        except Exception as e:  # noqa: BLE001 — record, don't lose the JSON
            failures.append(f"trained_gates regen: {e!r}")
            return {"trained_gates": f"error regenerating bundle: {e!r}"}
    if _over_budget():
        return {"trained_gates": "skipped: BENCH_TIME_BUDGET exhausted"}

    try:
        import flax.serialization

        from dualvgr_tpu.models import DualVGR as _DualVGR

        with open(bundle_path, "rb") as f:
            bundle = flax.serialization.msgpack_restore(f.read())
        mk = {
            k: (int(v) if isinstance(v, (int, np.integer)) else v)
            for k, v in bundle["model_kwargs"].items()
        }
        vb = bundle["val_batch"]
        t_inputs = tuple(jnp.asarray(vb[k]) for k in ("app", "mot", "q", "qlen"))
        t_vars = {
            "params": bundle["params"],
            "batch_stats": bundle.get("batch_stats") or {},
        }

        # ONE jit for all configurations: a single remote-compile round trip
        # instead of three (per-program overhead dominates at these dims)
        models = {
            "anchor": _DualVGR(use_pallas=False, **mk),
            "bf16": _DualVGR(use_pallas=False, compute_dtype="bfloat16", **mk),
        }
        if use_pallas:
            models["pallas"] = _DualVGR(use_pallas=True, **mk)

        @jax.jit
        def all_logits(v, i):
            return {
                name: m_.apply(v, i[0], i[1], i[2], i[3], train=False).logits
                for name, m_ in models.items()
            }

        outs = {k: np.asarray(v) for k, v in all_logits(t_vars, t_inputs).items()}
        anchor = outs["anchor"]
        trained = {"trained_n": int(anchor.shape[0])}
        for name in ("bf16", "pallas"):
            if name not in outs:
                continue
            o = outs[name]
            trained[f"trained_{name}_argmax_agreement"] = round(
                float((o.argmax(-1) == anchor.argmax(-1)).mean()), 4
            )
            trained[f"trained_{name}_max_abs_err"] = round(
                float(np.max(np.abs(o - anchor))), 5
            )
        trained["trained_gates"] = "ok"
        return trained
    except Exception as e:  # noqa: BLE001 — record, don't lose the JSON
        failures.append(f"trained_gates: {e!r}")
        return {"trained_gates": f"error: {e!r}"}


def _random_init_gates(model, model_xla, state, variables, inputs, labels, failures):
    """On-device Pallas == XLA equivalence at random init (real chip, not
    interpret mode): eval logits (atol 1e-3), then one train step's loss +
    per-module gradient norms (rel tol BENCH_GRAD_TOL). Budget-checked per
    gate; a FAILED gate is recorded (and exits rc=1 after the JSON prints)
    instead of crashing the artifact away."""
    import jax

    gates = {"eval": "skipped", "train_grads": "skipped"}
    if _over_budget():
        gates["eval"] = gates["train_grads"] = "skipped: BENCH_TIME_BUDGET exhausted"
        return gates

    try:
        @jax.jit
        def both_logits(variables, inputs):
            a, m, qq, ql = inputs
            lp = model.apply(variables, a, m, qq, ql, train=False).logits
            lx = model_xla.apply(variables, a, m, qq, ql, train=False).logits
            return lp, lx

        lp, lx = both_logits(variables, inputs)
        lp, lx = np.asarray(lp), np.asarray(lx)
        err = float(np.max(np.abs(lp - lx)))
        if np.allclose(lp, lx, atol=1e-3):
            gates["eval"] = f"ok max_abs_err={err:.2e}"
        else:
            gates["eval"] = f"FAILED max_abs_err={err:.2e} (atol 1e-3)"
            failures.append(gates["eval"])
        _stage("eval gate done")
    except Exception as e:  # noqa: BLE001
        gates["eval"] = f"error: {e!r}"
        failures.append(gates["eval"])
        return gates

    if _over_budget():
        gates["train_grads"] = "skipped: BENCH_TIME_BUDGET exhausted"
        return gates

    try:
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
        if rel_l < 1e-3 and not bad:
            worst_mod = max(rel_by_module, key=rel_by_module.get)
            gates["train_grads"] = (
                f"ok rel_loss={rel_l:.2e} per-module gnorm rel<= "
                f"{rel_by_module[worst_mod]:.2e} ({worst_mod}); "
                + " ".join(f"{k}={v:.1e}" for k, v in sorted(rel_by_module.items()))
            )
        else:
            gates["train_grads"] = (
                f"FAILED loss {loss_p} vs {loss_x} (rel {rel_l:.2e}), "
                f"per-module gnorm rel errs over tol {grad_tol}: "
                f"{ {k: f'{v:.2e}' for k, v in (bad or rel_by_module).items()} }"
            )
            failures.append(gates["train_grads"])
        _stage("train-grad gate done")
    except Exception as e:  # noqa: BLE001
        gates["train_grads"] = f"error: {e!r}"
        failures.append(gates["train_grads"])
    return gates


if __name__ == "__main__":
    main()
