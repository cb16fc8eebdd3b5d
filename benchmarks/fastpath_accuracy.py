"""Accuracy-gate evidence for every fast path, measured on TRAINED weights.

The north-star gate is <= 0.2% absolute ACCURACY delta vs the reference
stack (BASELINE.md; reference eval surface validate.py:23-235). The bench's
numeric gates (bench.py) verify the fast paths at random init, where 4k-way
logits are near-tied and argmax agreement is a worst case. THIS harness
produces the missing evidence (round-3 verdict item 1): it trains the model
to a (sub-ceiling, label-noised) plateau in the anchor configuration, then
evaluates the SAME trained weights under every serving configuration, and
additionally trains end-to-end under bf16 compute:

  paths evaluated on the fp32-trained weights
    fp32_xla       anchor (plain XLA, fp32 everywhere)
    pallas         fused Pallas kernels (TPU only; skipped elsewhere)
    bf16_compute   DualVGR(compute_dtype=bfloat16): bf16 operands in every
                   wide matmul, fp32 accumulation/params
    bf16_transfer  features RNE-cast to bfloat16 before the model (the
                   numeric effect of cfg.tpu.transfer_dtype — the loader
                   mechanics themselves are tested in
                   tests/test_transfer_dtype.py; the cast-once semantics
                   here are identical to FeatureStore(store_dtype=bfloat16),
                   dualvgr_tpu/data/features.py:82-110)
    combined       all of the above at once (the full TPU-fast deployment)

  end-to-end bf16 training
    a second model trains from the SAME init with compute_dtype=bfloat16;
    its converged val accuracy is compared to the fp32-trained anchor.

Statistical power (round-4 verdict item 2): the eval split is sized so the
0.2% gate is RESOLVABLE, not just bounded — ``eval_questions_per_video``
blows the val+test splits up to n_eval ~ 20k (0.005%/question) while the
train split (which sets the training cost) stays at 420 questions. Every
accuracy carries an exact Clopper-Pearson 95% CI; every delta carries a
PAIRED 95% CI from the discordant-pair binomial (McNemar construction: for
m = n01+n10 discordant answers, n01 ~ Binom(m, p) and
delta = (2p-1)·m/n — for the eval fast paths, which share weights with the
anchor, zero flips therefore means delta = 0 with CI [0, 0] EXACTLY, and
the 0.2% gate is resolved with certainty rather than bounded at n=180).

Training runs entirely on-device: the full fixture's features are uploaded
once and batches are gathered by index inside jit, so the harness is fast
even through a tunneled TPU. The fixture carries 30% label noise (see
dualvgr_tpu/data/synthetic.py::generate label_noise) so accuracy plateaus
well below 100% and per-path deltas are measured where they can actually
show up.

Artifacts
  benchmarks/fastpath_accuracy.json   committed evidence (per-path accuracy
                                      + CI, paired delta CI, argmax flips)
  benchmarks/fastpath_trained.msgpack gitignored: trained params +
                                      batch_stats + model kwargs + a val
                                      micro-batch, so bench.py can run its
                                      agreement gates at trained weights
                                      instead of random init. Regenerate
                                      any time with
                                      ``python -c "from benchmarks.fastpath_accuracy
                                      import regenerate_bundle; regenerate_bundle()"``
                                      (bench.py does this itself when the
                                      bundle is absent and budget allows).

Usage: python benchmarks/fastpath_accuracy.py [--epochs 12] [--out DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import tempfile

import h5py
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Flagship-precision shapes: the dims that matter for fp32-vs-bf16 rounding
# and for the Pallas kernels' real (non-interpret) code path — vision_dim
# 2048, module_dim 768, 4 GAT heads x 192 — at a fixture size that trains
# to plateau in seconds of device time. vocab/answers are reduced (the
# flagship 8k/4k head is untrainable on a 600-question fixture); num_clips 8
# matches the shipped msvd config (configs/msvd_qa_DualVGR.yml).
# eval_questions_per_video=680 -> n_eval = 30 eval videos x 680 = 20,400
# (0.005%/question): large enough that the paired CIs resolve the 0.2% gate.
FIXTURE = dict(
    dataset="svqa",
    num_videos=100,
    questions_per_video=6,
    eval_questions_per_video=680,
    num_clips=8,
    vision_dim=2048,
    frames=16,
    num_answers=60,
    vocab_size=600,
    max_q_len=16,
    word_dim=300,
    module_dim=768,
    batch_size=32,
    seed=0,
    label_noise=0.3,
)
MODEL_KW = dict(graph_layers=1, unit_layers=1)  # flagship bench config
LR = 1e-3
ALPHA, BETA = 1.0, 1e-8
SEED = 666
EVAL_BS = 256  # eval-only batch (training keeps fix["batch_size"])


def _binom_ci(k: int, n: int, conf: float = 0.95):
    """Exact (Clopper-Pearson) binomial CI on k successes out of n."""
    from scipy.stats import beta

    a = (1.0 - conf) / 2.0
    lo = 0.0 if k == 0 else float(beta.ppf(a, k, n - k + 1))
    hi = 1.0 if k == n else float(beta.ppf(1.0 - a, k + 1, n - k))
    return lo, hi


def _paired_delta_ci(path_correct: np.ndarray, anchor_correct: np.ndarray,
                     conf: float = 0.95):
    """Paired 95% CI on acc(path) - acc(anchor) over the SAME questions.

    McNemar construction: only discordant answers move the delta. With
    n01 = #(path right, anchor wrong), n10 = #(anchor right, path wrong),
    m = n01 + n10, delta = (n01 - n10)/n, and n01 ~ Binom(m, p) with exact
    CI (lo, hi) on p, the delta CI is ((2·lo - 1)·m/n, (2·hi - 1)·m/n).
    m = 0 (identical correctness on every question) gives CI [0, 0]."""
    n = len(path_correct)
    n01 = int((path_correct & ~anchor_correct).sum())
    n10 = int((~path_correct & anchor_correct).sum())
    m = n01 + n10
    if m == 0:
        return {"delta_ci95": [0.0, 0.0], "n_discordant": 0}
    lo, hi = _binom_ci(n01, m, conf)
    return {
        "delta_ci95": [
            round((2 * lo - 1) * m / n, 6),
            round((2 * hi - 1) * m / n, 6),
        ],
        "n_discordant": m,
    }


def _load_split(data_dir: str, mode: str):
    with open(os.path.join(data_dir, f"svqa_{mode}_questions.pt"), "rb") as f:
        obj = pickle.load(f)
    return obj


def _load_features(data_dir: str):
    with h5py.File(os.path.join(data_dir, "svqa_appearance_feat.h5"), "r") as f:
        app = np.asarray(f["resnet_features"], np.float32)
        ids = np.asarray(f["ids"])
    with h5py.File(os.path.join(data_dir, "svqa_motion_feat.h5"), "r") as f:
        mot = np.asarray(f["resnext_features"], np.float32)
    # row order == ids order in the synthetic fixture (0..N-1)
    assert (ids == np.arange(len(ids))).all()
    return app, mot


def _batches(n: int, batch_size: int, order: np.ndarray):
    for i in range(0, n, batch_size):
        idx = order[i : i + batch_size]
        valid = np.ones(len(idx), np.float32)
        if len(idx) < batch_size:  # pad the final batch, mask the padding
            pad = np.full(batch_size - len(idx), idx[-1])
            idx = np.concatenate([idx, pad])
            valid = np.concatenate([valid, np.zeros(len(pad), np.float32)])
        yield idx, valid


def _build_model(fix: dict, vocab_size: int, num_answers: int, **overrides):
    from dualvgr_tpu.models import DualVGR

    kw = dict(
        vision_dim=fix["vision_dim"],
        module_dim=fix["module_dim"],
        word_dim=fix["word_dim"],
        question_vocab_size=vocab_size,
        num_answers=num_answers,
        num_of_nodes=fix["num_clips"],
        **MODEL_KW,
    )
    kw.update(overrides)
    return DualVGR(**kw)


def _train(fix, model, app_d, mot_d, split, epochs: int, glove):
    """Train on-device (features pre-uploaded); return the trained state."""
    import jax
    import jax.numpy as jnp

    from dualvgr_tpu import train_lib

    q = np.asarray(split["questions"], np.int32)
    qlen = np.asarray(split["questions_len"], np.int32)
    vids = np.asarray(split["video_ids"], np.int32)
    ans = np.asarray(split["answers"], np.int32)
    n = len(ans)
    bs = fix["batch_size"]
    steps_per_epoch = (n + bs - 1) // bs
    opt = train_lib.make_optimizer(LR, steps_per_epoch)

    example = (app_d[:1], mot_d[:1], jnp.asarray(q[:1]), jnp.asarray(qlen[:1]))
    state = train_lib.create_train_state(model, jax.random.PRNGKey(SEED), example, opt)
    if glove is not None:
        state = train_lib.set_glove(state, glove)

    def step(state, app_all, mot_all, vid, qb, qlb, ab, vb):
        batch = (app_all[vid], mot_all[vid], qb, qlb, ab, vb)
        return train_lib.train_step(
            state, batch, model=model, optimizer=opt, alpha=ALPHA, beta=BETA
        )

    step = jax.jit(step, donate_argnums=(0,))
    shuffle = np.random.RandomState(SEED)
    for _epoch in range(epochs):
        order = shuffle.permutation(n)
        for idx, valid in _batches(n, bs, order):
            state, _m = step(
                state, app_d, mot_d,
                jnp.asarray(vids[idx]), jnp.asarray(q[idx]),
                jnp.asarray(qlen[idx]), jnp.asarray(ans[idx]), jnp.asarray(valid),
            )
    return state


def _predict(fix, model, state, app_d, mot_d, split, cast16: bool = False,
             batch_size: int | None = None):
    """Per-question argmax predictions under one serving configuration."""
    import jax
    import jax.numpy as jnp

    q = np.asarray(split["questions"], np.int32)
    qlen = np.asarray(split["questions_len"], np.int32)
    vids = np.asarray(split["video_ids"], np.int32)
    n = len(qlen)
    bs = batch_size or fix["batch_size"]

    def pred(params, batch_stats, app_all, mot_all, vid, qb, qlb):
        a, m = app_all[vid], mot_all[vid]
        if cast16:  # transfer_dtype numerics: RNE cast once, model upcasts
            a = a.astype(jnp.bfloat16)
            m = m.astype(jnp.bfloat16)
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            a, m, qb, qlb, train=False,
        )
        return jnp.argmax(out.logits, axis=1)

    pred = jax.jit(pred)
    preds = []
    order = np.arange(n)
    for idx, valid in _batches(n, bs, order):
        p = np.asarray(
            pred(
                state.params, state.batch_stats, app_d, mot_d,
                jnp.asarray(vids[idx]), jnp.asarray(q[idx]), jnp.asarray(qlen[idx]),
            )
        )
        preds.append(p[valid > 0])
    return np.concatenate(preds)


def _setup(out_dir: str, fix: dict) -> dict:
    """Generate the fixture, load splits + features, upload features once."""
    import jax.numpy as jnp

    from dualvgr_tpu.data.synthetic import generate

    data_dir = os.path.join(out_dir, "data")
    gen = generate(data_dir, **fix)
    train_split = _load_split(data_dir, "train")
    evals = {m: _load_split(data_dir, m) for m in ("val", "test")}
    app, mot = _load_features(data_dir)
    with open(os.path.join(data_dir, "svqa_vocab.json")) as f:
        vocab = json.load(f)
    eval_q = {m: np.asarray(s["answers"], np.int64) for m, s in evals.items()}
    return dict(
        gen=gen,
        data_dir=data_dir,
        train_split=train_split,
        evals=evals,
        app=app,
        mot=mot,
        app_d=jnp.asarray(app),
        mot_d=jnp.asarray(mot),
        vs=len(vocab["question_token_to_idx"]),
        na=len(vocab["answer_token_to_idx"]),
        eval_q=eval_q,
        n_eval=sum(len(v) for v in eval_q.values()),
    )


def _save_bundle(ctx: dict, fix: dict, state, path: str) -> str:
    """Trained-weights bundle for bench.py's agreement gates: params + stats
    + model kwargs + one val micro-batch."""
    import flax.serialization
    import jax

    vsplit = ctx["evals"]["val"]
    k = min(fix["batch_size"], len(vsplit["questions_len"]))
    vid = np.asarray(vsplit["video_ids"][:k], np.int32)
    bundle = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "model_kwargs": dict(
            vision_dim=fix["vision_dim"],
            module_dim=fix["module_dim"],
            word_dim=fix["word_dim"],
            question_vocab_size=ctx["vs"],
            num_answers=ctx["na"],
            num_of_nodes=fix["num_clips"],
            **MODEL_KW,
        ),
        "val_batch": {
            "app": ctx["app"][vid],
            "mot": ctx["mot"][vid],
            "q": np.asarray(vsplit["questions"][:k], np.int32),
            "qlen": np.asarray(vsplit["questions_len"][:k], np.int32),
        },
    }
    with open(path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(bundle))
    return path


def regenerate_bundle(path: str | None = None, epochs: int = 12,
                      out_dir: str | None = None) -> str:
    """Train ONLY the fp32 anchor on the standard fixture and write the
    trained-weights bundle (the gitignored benchmarks/fastpath_trained.msgpack
    that bench.py's trained gates consume). Same fixture, seed, optimizer
    and epoch count as :func:`run`, so the bundle is the run() bundle."""
    fix = dict(FIXTURE)
    out_dir = out_dir or tempfile.mkdtemp(prefix="fastpath_bundle_")
    ctx = _setup(out_dir, fix)
    model = _build_model(fix, ctx["vs"], ctx["na"], use_pallas=False)
    state = _train(fix, model, ctx["app_d"], ctx["mot_d"], ctx["train_split"],
                   epochs, ctx["train_split"]["glove"])
    path = path or os.path.join(REPO, "benchmarks", "fastpath_trained.msgpack")
    return _save_bundle(ctx, fix, state, path)


def run(out_dir: str, epochs: int = 12, fixture_overrides: dict | None = None,
        save_trained: bool = True, bundle_path: str | None = None) -> dict:
    import jax

    fix = dict(FIXTURE)
    if fixture_overrides:
        fix.update(fixture_overrides)
    ctx = _setup(out_dir, fix)
    on_tpu = jax.default_backend() == "tpu"

    train_split = ctx["train_split"]
    evals = ctx["evals"]
    app_d, mot_d = ctx["app_d"], ctx["mot_d"]
    vs, na = ctx["vs"], ctx["na"]
    eval_q, n_eval = ctx["eval_q"], ctx["n_eval"]
    eval_bs = min(EVAL_BS, max(fix["batch_size"], n_eval))

    # ---- anchor training: fp32, plain XLA ----
    model_anchor = _build_model(fix, vs, na, use_pallas=False)
    state = _train(fix, model_anchor, app_d, mot_d, train_split, epochs,
                   train_split["glove"])

    paths = {
        "fp32_xla": dict(use_pallas=False, compute_dtype="float32", cast16=False),
        "pallas": dict(use_pallas=True, compute_dtype="float32", cast16=False),
        "bf16_compute": dict(use_pallas=False, compute_dtype="bfloat16", cast16=False),
        "bf16_transfer": dict(use_pallas=False, compute_dtype="float32", cast16=True),
        "combined": dict(use_pallas=True, compute_dtype="bfloat16", cast16=True),
    }
    results = {}
    anchor_correct = None
    anchor_preds = {}
    for name, p in paths.items():
        if p["use_pallas"] and not on_tpu:
            results[name] = {"skipped": f"requires TPU (backend={jax.default_backend()})"}
            continue
        m = _build_model(fix, vs, na, use_pallas=p["use_pallas"], compute_dtype=p["compute_dtype"])
        preds_by_split = {}
        correct_vec = []
        flips = 0
        for mode, split in evals.items():
            preds = _predict(fix, m, state, app_d, mot_d, split,
                             cast16=p["cast16"], batch_size=eval_bs)
            preds_by_split[mode] = preds
            correct_vec.append(preds == eval_q[mode])
            if name != "fp32_xla":
                flips += int((preds != anchor_preds[mode]).sum())
        correct_vec = np.concatenate(correct_vec)
        if name == "fp32_xla":
            anchor_preds = preds_by_split
            anchor_correct = correct_vec
        k = int(correct_vec.sum())
        acc = k / n_eval
        results[name] = {
            "accuracy": round(acc, 6),
            "accuracy_ci95": [round(x, 6) for x in _binom_ci(k, n_eval)],
            "n_eval": n_eval,
            **(
                {}
                if name == "fp32_xla"
                else {
                    "delta_vs_anchor": round(acc - results["fp32_xla"]["accuracy"], 6),
                    **_paired_delta_ci(correct_vec, anchor_correct),
                    "argmax_flips_vs_anchor": flips,
                    "argmax_agreement": round(1.0 - flips / n_eval, 6),
                }
            ),
        }

    # ---- end-to-end reduced-precision training from the same init ----
    # bf16_trained_end_to_end: XLA path. The exact-f32 custom VJPs
    # (dualvgr_tpu/ops/precision.py) make a single train step bitwise-equal
    # to fp32 on TPU at probe shapes (benchmarks/precision_probe.py,
    # precision_ladder.py) — this measures whether that equality inducts
    # over the full trajectory at harness scale (B=32, T=16, GloVe, in-jit
    # gathers); benchmarks/bf16_divergence_bisect.py locates the first
    # diverging step when it does not.
    # pallas_bf16_trained_end_to_end: the full TPU-fast TRAIN deployment
    # (fused kernels + bf16). The appearance kernel genuinely streams its
    # gate projections in bf16 (halved HBM traffic of the model's largest
    # activation), so this one is a real accuracy measurement, not an
    # identity. The paired delta CI here spans trajectory chaos (the two
    # runs legitimately learn different functions from one-ulp seeds —
    # benchmarks/bf16_chaos_control.py separates chaos from bias).
    train_cfgs = {
        "bf16_trained_end_to_end": dict(use_pallas=False, compute_dtype="bfloat16"),
    }
    if on_tpu:
        train_cfgs["pallas_bf16_trained_end_to_end"] = dict(
            use_pallas=True, compute_dtype="bfloat16"
        )
    for name, mkw in train_cfgs.items():
        m16 = _build_model(fix, vs, na, **mkw)
        state16 = _train(fix, m16, app_d, mot_d, train_split, epochs, train_split["glove"])
        correct_vec = []
        for mode, split in evals.items():
            preds = _predict(fix, m16, state16, app_d, mot_d, split,
                             batch_size=eval_bs)
            correct_vec.append(preds == eval_q[mode])
        correct_vec = np.concatenate(correct_vec)
        k = int(correct_vec.sum())
        acc16 = k / n_eval
        results[name] = {
            "accuracy": round(acc16, 6),
            "accuracy_ci95": [round(x, 6) for x in _binom_ci(k, n_eval)],
            "n_eval": n_eval,
            "delta_vs_fp32_trained": round(acc16 - results["fp32_xla"]["accuracy"], 6),
            **_paired_delta_ci(correct_vec, anchor_correct),
        }

    out = {
        "fixture": dict(fix),
        "model_kw": dict(MODEL_KW),
        "epochs": epochs,
        "lr": LR,
        "backend": jax.default_backend(),
        "val_clean_fraction": ctx["gen"]["val_clean_fraction"],
        "paths": results,
        "gate": "BASELINE.md north-star: <=0.2% absolute accuracy delta",
        "ci_method": (
            "accuracy_ci95: exact Clopper-Pearson; delta_ci95: paired "
            "discordant-pair (McNemar) exact binomial — 0 flips -> [0, 0]"
        ),
    }

    if save_trained:
        path = bundle_path or os.path.join(
            REPO, "benchmarks", "fastpath_trained.msgpack"
        )
        out["trained_bundle"] = _save_bundle(ctx, fix, state, path)

    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    # persistent compile cache: first compiles of the 7 flagship-shape
    # programs cost minutes each through a tunneled TPU; a timed-out run
    # still populates the cache, so a rerun finishes (same policy as
    # bench.py)
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache")
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    out_dir = args.out or tempfile.mkdtemp(prefix="fastpath_")
    result = run(out_dir, epochs=args.epochs)

    print(f"\n{'path':<30} {'accuracy':>9} {'delta':>9} {'delta 95% CI':>22} {'flips':>6}")
    for name, r in result["paths"].items():
        if "skipped" in r:
            print(f"{name:<30} skipped: {r['skipped']}")
            continue
        d = r.get("delta_vs_anchor", r.get("delta_vs_fp32_trained", 0.0))
        ci = r.get("delta_ci95")
        ci_s = f"[{ci[0]:+.4f}, {ci[1]:+.4f}]" if ci else "-"
        print(
            f"{name:<30} {r['accuracy']:>9.4f} {d:>+9.4f} {ci_s:>22} "
            f"{r.get('argmax_flips_vs_anchor', '-'):>6}"
        )
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fastpath_accuracy.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print(f"\nwrote {path}")


if __name__ == "__main__":
    main()
