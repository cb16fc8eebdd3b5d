"""Find the FIRST train step where bf16-compute training leaves the fp32
trajectory, at the fastpath harness's exact scale.

Context: precision_probe.py + precision_ladder.py pin that one full DualVGR
train step under ``compute_dtype: bfloat16`` is BITWISE-identical to the
fp32 step on TPU (exact-f32 custom VJPs, dualvgr_tpu/ops/precision.py) — at
probe shapes (up to flagship dims, B=8, T=12). Yet fastpath_accuracy.json's
``bf16_trained_end_to_end`` (B=32, T=16, GloVe, in-jit feature gather, 228
steps) converges −5% off the fp32 anchor. Bitwise-equal steps induct to a
bitwise-equal trajectory, so SOME step at harness scale must not be bitwise
— this probe finds which, and which leaves break first.

Method: generate the harness fixture (benchmarks/fastpath_accuracy.py
FIXTURE, same seeds), build the fp32 and bf16 models from the same init,
then run the harness's training loop with BOTH states stepped on every
batch. After each step a jitted on-device comparator reduces (params,
batch_stats) equality to two scalars (diverged-leaf count, max |diff|) so
the tunnel only moves bytes when a step actually diverges; at the first
divergence the probe pulls both states and prints the offending leaves.
Also pre-checks forward-logits bitwise equality at the exact harness batch
shape (B=32, T=16, GloVe rows) before any training.

Usage: python benchmarks/bf16_divergence_bisect.py [--epochs 12]
Artifact: prints findings; writes benchmarks/bf16_divergence_bisect.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from benchmarks.fastpath_accuracy import (
    ALPHA,
    BETA,
    FIXTURE,
    LR,
    SEED,
    _batches,
    _build_model,
    _load_features,
    _load_split,
)


def run(out_dir: str, epochs: int = 12, fixture_overrides: dict | None = None,
        write_artifact: bool = True) -> dict:
    from dualvgr_tpu import train_lib
    from dualvgr_tpu.data.synthetic import generate

    fix = dict(FIXTURE)
    if fixture_overrides:
        fix.update(fixture_overrides)
    data_dir = os.path.join(out_dir, "data")
    generate(data_dir, **fix)
    train_split = _load_split(data_dir, "train")
    app, mot = _load_features(data_dir)
    app_d, mot_d = jnp.asarray(app), jnp.asarray(mot)

    with open(os.path.join(data_dir, "svqa_vocab.json")) as f:
        vocab = json.load(f)
    vs = len(vocab["question_token_to_idx"])
    na = len(vocab["answer_token_to_idx"])

    m32 = _build_model(fix, vs, na, use_pallas=False)
    m16 = _build_model(fix, vs, na, use_pallas=False, compute_dtype="bfloat16")

    q = np.asarray(train_split["questions"], np.int32)
    qlen = np.asarray(train_split["questions_len"], np.int32)
    vids = np.asarray(train_split["video_ids"], np.int32)
    ans = np.asarray(train_split["answers"], np.int32)
    glove = train_split["glove"]
    n, bs = len(ans), fix["batch_size"]
    steps_per_epoch = (n + bs - 1) // bs
    opt = train_lib.make_optimizer(LR, steps_per_epoch)

    example = (app_d[:1], mot_d[:1], jnp.asarray(q[:1]), jnp.asarray(qlen[:1]))

    def init_state(model):
        s = train_lib.create_train_state(model, jax.random.PRNGKey(SEED), example, opt)
        return train_lib.set_glove(s, glove) if glove is not None else s

    s32, s16 = init_state(m32), init_state(m16)

    # ---- init equality (params are dtype-independent; assert it) ----
    @jax.jit
    def tree_delta(a, b):
        leaves_a = jax.tree_util.tree_leaves(a)
        leaves_b = jax.tree_util.tree_leaves(b)
        neq = sum(
            jnp.any(x != y).astype(jnp.int32) for x, y in zip(leaves_a, leaves_b)
        )
        mx = jnp.array(0.0, jnp.float32)
        for x, y in zip(leaves_a, leaves_b):
            mx = jnp.maximum(mx, jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32)).max())
        return neq, mx

    def compare(tag, a, b):
        neq, mx = jax.device_get(tree_delta(a, b))
        return int(neq), float(mx)

    neq, mx = compare("init", (s32.params, s32.batch_stats), (s16.params, s16.batch_stats))
    print(f"init: diverged_leaves={neq} max_abs={mx:.3e}", flush=True)

    # ---- forward bitwise at exact harness batch shape, before training ----
    order0 = np.random.RandomState(SEED).permutation(n)
    idx0 = order0[:bs]
    b_vid = jnp.asarray(vids[idx0])
    b_q, b_ql = jnp.asarray(q[idx0]), jnp.asarray(qlen[idx0])

    def fwd(model, state):
        f = jax.jit(
            lambda p, st, vid, qb, qlb: model.apply(
                {"params": p, "batch_stats": st},
                app_d[vid], mot_d[vid], qb, qlb, train=False,
            ).logits
        )
        return np.asarray(f(state.params, state.batch_stats, b_vid, b_q, b_ql))

    l32, l16 = fwd(m32, s32), fwd(m16, s16)
    fwd_bitwise = bool(np.array_equal(l32, l16))
    print(
        f"fwd@harness-shape: bitwise={fwd_bitwise} "
        f"max_abs={float(np.abs(l32 - l16).max()):.3e}",
        flush=True,
    )

    # ---- lockstep training with per-step on-device comparison ----
    def make_step(model):
        def step(state, app_all, mot_all, vid, qb, qlb, ab, vb):
            batch = (app_all[vid], mot_all[vid], qb, qlb, ab, vb)
            return train_lib.train_step(
                state, batch, model=model, optimizer=opt, alpha=ALPHA, beta=BETA
            )
        return jax.jit(step, donate_argnums=(0,))

    step32, step16 = make_step(m32), make_step(m16)

    shuffle = np.random.RandomState(SEED)
    result = {
        "backend": jax.default_backend(),
        "fixture": fix,
        "init_diverged": neq,
        "fwd_bitwise_at_harness_shape": fwd_bitwise,
        "first_divergence": None,
    }
    gstep = 0
    done = False
    for epoch in range(epochs):
        order = shuffle.permutation(n)
        for bi, (idx, valid) in enumerate(_batches(n, bs, order)):
            argd = (
                app_d, mot_d, jnp.asarray(vids[idx]), jnp.asarray(q[idx]),
                jnp.asarray(qlen[idx]), jnp.asarray(ans[idx]), jnp.asarray(valid),
            )
            s32, _ = step32(s32, *argd)
            s16, _ = step16(s16, *argd)
            neq, mx = compare(
                "step", (s32.params, s32.batch_stats), (s16.params, s16.batch_stats)
            )
            if neq:
                padded = bool((valid == 0).any())
                print(
                    f"FIRST DIVERGENCE at global step {gstep} "
                    f"(epoch {epoch}, batch {bi}, padded_final={padded}): "
                    f"{neq} leaves, max_abs={mx:.3e}",
                    flush=True,
                )
                p32 = jax.device_get((s32.params, s32.batch_stats))
                p16 = jax.device_get((s16.params, s16.batch_stats))
                flat32 = jax.tree_util.tree_leaves_with_path(p32)
                flat16 = jax.tree_util.tree_leaves(p16)
                leaves = [
                    {
                        "leaf": jax.tree_util.keystr(path),
                        "max_abs": float(np.abs(np.asarray(a) - np.asarray(b)).max()),
                    }
                    for (path, a), b in zip(flat32, flat16)
                    if not np.array_equal(a, b)
                ]
                leaves.sort(key=lambda d: -d["max_abs"])
                for item in leaves[:20]:
                    print(f"    {item['leaf']}: {item['max_abs']:.3e}", flush=True)
                result["first_divergence"] = {
                    "global_step": gstep,
                    "epoch": epoch,
                    "batch": bi,
                    "padded_final_batch": padded,
                    "diverged_leaves": neq,
                    "max_abs": mx,
                    "leaves": leaves[:20],
                }
                done = True
                break
            gstep += 1
        if done:
            break
    if not done:
        print(
            f"NO divergence in {gstep} steps over {epochs} epochs — "
            "trajectories bitwise-identical at harness scale",
            flush=True,
        )

    if write_artifact:
        path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "bf16_divergence_bisect.json",
        )
        with open(path, "w") as f:
            json.dump(result, f, indent=2)
        print(f"wrote {path}", flush=True)
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    run(args.out or tempfile.mkdtemp(prefix="bisect_"), epochs=args.epochs)


if __name__ == "__main__":
    main()
