"""Per-component TRAIN-step timing breakdown on the real chip.

Times value_and_grad of each stage in isolation with the dependency-chained
methodology (see eval_breakdown.py and benchmarks/README.md for why, and
why every independent input branch must be perturbed). Run alone:

    python benchmarks/train_breakdown.py [--batch 256] [--steps 10]
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


def chain_time(fn, args, steps):
    """fn(eps, *args) -> scalar loss; chained through eps."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnums=(1,))
    def chained(args, n):
        def body(i, carry):
            acc, eps = carry
            s = fn(eps, *args)
            return acc + s, s * 1e-30

        acc, _ = jax.lax.fori_loop(
            0, n, body, (jnp.zeros((), "float32"), jnp.zeros((), "float32"))
        )
        return acc

    float(chained(args, 1))
    float(chained(args, steps + 1))
    t0 = time.perf_counter()
    float(chained(args, 1))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(chained(args, steps + 1))
    tn = time.perf_counter() - t0
    return (tn - t1) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=10)
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
    from dualvgr_tpu.models.dualvgr import DualVGRUnitStack
    from dualvgr_tpu.models.encoders import (
        AppearanceEncoder, MotionEncoder, QuestionEncoder,
    )
    from dualvgr_tpu import train_lib
    from dualvgr_tpu.parallel import data_mesh, replicate, shard_batch

    b, t, vocab, answers = args.batch, 24, 8000, 4000
    model = DualVGR(
        vision_dim=2048, module_dim=768, word_dim=300,
        question_vocab_size=vocab, num_answers=answers, num_of_nodes=16,
        graph_layers=1, unit_layers=1, use_pallas=bool(args.pallas),
    )
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
        model, jax.random.key(666, impl="rbg"), (app[:1], mot[:1], q[:1], qlen[:1]), opt
    )
    mesh = data_mesh()
    state = replicate(state, mesh)
    appd, motd, qd, qlend, ansd, validd = shard_batch(
        (app, mot, q, qlen, ans, valid), mesh
    )
    params = state.params
    key = jax.random.key(7, impl="rbg")

    timings = {}

    # full train step (params all perturbed via eps on one leaf per branch is
    # unnecessary here: train_step's own param updates + per-step dropout rng
    # make the body loop-variant; chain eps into the inputs anyway to charge
    # the same input-materialization pass as the component timings)
    def full_step(eps, st, a, m_, qq, ql, an, vl):
        st2, metrics = train_lib.train_step(
            st, (a + eps, m_ + eps, qq, ql, an, vl),
            model=model, optimizer=opt, alpha=1.0, beta=1e-8,
        )
        return metrics["loss"] + jnp.sum(
            st2.params["visual_motion_input_unit"]["proj"]["kernel"]
        ) * 1e-30

    timings["full_train_step"] = chain_time(
        full_step, (state, appd, motd, qd, qlend, ansd, validd), args.steps
    )

    # appearance encoder fwd+bwd (kernel-VJP path)
    app_enc = AppearanceEncoder(768, bool(args.pallas))
    app_params = params["visual_appearance_input_unit"]

    def app_loss(eps, a):
        def f(p):
            out = app_enc.apply(
                {"params": p}, a + eps, train=True,
                rngs={"dropout": key},
            )
            return (out * out).sum()

        l, g = jax.value_and_grad(f)(app_params)
        return l + sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g)) * 1e-30

    timings["appearance_fwd_bwd"] = chain_time(app_loss, (appd,), args.steps)

    # question encoder fwd+bwd (kernel-VJP path); perturb the embedding
    q_enc = QuestionEncoder(vocab, 300, 768, bool(args.pallas))
    q_params = params["linguistic_input_unit"]

    def q_loss(eps, qq, ql):
        def f(p):
            p = dict(p)
            p["encoder_embed"] = {
                "embedding": p["encoder_embed"]["embedding"] + eps
            }
            emb, words, dyn = q_enc.apply(
                {"params": p}, qq, ql, train=True, rngs={"dropout": key}
            )
            return (emb * emb).sum() + (dyn * dyn).sum() + (words * words).sum()

        l, g = jax.value_and_grad(f)(q_params)
        return l + sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g)) * 1e-30

    timings["question_fwd_bwd"] = chain_time(q_loss, (qd, qlend), args.steps)

    # unit stack fwd+bwd given precomputed encodings
    stack = DualVGRUnitStack(300, 768, 16, 1, 1, bool(args.pallas))
    stack_params = params["visual_input_unit"]
    m_enc = MotionEncoder(768)
    app_out = app_enc.apply({"params": app_params}, appd, train=False)
    mot_out = m_enc.apply({"params": params["visual_motion_input_unit"]}, motd)
    emb0, words0, dyn0 = q_enc.apply({"params": q_params}, qd, qlend, train=False)

    def stack_loss(eps, a, m_, w, dyn, ql):
        def f(p):
            fused, aq, mq, ca, cm, aqf, mqf = stack.apply(
                {"params": p}, a + eps, m_ + eps, dyn + eps, w + eps, ql,
                train=True, rngs={"dropout": key},
            )
            return (
                (fused * fused).sum()
                + sum((x * x).sum() for x in aqf)
                + sum((x * x).sum() for x in ca)
            )

        l, g = jax.value_and_grad(f)(stack_params)
        return l + sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g)) * 1e-30

    timings["unit_stack_fwd_bwd"] = chain_time(
        stack_loss, (app_out, mot_out, words0, dyn0, qlend), args.steps
    )

    # aux losses fwd+bwd on (B, N, D)-shaped embeddings
    from dualvgr_tpu.ops.losses import dualvgr_total_loss

    e1 = jnp.asarray(rng.randn(b, 16, 768).astype(np.float32))
    e2 = jnp.asarray(rng.randn(b, 16, 768).astype(np.float32))
    logits0 = jnp.asarray(rng.randn(b, answers).astype(np.float32))

    def loss_loss(eps, lo, a1, a2):
        def f(x):
            total, _ = dualvgr_total_loss(
                lo + x[0], ansd, (a1 + x[1])[None], (a1 + x[1])[None],
                (a2 + x[2])[None], (a2 + x[2])[None],
                alpha=1.0, beta=1e-8, num_of_nodes=16, valid=validd,
            )
            return total

        l, g = jax.value_and_grad(f)((eps, eps, eps))
        return l + sum(jnp.sum(x) for x in g) * 1e-30

    timings["losses_fwd_bwd"] = chain_time(loss_loss, (logits0, e1, e2), args.steps)

    # optimizer alone: clip-by-global-norm + Adam over the full param tree
    import optax

    grads0 = jax.tree_util.tree_map(lambda x: x * 1e-3, params)
    opt_state0 = opt.init(params)

    def opt_loss(eps, g0, os0, p0):
        g = jax.tree_util.tree_map(lambda x: x + eps, g0)
        updates, _ = opt.update(g, os0, p0)
        p = optax.apply_updates(p0, updates)
        return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(p)) * 1e-30 + eps

    timings["optimizer_only"] = chain_time(
        opt_loss, (grads0, opt_state0, params), args.steps
    )

    ms = {k: round(v * 1e3, 3) for k, v in sorted(timings.items(), key=lambda kv: -kv[1])}
    print(json.dumps({"batch": b, "pallas": bool(args.pallas), "ms": ms}))


if __name__ == "__main__":
    main()
