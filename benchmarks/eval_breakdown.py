"""Per-component eval timing breakdown on the real chip (chained timing).

Times each stage of the flagship eval forward in isolation with the same
dependency-chained fori_loop methodology bench.py uses, to show where the
~12.5 ms eval step goes. Run alone (the chip is single-tenant):

    python benchmarks/eval_breakdown.py [--batch 256] [--steps 20]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

# self-pathing: PYTHONPATH displaces the axon TPU plugin's registration on
# this machine, so the repo root is appended here instead
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_time(fn, args, steps, perturb=0):
    """Chained timing; ``perturb`` picks WHICH argument carries the iteration
    dependency — pick a SMALL one, or the chain's own rewrite of a large
    input adds a full HBM round-trip per iteration to the measurement."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnums=(1,))
    def chained(args, n):
        x0 = args[perturb]

        def body(i, carry):
            acc, x = carry
            a = list(args)
            a[perturb] = x
            out = fn(*a)
            s = out.sum() if hasattr(out, "sum") else sum(o.sum() for o in out)
            s = s.astype(jnp.float32)
            # dtype-preserving perturbation keeps int inputs chainable
            return acc + s, x + (s * 1e-30).astype(x.dtype)

        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.zeros((), "float32"), x0))
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
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--pallas", type=int, default=1)
    ap.add_argument(
        "--compute-dtype", default="float32", choices=["float32", "bfloat16"],
        help="model compute_dtype (bf16 operand streaming in wide matmuls)",
    )
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
    from dualvgr_tpu.models.dualvgr import DualVGRUnitStack  # noqa: F401
    from dualvgr_tpu import train_lib
    from dualvgr_tpu.parallel import data_mesh, replicate, shard_batch

    b, t, vocab, answers = args.batch, 24, 8000, 4000
    cd = args.compute_dtype
    model = DualVGR(
        vision_dim=2048, module_dim=768, word_dim=300,
        question_vocab_size=vocab, num_answers=answers, num_of_nodes=16,
        graph_layers=1, unit_layers=1, use_pallas=bool(args.pallas),
        compute_dtype=cd,
    )
    rng = np.random.RandomState(0)
    app = rng.randn(b, 16, 16, 2048).astype(np.float32)
    mot = rng.randn(b, 16, 2048).astype(np.float32)
    q = rng.randint(1, vocab, (b, t)).astype(np.int32)
    qlen = rng.randint(4, t + 1, (b,)).astype(np.int32)
    for i in range(b):
        q[i, qlen[i]:] = 0

    opt = train_lib.make_optimizer(1e-4, 100)
    state = train_lib.create_train_state(
        model, jax.random.key(666, impl="rbg"), (app[:1], mot[:1], q[:1], qlen[:1]), opt
    )
    mesh = data_mesh()
    state = replicate(state, mesh)
    appd, motd, qd, qlend = shard_batch((app, mot, q, qlen), mesh)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    params = state.params

    timings = {}

    # full model. The chain must feed EVERY independent input branch or XLA
    # hoists the untouched branches out of the timing loop as loop-invariant
    # (chaining through the motion tensor alone lets BOTH encoders be
    # computed once — the "full" time collapses to ~1.1 ms; chaining through
    # weight leaves still hoists input-only subgraphs like tanh(features)
    # and the other direction's projection). Perturb the visual input
    # tensors themselves plus the embedding table (covers the int-token
    # question path) — the same methodology as bench.py.
    def full_eval(eps, a, m_, qq, ql):
        p = dict(variables["params"])
        li = dict(p["linguistic_input_unit"])
        li["encoder_embed"] = {
            "embedding": li["encoder_embed"]["embedding"] + eps
        }
        p["linguistic_input_unit"] = li
        v = {**variables, "params": p}
        return model.apply(v, a + eps, m_ + eps, qq, ql, train=False).logits

    timings["full_eval"] = chain_time(
        full_eval, (jnp.zeros(()), appd, motd, qd, qlend), args.steps
    )

    # appearance encoder alone, chained through one LSTM weight leaf
    from dualvgr_tpu.models.encoders import AppearanceEncoder

    app_enc = AppearanceEncoder(768, bool(args.pallas), cd)
    app_params = params["visual_appearance_input_unit"]
    wf_leaf = app_params["encoder"]["w_ih_fwd"]

    def run_app_enc(wf, a):
        p = jax.tree_util.tree_map(lambda x: x, app_params)
        p = dict(p)
        p["encoder"] = dict(p["encoder"])
        p["encoder"]["w_ih_fwd"] = wf
        return app_enc.apply({"params": p}, a, train=False)

    timings["appearance_encoder"] = chain_time(
        run_app_enc, (wf_leaf, appd), args.steps
    )

    # tanh alone over the appearance tensor (HBM-bound elementwise);
    # chained through a scalar fused into the tanh pass
    timings["tanh_only"] = chain_time(
        lambda e, a: jnp.tanh(a + e), (jnp.zeros(()), appd), args.steps
    )

    # in-projection matmul alone (B*C*F, 2048) @ (2048, 2*4h)
    wb = app_params["encoder"]["w_ih_bwd"]
    w2 = jnp.concatenate([wf_leaf, wb], axis=1)  # (2048, 3072)

    timings["app_inproj_matmul"] = chain_time(
        lambda w, a: a.reshape(-1, a.shape[-1]) @ w, (w2, appd), args.steps
    )
    timings["app_tanh_plus_inproj"] = chain_time(
        lambda w, a: jnp.tanh(a).reshape(-1, a.shape[-1]) @ w, (w2, appd), args.steps
    )

    # question encoder alone
    from dualvgr_tpu.models.encoders import QuestionEncoder

    q_enc = QuestionEncoder(vocab, 300, 768, bool(args.pallas), cd)
    q_vars = {"params": params["linguistic_input_unit"]}
    timings["question_encoder"] = chain_time(
        lambda qq, ql: q_enc.apply(q_vars, qq, ql, train=False)[0],
        (qd, qlend), args.steps,
    )

    # motion encoder
    from dualvgr_tpu.models.encoders import MotionEncoder

    m_enc = MotionEncoder(768, cd)
    m_vars = {"params": params["visual_motion_input_unit"]}
    timings["motion_encoder"] = chain_time(
        lambda m_: m_enc.apply(m_vars, m_), (motd,), args.steps
    )

    # unit stack alone (graph reasoning + MFB), given precomputed encodings
    stack = DualVGRUnitStack(300, 768, 16, 1, 1, bool(args.pallas), "GAT", cd)
    stack_vars = {"params": params["visual_input_unit"]}
    app_enc_out = app_enc.apply({"params": app_params}, appd, train=False)
    mot_out = m_enc.apply(m_vars, motd)
    q_emb, words, dynamic = q_enc.apply(q_vars, qd, qlend, train=False)
    timings["unit_stack"] = chain_time(
        lambda dyn, a, m_, w, ql: stack.apply(
            stack_vars, a, m_, dyn, w, ql, train=False
        )[0],
        (dynamic, app_enc_out, mot_out, words, qlend), args.steps,
    )

    # tail: clip aggregation + classifier on precomputed embeddings — the
    # residual the round-2 verdict asked to itemize (item 4)
    from dualvgr_tpu.models.attention import ContextSelfAttn
    from dualvgr_tpu.models.decoder import OutputUnitOpenEnded

    visual = stack.apply(
        stack_vars, app_enc_out, mot_out, dynamic, words, qlend, train=False
    )[0]
    agg = ContextSelfAttn(768, cd)
    agg_vars = {"params": params["feature_aggregation"]}
    timings["context_self_attn"] = chain_time(
        lambda v_: agg.apply(agg_vars, v_, train=False), (visual,), args.steps
    )
    dec = OutputUnitOpenEnded(768, answers, cd)
    dec_vars = {
        "params": params["output_unit"],
        "batch_stats": state.batch_stats["output_unit"],
    }
    agg_out = agg.apply(agg_vars, visual, train=False)
    timings["output_unit"] = chain_time(
        lambda qe, v_: dec.apply(dec_vars, qe, v_, train=False),
        (q_emb, agg_out), args.steps,
    )

    ms = {k: round(v * 1e3, 3) for k, v in sorted(timings.items(), key=lambda kv: -kv[1])}
    components = [
        "appearance_encoder", "question_encoder", "motion_encoder",
        "unit_stack", "context_self_attn", "output_unit",
    ]
    ms["sum_of_components"] = round(sum(ms[c] for c in components), 3)
    print(json.dumps({"batch": b, "pallas": bool(args.pallas), "compute_dtype": cd, "ms": ms}))


if __name__ == "__main__":
    main()
