"""Flagship-dims per-STEP trainer parity vs the ACTUAL reference trainer.

benchmarks/reference_train_parity.py pins trainer-vs-trainer convergence at
TOY dims (vision_dim 64, module_dim 64); a shape-dependent numerics bug
(e.g. a reduction that loses precision only at 2048-wide operands, a Pallas
tile boundary, a fan-in-dependent init) would be invisible there. THIS
harness runs a FEW STEPS at the flagship MSRVTT dims — vision_dim 2048,
module_dim 768, num_of_nodes 16, 16 frames/clip, word_dim 300 — comparing
per-step total losses (CE + alpha*common + beta*HSIC) between the
reference's own train() loop and this framework, from ported identical
init on identical batches (reference train.py:27-326, utils.py:10-31).

Protocol
  1. Synthetic SVQA fixture at flagship dims (small video count — the
     POINT is operand widths, not dataset scale).
  2. Subprocess: the reference train() runs exactly N batches in step mode
     (benchmarks/reference_train_worker.py --steps N): dropout identity +
     BatchNorm on running stats (the two legitimately-divergent elements,
     same convention as tests/test_training_parity.py), recording every
     consumed batch and every total loss at loss.backward().
  3. This framework ports the reference's captured init (+ the same GloVe
     injection), replays the IDENTICAL batches through its jitted
     loss/grad/clip-12/Adam step (deterministic forward), and records its
     per-step losses.
  4. Gate: per-step relative loss deltas at fp32 tolerance (default 1e-3 —
     both sides run fp32 on CPU; the reference trainer quirk applies, so
     both models run unit_layers=2, SURVEY.md 2.11-1), plus a final-params
     max relative distance vs the reference's post-step state_dict.

Writes benchmarks/flagship_step_parity.json.

Usage: python benchmarks/flagship_step_parity.py [--steps 4] [--out DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURE = dict(
    dataset="svqa",
    num_videos=16,
    questions_per_video=4,
    num_clips=16,       # flagship msrvtt num_of_nodes
    vision_dim=2048,    # flagship operand widths — the point of this check
    frames=16,
    num_answers=20,
    vocab_size=120,
    max_q_len=16,
    word_dim=300,
    module_dim=768,
    batch_size=8,
    seed=0,
    category_names=True,  # the reference loader can only consume string cats
)
LR = 1e-3
ALPHA, BETA = 1.0, 1e-8
SEED = 666
REL_TOL = 1e-3


def run_reference_steps(data_dir: str, out_dir: str, steps: int) -> dict:
    cmd = [
        sys.executable, os.path.join(REPO, "benchmarks", "reference_train_worker.py"),
        "--data-dir", data_dir, "--out", out_dir, "--steps", str(steps),
        "--lr", str(LR), "--batch-size", str(FIXTURE["batch_size"]),
        "--vision-dim", str(FIXTURE["vision_dim"]),
        "--module-dim", str(FIXTURE["module_dim"]),
        "--word-dim", str(FIXTURE["word_dim"]),
        "--num-of-nodes", str(FIXTURE["num_clips"]),
        "--alpha", str(ALPHA), "--beta", str(BETA), "--seed", str(SEED),
    ]
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the worker must see only the reference tree
    proc = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=3600
    )
    if proc.returncode != 0 or "REF_WORKER_OK" not in proc.stdout:
        raise RuntimeError(
            f"reference step worker failed rc={proc.returncode}:\n"
            f"{proc.stdout[-2000:]}\n{proc.stderr[-3000:]}"
        )
    with open(os.path.join(out_dir, "ref_step_losses.json")) as f:
        losses = json.load(f)
    batches = np.load(os.path.join(out_dir, "ref_batches.npz"))
    return {"losses": losses, "batches": batches}


def run_ours_steps(data_dir: str, ref_out: str, steps: int, batches) -> dict:
    """Replay the reference's captured batches through our train step from
    the ported identical init; deterministic forward (train=False: dropout
    off, BatchNorm running stats — mirroring the worker's patches)."""
    import jax
    import jax.numpy as jnp
    import optax
    import torch

    from dualvgr_tpu import train_lib
    from dualvgr_tpu.data import VideoQADataLoader
    from dualvgr_tpu.models import DualVGR
    from dualvgr_tpu.ops.losses import dualvgr_total_loss
    from dualvgr_tpu.utils.port_reference import port_reference_state_dict

    model = DualVGR(
        vision_dim=FIXTURE["vision_dim"],
        module_dim=FIXTURE["module_dim"],
        word_dim=FIXTURE["word_dim"],
        question_vocab_size=FIXTURE["vocab_size"],
        num_answers=FIXTURE["num_answers"],
        num_of_nodes=FIXTURE["num_clips"],
        graph_layers=1,
        unit_layers=2,  # the reference trainer quirk (SURVEY.md 2.11-1)
    )
    torch_state = torch.load(
        os.path.join(ref_out, "ref_init_state.pt"), map_location="cpu"
    )
    variables = jax.tree_util.tree_map(
        jnp.asarray,
        port_reference_state_dict(torch_state, unit_layers=2, graph_layers=1),
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    # the same GloVe injection the reference applies post-init
    # (train.py:75-79); read from the fixture's train pickle like its loader
    loader = VideoQADataLoader(
        question_pt=os.path.join(data_dir, "svqa_train_questions.pt"),
        vocab_json=os.path.join(data_dir, "svqa_vocab.json"),
        appearance_feat=os.path.join(data_dir, "svqa_appearance_feat.h5"),
        motion_feat=os.path.join(data_dir, "svqa_motion_feat.h5"),
        batch_size=FIXTURE["batch_size"], shuffle=False, seed=SEED,
    )
    glove = jnp.asarray(loader.glove_matrix, jnp.float32)
    loader.close()
    params = dict(params)
    params["linguistic_input_unit"] = dict(params["linguistic_input_unit"])
    params["linguistic_input_unit"]["encoder_embed"] = {"embedding": glove}

    opt = optax.chain(optax.clip_by_global_norm(12.0), optax.adam(LR))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, app, mot, q, qlen, ans):
        def loss_fn(p):
            out = model.apply(
                {"params": p, "batch_stats": batch_stats},
                app, mot, q, qlen, train=False,
            )
            total, _aux = dualvgr_total_loss(
                out.logits, ans, out.aq_fusion, out.com_app,
                out.mq_fusion, out.com_motion,
                alpha=ALPHA, beta=BETA, num_of_nodes=FIXTURE["num_clips"],
            )
            return total

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return loss, optax.apply_updates(params, updates), opt_state

    losses = []
    for i in range(steps):
        app = jnp.asarray(batches[f"step_{i}_app"], jnp.float32)
        mot = jnp.asarray(batches[f"step_{i}_mot"], jnp.float32)
        q = jnp.asarray(batches[f"step_{i}_q"], jnp.int32)
        qlen = jnp.asarray(batches[f"step_{i}_qlen"], jnp.int32)
        ans = jnp.asarray(batches[f"step_{i}_ans"], jnp.int32)
        loss, params, opt_state = step(params, opt_state, app, mot, q, qlen, ans)
        losses.append(float(loss))

    # final-params distance vs the reference's post-step state_dict: a
    # trajectory-level check that the N optimizer updates landed in the
    # same place leaf-by-leaf (catches grad/clip/Adam divergence even where
    # losses agree by luck)
    final_ref = jax.tree_util.tree_map(
        jnp.asarray,
        port_reference_state_dict(
            torch.load(os.path.join(ref_out, "ref_final_state.pt"),
                       map_location="cpu"),
            unit_layers=2, graph_layers=1,
        ),
    )["params"]

    def rel_dist(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12))

    flat_ours = jax.tree_util.tree_leaves_with_path(params)
    flat_ref = dict(jax.tree_util.tree_leaves_with_path(final_ref))
    dists = {
        jax.tree_util.keystr(k): rel_dist(v, flat_ref[k]) for k, v in flat_ours
    }
    worst = max(dists, key=dists.get)
    return {
        "losses": losses,
        "final_param_rel_dist_max": dists[worst],
        "final_param_rel_dist_worst_leaf": worst,
    }


def _force_cpu_backend():
    """Both sides of this comparison are defined at STRICT fp32 — torch CPU
    vs XLA:CPU. On the TPU backend fp32 matmuls run as bf16 MXU passes
    (different rounding), which would turn a numerics-parity gate into a
    hardware-rounding measurement. Pin CPU before any backend init (the
    axon plugin ignores the env var alone)."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass  # backend already initialized (e.g. under the test conftest)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache_cpu")
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def run(out_dir: str, steps: int = 4) -> dict:
    _force_cpu_backend()
    from dualvgr_tpu.data.synthetic import generate

    data_dir = os.path.join(out_dir, "data")
    ref_out = os.path.join(out_dir, "ref")
    generate(data_dir, **FIXTURE)
    ref = run_reference_steps(data_dir, ref_out, steps)
    ours = run_ours_steps(data_dir, ref_out, steps, ref["batches"])

    rel = [
        abs(o - r) / max(abs(r), 1e-12)
        for o, r in zip(ours["losses"], ref["losses"])
    ]
    return {
        "fixture": {k: v for k, v in FIXTURE.items() if k != "category_names"},
        "steps": steps,
        "lr": LR,
        "alpha": ALPHA,
        "beta": BETA,
        "unit_layers_effective": 2,
        "reference_step_losses": ref["losses"],
        "ours_step_losses": ours["losses"],
        "per_step_rel_delta": rel,
        "max_rel_delta": max(rel),
        "rel_tol": REL_TOL,
        "final_param_rel_dist_max": ours["final_param_rel_dist_max"],
        "final_param_rel_dist_worst_leaf": ours["final_param_rel_dist_worst_leaf"],
        "determinism_patches": (
            "both sides: dropout off, BatchNorm1d on running stats "
            "(the only stochastic / batch-coupled elements)"
        ),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    result = run(args.out or tempfile.mkdtemp(prefix="flagstep_"), steps=args.steps)

    print(f"\n{'step':>4} {'reference':>12} {'ours':>12} {'rel delta':>10}")
    for i, (r, o, d) in enumerate(zip(
        result["reference_step_losses"], result["ours_step_losses"],
        result["per_step_rel_delta"],
    )):
        print(f"{i:>4} {r:>12.6f} {o:>12.6f} {d:>10.2e}")
    print(
        f"\nmax rel delta {result['max_rel_delta']:.2e} (tol {REL_TOL}); "
        f"final params max rel dist {result['final_param_rel_dist_max']:.2e} "
        f"({result['final_param_rel_dist_worst_leaf']})"
    )
    ok = result["max_rel_delta"] < REL_TOL
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "flagship_step_parity.json"
    )
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {path}")
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
