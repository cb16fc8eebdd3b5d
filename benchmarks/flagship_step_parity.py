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
     consumed batch, every total loss at loss.backward(), and the FULL
     step-0 gradient state.
  3. This framework ports the reference's captured init (+ the same GloVe
     injection), replays the IDENTICAL batches through its jitted
     loss/grad/clip-12/Adam step (deterministic forward), and records its
     per-step losses + step-0 gradients.
  4. Gates (both sides strict fp32 on CPU; the reference trainer quirk
     applies, so both models run unit_layers=2, SURVEY.md 2.11-1):
       a. step-0 loss: relative delta at fp32 tolerance — forward + loss
          math parity at flagship operand widths.
       b. step-0 GRADIENTS, leaf by leaf (ported through the same
          state-dict mapping): the deterministic backward-parity gate.
          This is the real shape-dependent-bug detector — measured first:
          forward matched to 1.2e-7 while Adam-stepped trajectories
          diverged percent-scale, because Adam's first step is
          ~±lr*sign(g) and near-zero gradient elements amplify fp32
          reduction-order sign noise into full ±lr update flips (the same
          mechanism benchmarks/bf16_divergence_bisect.py pinned for bf16).
          Raw gradients are free of optimizer chaos.
       c. per-step losses at the FLAGSHIP lr 1e-4 (configs/*.yml): loss is
          first-order insensitive to the flat coordinates whose update
          signs flip, so at the real recipe's step size the trajectory
          deltas stay small.
     Tolerances are SELF-CALIBRATING: a permuted-batch replay of OUR OWN
     stack (mathematically identical — only fp32 reduction order changes)
     measures the fixture's conditioning noise floor per step and per
     gradient metric; each gate is max(fixed tol, CHAOS_K x floor). The
     aux-loss gradients here are cancellation-heavy at ~1e5 magnitudes —
     a guessed fixed tolerance would be either vacuous or flaky.

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
LR = 1e-4  # the flagship recipe's lr (configs/*.yml; see docstring gate c)
ALPHA, BETA = 1.0, 1e-8
SEED = 666
REL_TOL = 1e-3       # per-step loss gate (min; widened by the noise floor)
GRAD_REL_TOL = 1e-3  # step-0 gradient gate (min; widened by the noise floor)
GRAD_FLOOR = 1e-4    # leaves with ||g_ref|| < floor*global gated by atol
CHAOS_K = 5          # gate = max(TOL, K x measured reduction-order floor)


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
    return {"losses": losses, "batches": batches, "out_dir": out_dir}


def _ported_ref_grads0(ref_out: str):
    """The reference's step-0 gradients in OUR param-tree layout.

    The state-dict port mapping is per-tensor reshape/transpose/concat, so
    applying it to the gradient dict aligns cotangents exactly. The mapping
    also reads BN buffers, which carry no gradient — overlay the grads onto
    a zeros-like copy of the full init state_dict."""
    import jax
    import jax.numpy as jnp
    import torch

    from dualvgr_tpu.utils.port_reference import port_reference_state_dict

    init_sd = torch.load(
        os.path.join(ref_out, "ref_init_state.pt"), map_location="cpu"
    )
    grads = torch.load(os.path.join(ref_out, "ref_grads0.pt"), map_location="cpu")
    merged = {k: torch.zeros_like(v) for k, v in init_sd.items()}
    merged.update(grads)
    return jax.tree_util.tree_map(
        jnp.asarray,
        port_reference_state_dict(merged, unit_layers=2, graph_layers=1),
    )["params"]


def _grad_parity(ours_g, ref_g):
    """Leaf-by-leaf step-0 gradient comparison (see docstring gate b)."""
    import jax
    import optax

    gnorm = float(optax.global_norm(ours_g))
    ref_norm = float(optax.global_norm(ref_g))
    flat_ours = jax.tree_util.tree_leaves_with_path(ours_g)
    flat_ref = dict(jax.tree_util.tree_leaves_with_path(ref_g))
    floor = GRAD_FLOOR * gnorm
    worst_rel, worst_rel_leaf = 0.0, None
    worst_atol, worst_atol_leaf = 0.0, None
    n_floor = 0
    for k, v in flat_ours:
        a = np.asarray(v, np.float64)
        b = np.asarray(flat_ref[k], np.float64)
        diff = float(np.linalg.norm(a - b))
        nb = float(np.linalg.norm(b))
        if nb >= floor:
            rel = diff / nb
            if rel > worst_rel:
                worst_rel, worst_rel_leaf = rel, jax.tree_util.keystr(k)
        else:
            n_floor += 1
            if diff > worst_atol:
                worst_atol, worst_atol_leaf = diff, jax.tree_util.keystr(k)
    return {
        "grad_global_norm_ours": gnorm,
        "grad_global_norm_ref": ref_norm,
        "grad_global_norm_rel_delta": abs(gnorm - ref_norm) / max(ref_norm, 1e-12),
        "grad_worst_leaf_rel": worst_rel,
        "grad_worst_leaf": worst_rel_leaf,
        "grad_leaves_below_floor": n_floor,
        "grad_floor_worst_abs": worst_atol,
        "grad_floor_worst_leaf": worst_atol_leaf,
        "grad_floor": floor,
    }


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
        return loss, grads, optax.apply_updates(params, updates), opt_state

    # leaves whose axis-0 rows live in vision_dim (consume raw features)
    FEATURE_LEAVES = (
        ("visual_appearance_input_unit", "encoder", "w_ih_fwd"),
        ("visual_appearance_input_unit", "encoder", "w_ih_bwd"),
        ("visual_motion_input_unit", "proj", "kernel"),
    )

    def _map_leaf(tree, path, fn):
        t = dict(tree)
        if len(path) == 1:
            t[path[0]] = fn(t[path[0]])
        else:
            t[path[0]] = _map_leaf(t[path[0]], path[1:], fn)
        return t

    def replay(permute_seed=None, feature_perm=None):
        """One N-step replay with two mathematically-exact perturbations
        that ONLY change fp32 reduction orders:

        * ``permute_seed`` shuffles each batch's ROWS (a no-op for every
          term: CE mean, batch-summed common/HSIC, per-sample encoders,
          BN on running stats) — perturbs the batch-dim reductions;
        * ``feature_perm`` permutes the vision_dim axis of the input
          features AND the input rows of the three weights that consume
          them (grads are un-permuted before return) — perturbs the INNER
          matmul/LSTM reduction orders, the same class of difference two
          correct frameworks have.

        Their deltas are this fixture's measured conditioning noise floor,
        against which the cross-framework deltas are gated (the aux-loss
        gradients are cancellation-heavy at ~1e5 magnitudes — a fixed rel
        tolerance would be a guess)."""
        perm_rng = (
            np.random.RandomState(permute_seed) if permute_seed is not None else None
        )
        p0 = init_params
        if feature_perm is not None:
            inv = np.argsort(feature_perm)
            for path in FEATURE_LEAVES:
                p0 = _map_leaf(p0, path, lambda w: w[jnp.asarray(feature_perm)])
        p_, o_ = p0, opt.init(p0)
        losses, grads0 = [], None
        for i in range(steps):
            arrs = {
                k: np.asarray(batches[f"step_{i}_{k}"])
                for k in ("app", "mot", "q", "qlen", "ans")
            }
            if perm_rng is not None:
                perm = perm_rng.permutation(len(arrs["ans"]))
                arrs = {k: v[perm] for k, v in arrs.items()}
            if feature_perm is not None:
                arrs["app"] = arrs["app"][..., feature_perm]
                arrs["mot"] = arrs["mot"][..., feature_perm]
            loss, grads, p_, o_ = step(
                p_, o_,
                jnp.asarray(arrs["app"], jnp.float32),
                jnp.asarray(arrs["mot"], jnp.float32),
                jnp.asarray(arrs["q"], jnp.int32),
                jnp.asarray(arrs["qlen"], jnp.int32),
                jnp.asarray(arrs["ans"], jnp.int32),
            )
            if i == 0:
                grads0 = jax.device_get(grads)
                if feature_perm is not None:
                    for path in FEATURE_LEAVES:
                        grads0 = _map_leaf(grads0, path, lambda g: g[inv])
            losses.append(float(loss))
        return losses, grads0, p_

    init_params = params
    losses, grads0, params = replay()
    ctrl_losses, ctrl_grads0, _ = replay(
        permute_seed=12345,
        feature_perm=np.random.RandomState(54321).permutation(FIXTURE["vision_dim"]),
    )

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
        "grads0": grads0,
        "ctrl_losses": ctrl_losses,
        "ctrl_grads0": ctrl_grads0,
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
    # measured conditioning noise floor: OUR stack vs OUR stack with each
    # batch's rows permuted — mathematically identical, fp32 reduction
    # order is the only difference (see replay() docstring)
    ctrl_rel = [
        abs(c - o) / max(abs(o), 1e-12)
        for c, o in zip(ours["ctrl_losses"], ours["losses"])
    ]
    per_step_tol = [
        max(REL_TOL if i else 1e-5, CHAOS_K * ctrl_rel[i]) for i in range(steps)
    ]
    grad_parity = _grad_parity(ours["grads0"], _ported_ref_grads0(ref_out))
    grad_floor = _grad_parity(ours["ctrl_grads0"], ours["grads0"])
    grad_tol_global = max(
        GRAD_REL_TOL, CHAOS_K * grad_floor["grad_global_norm_rel_delta"]
    )
    grad_tol_leaf = max(GRAD_REL_TOL, CHAOS_K * grad_floor["grad_worst_leaf_rel"])
    ok = (
        all(r <= t for r, t in zip(rel, per_step_tol))
        and grad_parity["grad_global_norm_rel_delta"] <= grad_tol_global
        and grad_parity["grad_worst_leaf_rel"] <= grad_tol_leaf
        and grad_parity["grad_floor_worst_abs"] <= grad_parity["grad_floor"]
    )
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
        "noise_floor_per_step_rel": ctrl_rel,
        "per_step_tol": per_step_tol,
        "max_rel_delta": max(rel),
        **grad_parity,
        "grad_noise_floor_global_rel": grad_floor["grad_global_norm_rel_delta"],
        "grad_noise_floor_worst_leaf_rel": grad_floor["grad_worst_leaf_rel"],
        "grad_tol_global": grad_tol_global,
        "grad_tol_leaf": grad_tol_leaf,
        "chaos_k": CHAOS_K,
        "ok": ok,
        # report-only: per-leaf param distance after N Adam steps. Flat
        # coordinates legitimately diverge by ~steps*lr (first-step sign
        # chaos, docstring gate b) — informative, not a gate.
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

    print(f"\n{'step':>4} {'reference':>12} {'ours':>12} {'rel delta':>10} {'floor':>10} {'tol':>10}")
    for i, (r, o, d, f_, t) in enumerate(zip(
        result["reference_step_losses"], result["ours_step_losses"],
        result["per_step_rel_delta"], result["noise_floor_per_step_rel"],
        result["per_step_tol"],
    )):
        print(f"{i:>4} {r:>12.6f} {o:>12.6f} {d:>10.2e} {f_:>10.2e} {t:>10.2e}")
    print(
        f"\nstep-0 grads: global-norm rel {result['grad_global_norm_rel_delta']:.2e} "
        f"(floor {result['grad_noise_floor_global_rel']:.2e}, "
        f"tol {result['grad_tol_global']:.2e}); worst leaf rel "
        f"{result['grad_worst_leaf_rel']:.2e} ({result['grad_worst_leaf']}; "
        f"floor {result['grad_noise_floor_worst_leaf_rel']:.2e}, "
        f"tol {result['grad_tol_leaf']:.2e}); "
        f"{result['grad_leaves_below_floor']} leaves below floor "
        f"(worst abs {result['grad_floor_worst_abs']:.2e})"
    )
    print(
        f"max per-step loss rel delta {result['max_rel_delta']:.2e}; "
        f"final params max rel dist {result['final_param_rel_dist_max']:.2e} "
        f"({result['final_param_rel_dist_worst_leaf']}, report-only); "
        f"ok={result['ok']}"
    )
    ok = result["ok"]
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
