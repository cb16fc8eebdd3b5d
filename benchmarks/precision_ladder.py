"""Scale ladder for the bf16-training == fp32-training bitwise claim.

precision_probe.py pins, at one small shape, that a full DualVGR train step
under ``compute_dtype: bfloat16`` is bitwise-identical to the fp32 step on
TPU (the exact-f32 custom VJPs in dualvgr_tpu/ops/precision.py compute every
streamed cotangent as a bf16-operand/f32-accumulation/f32-output contraction
— exactly what fp32 ``Precision.DEFAULT`` executes on the MXU). That
equality is only as strong as its scale generalization: XLA picks different
tilings/layouts at different shapes, and if the fp32-DEFAULT and explicit-
bf16 programs ever chose different reduction orders the f32 accumulations
would differ in the last bit and training would chaos-diverge.

THIS probe climbs a dimension ladder from toy to flagship shapes
(vision_dim 2048, module_dim 768, word_dim 300 — the shipped configs'
dims, configs/*.yml; reference model surface /root/reference/model/models.py:36-53)
and at each rung checks
  - forward logits bitwise equality (eval claim), and
  - per-leaf param equality after one full train step: forward, CE + aux
    losses (common + HSIC, /root/reference/utils.py:10-31 semantics),
    backward, global-norm clip, Adam update (train claim).

Committed artifact: precision_ladder.json (real-chip run). A rung that
stops being bitwise would mean the bf16-train-speedup numbers need a
per-dataset accuracy caveat at that scale; as measured, none does.

Usage: python benchmarks/precision_ladder.py [--tail]   (--tail: only the
two largest rungs, for cheap re-verification after a numerics change)
"""

from __future__ import annotations

import json
import os
import sys

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

RUNGS = [(256, 128, 64), (512, 256, 128), (1024, 512, 300), (2048, 768, 300)]


def check(vision_dim, module_dim, word_dim, nodes=8, frames=16, B=8, T=12):
    from dualvgr_tpu import train_lib
    from dualvgr_tpu.models import DualVGR

    kw = dict(
        vision_dim=vision_dim, module_dim=module_dim, word_dim=word_dim,
        question_vocab_size=600, num_answers=60, num_of_nodes=nodes,
        graph_layers=1, unit_layers=1, use_pallas=False,
    )
    rng = np.random.RandomState(7)
    app = jnp.asarray(rng.randn(B, nodes, frames, vision_dim).astype(np.float32))
    mot = jnp.asarray(rng.randn(B, nodes, vision_dim).astype(np.float32))
    q = jnp.asarray(rng.randint(1, 600, (B, T)).astype(np.int32))
    qlen = jnp.asarray(rng.randint(1, T + 1, (B,)).astype(np.int32))
    valid = jnp.ones((B,), jnp.float32)
    ans = jnp.asarray(rng.randint(0, 60, (B,)).astype(np.int32))
    example = (app[:1], mot[:1], q[:1], qlen[:1])
    opt = train_lib.make_optimizer(1e-3, 4)

    def fwd_logits(model):
        state = train_lib.create_train_state(
            model, jax.random.PRNGKey(11), example, opt
        )
        out = jax.jit(
            lambda p, bs: model.apply(
                {"params": p, "batch_stats": bs}, app, mot, q, qlen, train=False
            ).logits
        )(state.params, state.batch_stats)
        return np.asarray(out)

    def one_step(model):
        state = train_lib.create_train_state(
            model, jax.random.PRNGKey(11), example, opt
        )
        step = jax.jit(
            lambda s, b: train_lib.train_step(
                s, b, model=model, optimizer=opt, alpha=1.0, beta=1e-8
            ),
            donate_argnums=(0,),
        )
        state, _ = step(state, (app, mot, q, qlen, ans, valid))
        return jax.device_get(state.params)

    m32 = DualVGR(**kw)
    m16 = DualVGR(compute_dtype="bfloat16", **kw)
    l32, l16 = fwd_logits(m32), fwd_logits(m16)

    p32, p16 = one_step(m32), one_step(m16)
    flat32 = jax.tree_util.tree_leaves_with_path(p32)
    flat16 = jax.tree_util.tree_leaves(p16)
    diverged = [
        (jax.tree_util.keystr(path),
         float(np.abs(np.asarray(a) - np.asarray(b)).max()))
        for (path, a), b in zip(flat32, flat16)
        if not np.array_equal(a, b)
    ]
    rung = {
        "vision_dim": vision_dim,
        "module_dim": module_dim,
        "word_dim": word_dim,
        "fwd_bitwise": bool(np.array_equal(l32, l16)),
        "fwd_max_abs": float(np.abs(l32 - l16).max()),
        "param_leaves": len(flat16),
        "step_leaves_diverged": len(diverged),
        "step_bitwise": not diverged,
    }
    print(
        f"dims v={vision_dim} m={module_dim} w={word_dim}: "
        f"fwd_bitwise={rung['fwd_bitwise']} fwd_max={rung['fwd_max_abs']:.3e} "
        f"step_diverged={len(diverged)}/{len(flat16)}",
        flush=True,
    )
    for p, d in diverged[:8]:
        print(f"    {p}: {d:.3e}", flush=True)
    return rung


def main():
    print("backend:", jax.default_backend(), flush=True)
    rungs = RUNGS[-2:] if "--tail" in sys.argv else RUNGS
    results = [check(*dims) for dims in rungs]
    out = {
        "backend": jax.default_backend(),
        "rungs": results,
        "all_bitwise": all(r["fwd_bitwise"] and r["step_bitwise"] for r in results),
    }
    if out["backend"] == "tpu" and "--tail" not in sys.argv:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "precision_ladder.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
        print(f"wrote {path}")
    return out


if __name__ == "__main__":
    main()
