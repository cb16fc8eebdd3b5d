"""Pin down TPU matmul precision semantics for the compute_dtype knob.

Answers one question with on-chip evidence: what does
``cfg.tpu.compute_dtype: bfloat16`` (bf16 operand streaming,
dualvgr_tpu/ops/precision.py) change NUMERICALLY relative to the fp32
path on each backend?

Finding (v5e, committed in precision_probe.json):

* On TPU, JAX's fp32 matmuls default to ``Precision.DEFAULT``, which the
  MXU executes as a SINGLE bf16xbf16->f32 pass — i.e. the "fp32" path
  already rounds matmul operands to bf16 in hardware. Explicitly casting
  the operands first (``streamed_matmul``) is therefore **bitwise
  identical** on TPU, while ``Precision.HIGHEST`` (3-pass) genuinely
  differs. Consequences:
    - ``bench.py``'s ``trained_bf16_max_abs_err: 0.0`` is EXPECTED, not
      a broken gate: the eval-path model contains only matmul streaming,
      so on TPU its logits cannot differ from the fp32 anchor.
    - the measured compute_dtype eval speedup is an HBM-traffic win
      (bf16 operands stored/read at half the bytes between fusions), not
      an MXU-math change.
    - bf16 END-TO-END TRAINING diverged in round 3 (-3.3% on the plateau
      fixture): under plain jax.grad the cotangent of a bf16-dtyped
      operand is itself bf16, so gradient intermediates were rounded at
      every streamed matmul — rounding the fp32 DEFAULT path never
      applies. FIXED in round 4: the streamed ops carry a custom VJP
      (dualvgr_tpu/ops/precision.py) that computes both cotangents as
      bf16-operand/f32-accumulation contractions with f32 OUTPUTS —
      bitwise what fp32 DEFAULT training computes on the MXU. The
      ``train_step`` section below pins the consequence on-chip: a full
      DualVGR train step (loss, grads, Adam update) under
      compute_dtype=bfloat16 is BITWISE-IDENTICAL to the fp32 step,
      sustained over multiple steps.

* XLA:TPU folds a bare f32->bf16->f32 convert round-trip under jit
  (``roundtrip_fold`` below): the XLA LSTM path's gate-stream round-trip
  (ops/lstm.py) is a forward no-op on TPU, and ``stream_roundtrip``'s
  identity backward makes it transparent to training as well.

* On CPU (the test tier), there is no DEFAULT-precision truncation and
  XLA does not fold the f32->bf16->f32 convert chain: streaming applies
  REAL rounding under jit, so the CPU-tier bf16 tests
  (tests/test_stream_dtype.py) exercise genuine reduced precision.

Run on the chip:  python benchmarks/precision_probe.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run() -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    # MXU-friendly shape (multiples of 128 lanes); values O(1)
    x = jax.random.normal(k1, (256, 512), jnp.float32)
    w = jax.random.normal(k2, (512, 384), jnp.float32)
    dims = (((1,), (0,)), ((), ()))

    @jax.jit
    def f_default(x, w):
        return x @ w

    @jax.jit
    def f_highest(x, w):
        return jax.lax.dot_general(x, w, dims, precision=jax.lax.Precision.HIGHEST)

    @jax.jit
    def f_streamed(x, w):
        # exactly dualvgr_tpu.ops.precision.streamed_matmul's TPU branch
        return jax.lax.dot_general(
            x.astype(jnp.bfloat16),
            w.astype(jnp.bfloat16),
            dims,
            preferred_element_type=jnp.float32,
        )

    a = np.asarray(f_default(x, w))
    h = np.asarray(f_highest(x, w))
    s = np.asarray(f_streamed(x, w))
    out = {
        "backend": jax.default_backend(),
        "shape": "f32[256,512] @ f32[512,384]",
        "default_vs_highest_max_abs": float(np.abs(a - h).max()),
        "default_vs_streamed_bf16_max_abs": float(np.abs(a - s).max()),
        "default_equals_streamed_bitwise": bool(np.array_equal(a, s)),
    }

    # model-level confirmation on the trained bundle when present: the
    # full eval path (every streamed matmul in DualVGR) vs the fp32
    # anchor — on TPU these must match bitwise for the same reason.
    bundle_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fastpath_trained.msgpack")
    if os.path.exists(bundle_path):
        import flax.serialization

        from dualvgr_tpu.models import DualVGR

        with open(bundle_path, "rb") as f:
            bundle = flax.serialization.msgpack_restore(f.read())
        mk = {
            k: (int(v) if isinstance(v, (int, np.integer)) else v)
            for k, v in bundle["model_kwargs"].items()
        }
        vb = bundle["val_batch"]
        inputs = tuple(jnp.asarray(vb[k]) for k in ("app", "mot", "q", "qlen"))
        variables = {
            "params": bundle["params"],
            "batch_stats": bundle.get("batch_stats") or {},
        }

        def logits(m):
            return np.asarray(
                jax.jit(
                    lambda v, i: m.apply(v, i[0], i[1], i[2], i[3], train=False).logits
                )(variables, inputs)
            )

        l32 = logits(DualVGR(use_pallas=False, **mk))
        l16 = logits(DualVGR(use_pallas=False, compute_dtype="bfloat16", **mk))
        out["trained_model_fp32_vs_bf16_max_abs"] = float(np.abs(l32 - l16).max())
        out["trained_model_bitwise_identical"] = bool(np.array_equal(l32, l16))

    # does XLA fold a bare f32->bf16->f32 convert round-trip under jit?
    # (TPU: yes — the LSTM gate-stream round-trip is a forward no-op;
    # CPU: no — the test tier exercises genuine rounding)
    rt = jax.jit(lambda x: x.astype(jnp.bfloat16).astype(jnp.float32))
    rt_diff = float(np.abs(np.asarray(rt(x)) - np.asarray(x)).max())
    out["roundtrip_fold_max_abs"] = rt_diff
    out["roundtrip_folds_to_identity"] = rt_diff == 0.0

    # ---- training-step bitwise equality (the round-4 exact-VJP claim) ----
    # a full DualVGR train step (fwd, aux losses, grads, clip, Adam) under
    # compute_dtype=bfloat16 vs fp32, same init/batches/dropout keys: with
    # the exact-f32 custom VJPs every streamed cotangent is computed as a
    # bf16-operand/f32-out contraction == what fp32 DEFAULT computes on the
    # MXU, so on TPU the two runs must stay bitwise-identical step by step.
    from dualvgr_tpu import train_lib
    from dualvgr_tpu.models import DualVGR as _DualVGR

    kw = dict(
        vision_dim=256, module_dim=128, word_dim=64, question_vocab_size=120,
        num_answers=24, num_of_nodes=4, graph_layers=1, unit_layers=1,
        use_pallas=False,
    )
    B, T, F = 8, 9, 16
    rng = np.random.RandomState(7)
    app = jnp.asarray(rng.randn(B, kw["num_of_nodes"], F, kw["vision_dim"]).astype(np.float32))
    mot = jnp.asarray(rng.randn(B, kw["num_of_nodes"], kw["vision_dim"]).astype(np.float32))
    q = jnp.asarray(rng.randint(1, kw["question_vocab_size"], (B, T)).astype(np.int32))
    qlen = jnp.asarray(rng.randint(1, T + 1, (B,)).astype(np.int32))
    valid = jnp.ones((B,), jnp.float32)
    example = (app[:1], mot[:1], q[:1], qlen[:1])
    opt = train_lib.make_optimizer(1e-3, 4)

    def steps(model, n=5):
        state = train_lib.create_train_state(
            model, jax.random.PRNGKey(11), example, opt
        )
        step = jax.jit(
            lambda s, b: train_lib.train_step(
                s, b, model=model, optimizer=opt, alpha=1.0, beta=1e-8
            ),
            donate_argnums=(0,),
        )
        for i in range(n):
            ans = jnp.asarray(
                np.random.RandomState(100 + i).randint(0, kw["num_answers"], (B,))
                .astype(np.int32)
            )
            state, _ = step(state, (app, mot, q, qlen, ans, valid))
        return jax.device_get(state.params)

    p32 = steps(_DualVGR(**kw))
    p16 = steps(_DualVGR(compute_dtype="bfloat16", **kw))
    leaves32 = jax.tree_util.tree_leaves(p32)
    leaves16 = jax.tree_util.tree_leaves(p16)
    diverged = sum(
        0 if np.array_equal(a, b) else 1 for a, b in zip(leaves32, leaves16)
    )
    out["train_step"] = {
        "steps": 5,
        "param_leaves": len(leaves32),
        "leaves_diverged_after_5_steps": diverged,
        "bf16_train_bitwise_equals_fp32": diverged == 0,
        "max_abs_param_diff": float(
            max(np.abs(a - b).max() for a, b in zip(leaves32, leaves16))
        ),
    }
    return out


if __name__ == "__main__":
    result = run()
    print(json.dumps(result, indent=2))
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "precision_probe.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
