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
    - bf16 END-TO-END TRAINING still diverges (fastpath_accuracy.json:
      -3.3% on the plateau fixture): under jax.grad the cotangent of a
      bf16-dtyped operand is itself bf16, so gradient intermediates are
      rounded at every streamed matmul — rounding the fp32 DEFAULT path
      never applies. Eval streaming and train streaming are different
      numeric claims; only the former is identity on TPU.

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
    return out


if __name__ == "__main__":
    result = run()
    print(json.dumps(result, indent=2))
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "precision_probe.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
