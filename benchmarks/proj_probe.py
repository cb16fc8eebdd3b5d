"""Probe: appearance in-projection lowerings (the model's hottest op).

The eval breakdown (benchmarks/eval_breakdown.py) itemizes, at flagship
shapes, a ~0.8 ms standalone tanh pass over the (4096, 16, 2048) appearance
tensor plus two projection matmuls that each re-read it, plus a time-reverse
materialization for the backward direction. Candidates (all produce the
identical xf (T, R, 4H) and time-reversed xb in the stream dtype that the
fused recurrence kernel consumes):

  v0_current   tanh pass -> two bf16-operand einsums -> astype -> xb[::-1]
               (exactly dualvgr_tpu/ops/lstm.py::time_major_input_proj x2)
  v1_merged    tanh pass -> ONE einsum against [W_f | W_b] -> split + rev
               (halves the x operand reads if XLA doesn't CSE them already)
  v2_pallas2   two pallas calls (one per direction): tanh fused into the
               matmul tile load, bias added in-kernel, bf16 written directly
               in time-major layout, the backward direction written
               time-REVERSED (no rev pass)
  v3_pallas1   one pallas call, both direction weights resident (~12.6 MB
               VMEM): single pass over x

    python benchmarks/proj_probe.py [--rows 4096] [--steps 30]
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


def chain_time(fn, x, steps, repeats=4):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(x, n):
        def body(i, carry):
            acc, eps = carry
            out = fn(x + eps)
            s = out
            return acc + s, (s * 1e-30).astype(x.dtype)

        acc, _ = jax.lax.fori_loop(
            0, n, body, (jnp.zeros((), "float32"), jnp.zeros((), x.dtype))
        )
        return acc

    float(chained(x, 1))
    float(chained(x, steps + 1))
    t1s, tns = [], []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(chained(x, 1))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(chained(x, steps + 1))
        tns.append(time.perf_counter() - t0)
    return max(min(tns) - min(t1s), 0.0) / steps


def make_pallas_proj(T, R, D, H4, block_r, reverse_time):
    """One-direction fused tanh+projection kernel factory.

    x (R, T, D) f32 -> out (T, R, 4H) bf16 (+bias), optionally written
    time-reversed (out[T-1-t] <- proj(x[:, t])) so the backward direction
    needs no separate rev pass.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, w_ref, b_ref, o_ref):
        xt = jnp.tanh(x_ref[:]).astype(jnp.bfloat16)
        acc = jnp.dot(xt, w_ref[:], preferred_element_type=jnp.float32)
        o_ref[0] = (acc + b_ref[:]).astype(jnp.bfloat16)

    t_ix = (lambda t, r: (T - 1 - t, r, 0)) if reverse_time else (lambda t, r: (t, r, 0))

    @jax.jit
    def proj(x, w, b):
        # (R, T, D) -> (R, T*D): contiguous reshape, makes the per-(t, r)
        # input block a tile-legal (block_r, D) slice at column t*D
        x = x.reshape(R, T * D)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((T, R, H4), jnp.bfloat16),
            grid=(T, R // block_r),
            in_specs=[
                pl.BlockSpec((block_r, D), lambda t, r: (r, t), memory_space=pltpu.VMEM),
                pl.BlockSpec((D, H4), lambda t, r: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((H4,), lambda t, r: (0,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_r, H4), t_ix, memory_space=pltpu.VMEM),
            cost_estimate=pl.CostEstimate(
                flops=2 * R * T * D * H4,
                bytes_accessed=R * T * D * 4 + D * H4 * 2 + T * R * H4 * 2,
                transcendentals=R * T * D,
            ),
        )(x, w, b)

    return proj


def make_pallas_both(T, R, D, H4, block_r, fuse_tanh=True):
    """Both directions in one call: W_f and W_b resident, single x pass.

    fuse_tanh=False takes an already-tanh'd bf16 input (the tanh runs as a
    full-speed XLA pass) — the kernel is then pure MXU work plus the
    direct-time-reversed bf16 writes."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, wf_ref, bf_ref, wb_ref, bb_ref, of_ref, ob_ref):
        xt = jnp.tanh(x_ref[:]).astype(jnp.bfloat16) if fuse_tanh else x_ref[:]
        accf = jnp.dot(xt, wf_ref[:], preferred_element_type=jnp.float32)
        of_ref[0] = (accf + bf_ref[:]).astype(jnp.bfloat16)
        accb = jnp.dot(xt, wb_ref[:], preferred_element_type=jnp.float32)
        ob_ref[0] = (accb + bb_ref[:]).astype(jnp.bfloat16)

    in_dtype = jnp.float32 if fuse_tanh else jnp.bfloat16

    @jax.jit
    def proj(x, wf, bf, wb, bb):
        x = x.astype(in_dtype) if not fuse_tanh else x
        x = x.reshape(R, T * D)
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((T, R, H4), jnp.bfloat16),
                jax.ShapeDtypeStruct((T, R, H4), jnp.bfloat16),
            ),
            grid=(T, R // block_r),
            in_specs=[
                pl.BlockSpec((block_r, D), lambda t, r: (r, t), memory_space=pltpu.VMEM),
                pl.BlockSpec((D, H4), lambda t, r: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((H4,), lambda t, r: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((D, H4), lambda t, r: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((H4,), lambda t, r: (0,), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, block_r, H4), lambda t, r: (t, r, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_r, H4), lambda t, r: (T - 1 - t, r, 0), memory_space=pltpu.VMEM),
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * R * T * D * H4,
                bytes_accessed=R * T * D * 4 + 2 * D * H4 * 2 + 2 * T * R * H4 * 2,
                transcendentals=R * T * D,
            ),
        )(x, wf, bf, wb, bb)

    return proj


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4096)  # B*C at flagship shapes
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--block-r", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    R, T, D, H4 = args.rows, 16, 2048, 1536
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(R, T, D).astype(np.float32))
    wf = jnp.asarray((rng.randn(D, H4) * 0.02).astype(np.float32))
    wb = jnp.asarray((rng.randn(D, H4) * 0.02).astype(np.float32))
    bfv = jnp.asarray(rng.randn(H4).astype(np.float32))
    bbv = jnp.asarray(rng.randn(H4).astype(np.float32))
    wf16, wb16 = wf.astype(jnp.bfloat16), wb.astype(jnp.bfloat16)
    wcat16 = jnp.concatenate([wf16, wb16], axis=1)
    bcat = jnp.concatenate([bfv, bbv])

    def endpoint(xf, xb):
        # the real consumer (the fused recurrence kernel) reads materialized
        # time-major arrays; the barrier stops XLA from fusing the rev/split
        # into the reduction and skipping that materialization
        xf, xb = jax.lax.optimization_barrier((xf, xb))
        return xf.astype(jnp.float32).sum() + xb.astype(jnp.float32).sum()

    def v0_current(x):
        y = jnp.tanh(x)
        yb = y.astype(jnp.bfloat16)
        xf = (
            jnp.einsum("rtd,dh->trh", yb, wf16, preferred_element_type=jnp.float32)
            + bfv
        ).astype(jnp.bfloat16)
        xb = (
            jnp.einsum("rtd,dh->trh", yb, wb16, preferred_element_type=jnp.float32)
            + bbv
        ).astype(jnp.bfloat16)[::-1]
        return endpoint(xf, xb)

    def v1_merged(x):
        y = jnp.tanh(x).astype(jnp.bfloat16)
        p = jnp.einsum("rtd,dh->trh", y, wcat16, preferred_element_type=jnp.float32)
        p = (p + bcat).astype(jnp.bfloat16)
        return endpoint(p[..., :H4], p[..., H4:][::-1])

    pf = make_pallas_proj(T, R, D, H4, args.block_r, reverse_time=False)
    pb = make_pallas_proj(T, R, D, H4, args.block_r, reverse_time=True)

    def v2_pallas2(x):
        return endpoint(pf(x, wf16, bfv), pb(x, wb16, bbv))

    pboth = make_pallas_both(T, R, D, H4, min(args.block_r, 128))

    def v3_pallas1(x):
        xf, xb = pboth(x, wf16, bfv, wb16, bbv)
        return endpoint(xf, xb)

    pboth_nt = make_pallas_both(T, R, D, H4, min(args.block_r, 128), fuse_tanh=False)

    def v4_xla_tanh_pallas_mm(x):
        y = jnp.tanh(x).astype(jnp.bfloat16)
        xf, xb = pboth_nt(y, wf16, bfv, wb16, bbv)
        return endpoint(xf, xb)

    # numeric gate before timing (full shapes — the factories bake in R)
    xs = x

    def ref_pair(x):
        y = jnp.tanh(x).astype(jnp.bfloat16)
        xf = (
            jnp.einsum("rtd,dh->trh", y, wf16, preferred_element_type=jnp.float32)
            + bfv
        ).astype(jnp.bfloat16)
        xb = (
            jnp.einsum("rtd,dh->trh", y, wb16, preferred_element_type=jnp.float32)
            + bbv
        ).astype(jnp.bfloat16)[::-1]
        return xf, xb

    want_f, want_b = ref_pair(xs)
    for name, fn in (
        ("v2f", lambda: pf(xs, wf16, bfv)),
        ("v3", lambda: pboth(xs, wf16, bfv, wb16, bbv)),
        ("v4", lambda: pboth_nt(jnp.tanh(xs).astype(jnp.bfloat16), wf16, bfv, wb16, bbv)),
    ):
        try:
            got = fn()
        except Exception as e:  # VMEM overflow etc — report, keep probing
            print(f"# {name} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
            continue
        gf = got if not isinstance(got, tuple) else got[0]
        err = float(
            jnp.max(jnp.abs(gf.astype(jnp.float32) - want_f.astype(jnp.float32)))
        )
        print(f"# {name} max abs err vs v0: {err:.3e}", flush=True)
        assert err < 0.05, (name, err)

    out = {"rows": R, "block_r": args.block_r}
    variants = [
        ("v0_current", v0_current),
        ("v1_merged", v1_merged),
        ("v2_pallas2", v2_pallas2),
        ("v3_pallas1", v3_pallas1),
        ("v4_xla_tanh_pallas_mm", v4_xla_tanh_pallas_mm),
    ]
    for name, fn in variants:
        try:
            ms = chain_time(fn, x, args.steps) * 1e3
        except Exception as e:
            print(f"# {name} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
            out[f"{name}_ms"] = None
            continue
        out[f"{name}_ms"] = round(ms, 3)
        print(f"# {name}: {out[f'{name}_ms']} ms", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
