"""Mixed-precision matmul streaming (cfg.tpu.compute_dtype).

Policy: parameters, biases, accumulators, softmaxes, norms and recurrences
stay float32; only matmul OPERANDS are cast to the stream dtype (bfloat16),
with float32 accumulation via ``preferred_element_type`` — the MXU's native
bf16xbf16->f32 path. This halves the HBM operand traffic of every wide
matmul without changing parameter precision.

GRADIENTS ARE EXACT-F32 (custom VJP). Plain autodiff through the operand
casts rounds every cotangent to bfloat16 on the way back (the transpose of
a bf16-operand dot must produce a bf16 cotangent, which the ``astype``
transpose then upcasts — one genuine RNE rounding per streamed matmul per
step). Measured end-to-end that rounding cost −3.3% converged accuracy
(benchmarks/fastpath_accuracy.json, round 3). The custom VJP below instead
computes both cotangents as bf16-OPERAND contractions with float32
accumulation and float32 OUTPUTS — on the TPU MXU that is bitwise-identical
to what float32 training at ``Precision.DEFAULT`` computes (the MXU rounds
fp32 dot operands to bf16 internally; pinned on-chip by
benchmarks/precision_probe.py), so ``compute_dtype: bfloat16`` training is
bitwise-equal to fp32 training on TPU while backward operand traffic and
saved residuals stay half-width.

The knob is threaded EXPLICITLY as a flax module attribute
(``compute_dtype`` on DualVGR and its submodules) rather than a mutable
global: a bfloat16 model is a *different module instance*, so every
``jax.jit`` cache keys on it and stale-dtype executables cannot be reused
(the round-2 advisor flagged the global for exactly that hazard).

Deliberately NOT streamed: QueryAttn / QueryPunish (reference
model/utils.py:60-105) — their matmuls are a negligible FLOPs fraction and
QueryAttn's output feeds an L2-normalize + masked softmax that amplifies
operand rounding (the known-amplified leaves in tests/test_pallas_train.py).
"""

from __future__ import annotations

import functools
from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp


def stream_dtype_of(compute_dtype: str | None) -> str | None:
    """Map cfg.tpu.compute_dtype to an operand stream dtype (None = fp32)."""
    if compute_dtype is None or compute_dtype == "float32":
        return None
    return compute_dtype


def _contract(spec: str, a, b):
    """einsum over already-rounded operands, float32 accumulation + output.

    TPU: the MXU's native bf16xbf16->f32 path. CPU (no mixed-dtype dot):
    upcasting the rounded operands is numerically equivalent — bf16
    products are exact in fp32 and the accumulation is fp32 either way.
    """
    if jax.default_backend() == "tpu":
        return jnp.einsum(spec, a, b, preferred_element_type=jnp.float32)
    return jnp.einsum(spec, a.astype(jnp.float32), b.astype(jnp.float32))


@functools.lru_cache(maxsize=None)
def _transpose_specs(spec: str) -> tuple[str, str]:
    """Cotangent einsum specs for a 2-operand ``spec`` "a,b->o".

    dx_a = einsum("o,b->a", g, b) and dx_b = einsum("a,o->b", a, g) — valid
    when no operand repeats an index and every index of each operand appears
    in the union of the output and the other operand (true for every streamed
    contraction in this codebase; asserted so a new call site that violates
    it fails loudly instead of silently mis-differentiating).
    """
    ins, out = spec.split("->")
    a, b = ins.split(",")
    for op, other in ((a, b), (b, a)):
        assert len(set(op)) == len(op), f"repeated index in {spec!r}"
        assert set(op) <= set(out) | set(other), f"summed-only index in {spec!r}"
    return f"{out},{b}->{a}", f"{a},{out}->{b}"


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 3))
def _streamed_einsum(spec: str, x, w, sd: str):
    xs, ws = x.astype(sd), w.astype(sd)
    return _contract(spec, xs, ws)


def _streamed_einsum_fwd(spec, x, w, sd):
    xs, ws = x.astype(sd), w.astype(sd)
    # residuals are the HALF-WIDTH operands (+ zero-size dtype carriers so
    # the bwd can restore the primal cotangent dtypes without re-tracing)
    res = (xs, ws, jnp.zeros((0,), x.dtype), jnp.zeros((0,), w.dtype))
    return _contract(spec, xs, ws), res


def _streamed_einsum_bwd(spec, sd, res, g):
    xs, ws, xproto, wproto = res
    spec_dx, spec_dw = _transpose_specs(spec)
    gs = g.astype(sd)
    # EXACT-F32 cotangents: bf16 operands, f32 accumulation, f32 output —
    # on the MXU bitwise what fp32 Precision.DEFAULT training computes
    # (module docstring). No terminal bf16 rounding of dx/dw.
    dx = _contract(spec_dx, gs, ws).astype(xproto.dtype)
    dw = _contract(spec_dw, xs, gs).astype(wproto.dtype)
    return dx, dw


_streamed_einsum.defvjp(_streamed_einsum_fwd, _streamed_einsum_bwd)


def streamed_matmul(x, w, stream_dtype: str | None):
    """``x @ w`` over the last/first dims with reduced-precision operands.

    x: (..., D); w: (D, H). With ``stream_dtype`` (e.g. "bfloat16") the
    operands are cast down while accumulation stays float32 and gradients
    stay exact-f32 (module docstring); without it this is a plain fp32
    matmul.
    """
    if stream_dtype is None:
        return x @ w
    lead = "abcefg"[: x.ndim - 1]  # arbitrary distinct leading labels
    return _streamed_einsum(f"{lead}d,dh->{lead}h", x, w, stream_dtype)


def streamed_einsum(spec: str, x, w, stream_dtype: str | None):
    """``jnp.einsum(spec, x, w)`` with reduced-precision operands.

    Same policy/backend handling as ``streamed_matmul`` for contractions a
    plain ``x @ w`` can't express (e.g. per-bank stacked weights,
    "kbnd,kdh->kbnh").
    """
    if stream_dtype is None:
        return jnp.einsum(spec, x, w)
    return _streamed_einsum(spec, x, w, stream_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def stream_roundtrip(x, sd: str):
    """``x -> astype(sd) -> astype(x.dtype)`` with an IDENTITY gradient.

    Forward: the rounding the fused Pallas kernels apply when they stream
    gate projections in the reduced dtype, so the XLA path stays
    bit-comparable with them (ops/lstm.py). On TPU the convert pair folds
    to a no-op under jit (pinned by benchmarks/precision_probe.py); on CPU
    it applies genuine RNE rounding. Backward: the cotangent passes through
    UNROUNDED — plain autodiff would round it to ``sd`` (the forward fold
    does not apply to the transpose, whose converts are not adjacent), which
    is exactly the rounding the module docstring's −3.3% was made of. On
    TPU (folded forward + identity backward) the op is fully transparent;
    on CPU it is a straight-through estimator of a rounding whose true
    derivative is identity almost everywhere.
    """
    return x.astype(sd).astype(x.dtype)


def _stream_roundtrip_fwd(x, sd):
    return x.astype(sd).astype(x.dtype), None


def _stream_roundtrip_bwd(sd, _res, g):
    return (g,)


stream_roundtrip.defvjp(_stream_roundtrip_fwd, _stream_roundtrip_bwd)


class SDense(nn.Module):
    """nn.Dense drop-in whose matmul honors a stream dtype.

    Parameter names/shapes ("kernel" (D, features), "bias" (features,))
    match nn.Dense exactly, so swapping a Dense for an SDense changes no
    checkpoint or init; with ``stream=None`` the numerics are identical too.
    """

    features: int
    use_bias: bool = True
    stream: str | None = None
    kernel_init: Callable = nn.initializers.xavier_uniform()

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", self.kernel_init, (x.shape[-1], self.features))
        y = streamed_matmul(x, kernel, self.stream)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y
