"""Mixed-precision matmul streaming (cfg.tpu.compute_dtype).

Policy: parameters, biases, accumulators, softmaxes, norms and recurrences
stay float32; only matmul OPERANDS are cast to the stream dtype (bfloat16),
with float32 accumulation via ``preferred_element_type`` — the MXU's native
bf16xbf16->f32 path. This halves the HBM operand traffic of every wide
matmul without changing parameter precision (the ``astype`` VJP casts
gradients back to float32, so the optimizer state is untouched).

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

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp


def stream_dtype_of(compute_dtype: str | None) -> str | None:
    """Map cfg.tpu.compute_dtype to an operand stream dtype (None = fp32)."""
    if compute_dtype is None or compute_dtype == "float32":
        return None
    return compute_dtype


def streamed_matmul(x, w, stream_dtype: str | None):
    """``x @ w`` over the last/first dims with reduced-precision operands.

    x: (..., D); w: (D, H). With ``stream_dtype`` (e.g. "bfloat16") the
    operands are cast down while accumulation stays float32; without it this
    is a plain fp32 matmul.
    """
    if stream_dtype is None:
        return x @ w
    xs = x.astype(stream_dtype)
    ws = w.astype(stream_dtype)
    if jax.default_backend() == "tpu":
        return jax.lax.dot_general(
            xs,
            ws,
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    # CPU has no bf16xbf16->f32 dot; upcasting the already-rounded operands
    # is numerically equivalent (bf16 products are exact in fp32 and the
    # accumulation is fp32 either way), so tests match TPU behavior.
    return xs.astype(jnp.float32) @ ws.astype(jnp.float32)


def streamed_einsum(spec: str, x, w, stream_dtype: str | None):
    """``jnp.einsum(spec, x, w)`` with reduced-precision operands.

    Same policy/backend handling as ``streamed_matmul`` for contractions a
    plain ``x @ w`` can't express (e.g. per-bank stacked weights,
    "kbnd,kdh->kbnh").
    """
    if stream_dtype is None:
        return jnp.einsum(spec, x, w)
    xs = x.astype(stream_dtype)
    ws = w.astype(stream_dtype)
    if jax.default_backend() == "tpu":
        return jnp.einsum(spec, xs, ws, preferred_element_type=jnp.float32)
    # CPU: upcast the rounded operands (see streamed_matmul)
    return jnp.einsum(spec, xs.astype(jnp.float32), ws.astype(jnp.float32))


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
