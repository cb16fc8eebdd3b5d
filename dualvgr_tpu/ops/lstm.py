"""Masked (Bi)LSTM as a fused-projection ``lax.scan`` — the TPU replacement
for the reference's cuDNN packed-sequence LSTMs.

Reference semantics being matched (behavioral, not bit-wise):

* ``DynamicRNN`` (reference model/Preprocessing.py:7-45): sort-by-length ->
  pack_padded -> nn.LSTM -> unsort -> right-pad per-step outputs with zeros,
  plus the concatenated (fwd, bwd) final hidden state.
* plain packed BiLSTM final state (reference model/Preprocessing.py:119-124).

Packed-vs-masked equivalence: with right-padded inputs and zero-initialized
state, (a) a forward scan that carries the previous state through padded
steps ends with exactly the state at t = len-1; (b) a *reverse-time* scan
whose carry stays at the zero init until it enters the valid region starts
the backward pass at t = len-1, exactly like packed cuDNN; (c) per-step
outputs at padded positions are zero-masked, matching pad_packed_sequence.

TPU-first design: the input projection for all timesteps is ONE big matmul
(B*T, D) @ (D, 4H) hitting the MXU at full tile occupancy; only the (H, 4H)
recurrent matmul lives inside ``lax.scan``. Gate order is torch's
(i, f, g, o) so reference checkpoints port weight-for-weight.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


class LSTMParams(NamedTuple):
    """Single-direction LSTM parameters, torch-compatible gate order (i,f,g,o).

    w_ih: (input_dim, 4*hidden)  — transpose of torch's weight_ih_l0
    w_hh: (hidden, 4*hidden)     — transpose of torch's weight_hh_l0
    b_ih, b_hh: (4*hidden,)      — torch's two bias vectors, kept SEPARATE:
        they receive identical gradients, so under Adam the effective bias
        step is doubled vs a single fused bias — matching the reference's
        training dynamics requires both (tests/test_training_parity.py).
    """

    w_ih: jax.Array
    w_hh: jax.Array
    b_ih: jax.Array
    b_hh: jax.Array

    @property
    def b(self) -> jax.Array:
        return self.b_ih + self.b_hh


def _xavier_uniform_torch_shape(key, torch_shape, dtype=jnp.float32):
    """torch.nn.init.xavier_uniform_ on a (out, in) torch-shaped matrix.

    The reference initializes LSTM weight matrices with xavier_uniform on
    their torch shapes (4H, D) (reference model/utils.py:28-32); fan-in/out
    is computed on that shape, so we must too, then transpose to (D, 4H).
    """
    fan_out, fan_in = torch_shape
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    w = jax.random.uniform(key, torch_shape, dtype, minval=-bound, maxval=bound)
    return w.T


def init_lstm_params(key, input_dim: int, hidden: int, dtype=jnp.float32) -> LSTMParams:
    """Xavier-uniform weights + zero biases (reference model/utils.py:28-32)."""
    k1, k2 = jax.random.split(key)
    w_ih = _xavier_uniform_torch_shape(k1, (4 * hidden, input_dim), dtype)
    w_hh = _xavier_uniform_torch_shape(k2, (4 * hidden, hidden), dtype)
    zeros = jnp.zeros((4 * hidden,), dtype)
    return LSTMParams(w_ih, w_hh, zeros, zeros)


# scan unroll factor: unrolling the 16-step recurrences lets XLA pipeline the
# small (rows, H) @ (H, 4H) matmuls with the elementwise gate math instead of
# paying per-iteration loop overhead; 16-frame clips unroll fully.
SCAN_UNROLL = 4


def time_major_input_proj(x, params: LSTMParams, stream_dtype=None):
    """(B, T, D) -> (T, B, 4H) fused input projection ``x @ w_ih + b``.

    Written directly in time-major layout (the transposed output tiling is
    free on the MXU; reshape+transpose costs an extra HBM round-trip). With
    ``stream_dtype`` (e.g. bfloat16, from cfg.tpu.compute_dtype) the matmul
    consumes reduced-precision OPERANDS while accumulating in float32 —
    halves the dominant operand traffic of the model's hottest matmul and
    engages the MXU's native bf16 path; the bias add stays float32. Params
    themselves remain float32, and gradients stay EXACT-F32 (the custom VJP
    in ops/precision.py — plain autodiff would round the cotangents to the
    stream dtype, the measured −3.3% training delta of round 3).
    """
    if stream_dtype is None:
        return jnp.einsum("btd,dh->tbh", x, params.w_ih) + params.b
    from dualvgr_tpu.ops.precision import streamed_einsum

    return streamed_einsum("btd,dh->tbh", x, params.w_ih, stream_dtype) + params.b


def _scan_direction(params: LSTMParams, xproj, mask, reverse: bool):
    """Run one direction over time.

    xproj: (T, B, 4H) precomputed input projection (+ bias).
    mask:  (T, B, 1) float; 1 inside the valid region, 0 at padding.
    Returns (outputs (T, B, H) zero-masked at padding, final h (B, H)).
    """
    hidden = params.w_hh.shape[0]
    bsz = xproj.shape[1]
    h0 = jnp.zeros((bsz, hidden), xproj.dtype)
    c0 = jnp.zeros((bsz, hidden), xproj.dtype)
    w_hh = params.w_hh

    def step(carry, inp):
        h_prev, c_prev = carry
        xp, m = inp
        gates = xp + h_prev @ w_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c_prev + i * g
        h = o * jnp.tanh(c)
        # carry the previous state through padded steps (packed equivalence)
        h = m * h + (1.0 - m) * h_prev
        c = m * c + (1.0 - m) * c_prev
        return (h, c), h * m  # zero per-step output at padding

    (h_final, _), outs = jax.lax.scan(
        step, (h0, c0), (xproj, mask), reverse=reverse, unroll=SCAN_UNROLL
    )
    return outs, h_final


def lstm_unroll(
    params: LSTMParams, x, lengths=None, *, reverse: bool = False,
    stream_dtype: str | None = None,
):
    """Single-direction masked LSTM.

    x: (B, T, D); lengths: (B,) int or None (None => all steps valid).
    ``stream_dtype`` (explicit, threaded from the model's ``compute_dtype``
    attribute so jit caches key on it) makes the input projection consume
    reduced-precision operands — see dualvgr_tpu/ops/precision.py.
    Returns (outputs (B, T, H), final_h (B, H)).
    """
    bsz, t, _ = x.shape
    # one fused projection matmul over all timesteps (see
    # time_major_input_proj); honors the stream dtype so the XLA path
    # and the fused Pallas path share identical input-projection numerics
    # (the bench's on-device equivalence gate stays tight under bf16).
    sd = stream_dtype
    xproj = time_major_input_proj(x, params, sd)
    if sd is not None:
        # round-trip through the stream dtype: the fused Pallas path streams
        # the projected gates to the kernel in sd, so the XLA path applies
        # the SAME rounding — the two implementations stay bit-comparable
        # and the bench's on-device equivalence gate holds at fp32 tightness.
        # Identity gradient (stream_roundtrip): the forward pair folds to a
        # no-op on TPU, and the backward must not round the cotangent.
        from dualvgr_tpu.ops.precision import stream_roundtrip

        xproj = stream_roundtrip(xproj, sd)
    if lengths is None:
        mask = jnp.ones((t, bsz, 1), x.dtype)
    else:
        steps = jnp.arange(t, dtype=jnp.int32)[:, None]
        mask = (steps < lengths[None, :].astype(jnp.int32)).astype(x.dtype)[..., None]
    outs, h = _scan_direction(params, xproj, mask, reverse)
    return outs.transpose(1, 0, 2), h


def bilstm(fwd: LSTMParams, bwd: LSTMParams, x, lengths=None, *, stream_dtype=None):
    """Bidirectional masked LSTM.

    Returns (outputs (B, T, 2H) with [fwd, bwd] features concatenated,
    final (B, 2H) = [fwd final at len-1, bwd state at t=0]) — the same
    layout torch produces after `torch.cat([state[0], state[1]], -1)`
    (reference model/Preprocessing.py:43-44, 122-123).
    """
    out_f, h_f = lstm_unroll(fwd, x, lengths, reverse=False, stream_dtype=stream_dtype)
    out_b, h_b = lstm_unroll(bwd, x, lengths, reverse=True, stream_dtype=stream_dtype)
    return jnp.concatenate([out_f, out_b], -1), jnp.concatenate([h_f, h_b], -1)
