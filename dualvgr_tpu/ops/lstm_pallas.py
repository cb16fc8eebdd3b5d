"""Fused bidirectional LSTM recurrence as a Pallas TPU kernel.

The model's three BiLSTMs (reference model/Preprocessing.py) share one
recurrence pattern; XLA schedules it poorly — 2*T sequential small matmuls
plus gate transcendentals per direction. This kernel fuses the whole
bidirectional recurrence into one invocation:

* the FLOPs-heavy input projection ((rows*T, D) @ (D, 4H)) stays in XLA
  where it runs at MXU peak; the kernel consumes the projected gates,
* grid = (row_blocks, T); the T axis iterates fastest, so Pallas
  double-buffers per-step xproj blocks from HBM while compute proceeds,
* h/c states for both directions live in VMEM scratch across grid steps,
* both directions advance in the same grid step (the backward direction's
  xproj is passed time-reversed, making both scans forward-in-time),
* variable lengths (packed-sequence semantics): the forward direction
  carries its state through padded steps (final state == state at len-1);
  the backward direction stays at the zero init until it enters its valid
  region (global step t >= T - len), exactly like cuDNN packed sequences,
* optionally emits zero-masked per-step outputs (the DynamicRNN contract,
  Preprocessing.py:35-40) — the backward half is written at kernel time t
  and time-flipped by the caller (one cheap XLA reverse).

Inference-path kernel; the training path runs the custom-VJP forward/backward
kernel pair in dualvgr_tpu/ops/lstm_pallas_train.py (see PARITY.md).
Equivalence is tested in interpret mode (tests/test_pallas.py) and on
hardware. The bf16 gate-streaming knob is threaded explicitly (the model's
``compute_dtype`` attribute casts the projected gates before the kernel
call) — there is no mutable module global.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lstm_step(gates, h, c):
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h, c


def _kernel(
    xf_ref, xb_ref, len_ref,
    whf_ref, whb_ref,
    final_ref, outs_ref,
    hf, cf, hb, cb,
    *, t_total, hidden, masked, with_outputs,
):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        hf[:] = jnp.zeros_like(hf)
        cf[:] = jnp.zeros_like(cf)
        hb[:] = jnp.zeros_like(hb)
        cb[:] = jnp.zeros_like(cb)

    if masked:
        lens = len_ref[:]  # (rows, 1) float
        m_f = (t < lens).astype(jnp.float32)  # forward: valid while t < len
        m_b = (t >= t_total - lens).astype(jnp.float32)  # backward (reversed)
    else:
        m_f = m_b = None

    # xproj may stream in bf16 (halves the dominant HBM traffic); compute fp32
    gates_f = xf_ref[0].astype(jnp.float32) + jnp.dot(
        hf[:], whf_ref[:], preferred_element_type=jnp.float32
    )
    h_new, c_new = _lstm_step(gates_f, hf[:], cf[:])
    if masked:
        h_new = m_f * h_new + (1.0 - m_f) * hf[:]
        c_new = m_f * c_new + (1.0 - m_f) * cf[:]
    hf[:] = h_new
    cf[:] = c_new

    gates_b = xb_ref[0].astype(jnp.float32) + jnp.dot(
        hb[:], whb_ref[:], preferred_element_type=jnp.float32
    )
    h_new, c_new = _lstm_step(gates_b, hb[:], cb[:])
    if masked:
        h_new = m_b * h_new + (1.0 - m_b) * hb[:]
        c_new = m_b * c_new + (1.0 - m_b) * cb[:]
    hb[:] = h_new
    cb[:] = c_new

    if with_outputs:
        out_f = hf[:] * m_f if masked else hf[:]
        out_b = hb[:] * m_b if masked else hb[:]
        outs_ref[0, :, :hidden] = out_f.astype(outs_ref.dtype)
        outs_ref[0, :, hidden:] = out_b.astype(outs_ref.dtype)

    @pl.when(t == t_total - 1)
    def _():
        final_ref[:, :hidden] = hf[:].astype(final_ref.dtype)
        final_ref[:, hidden:] = hb[:].astype(final_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_r", "interpret", "with_outputs")
)
def bilstm_pallas(
    xproj_f,
    xproj_b_rev,
    w_hh_f,
    w_hh_b,
    lengths=None,
    *,
    with_outputs: bool = False,
    # 128-row blocks measured fastest at flagship shapes (1.73 vs 2.16 ms
    # for the appearance recurrence at 256; 64 regresses to 2.50 ms)
    block_r: int = 128,
    interpret: bool = False,
):
    """Fused BiLSTM recurrence.

    xproj_f:     (T, R, 4H) forward input projections (incl. bias).
    xproj_b_rev: (T, R, 4H) backward projections, TIME-REVERSED.
    w_hh_*:      (H, 4H) recurrent weights.
    lengths:     optional (R,) int/float valid lengths (None = full length).

    Returns final (R, 2H) = [h_fwd_at_len-1, h_bwd_at_0]; with
    ``with_outputs`` also returns per-step outputs (R, T, 2H), zero-masked
    at padding, backward half already time-aligned to original order.
    """
    t_total, r, g = xproj_f.shape
    hidden = g // 4
    masked = lengths is not None

    block_r = min(block_r, r)
    pad = (-r) % block_r
    if pad:
        padding = ((0, 0), (0, pad), (0, 0))
        xproj_f = jnp.pad(xproj_f, padding)
        xproj_b_rev = jnp.pad(xproj_b_rev, padding)
    rp = xproj_f.shape[1]
    if masked:
        lens = jnp.pad(lengths.astype(jnp.float32), (0, pad))[:, None]  # (rp, 1)
    else:
        lens = jnp.zeros((rp, 1), jnp.float32)  # unused placeholder

    kernel = functools.partial(
        _kernel, t_total=t_total, hidden=hidden, masked=masked, with_outputs=with_outputs
    )
    x_spec = pl.BlockSpec((1, block_r, g), lambda rb, t: (t, rb, 0), memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec((block_r, 1), lambda rb, t: (rb, 0), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((hidden, g), lambda rb, t: (0, 0), memory_space=pltpu.VMEM)
    final_spec = pl.BlockSpec((block_r, 2 * hidden), lambda rb, t: (rb, 0), memory_space=pltpu.VMEM)

    out_shapes = [jax.ShapeDtypeStruct((rp, 2 * hidden), xproj_f.dtype)]
    out_specs = [final_spec]
    if with_outputs:
        out_shapes.append(jax.ShapeDtypeStruct((t_total, rp, 2 * hidden), xproj_f.dtype))
        out_specs.append(
            pl.BlockSpec((1, block_r, 2 * hidden), lambda rb, t: (t, rb, 0), memory_space=pltpu.VMEM)
        )
    else:
        # dummy 1-block output so the kernel signature is static
        out_shapes.append(jax.ShapeDtypeStruct((1, block_r, 2 * hidden), xproj_f.dtype))
        out_specs.append(
            pl.BlockSpec((1, block_r, 2 * hidden), lambda rb, t: (0, 0, 0), memory_space=pltpu.VMEM)
        )

    final, outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=(rp // block_r, t_total),
        in_specs=[x_spec, x_spec, len_spec, w_spec, w_spec],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((block_r, hidden), jnp.float32),  # hf
            pltpu.VMEM((block_r, hidden), jnp.float32),  # cf
            pltpu.VMEM((block_r, hidden), jnp.float32),  # hb
            pltpu.VMEM((block_r, hidden), jnp.float32),  # cb
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * rp * t_total * hidden * g * 2,
            bytes_accessed=xproj_f.size * 4 * 2,
            transcendentals=rp * t_total * g * 2,
        ),
        interpret=interpret,
    )(xproj_f, xproj_b_rev, lens, w_hh_f, w_hh_b)

    final = final[:r]
    if not with_outputs:
        return final
    # (T, R, 2H) -> (R, T, 2H); backward half written in reversed kernel time
    outs = outs[:, :r].transpose(1, 0, 2)
    out_f, out_b = outs[..., :hidden], outs[..., hidden:]
    out_b = out_b[:, ::-1]
    return final, jnp.concatenate([out_f, out_b], axis=-1)


def bilstm_final_pallas(xproj_f, xproj_b_rev, w_hh_f, w_hh_b, *, block_r: int = 128, interpret: bool = False):
    """Back-compat wrapper: full-length final states only."""
    return bilstm_pallas(
        xproj_f, xproj_b_rev, w_hh_f, w_hh_b, None,
        with_outputs=False, block_r=block_r, interpret=interpret,
    )
