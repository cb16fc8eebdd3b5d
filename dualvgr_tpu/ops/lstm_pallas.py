"""Fused bidirectional LSTM recurrence as a Pallas TPU kernel (final state).

The appearance encoder runs a BiLSTM over 16 frames of batch*clips clip
sequences and keeps ONLY the final states (reference model/Preprocessing.py:
209-234). The input projection (the FLOPs-heavy (B*C*F, 2048) @ (2048, 4H)
matmul) stays in XLA where it runs at MXU peak; this kernel fuses everything
XLA schedules poorly — 16 sequential small recurrent matmuls per direction
plus the gate transcendentals — into one invocation:

* grid = (row_blocks, T); the T axis iterates fastest, so Pallas
  double-buffers the per-step xproj blocks from HBM while the VPU/MXU chew
  on the current step,
* h/c states for both directions live in VMEM scratch across grid steps,
* both directions advance in the same grid step (the backward direction's
  xproj is passed time-reversed, making both scans forward-in-time),
* the (rows, 2H) final-state block is written once at t == T-1.

Inference-path kernel: training uses the XLA scan (autodiff). Equivalence is
tested in interpret mode (tests/test_pallas.py) and on hardware.
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


def _kernel(xf_ref, xb_ref, whf_ref, whb_ref, out_ref, hf, cf, hb, cb, *, t_total, hidden):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        hf[:] = jnp.zeros_like(hf)
        cf[:] = jnp.zeros_like(cf)
        hb[:] = jnp.zeros_like(hb)
        cb[:] = jnp.zeros_like(cb)

    gates_f = xf_ref[0] + jnp.dot(
        hf[:], whf_ref[:], preferred_element_type=jnp.float32
    )
    h_new, c_new = _lstm_step(gates_f, hf[:], cf[:])
    hf[:] = h_new
    cf[:] = c_new

    gates_b = xb_ref[0] + jnp.dot(
        hb[:], whb_ref[:], preferred_element_type=jnp.float32
    )
    h_new, c_new = _lstm_step(gates_b, hb[:], cb[:])
    hb[:] = h_new
    cb[:] = c_new

    @pl.when(t == t_total - 1)
    def _():
        out_ref[:, :hidden] = hf[:]
        out_ref[:, hidden:] = hb[:]


@functools.partial(jax.jit, static_argnames=("block_r", "interpret"))
def bilstm_final_pallas(
    xproj_f, xproj_b_rev, w_hh_f, w_hh_b, *, block_r: int = 256, interpret: bool = False
):
    """Final BiLSTM states for full-length sequences.

    xproj_f:     (T, R, 4H) forward input projections (incl. bias).
    xproj_b_rev: (T, R, 4H) backward projections, TIME-REVERSED (step 0 is
                 the last frame), so the kernel scans both directions forward.
    w_hh_*:      (H, 4H) recurrent weights.
    Returns (R, 2H) = [h_fwd(T-1), h_bwd(0)] like torch's bidirectional cat.
    """
    t_total, r, g = xproj_f.shape
    hidden = g // 4

    block_r = min(block_r, r)
    pad = (-r) % block_r
    if pad:
        padding = ((0, 0), (0, pad), (0, 0))
        xproj_f = jnp.pad(xproj_f, padding)
        xproj_b_rev = jnp.pad(xproj_b_rev, padding)
    rp = xproj_f.shape[1]

    kernel = functools.partial(_kernel, t_total=t_total, hidden=hidden)
    x_spec = pl.BlockSpec((1, block_r, g), lambda rb, t: (t, rb, 0), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((hidden, g), lambda rb, t: (0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((block_r, 2 * hidden), lambda rb, t: (rb, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rp, 2 * hidden), xproj_f.dtype),
        grid=(rp // block_r, t_total),
        in_specs=[x_spec, x_spec, w_spec, w_spec],
        out_specs=out_spec,
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
    )(xproj_f, xproj_b_rev, w_hh_f, w_hh_b)
    return out[:r]
