"""Trainable fused BiLSTM recurrence: Pallas forward + Pallas backward.

Extends the inference kernel (dualvgr_tpu/ops/lstm_pallas.py) to the
training path for the appearance encoder's full-length, final-state-only
BiLSTM — the hottest recurrence in the backward pass. Exposed as a
``jax.custom_vjp`` so ``jax.grad`` through the model uses both kernels:

* forward: same grid-carried recurrence, additionally writing the PRE-step
  states (h_{t-1}, c_{t-1}) per step as residuals (the backward recomputes
  gate activations from them + the streamed xproj, instead of saving the
  4H-wide gate tensor),
* backward: reverse-time grid; carries (dh, dc) per direction in VMEM
  scratch, recomputes gates, emits per-step dxproj blocks, and accumulates
  dW_hh per row-block (summed across blocks in XLA).

Gradient correctness is verified against ``jax.grad`` of the XLA scan in
interpret mode (tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = False  # flipped by tests to run on CPU


def _sig(x):
    return jax.nn.sigmoid(x)


def _fwd_kernel(
    xf_ref, xb_ref, whf_ref, whb_ref,
    final_ref, hprev_ref, cprev_ref,
    hf, cf, hb, cb,
    *, t_total, hidden,
):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        hf[:] = jnp.zeros_like(hf)
        cf[:] = jnp.zeros_like(cf)
        hb[:] = jnp.zeros_like(hb)
        cb[:] = jnp.zeros_like(cb)

    # save PRE-step states as residuals: [fwd | bwd] packed on the last axis
    hprev_ref[0, :, :hidden] = hf[:]
    hprev_ref[0, :, hidden:] = hb[:]
    cprev_ref[0, :, :hidden] = cf[:]
    cprev_ref[0, :, hidden:] = cb[:]

    for x_ref, w_ref, h_s, c_s in ((xf_ref, whf_ref, hf, cf), (xb_ref, whb_ref, hb, cb)):
        gates = x_ref[0].astype(jnp.float32) + jnp.dot(
            h_s[:], w_ref[:], preferred_element_type=jnp.float32
        )
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = _sig(f) * c_s[:] + _sig(i) * jnp.tanh(g)
        h = _sig(o) * jnp.tanh(c)
        h_s[:] = h
        c_s[:] = c

    @pl.when(t == t_total - 1)
    def _():
        final_ref[:, :hidden] = hf[:]
        final_ref[:, hidden:] = hb[:]


def _bwd_kernel(
    xf_ref, xb_ref, whf_ref, whb_ref,
    hprev_ref, cprev_ref, dfinal_ref,
    dxf_ref, dxb_ref, dwf_ref, dwb_ref,
    dhf, dcf, dhb, dcb,
    *, t_total, hidden,
):
    # grid t runs 0..T-1 but all t-indexed specs map to forward time T-1-t
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        dhf[:] = dfinal_ref[:, :hidden]
        dhb[:] = dfinal_ref[:, hidden:]
        dcf[:] = jnp.zeros_like(dcf)
        dcb[:] = jnp.zeros_like(dcb)
        # dW accumulates directly in the (block-resident) output refs
        dwf_ref[0] = jnp.zeros_like(dwf_ref[0])
        dwb_ref[0] = jnp.zeros_like(dwb_ref[0])

    for k, (x_ref, w_ref, dh_s, dc_s, dx_ref, dw_acc) in enumerate(
        (
            (xf_ref, whf_ref, dhf, dcf, dxf_ref, dwf_ref),
            (xb_ref, whb_ref, dhb, dcb, dxb_ref, dwb_ref),
        )
    ):
        off = k * hidden
        h_prev = hprev_ref[0, :, off : off + hidden]
        c_prev = cprev_ref[0, :, off : off + hidden]
        gates = x_ref[0].astype(jnp.float32) + jnp.dot(
            h_prev, w_ref[:], preferred_element_type=jnp.float32
        )
        gi, gf, gg, go = jnp.split(gates, 4, axis=-1)
        i, f, g, o = _sig(gi), _sig(gf), jnp.tanh(gg), _sig(go)
        c = f * c_prev + i * g
        tc = jnp.tanh(c)

        dh = dh_s[:]
        dc = dc_s[:] + dh * o * (1.0 - tc * tc)
        do = dh * tc
        di = dc * g
        df = dc * c_prev
        dg = dc * i
        dc_prev = dc * f

        dgates = jnp.concatenate(
            [
                di * i * (1.0 - i),
                df * f * (1.0 - f),
                dg * (1.0 - g * g),
                do * o * (1.0 - o),
            ],
            axis=-1,
        )  # (rows, 4H)
        dx_ref[0] = dgates.astype(dx_ref.dtype)
        # dh_{t-1} = dgates @ W_hh^T
        dh_s[:] = jax.lax.dot_general(
            dgates, w_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dc_s[:] = dc_prev
        # dW_hh += h_{t-1}^T @ dgates
        dw_acc[0] = dw_acc[0] + jax.lax.dot_general(
            h_prev, dgates,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _run_fwd(xf, xb, wf, wb, block_r):
    t_total, rp, g = xf.shape
    hidden = g // 4
    kernel = functools.partial(_fwd_kernel, t_total=t_total, hidden=hidden)
    x_spec = pl.BlockSpec((1, block_r, g), lambda rb, t: (t, rb, 0), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((hidden, g), lambda rb, t: (0, 0), memory_space=pltpu.VMEM)
    res_spec = pl.BlockSpec((1, block_r, 2 * hidden), lambda rb, t: (t, rb, 0), memory_space=pltpu.VMEM)
    final_spec = pl.BlockSpec((block_r, 2 * hidden), lambda rb, t: (rb, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((rp, 2 * hidden), jnp.float32),
            jax.ShapeDtypeStruct((t_total, rp, 2 * hidden), jnp.float32),
            jax.ShapeDtypeStruct((t_total, rp, 2 * hidden), jnp.float32),
        ],
        grid=(rp // block_r, t_total),
        in_specs=[x_spec, x_spec, w_spec, w_spec],
        out_specs=[final_spec, res_spec, res_spec],
        scratch_shapes=[pltpu.VMEM((block_r, hidden), jnp.float32)] * 4,
        interpret=INTERPRET,
    )(xf, xb, wf, wb)


def _run_bwd(xf, xb, wf, wb, hprev, cprev, dfinal, block_r):
    t_total, rp, g = xf.shape
    hidden = g // 4
    n_rb = rp // block_r
    kernel = functools.partial(_bwd_kernel, t_total=t_total, hidden=hidden)
    # reversed-time index maps for t-indexed arrays
    rev = lambda rb, t: (t_total - 1 - t, rb, 0)
    x_spec_r = pl.BlockSpec((1, block_r, g), rev, memory_space=pltpu.VMEM)
    res_spec_r = pl.BlockSpec((1, block_r, 2 * hidden), rev, memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((hidden, g), lambda rb, t: (0, 0), memory_space=pltpu.VMEM)
    final_spec = pl.BlockSpec((block_r, 2 * hidden), lambda rb, t: (rb, 0), memory_space=pltpu.VMEM)
    dw_spec = pl.BlockSpec((1, hidden, g), lambda rb, t: (rb, 0, 0), memory_space=pltpu.VMEM)
    dxf, dxb, dwf, dwb = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((t_total, rp, g), jnp.float32),
            jax.ShapeDtypeStruct((t_total, rp, g), jnp.float32),
            jax.ShapeDtypeStruct((n_rb, hidden, g), jnp.float32),
            jax.ShapeDtypeStruct((n_rb, hidden, g), jnp.float32),
        ],
        grid=(n_rb, t_total),
        in_specs=[x_spec_r, x_spec_r, w_spec, w_spec, res_spec_r, res_spec_r, final_spec],
        out_specs=[x_spec_r, x_spec_r, dw_spec, dw_spec],
        scratch_shapes=[pltpu.VMEM((block_r, hidden), jnp.float32)] * 4,
        interpret=INTERPRET,
    )(xf, xb, wf, wb, hprev, cprev, dfinal)
    return dxf, dxb, dwf.sum(0), dwb.sum(0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def bilstm_final_trainable(xf, xb, wf, wb, block_r: int = 64):
    """Differentiable fused BiLSTM final states (full-length sequences).

    xf/xb: (T, R, 4H) input projections (xb TIME-REVERSED); wf/wb: (H, 4H).
    Returns (R, 2H). R must be a multiple of block_r (callers pad).
    """
    final, _, _ = _run_fwd(xf, xb, wf, wb, min(block_r, xf.shape[1]))
    return final


def _vjp_fwd(xf, xb, wf, wb, block_r):
    final, hprev, cprev = _run_fwd(xf, xb, wf, wb, min(block_r, xf.shape[1]))
    return final, (xf, xb, wf, wb, hprev, cprev)


def _vjp_bwd(block_r, res, dfinal):
    xf, xb, wf, wb, hprev, cprev = res
    dxf, dxb, dwf, dwb = _run_bwd(
        xf, xb, wf, wb, hprev, cprev, dfinal, min(block_r, xf.shape[1])
    )
    return dxf, dxb, dwf, dwb


bilstm_final_trainable.defvjp(_vjp_fwd, _vjp_bwd)


def bilstm_final_trainable_padded(xf, xb, wf, wb, block_r: int = 64):
    """Row-padding wrapper (differentiable through pad/slice)."""
    r = xf.shape[1]
    block_r = min(block_r, r)
    pad = (-r) % block_r
    if pad:
        padding = ((0, 0), (0, pad), (0, 0))
        xf = jnp.pad(xf, padding)
        xb = jnp.pad(xb, padding)
    return bilstm_final_trainable(xf, xb, wf, wb, block_r)[:r]
