"""Trainable fused BiLSTM recurrence: Pallas forward + Pallas backward.

Extends the inference kernel (dualvgr_tpu/ops/lstm_pallas.py) to the
training path for ALL THREE of the model's BiLSTMs (appearance encoder:
full-length final-state-only; question encoders: variable-length masked,
one with per-step outputs). One generalized kernel pair, exposed as a
``jax.custom_vjp`` so ``jax.grad`` through the model uses both kernels:

* forward: grid-carried recurrence, additionally writing the PRE-step
  states (h_{t-1}, c_{t-1}) per step as residuals (the backward recomputes
  gate activations from them + the streamed xproj, instead of saving the
  4H-wide gate tensor),
* backward: reverse-time grid; carries (dh, dc) per direction in VMEM
  scratch, recomputes gates, and emits per-step dxproj (= dgates) blocks.
  dW_hh is NOT accumulated in-kernel — the two (H, 4H) VMEM accumulators
  would cap the row-block size at 64 (16 MB scoped-VMEM budget), making the
  grid latency-bound; instead the wrapper computes dW_hh = sum_t h_prev^T
  dgates as one MXU-shaped XLA matmul over the residuals + the dgates
  output, which lets the kernels run 128-row blocks.

Gradient correctness is verified against ``jax.grad`` of the XLA scan in
interpret mode (tests/test_pallas_train.py) and on hardware via bench.py's
train-grad gate.
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


# ---------------------------------------------------------------------------
# Generalized trainable kernel: variable-length masking + per-step outputs,
# both optional (static flags — unused refs become 1-block dummies and the
# corresponding kernel code is not emitted).
#
# Covers all three BiLSTMs on the TRAINING path: the appearance encoder
# (masked=False, emit_outputs=False), the question sentence encoder
# (masked=True, final only) and the question dynamic encoder (masked=True,
# emit_outputs=True). Packed-sequence semantics match
# dualvgr_tpu/ops/lstm.py exactly: the forward direction
# carries state through padded steps (final == state at len-1), the backward
# direction (fed a TIME-REVERSED stream) stays at zero init until kernel
# time t >= T - len, and per-step outputs are zero at padding. The masked
# step's backward follows from h_t = m*h~ + (1-m)*h_prev:
#     dh~ = m*(dh_carry + m*dout),  dh_prev += (1-m)*(dh_carry + m*dout)
# and analogously for c; at masked steps dgates vanishes, so dxproj is zero
# there — identical to jax.grad of the masked scan.
# ---------------------------------------------------------------------------


def _fwd_kernel_m(
    xf_ref, xb_ref, len_ref, whf_ref, whb_ref,
    final_ref, outs_ref, hprev_ref, cprev_ref,
    hf, cf, hb, cb,
    *, t_total, hidden, masked, emit_outputs,
):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        hf[:] = jnp.zeros_like(hf)
        cf[:] = jnp.zeros_like(cf)
        hb[:] = jnp.zeros_like(hb)
        cb[:] = jnp.zeros_like(cb)

    # PRE-step states as residuals: [fwd | bwd] packed on the last axis
    hprev_ref[0, :, :hidden] = hf[:]
    hprev_ref[0, :, hidden:] = hb[:]
    cprev_ref[0, :, :hidden] = cf[:]
    cprev_ref[0, :, hidden:] = cb[:]

    if masked:
        lens = len_ref[:]  # (rows, 1) float
        m_f = (t < lens).astype(jnp.float32)
        m_b = (t >= t_total - lens).astype(jnp.float32)
    else:
        m_f = m_b = None

    for k, (x_ref, w_ref, h_s, c_s, m) in enumerate(
        ((xf_ref, whf_ref, hf, cf, m_f), (xb_ref, whb_ref, hb, cb, m_b))
    ):
        gates = x_ref[0].astype(jnp.float32) + jnp.dot(
            h_s[:], w_ref[:], preferred_element_type=jnp.float32
        )
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = _sig(f) * c_s[:] + _sig(i) * jnp.tanh(g)
        h = _sig(o) * jnp.tanh(c)
        if masked:
            h = m * h + (1.0 - m) * h_s[:]
            c = m * c + (1.0 - m) * c_s[:]
        h_s[:] = h
        c_s[:] = c
        if emit_outputs:
            off = k * hidden
            out = h * m if masked else h
            outs_ref[0, :, off : off + hidden] = out

    @pl.when(t == t_total - 1)
    def _():
        final_ref[:, :hidden] = hf[:]
        final_ref[:, hidden:] = hb[:]


def _bwd_kernel_m(
    xf_ref, xb_ref, len_ref, whf_ref, whb_ref,
    hprev_ref, cprev_ref, dfinal_ref, douts_ref,
    dxf_ref, dxb_ref,
    dhf, dcf, dhb, dcb,
    *, t_total, hidden, masked, emit_outputs,
):
    # grid t runs 0..T-1; all t-indexed specs map to forward time T-1-t.
    # Unlike the final-only pair, dW_hh is NOT accumulated here: the two
    # (H, 4H) accumulators would put the backward kernel over the 16 MB
    # scoped-VMEM budget at useful block sizes; the wrapper instead computes
    # dW_hh = sum_t h_prev^T dgates as ONE big XLA matmul from the hprev
    # residuals and the dgates (dx) output this kernel already materializes.
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        dhf[:] = dfinal_ref[:, :hidden]
        dhb[:] = dfinal_ref[:, hidden:]
        dcf[:] = jnp.zeros_like(dcf)
        dcb[:] = jnp.zeros_like(dcb)

    if masked:
        tf = t_total - 1 - t  # forward-time index of this grid step
        lens = len_ref[:]
        m_f = (tf < lens).astype(jnp.float32)
        m_b = (tf >= t_total - lens).astype(jnp.float32)
    else:
        m_f = m_b = None

    for k, (x_ref, w_ref, dh_s, dc_s, dx_ref, m) in enumerate(
        (
            (xf_ref, whf_ref, dhf, dcf, dxf_ref, m_f),
            (xb_ref, whb_ref, dhb, dcb, dxb_ref, m_b),
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

        if emit_outputs:
            dout = douts_ref[0, :, off : off + hidden].astype(jnp.float32)
        else:
            dout = jnp.zeros_like(dh_s[:])
        if masked:
            dh_tot = dh_s[:] + m * dout  # out_t = m * h~_t
            dh = m * dh_tot
            dh_prev_direct = (1.0 - m) * dh_tot
            dc_in = m * dc_s[:]
            dc_prev_direct = (1.0 - m) * dc_s[:]
        else:
            dh = dh_s[:] + dout
            dh_prev_direct = jnp.zeros_like(dh)
            dc_in = dc_s[:]
            dc_prev_direct = jnp.zeros_like(dh)

        dc = dc_in + dh * o * (1.0 - tc * tc)

        # per-gate chunks written straight into the output ref (no (rows, 4H)
        # concat temp) and contracted chunk-by-chunk against W_hh's matching
        # row-block: same FLOPs as dgates @ W_hh^T, smaller live tensors
        dh_prev = dh_prev_direct
        for j, dgate in enumerate(
            (
                dc * g * i * (1.0 - i),
                dc * c_prev * f * (1.0 - f),
                dc * i * (1.0 - g * g),
                dh * tc * o * (1.0 - o),
            )
        ):
            dx_ref[0, :, j * hidden : (j + 1) * hidden] = dgate.astype(dx_ref.dtype)
            dh_prev = dh_prev + jax.lax.dot_general(
                dgate, w_ref[:, j * hidden : (j + 1) * hidden],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        dh_s[:] = dh_prev
        dc_s[:] = dc_prev_direct + dc * f


def _run_fwd_m(xf, xb, wf, wb, lens, block_r, masked, emit_outputs):
    t_total, rp, g = xf.shape
    hidden = g // 4
    kernel = functools.partial(
        _fwd_kernel_m, t_total=t_total, hidden=hidden, masked=masked,
        emit_outputs=emit_outputs,
    )
    x_spec = pl.BlockSpec((1, block_r, g), lambda rb, t: (t, rb, 0), memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec((block_r, 1), lambda rb, t: (rb, 0), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((hidden, g), lambda rb, t: (0, 0), memory_space=pltpu.VMEM)
    res_spec = pl.BlockSpec((1, block_r, 2 * hidden), lambda rb, t: (t, rb, 0), memory_space=pltpu.VMEM)
    final_spec = pl.BlockSpec((block_r, 2 * hidden), lambda rb, t: (rb, 0), memory_space=pltpu.VMEM)
    if emit_outputs:
        outs_shape = jax.ShapeDtypeStruct((t_total, rp, 2 * hidden), jnp.float32)
        outs_spec = res_spec
    else:
        # 1-block dummy so the kernel signature stays static
        outs_shape = jax.ShapeDtypeStruct((1, block_r, 2 * hidden), jnp.float32)
        outs_spec = pl.BlockSpec(
            (1, block_r, 2 * hidden), lambda rb, t: (0, 0, 0), memory_space=pltpu.VMEM
        )
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((rp, 2 * hidden), jnp.float32),
            outs_shape,
            jax.ShapeDtypeStruct((t_total, rp, 2 * hidden), jnp.float32),
            jax.ShapeDtypeStruct((t_total, rp, 2 * hidden), jnp.float32),
        ],
        grid=(rp // block_r, t_total),
        in_specs=[x_spec, x_spec, len_spec, w_spec, w_spec],
        out_specs=[final_spec, outs_spec, res_spec, res_spec],
        scratch_shapes=[pltpu.VMEM((block_r, hidden), jnp.float32)] * 4,
        interpret=INTERPRET,
    )(xf, xb, lens, wf, wb)


def _run_bwd_m(
    xf, xb, wf, wb, lens, hprev, cprev, dfinal, douts, block_r, masked,
    emit_outputs,
):
    t_total, rp, g = xf.shape
    hidden = g // 4
    n_rb = rp // block_r
    kernel = functools.partial(
        _bwd_kernel_m, t_total=t_total, hidden=hidden, masked=masked,
        emit_outputs=emit_outputs,
    )
    rev = lambda rb, t: (t_total - 1 - t, rb, 0)
    x_spec_r = pl.BlockSpec((1, block_r, g), rev, memory_space=pltpu.VMEM)
    res_spec_r = pl.BlockSpec((1, block_r, 2 * hidden), rev, memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec((block_r, 1), lambda rb, t: (rb, 0), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((hidden, g), lambda rb, t: (0, 0), memory_space=pltpu.VMEM)
    final_spec = pl.BlockSpec((block_r, 2 * hidden), lambda rb, t: (rb, 0), memory_space=pltpu.VMEM)
    douts_spec = res_spec_r if emit_outputs else pl.BlockSpec(
        (1, block_r, 2 * hidden), lambda rb, t: (0, 0, 0), memory_space=pltpu.VMEM
    )
    dxf, dxb = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((t_total, rp, g), jnp.float32),
            jax.ShapeDtypeStruct((t_total, rp, g), jnp.float32),
        ],
        grid=(n_rb, t_total),
        in_specs=[
            x_spec_r, x_spec_r, len_spec, w_spec, w_spec,
            res_spec_r, res_spec_r, final_spec, douts_spec,
        ],
        out_specs=[x_spec_r, x_spec_r],
        scratch_shapes=[pltpu.VMEM((block_r, hidden), jnp.float32)] * 4,
        interpret=INTERPRET,
    )(xf, xb, lens, wf, wb, hprev, cprev, dfinal, douts)
    # dW_hh = sum over (t, rows) of h_prev^T dgates — one MXU-shaped matmul
    # per direction over the residuals + the kernel's dgates output
    dwf = jnp.einsum("trh,trg->hg", hprev[..., :hidden], dxf)
    dwb = jnp.einsum("trh,trg->hg", hprev[..., hidden:], dxb)
    return dxf, dxb, dwf, dwb


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _bilstm_outs_core(
    xf, xb, wf, wb, lens, block_r: int, masked: bool, emit_outputs: bool
):
    final, outs, _, _ = _run_fwd_m(
        xf, xb, wf, wb, lens, block_r, masked, emit_outputs
    )
    return final, outs


def _outs_vjp_fwd(xf, xb, wf, wb, lens, block_r, masked, emit_outputs):
    final, outs, hprev, cprev = _run_fwd_m(
        xf, xb, wf, wb, lens, block_r, masked, emit_outputs
    )
    return (final, outs), (xf, xb, wf, wb, lens, hprev, cprev)


def _outs_vjp_bwd(block_r, masked, emit_outputs, res, cot):
    xf, xb, wf, wb, lens, hprev, cprev = res
    dfinal, douts = cot
    dxf, dxb, dwf, dwb = _run_bwd_m(
        xf, xb, wf, wb, lens, hprev, cprev, dfinal, douts, block_r, masked,
        emit_outputs,
    )
    return dxf, dxb, dwf, dwb, jnp.zeros_like(lens)


_bilstm_outs_core.defvjp(_outs_vjp_fwd, _outs_vjp_bwd)


def bilstm_trainable(
    xf, xb_rev, wf, wb, lengths=None, *, with_outputs: bool = True,
    block_r: int = 128,
):
    """Differentiable fused BiLSTM with optional masking + per-step outputs.

    xf/xb_rev: (T, R, 4H) input projections (+bias), xb_rev TIME-REVERSED;
    wf/wb: (H, 4H); lengths: optional (R,) valid lengths.

    Returns (final (R, 2H), outs) where outs is (R, T, 2H), zero-masked at
    padding with the backward half re-aligned to original time order (the
    flip/transpose live OUTSIDE the custom_vjp, so their cotangents are
    handled by ordinary XLA autodiff) — or None with ``with_outputs=False``
    (the appearance encoder's final-state-only mode, which skips the
    (T, R, 2H) HBM round-trip entirely).
    """
    t_total, r, g = xf.shape
    hidden = g // 4
    block_r = min(block_r, r)
    pad = (-r) % block_r
    if pad:
        padding = ((0, 0), (0, pad), (0, 0))
        xf = jnp.pad(xf, padding)
        xb_rev = jnp.pad(xb_rev, padding)
    rp = xf.shape[1]
    masked = lengths is not None
    if masked:
        lens = jnp.pad(lengths.astype(jnp.float32), (0, pad))[:, None]
    else:
        lens = jnp.zeros((rp, 1), jnp.float32)

    final, outs = _bilstm_outs_core(
        xf, xb_rev, wf, wb, lens, block_r, masked, with_outputs
    )
    final = final[:r]
    if not with_outputs:
        return final, None
    outs = outs[:, :r].transpose(1, 0, 2)  # (R, T, 2H), bwd half kernel-time
    out_f, out_b = outs[..., :hidden], outs[..., hidden:]
    return final, jnp.concatenate([out_f, out_b[:, ::-1]], axis=-1)


def bilstm_final_trainable_padded(xf, xb, wf, wb, block_r: int = 128):
    """Full-length, final-state-only differentiable BiLSTM (the appearance
    encoder's mode): the generalized kernel with masking and output
    emission both off."""
    final, _ = bilstm_trainable(
        xf, xb, wf, wb, None, with_outputs=False, block_r=block_r
    )
    return final


# ---------------------------------------------------------------------------
# Appearance-encoder whole-layer op: input projection + recurrence in ONE
# custom_vjp boundary. The appearance stream's input x = tanh(dropout(video
# features)) never requires a gradient (nothing trainable sits upstream), so
# the backward can skip the dx = dgates @ W_ih^T matmul — 825 GFLOPs at
# flagship shapes — outright; the wrapper stop_gradient()s x so the zero
# cotangent it returns is discarded by construction, never consumed.
# Owning the projection also lets the mixed-precision path (stream_dtype)
# run BOTH heavy matmuls (forward projection and dW_ih) with bf16 operands
# and fp32 accumulation, and stream the projected gates + dgates in bf16.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _app_core(x, wih_f, b_f, whh_f, wih_b, b_b, whh_b, block_r, sd):
    final, _ = _app_fwd(x, wih_f, b_f, whh_f, wih_b, b_b, whh_b, block_r, sd)
    return final


def _sd_einsum(spec, a, b, sd):
    """einsum with reduced-precision operands, fp32 accumulation. On CPU
    backends (no BF16xBF16->F32 dot) the rounded operands are upcast —
    numerically identical (bf16 products are exact in fp32)."""
    a, b = a.astype(sd), b.astype(sd)
    if jax.default_backend() == "tpu":
        return jnp.einsum(spec, a, b, preferred_element_type=jnp.float32)
    return jnp.einsum(spec, a.astype(jnp.float32), b.astype(jnp.float32))


def _proj(x, wih, b, sd):
    """(R, T, D) -> (T, R, 4H) in the kernel's stream dtype."""
    if sd is None:
        return jnp.einsum("rtd,dh->trh", x, wih) + b
    xp = _sd_einsum("rtd,dh->trh", x, wih, sd) + b
    # stream to the kernel in sd: same rounding the XLA path applies
    # (ops/lstm.py round-trips xproj through sd), half the HBM traffic
    return xp.astype(sd)


def _app_fwd(x, wih_f, b_f, whh_f, wih_b, b_b, whh_b, block_r, sd):
    r = x.shape[0]
    xf = _proj(x, wih_f, b_f, sd)
    xb = _proj(x, wih_b, b_b, sd)[::-1]
    block_r = min(block_r, r)
    pad = (-r) % block_r
    if pad:
        padding = ((0, 0), (0, pad), (0, 0))
        xf = jnp.pad(xf, padding)
        xb = jnp.pad(xb, padding)
    lens = jnp.zeros((xf.shape[1], 1), jnp.float32)
    final, _, hprev, cprev = _run_fwd_m(
        xf, xb, whh_f, whh_b, lens, block_r, False, False
    )
    return final[:r], (x, xf, xb, whh_f, whh_b, hprev, cprev, lens)


def _app_vjp_fwd(x, wih_f, b_f, whh_f, wih_b, b_b, whh_b, block_r, sd):
    final, res = _app_fwd(x, wih_f, b_f, whh_f, wih_b, b_b, whh_b, block_r, sd)
    return final, res


def _app_vjp_bwd(block_r, sd, res, dfinal):
    x, xf, xb, whh_f, whh_b, hprev, cprev, lens = res
    r = x.shape[0]
    rp = xf.shape[1]
    block_r = min(block_r, rp)
    if rp > r:
        dfinal = jnp.pad(dfinal, ((0, rp - r), (0, 0)))
    douts = jnp.zeros((1, block_r, dfinal.shape[1]), jnp.float32)
    dxf, dxb, dwhf, dwhb = _run_bwd_m(
        xf, xb, whh_f, whh_b, lens, hprev, cprev, dfinal, douts,
        block_r, False, False,
    )
    dxf, dxb = dxf[:, :r], dxb[:, :r]
    db_f = jnp.sum(dxf, axis=(0, 1))
    db_b = jnp.sum(dxb, axis=(0, 1))
    if sd is None:
        dwih_f = jnp.einsum("rtd,trh->dh", x, dxf)
        dwih_b = jnp.einsum("rtd,trh->dh", x, dxb[::-1])
    else:
        dwih_f = _sd_einsum("rtd,trh->dh", x, dxf, sd)
        dwih_b = _sd_einsum("rtd,trh->dh", x, dxb[::-1], sd)
    # dx is never consumed: the wrapper stop_gradient()s x (see note above)
    return jnp.zeros_like(x), dwih_f, db_f, dwhf, dwih_b, db_b, dwhb


_app_core.defvjp(_app_vjp_fwd, _app_vjp_bwd)


def appearance_bilstm_train(
    x, wih_f, b_f, whh_f, wih_b, b_b, whh_b, *, block_r: int = 128,
    stream_dtype=None,
):
    """Differentiable appearance-encoder BiLSTM layer: fused input
    projection + final-state recurrence, full-length sequences.

    CONTRACT — dL/dx IS DROPPED BY DESIGN (stop_gradient below): this op
    skips the never-needed dX matmul, which is only sound when nothing
    trainable sits upstream of ``x``. The one shipped caller satisfies
    that (AppearanceEncoder: x = dropout(tanh(raw video features)),
    dualvgr_tpu/models/encoders.py). Any caller with trainable upstream
    layers would get silently-zero input gradients — use
    ``bilstm_trainable`` (full VJP) there instead.

    x: (R, T, D) post-tanh/dropout features. wih_*: (D, 4H);
    b_*: (4H,) combined bias (pass ``params.b``; the b_ih+b_hh add outside
    this op routes the shared gradient to both torch-style bias vectors).
    Returns final (R, 2H).
    """
    return _app_core(
        jax.lax.stop_gradient(x), wih_f, b_f, whh_f, wih_b, b_b, whh_b,
        block_r, stream_dtype,
    )
