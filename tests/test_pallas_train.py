"""Trainable fused BiLSTM kernel: forward + gradient parity vs the XLA scan
(interpret mode), standalone and through the full model's train step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import dualvgr_tpu.ops.lstm_pallas_train as lpt
from dualvgr_tpu.ops.lstm import LSTMParams, bilstm, init_lstm_params

pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def _interpret():
    lpt.INTERPRET = True
    yield
    lpt.INTERPRET = False


def _proj(x, p, reverse=False):
    r, t, d = x.shape
    h4 = p.w_hh.shape[1]
    xp = (x.reshape(r * t, d) @ p.w_ih + p.b).reshape(r, t, h4).transpose(1, 0, 2)
    return xp[::-1] if reverse else xp


def test_forward_matches_scan(rng):
    R, T, D, H = 8, 5, 6, 4
    x = jnp.asarray(rng.randn(R, T, D).astype(np.float32))
    fwd = init_lstm_params(jax.random.PRNGKey(0), D, H)
    bwd = init_lstm_params(jax.random.PRNGKey(1), D, H)
    got = lpt.bilstm_final_trainable_padded(
        _proj(x, fwd), _proj(x, bwd, reverse=True), fwd.w_hh, bwd.w_hh, block_r=4
    )
    _, want = bilstm(fwd, bwd, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_gradients_match_scan(rng):
    """d(loss)/d(xproj, w_hh) from the kernel VJP == jax.grad of the scan,
    including a ragged row count exercising the pad/slice wrapper."""
    R, T, D, H = 10, 5, 6, 4  # R=10 with block 4 -> padded to 12
    x = jnp.asarray(rng.randn(R, T, D).astype(np.float32))
    fwd = init_lstm_params(jax.random.PRNGKey(2), D, H)
    bwd = init_lstm_params(jax.random.PRNGKey(3), D, H)
    xf = _proj(x, fwd)
    xb = _proj(x, bwd, reverse=True)
    tgt = jnp.asarray(rng.randn(R, 2 * H).astype(np.float32))

    def loss_kernel(xf, xb, wf, wb):
        f = lpt.bilstm_final_trainable_padded(xf, xb, wf, wb, block_r=4)
        return ((f - tgt) ** 2).sum()

    def loss_scan(xf, xb, wf, wb):
        from dualvgr_tpu.ops.lstm import _scan_direction

        mask = jnp.ones((T, R, 1), jnp.float32)
        pf = LSTMParams(fwd.w_ih, wf, fwd.b_ih, fwd.b_hh)
        pb = LSTMParams(bwd.w_ih, wb, bwd.b_ih, bwd.b_hh)
        _, hf = _scan_direction(pf, xf, mask, False)
        _, hb = _scan_direction(pb, xb, mask, False)
        return ((jnp.concatenate([hf, hb], -1) - tgt) ** 2).sum()

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(xf, xb, fwd.w_hh, bwd.w_hh)
    gs = jax.grad(loss_scan, argnums=(0, 1, 2, 3))(xf, xb, fwd.w_hh, bwd.w_hh)
    for a, b in zip(gk, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_train_step_grads_match_xla_path(rng):
    """Full-model train step: the use_pallas training path (kernel-VJP
    appearance LSTM) produces the same loss and parameter update as XLA."""
    from dualvgr_tpu.models import DualVGR
    from dualvgr_tpu import train_lib

    dims = dict(
        vision_dim=12, module_dim=16, word_dim=8, question_vocab_size=20,
        num_answers=7, num_of_nodes=3, graph_layers=1, unit_layers=1,
    )
    b, c, f, t = 4, 3, 4, 5
    app = rng.randn(b, c, f, 12).astype(np.float32)
    mot = rng.randn(b, c, 12).astype(np.float32)
    q = rng.randint(1, 20, (b, t)).astype(np.int32)
    # ragged lengths: exercises the masked trainable kernel pair that the
    # question encoders route through on the use_pallas training path
    qlen = np.array([5, 3, 1, 4], np.int32)
    for i in range(b):
        q[i, qlen[i]:] = 0
    ans = rng.randint(0, 7, (b,)).astype(np.int32)

    from dualvgr_tpu.ops.losses import dualvgr_total_loss

    opt = train_lib.make_optimizer(1e-3, 10)
    model_x = DualVGR(use_pallas=False, **dims)
    model_p = DualVGR(use_pallas=True, **dims)
    state = train_lib.create_train_state(
        model_x, jax.random.PRNGKey(5), (app, mot, q, qlen), opt
    )

    def loss_fn(params, model):
        out = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            app, mot, q, qlen, train=True,
            rngs={"dropout": jax.random.PRNGKey(9)},
            mutable=["batch_stats"],
        )[0]
        total, _ = dualvgr_total_loss(
            out.logits, ans, out.aq_fusion, out.com_app, out.mq_fusion,
            out.com_motion, alpha=1.0, beta=1e-8, num_of_nodes=3,
        )
        return total

    lx, gx = jax.value_and_grad(lambda p: loss_fn(p, model_x))(state.params)
    lp, gp = jax.value_and_grad(lambda p: loss_fn(p, model_p))(state.params)
    np.testing.assert_allclose(float(lx), float(lp), rtol=1e-5)
    # gradients agree directly (comparing post-Adam params is ill-conditioned:
    # Adam amplifies fp32 noise in near-zero gradients to O(lr)). Per-leaf
    # tolerance map: the tight 5e-5 default (measured headroom: ~2.6e-5 on
    # the BN-downstream classifier bias) catches regressions in the
    # composition code between the kernels and the loss; only the
    # known-amplified QueryAttn leaves get 5e-4 — the kernels' fp32
    # accumulation order differs from the scan's (~1e-7 on the dynamic
    # question embedding) and QueryAttn's l2-normalize + masked softmax
    # amplifies that reorder noise ~1000x into its feat_enhance grads.
    # Exact step-level grad parity for the kernels themselves is pinned by
    # the standalone test_masked_outputs_gradients_match_scan.
    flat_x = jax.tree_util.tree_flatten_with_path(gx)[0]
    flat_p = jax.tree_util.tree_leaves(gp)
    assert len(flat_x) == len(flat_p)
    for (path, a), b_ in zip(flat_x, flat_p):
        a, b_ = np.asarray(a), np.asarray(b_)
        name = jax.tree_util.keystr(path)
        atol = 5e-4 if "query_attn" in name else 5e-5
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(
            a / scale, b_ / scale, atol=atol, err_msg=f"leaf {name}"
        )


def test_masked_outputs_forward_matches_scan(rng):
    """bilstm_trainable (masked + per-step outputs) == the XLA masked scan,
    ragged lengths including len=1 and full length."""
    R, T, D, H = 6, 5, 6, 4
    x = jnp.asarray(rng.randn(R, T, D).astype(np.float32))
    lens = jnp.asarray([5, 3, 1, 4, 2, 5])
    fwd = init_lstm_params(jax.random.PRNGKey(0), D, H)
    bwd = init_lstm_params(jax.random.PRNGKey(1), D, H)
    final, outs = lpt.bilstm_trainable(
        _proj(x, fwd), _proj(x, bwd, reverse=True), fwd.w_hh, bwd.w_hh, lens,
        block_r=4,  # R=6 -> padded to 8, exercises the pad/slice wrapper
    )
    want_outs, want_final = bilstm(fwd, bwd, x, lens)
    np.testing.assert_allclose(np.asarray(final), np.asarray(want_final), atol=1e-5)
    np.testing.assert_allclose(np.asarray(outs), np.asarray(want_outs), atol=1e-5)


def test_masked_outputs_gradients_match_scan(rng):
    """Kernel-VJP grads w.r.t. (xf, xb, w_hh_f, w_hh_b) == jax.grad of the
    masked scan, through a loss that consumes BOTH outputs and final."""
    R, T, D, H = 6, 5, 6, 4
    x = jnp.asarray(rng.randn(R, T, D).astype(np.float32))
    lens = jnp.asarray([5, 3, 1, 4, 2, 5])
    fwd = init_lstm_params(jax.random.PRNGKey(2), D, H)
    bwd = init_lstm_params(jax.random.PRNGKey(3), D, H)
    xf = _proj(x, fwd)
    xb = _proj(x, bwd, reverse=True)
    tgt_f = jnp.asarray(rng.randn(R, 2 * H).astype(np.float32))
    tgt_o = jnp.asarray(rng.randn(R, T, 2 * H).astype(np.float32))

    def loss_kernel(xf, xb, wf, wb):
        f, o = lpt.bilstm_trainable(xf, xb, wf, wb, lens, block_r=4)
        return ((f - tgt_f) ** 2).sum() + ((o - tgt_o) ** 2).sum()

    def loss_scan(xf, xb, wf, wb):
        from dualvgr_tpu.ops.lstm import _scan_direction

        steps = jnp.arange(T, dtype=jnp.int32)[:, None]
        mask = (steps < lens[None, :]).astype(jnp.float32)[..., None]
        pf = LSTMParams(fwd.w_ih, wf, fwd.b_ih, fwd.b_hh)
        pb = LSTMParams(bwd.w_ih, wb, bwd.b_ih, bwd.b_hh)
        of, hf = _scan_direction(pf, xf, mask, False)
        # backward direction consumes the REVERSED stream + reversed mask
        ob, hb = _scan_direction(pb, xb, mask[::-1], False)
        o = jnp.concatenate([of.transpose(1, 0, 2), ob[::-1].transpose(1, 0, 2)], -1)
        f = jnp.concatenate([hf, hb], -1)
        return ((f - tgt_f) ** 2).sum() + ((o - tgt_o) ** 2).sum()

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(xf, xb, fwd.w_hh, bwd.w_hh)
    gs = jax.grad(loss_scan, argnums=(0, 1, 2, 3))(xf, xb, fwd.w_hh, bwd.w_hh)
    for a, b in zip(gk, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_masked_outputs_unmasked_variant(rng):
    """lengths=None (full-length) path of bilstm_trainable, value + grad."""
    R, T, D, H = 4, 3, 5, 4
    x = jnp.asarray(rng.randn(R, T, D).astype(np.float32))
    fwd = init_lstm_params(jax.random.PRNGKey(4), D, H)
    bwd = init_lstm_params(jax.random.PRNGKey(5), D, H)
    xf = _proj(x, fwd)
    xb = _proj(x, bwd, reverse=True)
    final, outs = lpt.bilstm_trainable(xf, xb, fwd.w_hh, bwd.w_hh, None, block_r=4)
    want_outs, want_final = bilstm(fwd, bwd, x)
    np.testing.assert_allclose(np.asarray(final), np.asarray(want_final), atol=1e-5)
    np.testing.assert_allclose(np.asarray(outs), np.asarray(want_outs), atol=1e-5)

    g = jax.grad(
        lambda wf: lpt.bilstm_trainable(xf, xb, wf, bwd.w_hh, None, block_r=4)[0].sum()
    )(fwd.w_hh)
    assert float(jnp.abs(g).sum()) > 0


def test_appearance_whole_layer_op_matches_scan(rng):
    """appearance_bilstm_train (projection + recurrence in one custom_vjp):
    forward == XLA bilstm, grads for every weight/bias == jax.grad of the
    scan path, and NO gradient leaks to x (stop_gradient by design)."""
    R, T, D, H = 6, 5, 8, 4
    x = jnp.asarray(rng.randn(R, T, D).astype(np.float32))
    fwd = init_lstm_params(jax.random.PRNGKey(6), D, H)
    bwd = init_lstm_params(jax.random.PRNGKey(7), D, H)
    tgt = jnp.asarray(rng.randn(R, 2 * H).astype(np.float32))

    got = lpt.appearance_bilstm_train(
        x, fwd.w_ih, fwd.b, fwd.w_hh, bwd.w_ih, bwd.b, bwd.w_hh, block_r=4
    )
    _, want = bilstm(fwd, bwd, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def loss_op(args):
        wif, bf, whf, wib, bb, whb = args
        f = lpt.appearance_bilstm_train(
            x, wif, bf, whf, wib, bb, whb, block_r=4
        )
        return ((f - tgt) ** 2).sum()

    def loss_scan(args):
        wif, bf, whf, wib, bb, whb = args
        pf = LSTMParams(wif, whf, bf, jnp.zeros_like(bf))
        pb = LSTMParams(wib, whb, bb, jnp.zeros_like(bb))
        _, f = bilstm(pf, pb, x)
        return ((f - tgt) ** 2).sum()

    args = (fwd.w_ih, fwd.b, fwd.w_hh, bwd.w_ih, bwd.b, bwd.w_hh)
    go = jax.grad(loss_op)(args)
    gs = jax.grad(loss_scan)(args)
    for a, b in zip(go, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    # x receives no gradient (and asking for one is well-defined: zero)
    gx = jax.grad(lambda xx: lpt.appearance_bilstm_train(
        xx, *args, block_r=4).sum())(x)
    assert float(jnp.abs(gx).sum()) == 0.0


def test_appearance_whole_layer_op_bf16_stream(rng):
    """bf16 stream variant stays close to fp32 (operand rounding only)."""
    R, T, D, H = 4, 3, 8, 4
    x = jnp.asarray(rng.randn(R, T, D).astype(np.float32))
    fwd = init_lstm_params(jax.random.PRNGKey(8), D, H)
    bwd = init_lstm_params(jax.random.PRNGKey(9), D, H)
    args = (fwd.w_ih, fwd.b, fwd.w_hh, bwd.w_ih, bwd.b, bwd.w_hh)
    f32 = lpt.appearance_bilstm_train(x, *args, block_r=4)
    f16 = lpt.appearance_bilstm_train(x, *args, block_r=4, stream_dtype="bfloat16")
    np.testing.assert_allclose(np.asarray(f16), np.asarray(f32), atol=3e-2)
    g = jax.grad(lambda w: lpt.appearance_bilstm_train(
        x, w, *args[1:], block_r=4, stream_dtype="bfloat16").sum())(fwd.w_ih)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0
