"""Fused Pallas DualVGR-cycle kernel: equivalence with the XLA composition.

Runs in interpret mode on CPU (the driver benches the compiled kernel on
real TPU hardware; see benchmarks/README.md).
"""

import pytest

import numpy as np

import jax
import jax.numpy as jnp

from dualvgr_tpu.models.graph import AttentionSFGCN, PunishGAT, dense_self_loop_adjacency
from dualvgr_tpu.ops.gat_pallas import fused_gat_cycle

pytestmark = pytest.mark.slow


def _setup(rng, B, N, D, H):
    hd = D // H
    h = jnp.asarray(rng.randn(B, N, D).astype(np.float32))
    scores = jnp.asarray(rng.rand(B, N, hd).astype(np.float32))
    adj = dense_self_loop_adjacency(N)
    gat_c = PunishGAT(H, hd, in_dim=D)
    gat_s = PunishGAT(H, hd, in_dim=D)
    sf = AttentionSFGCN(D, in_dim=D)
    vc = gat_c.init(jax.random.PRNGKey(0), h, adj, scores, train=False)
    vs = gat_s.init(jax.random.PRNGKey(1), h, adj, scores, train=False)
    vf = sf.init(jax.random.PRNGKey(2), jnp.stack([h, h], 1))
    return h, scores, adj, (gat_c, vc), (gat_s, vs), (sf, vf)


def _kernel_args(D, H, hd, vc, vs, vf):
    pc, ps, pf = vc["params"], vs["params"], vf["params"]

    def flat(p):
        return (
            jnp.asarray(np.asarray(p["w_kernel"]).reshape(D, H * hd)),
            jnp.asarray(np.asarray(p["w_bias"]).reshape(H * hd)),
        )

    wc, bc = flat(pc)
    ws, bs_ = flat(ps)
    return (
        wc, bc, jnp.asarray(pc["a"]), jnp.asarray(pc["a_bias"]),
        ws, bs_, jnp.asarray(ps["a"]), jnp.asarray(ps["a_bias"]),
        jnp.asarray(pf["proj_kernel"]), jnp.asarray(pf["proj_bias"]),
        jnp.asarray(pf["score_kernel"]),
    )


def test_fused_cycle_matches_xla_composition(rng):
    B, N, D, H = 12, 5, 32, 4
    hd = D // H
    h, scores, adj, (gat_c, vc), (gat_s, vs), (sf, vf) = _setup(rng, B, N, D, H)

    common = gat_c.apply(vc, h, adj, scores, train=False)
    spec = gat_s.apply(vs, h, adj, scores, train=False)
    fused, _ = sf.apply(vf, jnp.stack([common, spec], 1))
    want = h + fused

    got, got_common, got_spec = fused_gat_cycle(
        h, scores, *_kernel_args(D, H, hd, vc, vs, vf), block_b=4, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_common), np.asarray(common), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_spec), np.asarray(spec), atol=1e-5)


def test_fused_cycle_pads_ragged_batch(rng):
    """B not divisible by block_b is padded internally and trimmed."""
    B, N, D, H = 10, 4, 16, 4
    hd = D // H
    h, scores, adj, (gat_c, vc), (gat_s, vs), (sf, vf) = _setup(rng, B, N, D, H)
    got, got_common, got_spec = fused_gat_cycle(
        h, scores, *_kernel_args(D, H, hd, vc, vs, vf), block_b=4, interpret=True
    )
    assert got.shape == got_common.shape == got_spec.shape == (B, N, D)
    common = gat_c.apply(vc, h, adj, scores, train=False)
    spec = gat_s.apply(vs, h, adj, scores, train=False)
    fused, _ = sf.apply(vf, jnp.stack([common, spec], 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(h + fused), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_common), np.asarray(common), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_spec), np.asarray(spec), atol=1e-5)


def test_fused_bilstm_final_matches_scan(rng):
    """Pallas BiLSTM final-state kernel == masked-scan bilstm, incl. ragged
    row counts (interpret mode)."""
    from dualvgr_tpu.ops.lstm import init_lstm_params, bilstm
    from dualvgr_tpu.ops.lstm_pallas import bilstm_final_pallas

    R, T, D, H = 20, 7, 12, 8
    x = jnp.asarray(rng.randn(R, T, D).astype(np.float32))
    fwd = init_lstm_params(jax.random.PRNGKey(0), D, H)
    bwd = init_lstm_params(jax.random.PRNGKey(1), D, H)
    _, want = bilstm(fwd, bwd, x)

    x2 = x.reshape(R * T, D)
    xf = (x2 @ fwd.w_ih + fwd.b).reshape(R, T, 4 * H).transpose(1, 0, 2)
    xb = (x2 @ bwd.w_ih + bwd.b).reshape(R, T, 4 * H).transpose(1, 0, 2)[::-1]
    got = bilstm_final_pallas(xf, xb, fwd.w_hh, bwd.w_hh, block_r=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_bilstm_masked_outputs_match_scan(rng):
    """Masked variable-length kernel with per-step outputs == masked scan."""
    from dualvgr_tpu.ops.lstm import init_lstm_params, bilstm
    from dualvgr_tpu.ops.lstm_pallas import bilstm_pallas

    R, T, D, H = 11, 6, 9, 8
    x = jnp.asarray(rng.randn(R, T, D).astype(np.float32))
    lens = jnp.asarray(rng.randint(1, T + 1, (R,)).astype(np.int32))
    fwd = init_lstm_params(jax.random.PRNGKey(2), D, H)
    bwd = init_lstm_params(jax.random.PRNGKey(3), D, H)
    outs_want, final_want = bilstm(fwd, bwd, x, lens)

    x2 = x.reshape(R * T, D)
    xf = (x2 @ fwd.w_ih + fwd.b).reshape(R, T, 4 * H).transpose(1, 0, 2)
    xb = (x2 @ bwd.w_ih + bwd.b).reshape(R, T, 4 * H).transpose(1, 0, 2)[::-1]
    final, outs = bilstm_pallas(
        xf, xb, fwd.w_hh, bwd.w_hh, lens, with_outputs=True, block_r=4, interpret=True
    )
    np.testing.assert_allclose(np.asarray(final), np.asarray(final_want), atol=1e-5)
    np.testing.assert_allclose(np.asarray(outs), np.asarray(outs_want), atol=1e-5)


def test_model_fused_flag_matches_xla(rng):
    """DualVGR(use_pallas=True) eval outputs — logits AND every auxiliary
    embedding the losses consume — match DualVGR(use_pallas=False)."""
    from dualvgr_tpu.models import DualVGR

    dims = dict(
        vision_dim=20, module_dim=16, word_dim=10, question_vocab_size=30,
        num_answers=9, num_of_nodes=4, graph_layers=1, unit_layers=2,
    )
    b, c, f, t = 4, 4, 3, 6
    app = rng.randn(b, c, f, 20).astype(np.float32)
    mot = rng.randn(b, c, 20).astype(np.float32)
    q = rng.randint(1, 30, (b, t)).astype(np.int32)
    qlen = rng.randint(1, t + 1, (b,)).astype(np.int32)

    model = DualVGR(**dims)
    variables = model.init(
        {"params": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(0)},
        app, mot, q, qlen, train=False,
    )
    want = model.apply(variables, app, mot, q, qlen, train=False)

    import dualvgr_tpu.ops.gat_pallas as gp
    import dualvgr_tpu.ops.lstm_pallas as lp
    import functools

    orig_gat = gp.fused_gat_cycle
    orig_lstm = lp.bilstm_pallas
    # run both fused paths through the interpreter on CPU
    gp.fused_gat_cycle = functools.partial(orig_gat, interpret=True)
    lp.bilstm_pallas = functools.partial(orig_lstm, interpret=True)
    try:
        fused_model = DualVGR(use_pallas=True, **dims)
        got = fused_model.apply(variables, app, mot, q, qlen, train=False)
    finally:
        gp.fused_gat_cycle = orig_gat
        lp.bilstm_pallas = orig_lstm
    for field in want._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(got, field)),
            np.asarray(getattr(want, field)),
            atol=1e-4,
            err_msg=field,
        )
