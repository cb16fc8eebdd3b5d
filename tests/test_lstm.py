"""LSTM parity vs torch.nn.LSTM: the masked-scan must reproduce cuDNN-style
packed-sequence semantics (final states at true lengths, zero-padded
per-step outputs, correct reverse-direction start points)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from dualvgr_tpu.ops.lstm import LSTMParams, bilstm, lstm_unroll

pytestmark = pytest.mark.slow


def _torch_lstm(input_dim, hidden, bidirectional, seed=0):
    torch.manual_seed(seed)
    m = torch.nn.LSTM(input_dim, hidden, batch_first=True, bidirectional=bidirectional)
    return m


def _params_from_torch(m, reverse=False):
    sfx = "_reverse" if reverse else ""
    w_ih = m.state_dict()[f"weight_ih_l0{sfx}"].numpy()  # (4H, D)
    w_hh = m.state_dict()[f"weight_hh_l0{sfx}"].numpy()  # (4H, H)
    b_ih = m.state_dict()[f"bias_ih_l0{sfx}"].numpy()
    b_hh = m.state_dict()[f"bias_hh_l0{sfx}"].numpy()
    return LSTMParams(
        jnp.asarray(w_ih.T), jnp.asarray(w_hh.T), jnp.asarray(b_ih), jnp.asarray(b_hh)
    )


def test_forward_full_length_matches_torch(rng):
    B, T, D, H = 4, 7, 6, 5
    x = rng.randn(B, T, D).astype(np.float32)
    m = _torch_lstm(D, H, bidirectional=False)
    with torch.no_grad():
        out_t, (h_t, _) = m(torch.from_numpy(x))
    params = _params_from_torch(m)
    out_j, h_j = lstm_unroll(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_j), h_t[0].numpy(), atol=1e-5)


@pytest.mark.parametrize("lengths", [[7, 3, 1, 5], [2, 2, 2, 2]])
def test_packed_bilstm_matches_torch(rng, lengths):
    """Masked scan == pack_padded_sequence for both outputs and final states."""
    B, T, D, H = 4, 7, 6, 5
    x = rng.randn(B, T, D).astype(np.float32)
    lens = np.asarray(lengths, np.int64)
    for i in range(B):
        x[i, lens[i]:] = 0.0  # padded region content must not matter anyway

    m = _torch_lstm(D, H, bidirectional=True)
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.from_numpy(x), lens, batch_first=True, enforce_sorted=False
    )
    with torch.no_grad():
        out_p, (h, _) = m(packed)
    out_t, _ = torch.nn.utils.rnn.pad_packed_sequence(
        out_p, batch_first=True, total_length=T
    )
    final_t = torch.cat([h[0], h[1]], -1).numpy()  # (B, 2H)

    fwd = _params_from_torch(m, reverse=False)
    bwd = _params_from_torch(m, reverse=True)
    out_j, final_j = bilstm(fwd, bwd, jnp.asarray(x), jnp.asarray(lens))

    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(final_j), final_t, atol=1e-5)


def test_padding_content_is_ignored(rng):
    """Garbage in the padded region must not change outputs or final state."""
    B, T, D, H = 3, 6, 4, 4
    lens = np.asarray([4, 2, 6], np.int64)
    x1 = rng.randn(B, T, D).astype(np.float32)
    x2 = x1.copy()
    for i in range(B):
        x2[i, lens[i]:] = 999.0

    m = _torch_lstm(D, H, bidirectional=True, seed=1)
    fwd = _params_from_torch(m, False)
    bwd = _params_from_torch(m, True)
    o1, f1 = bilstm(fwd, bwd, jnp.asarray(x1), jnp.asarray(lens))
    o2, f2 = bilstm(fwd, bwd, jnp.asarray(x2), jnp.asarray(lens))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-6)


def test_gradients_flow(rng):
    import jax

    B, T, D, H = 2, 5, 3, 4
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    lens = jnp.asarray([5, 2])
    m = _torch_lstm(D, H, bidirectional=False, seed=2)
    params = _params_from_torch(m)

    def loss(p):
        out, h = lstm_unroll(p, x, lens)
        return (out**2).sum() + (h**2).sum()

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(t)).all() for t in g)
    assert float(jnp.abs(g.w_ih).sum()) > 0
