"""Mixed-precision stream dtype (cfg.tpu.compute_dtype) behavior.

The stream dtype makes the LSTM input projections consume bf16 OPERANDS with
fp32 accumulation (dualvgr_tpu/ops/lstm.py::time_major_input_proj) and
streams the projected gates to the fused kernel in bf16. Params and the
recurrence stay fp32. These tests pin (a) the reduced-precision path stays
numerically close to fp32, (b) the global knob round-trips cleanly.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dualvgr_tpu.ops import lstm_pallas
from dualvgr_tpu.ops.lstm import init_lstm_params, lstm_unroll, time_major_input_proj


@pytest.fixture
def restore_stream_dtype():
    prev = lstm_pallas.STREAM_DTYPE
    yield
    lstm_pallas.STREAM_DTYPE = prev


def test_input_proj_bf16_close_to_fp32(rng):
    import jax

    B, T, D, H = 4, 7, 64, 16
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    p = init_lstm_params(jax.random.PRNGKey(0), D, H)
    ref = time_major_input_proj(x, p, None)
    bf = time_major_input_proj(x, p, "bfloat16")
    assert bf.dtype == jnp.float32  # fp32 accumulate + fp32 bias add
    # bf16 operand rounding: ~2^-8 relative per element
    np.testing.assert_allclose(np.asarray(bf), np.asarray(ref), rtol=0, atol=2e-2)


def test_lstm_unroll_honors_stream_dtype(rng, restore_stream_dtype):
    import jax

    B, T, D, H = 3, 6, 32, 8
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    lens = jnp.asarray([6, 3, 1])
    p = init_lstm_params(jax.random.PRNGKey(1), D, H)

    lstm_pallas.STREAM_DTYPE = None
    out32, h32 = lstm_unroll(p, x, lens)
    lstm_pallas.STREAM_DTYPE = "bfloat16"
    out16, h16 = lstm_unroll(p, x, lens)
    assert out16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32), atol=2e-2)
    np.testing.assert_allclose(np.asarray(h16), np.asarray(h32), atol=2e-2)
    # gradients still flow through the cast (mixed-precision VJP)
    g = jax.grad(lambda pp: lstm_unroll(pp, x, lens)[1].sum())(p)
    assert float(jnp.abs(g.w_ih).sum()) > 0


@pytest.mark.slow  # two full-model compiles (~50 s) — parity tier
def test_full_model_logits_close_under_bf16_stream(rng, restore_stream_dtype):
    import jax

    from dualvgr_tpu.models import DualVGR

    model = DualVGR(
        vision_dim=48, module_dim=32, word_dim=16,
        question_vocab_size=60, num_answers=20, num_of_nodes=4,
        graph_layers=1, unit_layers=1,
    )
    b, c, f, t = 4, 4, 5, 6
    app = rng.randn(b, c, f, 48).astype(np.float32)
    mot = rng.randn(b, c, 48).astype(np.float32)
    q = rng.randint(1, 60, (b, t)).astype(np.int32)
    qlen = np.array([6, 4, 2, 1], np.int32)
    for i in range(b):
        q[i, qlen[i]:] = 0
    variables = model.init(
        {"params": jax.random.PRNGKey(666), "dropout": jax.random.PRNGKey(0)},
        app[:1], mot[:1], q[:1], qlen[:1], train=False,
    )

    lstm_pallas.STREAM_DTYPE = None
    ref = model.apply(variables, app, mot, q, qlen, train=False).logits
    lstm_pallas.STREAM_DTYPE = "bfloat16"
    bf = model.apply(variables, app, mot, q, qlen, train=False).logits
    np.testing.assert_allclose(np.asarray(bf), np.asarray(ref), atol=5e-2)
    assert (
        np.asarray(jnp.argmax(bf, -1)) == np.asarray(jnp.argmax(ref, -1))
    ).all()


def test_apply_tpu_config_routes_compute_dtype(restore_stream_dtype):
    """cfg.tpu.compute_dtype -> the kernels' global stream dtype (the wiring
    all three CLI drivers call: train.py:249, validate.py:49, predict.py:66)."""
    from dualvgr_tpu import train_lib
    from dualvgr_tpu.config import default_config

    cfg = default_config()
    train_lib.apply_tpu_config(cfg)
    assert lstm_pallas.STREAM_DTYPE is None  # float32 default = no streaming

    cfg.tpu.compute_dtype = "bfloat16"
    train_lib.apply_tpu_config(cfg)
    assert lstm_pallas.STREAM_DTYPE == "bfloat16"
