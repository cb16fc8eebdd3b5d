"""Mixed-precision compute dtype (cfg.tpu.compute_dtype) behavior.

The knob is threaded EXPLICITLY: ``DualVGR(compute_dtype="bfloat16")`` is a
different (hashable) module instance, so jit caches key on it — no mutable
global, no stale-dtype executables (round-2 advisor finding). Streamed
matmuls consume bf16 OPERANDS with fp32 accumulation
(dualvgr_tpu/ops/precision.py); params, recurrences, softmaxes stay fp32.
These tests pin (a) the reduced-precision paths stay numerically close to
fp32, (b) the cfg wiring the CLI drivers use resolves correctly.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dualvgr_tpu.ops.lstm import init_lstm_params, lstm_unroll, time_major_input_proj
from dualvgr_tpu.ops.precision import SDense, stream_dtype_of, streamed_matmul


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


def test_lstm_unroll_honors_stream_dtype(rng):
    import jax

    B, T, D, H = 3, 6, 32, 8
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    lens = jnp.asarray([6, 3, 1])
    p = init_lstm_params(jax.random.PRNGKey(1), D, H)

    out32, h32 = lstm_unroll(p, x, lens)
    out16, h16 = lstm_unroll(p, x, lens, stream_dtype="bfloat16")
    assert out16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32), atol=2e-2)
    np.testing.assert_allclose(np.asarray(h16), np.asarray(h32), atol=2e-2)
    # gradients still flow through the cast (mixed-precision VJP)
    g = jax.grad(
        lambda pp: lstm_unroll(pp, x, lens, stream_dtype="bfloat16")[1].sum()
    )(p)
    assert float(jnp.abs(g.w_ih).sum()) > 0
    assert g.w_ih.dtype == jnp.float32  # grads cast back to param dtype


def test_streaming_applies_real_rounding_on_cpu(rng):
    """On the CPU test tier, bf16 streaming must apply GENUINE operand
    rounding under jit — otherwise every closeness assertion in this file
    would pass vacuously. (On TPU the fp32 path's Precision.DEFAULT already
    truncates MXU operands to bf16, so streaming is bitwise-identical there;
    see benchmarks/precision_probe.py. CPU has no such truncation and XLA
    does not fold the f32->bf16->f32 convert chain, so a nonzero diff here
    proves the tests exercise real reduced precision.)"""
    import jax

    x = jnp.asarray(rng.randn(64, 128).astype(np.float32))
    w = jnp.asarray(rng.randn(128, 96).astype(np.float32))
    plain = jax.jit(lambda x, w: x @ w)(x, w)
    streamed = jax.jit(lambda x, w: streamed_matmul(x, w, "bfloat16"))(x, w)
    diff = float(jnp.abs(plain - streamed).max())
    if jax.default_backend() == "tpu":  # pragma: no cover - CPU tier
        assert diff == 0.0  # DEFAULT precision == explicit bf16 on the MXU
    else:
        assert diff > 1e-3  # real rounding: ~2^-8 relative on O(10) sums


def test_streamed_matmul_grads_exact_f32(rng):
    """Streamed-matmul cotangents are EXACT-F32: bf16 OPERANDS, f32
    accumulation, f32 output, with NO terminal bf16 rounding of dx/dw.
    Plain autodiff through the operand casts rounds every cotangent to
    bf16 (the round-3 −3.3% bf16-training delta,
    benchmarks/fastpath_accuracy.json); the custom VJP in
    dualvgr_tpu/ops/precision.py removes exactly that rounding — on the
    TPU MXU the result is bitwise what fp32 Precision.DEFAULT training
    computes (benchmarks/precision_probe.py)."""
    import jax

    x = jnp.asarray(rng.randn(6, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(32, 16).astype(np.float32))
    c = jnp.asarray(rng.randn(6, 16).astype(np.float32))  # cotangent seed

    dx, dw = jax.grad(
        lambda x, w: (streamed_matmul(x, w, "bfloat16") * c).sum(), argnums=(0, 1)
    )(x, w)

    # hand-computed exact-f32 cotangents: rounded OPERANDS, f32 math — the
    # same einsum forms the VJP emits, so CPU equality is bitwise
    f32 = lambda a: a.astype(jnp.bfloat16).astype(jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(dx), np.asarray(jnp.einsum("ah,dh->ad", f32(c), f32(w)))
    )
    np.testing.assert_array_equal(
        np.asarray(dw), np.asarray(jnp.einsum("ad,ah->dh", f32(x), f32(c)))
    )
    assert dx.dtype == dw.dtype == jnp.float32
    # the cotangents are NOT bf16-rounded values (the old behavior was):
    # re-rounding them must change them
    assert float(jnp.abs(dx - f32(dx)).max()) > 0
    assert float(jnp.abs(dw - f32(dw)).max()) > 0


def test_streamed_einsum_grads_exact_f32(rng):
    """Same exactness for the stacked-bank einsum spec the batched GAT
    path uses (dualvgr_tpu/models/dualvgr.py::_gat4_batched)."""
    import jax

    from dualvgr_tpu.ops.precision import streamed_einsum

    x = jnp.asarray(rng.randn(4, 2, 3, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(4, 8, 6).astype(np.float32))
    c = jnp.asarray(rng.randn(4, 2, 3, 6).astype(np.float32))

    dx, dw = jax.grad(
        lambda x, w: (streamed_einsum("kbnd,kdh->kbnh", x, w, "bfloat16") * c).sum(),
        argnums=(0, 1),
    )(x, w)
    f32 = lambda a: a.astype(jnp.bfloat16).astype(jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(dx), np.asarray(jnp.einsum("kbnh,kdh->kbnd", f32(c), f32(w)))
    )
    np.testing.assert_array_equal(
        np.asarray(dw), np.asarray(jnp.einsum("kbnd,kbnh->kdh", f32(x), f32(c)))
    )
    assert float(jnp.abs(dx - f32(dx)).max()) > 0


def test_transpose_specs_rejects_summed_only_index():
    """A contraction whose operand has an index absent from output+other
    operand cannot be transposed by spec swapping — must fail loudly."""
    from dualvgr_tpu.ops.precision import _transpose_specs

    assert _transpose_specs("btd,dh->tbh") == ("tbh,dh->btd", "btd,tbh->dh")
    with pytest.raises(AssertionError):
        _transpose_specs("ij,jk->k")  # i is summed-only in the lhs


def test_stream_roundtrip_rounds_forward_identity_backward(rng):
    """stream_roundtrip: genuine RNE rounding in the forward on CPU (the
    Pallas-path bit-comparability contract) but an IDENTITY cotangent —
    plain autodiff would round the cotangent to bf16."""
    import jax

    from dualvgr_tpu.ops.precision import stream_roundtrip

    x = jnp.asarray(rng.randn(32, 48).astype(np.float32))
    c = jnp.asarray(rng.randn(32, 48).astype(np.float32))
    y = stream_roundtrip(x, "bfloat16")
    assert y.dtype == jnp.float32
    np.testing.assert_array_equal(
        np.asarray(y), np.asarray(x.astype(jnp.bfloat16).astype(jnp.float32))
    )
    g = jax.grad(lambda x: (stream_roundtrip(x, "bfloat16") * c).sum())(x)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(c))  # bitwise


def test_streamed_matmul_and_sdense(rng):
    import jax

    x = jnp.asarray(rng.randn(5, 3, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(32, 16).astype(np.float32))
    ref = x @ w
    bf = streamed_matmul(x, w, "bfloat16")
    assert bf.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(bf), np.asarray(ref), atol=0.15)
    assert streamed_matmul(x, w, None) is not None
    np.testing.assert_allclose(np.asarray(streamed_matmul(x, w, None)), np.asarray(ref))

    # SDense: identical params to nn.Dense; stream=None identical numerics
    import flax.linen as nn

    d0 = nn.Dense(16, kernel_init=nn.initializers.xavier_uniform())
    v0 = d0.init(jax.random.PRNGKey(3), x)
    s0 = SDense(16)
    vs = s0.init(jax.random.PRNGKey(3), x)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(vs)
    np.testing.assert_array_equal(
        np.asarray(v0["params"]["kernel"]), np.asarray(vs["params"]["kernel"])
    )
    np.testing.assert_allclose(
        np.asarray(d0.apply(v0, x)), np.asarray(s0.apply(v0, x)), rtol=1e-6
    )


@pytest.mark.slow  # two full-model compiles (~50 s) — parity tier
def test_full_model_logits_close_under_bf16_stream(rng):
    import jax

    from dualvgr_tpu.models import DualVGR

    kw = dict(
        vision_dim=48, module_dim=32, word_dim=16,
        question_vocab_size=60, num_answers=20, num_of_nodes=4,
        graph_layers=1, unit_layers=1,
    )
    model = DualVGR(**kw)
    model_bf16 = DualVGR(**kw, compute_dtype="bfloat16")
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
    # identical trees: compute_dtype changes no parameter
    v16 = model_bf16.init(
        {"params": jax.random.PRNGKey(666), "dropout": jax.random.PRNGKey(0)},
        app[:1], mot[:1], q[:1], qlen[:1], train=False,
    )
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(v16)

    ref = model.apply(variables, app, mot, q, qlen, train=False).logits
    bf = model_bf16.apply(variables, app, mot, q, qlen, train=False).logits
    np.testing.assert_allclose(np.asarray(bf), np.asarray(ref), atol=8e-2)
    assert (
        np.asarray(jnp.argmax(bf, -1)) == np.asarray(jnp.argmax(ref, -1))
    ).all()


def test_model_runtime_kwargs_routes_cfg(monkeypatch):
    """cfg.tpu -> DualVGR constructor kwargs (the wiring all three CLI
    drivers call via dualvgr_tpu.config.model_runtime_kwargs)."""
    import jax

    from dualvgr_tpu.config import default_config, model_runtime_kwargs, resolved_use_pallas

    cfg = default_config()
    # "auto" default: off on CPU test backend...
    assert cfg.tpu.use_pallas == "auto"
    assert resolved_use_pallas(cfg) == (jax.default_backend() == "tpu")
    # ...on when the ambient backend is TPU (the flagship CLI command then
    # runs the kernel path with no config edits — VERDICT r2 item 5)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert resolved_use_pallas(cfg) is True
    kw = model_runtime_kwargs(cfg)
    # compute_dtype "auto" resolves to bfloat16 on TPU (bitwise-identical
    # eval there — benchmarks/precision_probe.py; chaos-band-neutral
    # training — benchmarks/bf16_chaos_control.json)
    assert kw == {"use_pallas": True, "compute_dtype": "bfloat16"}
    # explicit bool wins over auto
    cfg.tpu.use_pallas = False
    assert resolved_use_pallas(cfg) is False
    # explicit dtype pins win over auto, both directions
    cfg.tpu.compute_dtype = "float32"
    assert model_runtime_kwargs(cfg)["compute_dtype"] == "float32"
    cfg.tpu.compute_dtype = "bfloat16"
    assert model_runtime_kwargs(cfg)["compute_dtype"] == "bfloat16"


def test_compute_dtype_auto_resolution(monkeypatch):
    """tpu.compute_dtype "auto" = bfloat16 on TPU / float32 elsewhere; the
    CPU test tier must keep exact fp32 numerics by default (streaming on CPU
    applies genuine RNE rounding the reference never does)."""
    import jax

    from dualvgr_tpu.config import default_config, resolved_compute_dtype

    cfg = default_config()
    assert cfg.tpu.compute_dtype == "auto"
    assert resolved_compute_dtype(cfg) == (
        "bfloat16" if jax.default_backend() == "tpu" else "float32"
    )
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert resolved_compute_dtype(cfg) == "bfloat16"
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert resolved_compute_dtype(cfg) == "float32"


def test_yaml_bool_overrides_auto(tmp_path):
    from dualvgr_tpu.config import cfg_from_file

    p = tmp_path / "c.yml"
    p.write_text("tpu:\n  use_pallas: true\n")
    cfg = cfg_from_file(str(p))
    assert cfg.tpu.use_pallas is True
    p.write_text("tpu:\n  use_pallas: false\n")
    cfg = cfg_from_file(str(p))
    assert cfg.tpu.use_pallas is False


def test_prng_impl_auto_resolution(monkeypatch, tmp_path):
    """tpu.prng_impl "auto" = hardware rbg on TPU / threefry elsewhere, so
    the flagship CLI's dropout PRNG matches the benched configuration
    (bench.py defaults BENCH_PRNG=rbg); explicit YAML pins win."""
    import jax

    from dualvgr_tpu.config import cfg_from_file, default_config, resolved_prng_impl

    cfg = default_config()
    assert cfg.tpu.prng_impl == "auto"
    assert resolved_prng_impl(cfg) == (
        "rbg" if jax.default_backend() == "tpu" else "threefry2x32"
    )
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert resolved_prng_impl(cfg) == "rbg"
    # explicit pin wins over auto, both ways
    p = tmp_path / "c.yml"
    p.write_text("tpu:\n  prng_impl: threefry2x32\n")
    assert resolved_prng_impl(cfg_from_file(str(p))) == "threefry2x32"
    p.write_text("tpu:\n  prng_impl: rbg\n")
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert resolved_prng_impl(cfg_from_file(str(p))) == "rbg"
    # the typed key the drivers build carries the resolved impl
    key = jax.random.key(7, impl=resolved_prng_impl(default_config()))
    assert str(jax.random.key_impl(key)) == resolved_prng_impl(default_config())


@pytest.mark.slow
def test_precision_ladder_probe_runs():
    """The committed precision-ladder probe (benchmarks/precision_ladder.py)
    executes end-to-end at a toy rung. On CPU the fp32 and bf16-streamed
    programs genuinely differ (no DEFAULT-precision truncation, real RNE
    rounding), so the rung must report NON-bitwise — the bitwise claim in
    precision_ladder.json is a TPU-only MXU semantic, and this guard proves
    the probe can tell the difference (a probe that reported bitwise on CPU
    would be vacuous on chip too)."""
    import jax

    from benchmarks.precision_ladder import check

    rung = check(64, 32, 16, nodes=4, frames=3, B=4, T=6)
    assert rung["param_leaves"] > 0
    if jax.default_backend() == "cpu":
        assert not rung["fwd_bitwise"]
        assert rung["fwd_max_abs"] > 0
        assert rung["step_leaves_diverged"] > 0
