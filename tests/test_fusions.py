"""Fusion-zoo tests: shape contracts for all fusions, math parity for the
main ones vs direct torch implementations, and the fixed GCN path."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from dualvgr_tpu.models.fusions import (
    FUSIONS,
    Block,
    CountSketch,
    GeneralMFB,
    MCB,
    MLB,
    Mutan,
    fusion_factory,
    get_sizes_list,
    power_normalize,
)

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("name", sorted(FUSIONS))
def test_factory_shapes(name, rng):
    kwargs = {"output_dim": 24}
    if name in ("block", "block_tucker"):
        kwargs.update(mm_dim=40, chunks=4)
        if name == "block":
            kwargs.update(rank=3)
    elif name in ("mutan", "tucker"):
        kwargs.update(mm_dim=16)
        if name == "mutan":
            kwargs.update(rank=3)
    elif name == "mcb":
        kwargs.update(mm_dim=64)
    m = fusion_factory(name, **kwargs)
    x0 = jnp.asarray(rng.randn(3, 10).astype(np.float32))
    x1 = jnp.asarray(rng.randn(3, 12).astype(np.float32))
    if name == "cat_mlp":
        variables = m.init(jax.random.PRNGKey(0), x0, x1)
        out = m.apply(variables, x0, x1)
    else:
        variables = m.init(jax.random.PRNGKey(0), x0, x1)
        out = m.apply(variables, x0, x1)
    assert out.shape == (3, 24)
    assert np.isfinite(np.asarray(out)).all()


def test_factory_unknown_name():
    with pytest.raises(ValueError):
        fusion_factory("nope", output_dim=3)


def test_get_sizes_list():
    assert sum(get_sizes_list(1600, 20)) == 1600
    assert sum(get_sizes_list(10, 3)) == 10
    assert min(get_sizes_list(10, 3)) > 0


def test_mlb_matches_torch(rng):
    x0 = rng.randn(4, 8).astype(np.float32)
    x1 = rng.randn(4, 6).astype(np.float32)
    m = MLB(output_dim=5, mm_dim=7, normalize=True)
    variables = m.init(jax.random.PRNGKey(1), jnp.asarray(x0), jnp.asarray(x1))
    got = np.asarray(m.apply(variables, jnp.asarray(x0), jnp.asarray(x1)))

    p = variables["params"]
    t0 = torch.relu(torch.from_numpy(x0) @ torch.from_numpy(np.asarray(p["linear0"]["kernel"])) + torch.from_numpy(np.asarray(p["linear0"]["bias"])))
    t1 = torch.relu(torch.from_numpy(x1) @ torch.from_numpy(np.asarray(p["linear1"]["kernel"])) + torch.from_numpy(np.asarray(p["linear1"]["bias"])))
    z = t0 * t1
    z = torch.sqrt(torch.relu(z)) - torch.sqrt(torch.relu(-z))
    z = torch.nn.functional.normalize(z, p=2)  # default dim=1, as reference
    z = torch.relu(z @ torch.from_numpy(np.asarray(p["linear_out"]["kernel"])) + torch.from_numpy(np.asarray(p["linear_out"]["bias"])))
    np.testing.assert_allclose(got, z.numpy(), atol=1e-5)


def test_mutan_rank_sum(rng):
    """Mutan: z_k = sum_r m0[r,k] * m1[r,k] — verify the rank contraction."""
    x0 = rng.randn(2, 5).astype(np.float32)
    x1 = rng.randn(2, 5).astype(np.float32)
    m = Mutan(output_dim=4, mm_dim=6, rank=3)
    variables = m.init(jax.random.PRNGKey(2), jnp.asarray(x0), jnp.asarray(x1))
    p = variables["params"]

    def lin(name, x):
        return x @ np.asarray(p[name]["kernel"]) + np.asarray(p[name]["bias"])

    h0, h1 = lin("linear0", x0), lin("linear1", x1)
    m_full = lin("merge_linear0", h0) * lin("merge_linear1", h1)
    z = m_full.reshape(2, 3, 6).sum(1)
    want = lin("linear_out", z)
    got = np.asarray(m.apply(variables, jnp.asarray(x0), jnp.asarray(x1)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_block_chunks_and_norm(rng):
    x0 = rng.randn(2, 9).astype(np.float32)
    x1 = rng.randn(2, 9).astype(np.float32)
    m = Block(output_dim=6, mm_dim=12, chunks=3, rank=2)
    variables = m.init(jax.random.PRNGKey(3), jnp.asarray(x0), jnp.asarray(x1))
    out = m.apply(variables, jnp.asarray(x0), jnp.asarray(x1))
    assert out.shape == (2, 6)
    p = variables["params"]
    assert "merge0_0" in p and "merge1_2" in p  # per-chunk projections exist


def test_mcb_is_circular_convolution_of_sketches(rng):
    """FFT compact bilinear == circular convolution of the two count sketches."""
    d0, d1, out = 10, 12, 32
    x0 = rng.randn(3, d0).astype(np.float32)
    x1 = rng.randn(3, d1).astype(np.float32)
    m = MCB(output_dim=8, mm_dim=out)
    variables = m.init(jax.random.PRNGKey(4), jnp.asarray(x0), jnp.asarray(x1))

    s0_mod = CountSketch(d0, out, seed=0)
    s1_mod = CountSketch(d1, out, seed=1)
    s0 = np.asarray(s0_mod.apply({}, jnp.asarray(x0)))
    s1 = np.asarray(s1_mod.apply({}, jnp.asarray(x1)))
    conv = np.real(np.fft.ifft(np.fft.fft(s0, axis=-1) * np.fft.fft(s1, axis=-1), axis=-1))

    p = variables["params"]
    want = conv @ np.asarray(p["linear_out"]["kernel"]) + np.asarray(p["linear_out"]["bias"])
    want = np.maximum(want, 0)
    got = np.asarray(m.apply(variables, jnp.asarray(x0), jnp.asarray(x1)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_general_mfb_equals_model_mfb(rng):
    """GeneralMFB at the model's settings == the specialized fusion.MFB."""
    from dualvgr_tpu.models.fusion import MFB as ModelMFB

    x0 = rng.randn(3, 16).astype(np.float32)
    x1 = rng.randn(3, 16).astype(np.float32)
    gen = GeneralMFB(output_dim=16, mm_dim=8, factor=2)
    vg = gen.init(jax.random.PRNGKey(5), jnp.asarray(x0), jnp.asarray(x1))
    spec = ModelMFB(output_dim=16, mm_dim=8, factor=2)
    out_g = np.asarray(gen.apply(vg, jnp.asarray(x0), jnp.asarray(x1)))
    out_s = np.asarray(spec.apply(vg, jnp.asarray(x0), jnp.asarray(x1)))
    np.testing.assert_allclose(out_g, out_s, atol=1e-6)


def test_gcn_graph_module_trains(rng):
    """graph_module='GCN' (crashes in the reference) works end to end here."""
    from dualvgr_tpu.models import DualVGR
    from dualvgr_tpu import train_lib

    model = DualVGR(
        vision_dim=16, module_dim=16, word_dim=8, question_vocab_size=20,
        num_answers=7, num_of_nodes=3, graph_layers=1, unit_layers=1,
        graph_module="GCN",
    )
    b, c, f, t = 4, 3, 2, 5
    app = rng.randn(b, c, f, 16).astype(np.float32)
    mot = rng.randn(b, c, 16).astype(np.float32)
    q = rng.randint(1, 20, (b, t)).astype(np.int32)
    qlen = np.full((b,), t, np.int32)
    ans = rng.randint(0, 7, (b,)).astype(np.int32)
    opt = train_lib.make_optimizer(1e-3, 10)
    state = train_lib.create_train_state(model, jax.random.PRNGKey(0), (app, mot, q, qlen), opt)
    step = train_lib.jit_train_step(model, opt, 1.0, 1e-8, donate=False)
    state, metrics = step(state, (app, mot, q, qlen, ans))
    assert np.isfinite(float(metrics["loss"]))


def test_alternative_encoders_and_decoder(rng):
    """Dead-in-reference modules are functional here (component parity)."""
    from dualvgr_tpu.models.encoders import (
        MultiGranularQuestionEncoder,
        SimpleQuestionEncoder,
    )
    from dualvgr_tpu.models.decoder import GateOutputUnitOpenEnded

    b, t, v = 3, 6, 25
    q = rng.randint(1, v, (b, t)).astype(np.int32)
    qlen = np.asarray([6, 3, 1], np.int32)

    enc = SimpleQuestionEncoder(v, word_dim=8, module_dim=12)
    variables = enc.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, q, qlen, train=False)
    emb, words, outs = enc.apply(variables, q, qlen, train=False)
    assert emb.shape == (b, 12) and words.shape == (b, t, 8) and outs.shape == (b, t, 12)

    mg = MultiGranularQuestionEncoder(v, word_dim=8, module_dim=10)
    variables = mg.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, q, qlen, train=False)
    emb, words, dyn = mg.apply(variables, q, qlen, train=False)
    assert emb.shape == (b, 20) and dyn.shape == (b, t, 20)

    dec = GateOutputUnitOpenEnded(module_dim=10, num_answers=5)
    qv = jnp.asarray(rng.randn(b, 10).astype(np.float32))
    vis = jnp.asarray(rng.randn(b, 10).astype(np.float32))
    variables = dec.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, qv, vis, train=False)
    logits = dec.apply(variables, qv, vis, train=False)
    assert logits.shape == (b, 5)
