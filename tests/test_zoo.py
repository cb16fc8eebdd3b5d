"""Shape/behavior tests for the parity zoos: attention (reference
model/Attention.py), graph (model/GraphNN.py dead code), decoders
(model/AnswerDecoder.py dead variants), model utils (model/utils.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dualvgr_tpu.models.attention_zoo import (
    AttentionC,
    EncoderLayer,
    GatedNLT,
    MultiHeadAttention,
    PositionwiseFeedForward,
    RNNEncoder,
    ScaledDotProductAttention,
    TanhAttention,
    WordAttention,
)
from dualvgr_tpu.models.decoder import ConcatELUAttn, MFBAttn, SimpleConcatELUAttn
from dualvgr_tpu.models.graph_zoo import (
    GAT,
    GatedGATLayer,
    GatedGCNLayer,
    GINLayer,
    construct_graph,
    process_adj,
)
from dualvgr_tpu.models.utils_zoo import VisualEnhanceByQuery, l2norm, mean_x, pca


def _init(module, *args, **kw):
    variables = module.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        *args, **kw,
    )
    return variables


# ---------------------------------------------------------------- attention


def test_scaled_dot_product_attention(rng):
    b, lq, lk, d = 3, 5, 7, 8
    q = jnp.asarray(rng.randn(b, lq, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, lk, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, lk, d).astype(np.float32))
    m = ScaledDotProductAttention(temperature=d ** 0.5)
    out, attn = m.apply({}, q, k, v)
    assert out.shape == (b, lq, d) and attn.shape == (b, lq, lk)
    want = jax.nn.softmax(q @ k.transpose(0, 2, 1) / d ** 0.5, axis=2) @ v
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-6)
    # masked positions get zero attention
    mask = jnp.zeros((b, lq, lk), bool).at[:, :, 0].set(True)
    _, attn = m.apply({}, q, k, v, mask)
    assert np.allclose(np.asarray(attn[:, :, 0]), 0.0)


def test_multi_head_attention_block(rng):
    b, t, dm = 2, 6, 32
    x = jnp.asarray(rng.randn(b, t, dm).astype(np.float32))
    m = MultiHeadAttention(n_head=4, d_model=dm, d_k=8, d_v=8)
    variables = _init(m, x, x, x)
    out, attn = m.apply(variables, x, x, x)
    assert out.shape == (b, t, dm) and attn.shape == (b, 4, t, t)
    # LayerNorm(residual) output: per-position zero mean / unit variance
    np.testing.assert_allclose(np.asarray(out.mean(-1)), 0.0, atol=1e-5)


def test_positionwise_ffn_and_encoder_layer(rng):
    b, t, dm = 2, 5, 16
    x = jnp.asarray(rng.randn(b, t, dm).astype(np.float32))
    ffn = PositionwiseFeedForward(dm, 32)
    out = ffn.apply(_init(ffn, x), x)
    assert out.shape == (b, t, dm)

    enc = EncoderLayer(d_model=dm, d_inner=32, n_head=2, d_k=8, d_v=8)
    variables = _init(enc, x, x, x)
    non_pad = jnp.ones((b, t, 1)).at[:, -2:].set(0.0)
    out, attn = enc.apply(variables, x, x, x, non_pad)
    assert out.shape == (b, t, dm)
    assert np.allclose(np.asarray(out[:, -2:]), 0.0)  # padded rows zeroed


def test_attention_c_gates_features(rng):
    b, nh = 3, 12
    v = jnp.asarray(rng.randn(b, 1, nh).astype(np.float32))
    q = jnp.asarray(rng.randn(b, 20).astype(np.float32))
    m = AttentionC(dim=20, num_hid=nh, head=4)
    out = m.apply(_init(m, v, q), v, q)
    assert out.shape == (b, 1, nh)
    # sigmoid gate: output bounded by |v|
    assert (np.abs(np.asarray(out)) <= np.abs(np.asarray(v)) + 1e-6).all()


def test_rnn_encoder_contract(rng):
    b, t, w, h = 4, 7, 10, 6
    x = jnp.asarray(rng.randn(b, t, w).astype(np.float32))
    lens = jnp.asarray([7, 3, 1, 0], jnp.int32)  # zero length clamped to 1
    m = RNNEncoder(word_size=w, hidden_size=h, n_layers=2)
    variables = _init(m, x, lens)
    out, hidden, emb = m.apply(variables, x, lens)
    assert out.shape == (b, t, 2 * h)
    assert hidden.shape == (b, 2 * 2 * h)
    assert emb is x
    # per-step outputs at padded positions are zero (masked scan)
    assert np.allclose(np.asarray(out[1, 3:]), 0.0)


def test_tanh_attention_directions(rng):
    b, l, d = 2, 5, 8
    x = jnp.asarray(rng.randn(b, l, d).astype(np.float32))
    mask = jnp.ones((b, l), jnp.int32)

    fwd = TanhAttention(d, direction="forward")
    variables = _init(fwd, x, x, mask)
    out = fwd.apply(variables, x, x, mask)
    assert out.shape == (b, l, d)

    bwd = TanhAttention(d, direction="backward")
    vb = _init(bwd, x, x, mask)
    o1 = bwd.apply(vb, x, x.at[:, -1].add(5.0), mask)
    o2 = bwd.apply(vb, x, x, mask)
    # backward: row i attends to j <= i, so the last memory row only
    # affects the last output row
    np.testing.assert_allclose(
        np.asarray(o1[:, :-1]), np.asarray(o2[:, :-1]), atol=1e-5
    )
    assert not np.allclose(np.asarray(o1[:, -1]), np.asarray(o2[:, -1]))


def test_word_attention_masks_padding(rng):
    b, t, d, w = 3, 6, 8, 5
    ctx = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    emb = jnp.asarray(rng.randn(b, t, w).astype(np.float32))
    labels = jnp.asarray(rng.randint(1, 9, (b, t)), jnp.int32).at[:, 4:].set(0)
    m = WordAttention(d)
    attn, weighted = m.apply(_init(m, ctx, emb, labels), ctx, emb, labels)
    assert attn.shape == (b, t) and weighted.shape == (b, w)
    assert np.allclose(np.asarray(attn[:, 4:]), 0.0)
    np.testing.assert_allclose(np.asarray(attn.sum(1)), 1.0, atol=1e-3)


def test_gated_nlt(rng):
    x = jnp.asarray(rng.randn(4, 10).astype(np.float32))
    m = GatedNLT(10, 6)
    y = m.apply(_init(m, x), x)
    assert y.shape == (4, 6)
    assert (np.abs(np.asarray(y)) <= 1.0).all()  # tanh * tanh


# -------------------------------------------------------------------- graph


def test_unpunished_gat_shapes(rng):
    from dualvgr_tpu.models.graph import dense_self_loop_adjacency

    b, n, d = 3, 5, 16
    h = jnp.asarray(rng.randn(b, n, d).astype(np.float32))
    adj = dense_self_loop_adjacency(n)
    m = GAT(n_heads=4, head_dim=4, in_dim=d)
    out = m.apply(_init(m, h, adj), h, adj)
    assert out.shape == (b, n, 16)


def test_construct_graph_knn(rng):
    feats = rng.randn(7, 12).astype(np.float32)
    a = np.asarray(construct_graph(feats, topk=2))
    assert a.shape == (7, 7)
    assert set(np.unique(a)).issubset({0.0, 1.0})
    assert (a.sum(axis=1) == 3).all()  # topk + self
    assert (np.diag(a) == 1).all()  # self always most similar
    # matches a direct numpy cosine top-k
    xn = feats / np.linalg.norm(feats, axis=1, keepdims=True)
    sim = xn @ xn.T
    for i in range(7):
        want = set(np.argsort(-sim[i])[:3].tolist())
        got = set(np.nonzero(a[i])[0].tolist())
        assert got == want


def test_process_adj():
    a = np.array([[0, 1, 0], [1, 0, 1], [0, 1, 0]], np.float32)
    a_hat, d = map(np.asarray, process_adj(a))
    np.testing.assert_array_equal(a_hat, a + np.eye(3, dtype=np.float32))
    np.testing.assert_allclose(
        np.diag(d), [1 / np.sqrt(2), 1 / np.sqrt(3), 1 / np.sqrt(2)], rtol=1e-6
    )


@pytest.mark.parametrize("cls,extra", [(GINLayer, 3), (GatedGATLayer, 2)])
def test_gated_multirel_layers(rng, cls, extra):
    b, n, d = 2, 4, 8
    x = jnp.asarray(rng.randn(b, n, d).astype(np.float32))
    mask = jnp.ones((b, n)).at[1, -1].set(0.0)
    adj = jnp.asarray(rng.rand(b, extra, n, n).astype(np.float32))
    m = cls(input_dim=d, proj_dim=d, num_hop=2, num_rel=extra)
    out = m.apply(_init(m, x, mask, adj), x, mask, adj)
    assert out.shape == (b, n, d)
    assert np.isfinite(np.asarray(out)).all()
    # gated residual: masked node keeps its input (gate * update is zeroed)
    np.testing.assert_allclose(np.asarray(out[1, -1]), np.asarray(x[1, -1]), atol=1e-6)


def test_gated_gcn_layer(rng):
    b, n, d = 2, 4, 8
    x = jnp.asarray(rng.randn(b, n, d).astype(np.float32))
    adj = jnp.asarray(rng.rand(b, 2, n, n).astype(np.float32))
    m = GatedGCNLayer(input_dim=d, proj_dim=d, num_hop=3, num_rel=2)
    out = m.apply(_init(m, x, adj), x, adj)
    assert out.shape == (b, n, d)
    assert np.isfinite(np.asarray(out)).all()


# ----------------------------------------------------------------- decoders


@pytest.mark.parametrize("cls", [ConcatELUAttn, MFBAttn, SimpleConcatELUAttn])
def test_dead_decoder_variants(rng, cls):
    b, n, d = 3, 5, 16
    q = jnp.asarray(rng.randn(b, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, n, d).astype(np.float32))
    m = cls(module_dim=d)
    out = m.apply(_init(m, q, v), q, v)
    assert out.shape == (b, d)
    # convex combination over clips: output within per-feature clip range
    vn = np.asarray(v)
    assert (np.asarray(out) <= vn.max(axis=1) + 1e-5).all()
    assert (np.asarray(out) >= vn.min(axis=1) - 1e-5).all()


# -------------------------------------------------------------- model utils


def test_pca_projects_to_principal_axes(rng):
    # anisotropic 2D data embedded in 4D: PCA(k=1) captures the long axis
    base = rng.randn(200, 1) * np.array([[10.0]])
    x = np.concatenate([base, 0.1 * rng.randn(200, 3)], axis=1)
    proj = pca(x, 1)
    assert proj.shape == (200, 1)
    np.testing.assert_allclose(
        np.abs(np.corrcoef(proj[:, 0], x[:, 0])[0, 1]), 1.0, atol=1e-2
    )
    assert mean_x(x).shape == (4,)
    with pytest.raises(ValueError):
        pca(x, 9)


def test_l2norm(rng):
    x = jnp.asarray(rng.randn(2, 3, 8).astype(np.float32))
    y = l2norm(x)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=2), 1.0, rtol=1e-5
    )


def test_visual_enhance_by_query(rng):
    b, t, n, d = 2, 6, 4, 16
    q = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, n, d).astype(np.float32))
    m = VisualEnhanceByQuery(module_dim=d)
    out = m.apply(_init(m, q, v), q, v)
    assert out.shape == (b, n, d)
    assert np.isfinite(np.asarray(out)).all()
