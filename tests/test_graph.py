"""Graph-attention parity: the broadcast-additive PunishGAT must equal a
direct torch implementation that materializes the (N, N, 2d) pairwise-concat
tensor exactly as the reference formulates it (GraphNN.py:77-155), including
punishment gating order and the softmax over neighbors."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from dualvgr_tpu.models.graph import AttentionSFGCN, PunishGAT, dense_self_loop_adjacency


def torch_punish_gat_head(h, adj, scores, W, Wb, a, ab, alpha=0.01):
    """One PunishGraphAttentionLayer head, pairwise-concat formulation."""
    h = torch.from_numpy(h)
    Wh = h @ torch.from_numpy(W).T + torch.from_numpy(Wb)  # (B, N, hd)
    b, n, hd = Wh.shape
    rep_chunks = Wh.repeat(1, 1, n).view(b, n * n, hd)
    rep_alt = Wh.repeat(1, n, 1)
    pair = torch.cat([rep_chunks, rep_alt], dim=2).view(b, n, n, 2 * hd)
    e = torch.nn.functional.leaky_relu(
        (pair @ torch.from_numpy(a).T).squeeze(-1) + float(ab), negative_slope=alpha
    )
    zero_vec = -9e15 * torch.ones_like(e)
    attention = torch.where(torch.from_numpy(adj) > 0, e, zero_vec)
    Wh = Wh * torch.from_numpy(scores)
    attention = torch.softmax(attention, dim=-1)
    out = torch.bmm(attention, Wh)
    return torch.nn.functional.elu(out).numpy()


def test_punish_gat_matches_pairwise_concat_formulation(rng):
    B, N, D, H, hd = 3, 5, 16, 4, 4
    x = rng.randn(B, N, D).astype(np.float32)
    scores = rng.rand(B, N, hd).astype(np.float32)
    adj = np.asarray(dense_self_loop_adjacency(N))

    gat = PunishGAT(n_heads=H, head_dim=hd, in_dim=D)
    vars_ = gat.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(adj), jnp.asarray(scores), train=False
    )
    out = gat.apply(
        vars_, jnp.asarray(x), jnp.asarray(adj), jnp.asarray(scores), train=False
    )  # dropout off => deterministic

    p = vars_["params"]
    kernel = np.asarray(p["w_kernel"])  # (D, H, hd)
    bias = np.asarray(p["w_bias"])  # (H, hd)
    a = np.asarray(p["a"])  # (H, 2hd)
    ab = np.asarray(p["a_bias"])  # (H,)

    heads = []
    for hidx in range(H):
        W = kernel[:, hidx, :].T  # torch layout (hd, D)
        heads.append(
            torch_punish_gat_head(
                x, adj, scores, W, bias[hidx], a[hidx : hidx + 1], ab[hidx]
            )
        )
    want = np.concatenate(heads, axis=2)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


def test_punishment_gates_values_not_logits(rng):
    """Scaling the punishment scores must scale aggregated values linearly
    (pre-ELU), proving the gate bypasses the attention logits."""
    B, N, D, H, hd = 2, 4, 8, 1, 8
    x = rng.randn(B, N, D).astype(np.float32)
    adj = np.asarray(dense_self_loop_adjacency(N))
    gat = PunishGAT(n_heads=H, head_dim=hd, in_dim=D)
    ones = np.ones((B, N, hd), np.float32)
    vars_ = gat.init(jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(adj), jnp.asarray(ones), train=False)

    o1 = gat.apply(vars_, jnp.asarray(x), jnp.asarray(adj), jnp.asarray(ones * 1e-3), train=False)
    o2 = gat.apply(vars_, jnp.asarray(x), jnp.asarray(adj), jnp.asarray(ones * 2e-3), train=False)
    # tiny positive pre-activations: ELU(x) ~ x, so doubling scores doubles out
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1) * 2.0, rtol=1e-2)


def test_attention_sfgcn(rng):
    """2-way soft attention: softmax weights over the stack dim sum to 1 and
    the output is the weighted sum (reference Attention.py:11-23)."""
    B, K, N, D = 2, 2, 4, 8
    z = rng.randn(B, K, N, D).astype(np.float32)
    m = AttentionSFGCN(hidden=D, in_dim=D)
    vars_ = m.init(jax.random.PRNGKey(0), jnp.asarray(z))
    out, beta = m.apply(vars_, jnp.asarray(z))
    beta = np.asarray(beta)
    np.testing.assert_allclose(beta.sum(axis=1), np.ones_like(beta.sum(axis=1)), rtol=1e-5)
    want = (beta * z).sum(axis=1)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


def test_dense_adjacency_values():
    adj = np.asarray(dense_self_loop_adjacency(4))
    np.testing.assert_allclose(np.diag(adj), np.full(4, 2 / 5), rtol=1e-6)
    off = adj[~np.eye(4, dtype=bool)]
    np.testing.assert_allclose(off, np.full(12, 1 / 5), rtol=1e-6)
    np.testing.assert_allclose(adj.sum(1), np.ones(4), rtol=1e-6)
    assert (adj > 0).all()  # the GAT mask never fires
