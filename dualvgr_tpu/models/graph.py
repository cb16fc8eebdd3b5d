"""Query-punished multi-head graph attention over clip nodes, TPU-first.

Reference semantics (model/GraphNN.py:77-178):

* ``PunishGraphAttentionLayer``: Wh = W h (768 -> 192); attention logits
  e_ij = LeakyReLU_0.01(a([Wh_i || Wh_j]) + b_a); mask where adj <= 0 with
  -9e15 (the shipped adjacency is strictly positive everywhere — all-ones +
  self-loop row normalization, models.py:114-119 — so the mask never fires
  and the clip graph is dense all-to-all); punishment gating Wh <- Wh *
  scores BEFORE aggregation and AFTER logit computation (GraphNN.py:102-108);
  softmax over neighbors; attention dropout 0.15; h' = attn @ Wh; ELU.
* ``punishGAT``: input dropout 0.15, concat of 4 heads, output dropout 0.15.

TPU reformulation: the reference materializes a (B, N, N, 2d) pairwise
concat tensor (GraphNN.py:115-155). Because a([x||y]) = a_src . x +
a_dst . y + b_a is additive, we compute two (B, H, N) projections and add
them with a broadcast — never building the N^2 x 2d tensor — and we batch
all H heads through one (768, H*192) matmul. Everything is dense matmuls +
softmax over N <= 20 nodes; XLA fuses this tightly, and a fused Pallas
cycle kernel (dualvgr_tpu/ops/gat_pallas.py) covers the full DualVGR cycle.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from dualvgr_tpu.models.init import xavier_uniform_fans


class PunishGAT(nn.Module):
    """Multi-head query-punished GAT (reference GraphNN.py:77-178)."""

    n_heads: int = 4
    head_dim: int = 192  # module_dim // 4
    dropout: float = 0.15
    alpha: float = 0.01  # LeakyReLU negative slope

    @nn.compact
    def __call__(self, h, adj, scores, *, train: bool):
        """h: (B, N, D); adj: (N, N) (>0 everywhere in shipped configs);
        scores: (B, N, head_dim) punishment gates or None.

        Returns (B, N, n_heads * head_dim).
        """
        b, n, d = h.shape
        nh, hd = self.n_heads, self.head_dim

        x = nn.Dropout(self.dropout, deterministic=not train)(h)

        # all heads in one (D, H*hd) matmul; per-head W has its own bias,
        # matching nn.Linear(in_features, out_features) per head. Explicit
        # per-head fans (768 -> 192) for xavier, independent of array shape.
        wh = nn.DenseGeneral(
            features=(nh, hd),
            kernel_init=xavier_uniform_fans(d, hd),
            name="w",
        )(x)  # (B, N, H, hd)

        # additive attention: a([Wh_i || Wh_j]) = src_i + dst_j + b_a
        # per-head torch shape is (1, 2*hd) => fans (2*hd, 1)
        a = self.param(
            "a",
            xavier_uniform_fans(2 * hd, 1),
            (nh, 2 * hd),
        )
        a_bias = self.param("a_bias", nn.initializers.zeros, (nh,))
        a_src, a_dst = a[:, :hd], a[:, hd:]
        src = jnp.einsum("bnhd,hd->bhn", wh, a_src)
        dst = jnp.einsum("bnhd,hd->bhn", wh, a_dst)
        e = src[:, :, :, None] + dst[:, :, None, :] + a_bias[None, :, None, None]
        e = nn.leaky_relu(e, negative_slope=self.alpha)  # (B, H, N, N)

        # adjacency mask (never fires for the shipped dense adjacency)
        e = jnp.where(adj[None, None] > 0, e, jnp.full_like(e, -9e15))

        # punishment gating: values only, logits untouched (GraphNN.py:102-108)
        if scores is not None:
            wh = wh * scores[:, :, None, :]

        attn = jax.nn.softmax(e, axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out = jnp.einsum("bhij,bjhd->bihd", attn, wh)
        out = nn.elu(out)  # per-head ELU (concat=True path, GraphNN.py:110-111)
        out = out.reshape(b, n, nh * hd)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class AttentionSFGCN(nn.Module):
    """2-way soft attention over the [common, specific] stack
    (reference model/Attention.py:11-23; instantiated with hidden=module_dim
    at models.py:103-104)."""

    hidden: int = 768

    @nn.compact
    def __call__(self, z):
        """z: (B, K, N, D) -> ((B, N, D), beta (B, K, N, 1))."""
        w = nn.Dense(
            self.hidden, kernel_init=nn.initializers.xavier_uniform(), name="proj"
        )(z)
        w = jnp.tanh(w)
        w = nn.Dense(
            1,
            use_bias=False,
            kernel_init=nn.initializers.xavier_uniform(),
            name="score",
        )(w)
        beta = jax.nn.softmax(w, axis=1)
        return (beta * z).sum(axis=1), beta


def dense_self_loop_adjacency(num_nodes: int, dtype=jnp.float32):
    """The reference's clip-graph adjacency (models.py:114-119).

    All-ones graph + self loops, row-normalized: off-diagonal 1/(n+1),
    diagonal 2/(n+1) — strictly positive, so GAT's adj>0 mask is a no-op.
    Built with plain jnp instead of scipy sparse.
    """
    n = num_nodes
    adj = jnp.full((n, n), 1.0 / (n + 1), dtype) + jnp.eye(n, dtype=dtype) / (n + 1)
    return adj
