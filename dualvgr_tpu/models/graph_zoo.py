"""Graph zoo: the reference's unused graph modules + adjacency helpers.

TPU-idiomatic ports of reference model/GraphNN.py's dead code, for
component parity (the live graph modules — PunishGAT / AttentionSFGCN /
GraphConvolution / PunishGCN — are in dualvgr_tpu/models/graph.py):

* ``GAT`` / unpunished attention layer (GraphNN.py:181-281): same additive
  reformulation as PunishGAT — a([Wh_i || Wh_j]) = a_src.Wh_i + a_dst.Wh_j
  + b — never materializing the reference's (B, N, N, 2d) pairwise-concat
  tensor, all heads in one merged matmul.
* ``construct_graph`` KNN adjacency (GraphNN.py:289-300): cosine top-k via
  ``jax.lax.top_k`` + one-hot scatter instead of sklearn + Python loops.
* ``process_adj`` (GraphNN.py:48-74): degree count, D^-1/2 via rsqrt (the
  reference inverts a Cholesky of the diagonal degree matrix — identical
  result), A_hat = A + I.
* ``GINLayer`` / ``GatedGATLayer`` / ``GatedGCNLayer``
  (GraphNN.py:303-448, 'ginLayer'/'gatLayer'/'gcnLayer'): multi-relation
  gated message passing; the per-relation Linears run as stacked einsums.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from dualvgr_tpu.models.graph import PunishGAT


class GAT(nn.Module):
    """Unpunished multi-head GAT (reference GraphNN.py:246-281 'GAT' over
    :181-244 'GraphAttentionLayer'): input dropout, per-head ELU + concat,
    output dropout — exactly PunishGAT with the punishment gate disabled
    (the punished layer differs only by its value gating, GraphNN.py:102-108).
    """

    n_heads: int = 4
    head_dim: int = 192
    in_dim: int = 768
    dropout: float = 0.15
    alpha: float = 0.01

    def setup(self):
        self.inner = PunishGAT(
            self.n_heads, self.head_dim, self.in_dim, self.dropout, self.alpha,
            name="inner",
        )

    def __call__(self, h, adj, *, train: bool = False):
        return self.inner(h, adj, None, train=train)


def construct_graph(features, topk: int):
    """KNN adjacency from cosine similarity (reference GraphNN.py:289-300).

    features: (N, D). Returns (N, N) float 0/1 with A[i, j] = 1 for the
    topk+1 most cosine-similar nodes of i (self included, like the
    reference's argpartition over the full similarity row).
    """
    x = jnp.asarray(features)
    norm = jnp.sqrt(jnp.maximum(jnp.sum(x * x, axis=1, keepdims=True), 1e-24))
    xn = x / norm
    sim = xn @ xn.T  # (N, N) cosine similarity
    n = sim.shape[0]
    k = min(topk + 1, n)
    _, idx = jax.lax.top_k(sim, k)  # (N, k)
    return jax.nn.one_hot(idx, n, dtype=x.dtype).sum(axis=1)


def process_adj(adj):
    """(A_hat, D^-1/2) for GCN normalization (reference GraphNN.py:48-74).

    Degrees count exact-1 entries per row plus the self loop; the
    reference's inv(cholesky(diag(deg))) is just diag(deg^-1/2).
    """
    a = jnp.asarray(adj, jnp.float32)
    degrees = (a == 1.0).sum(axis=1).astype(jnp.float32) + 1.0
    d = jnp.diag(jax.lax.rsqrt(degrees))
    a_hat = a + jnp.eye(a.shape[0], dtype=a.dtype)
    return a_hat, d


class _RelDense(nn.Module):
    """One Dense per relation, applied as a stacked einsum."""

    num_rel: int
    in_dim: int
    out_dim: int
    dropout: float

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        """x: (B, N, in_dim) -> (B, R, N, out_dim)."""
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.num_rel, self.in_dim, self.out_dim),
        )
        b = self.param("bias", nn.initializers.zeros, (self.num_rel, self.out_dim))
        y = jnp.einsum("bnd,rde->brne", x, w) + b[None, :, None, :]
        return nn.Dropout(self.dropout, deterministic=not train)(y)


class GINLayer(nn.Module):
    """Gated multi-relation GIN (reference GraphNN.py:303-347 'ginLayer').

    Per hop: neighbor sum per relation, (1+eps) self term, per-(hop,
    relation) MLP, mean over relations, sigmoid gate vs the running state.
    Requires input_dim == proj_dim for the residual gate (as in the
    reference's actual use).
    """

    input_dim: int
    proj_dim: int = 512
    dropout: float = 0.1
    num_hop: int = 3
    num_rel: int = 3

    def setup(self):
        self.epsilon = self.param("epsilon", nn.initializers.zeros, (1,))
        # one MLP per (hop, relation) like the reference's mlp{i}{j}
        self.mlps = [
            [
                nn.Dense(self.proj_dim, name=f"mlp{i + 1}{j + 1}")
                for j in range(self.num_rel)
            ]
            for i in range(self.num_hop)
        ]
        self.fa = nn.Dense(self.proj_dim, name="fa")  # ONE shared gate
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, x, input_mask, adj, *, train: bool = False):
        """x: (B, N, D); input_mask: (B, N); adj: (B, R, N, N)."""
        mask = input_mask[..., None]
        cur = x
        for i in range(self.num_hop):
            multi = jnp.broadcast_to(
                cur[:, None], (cur.shape[0], self.num_rel) + cur.shape[1:]
            )
            nb = jnp.einsum("brnm,brmd->brnd", adj, multi) * mask[:, None]
            cur_update = (1.0 + self.epsilon) * multi + nb
            per_rel = [
                self.drop(
                    nn.relu(self.mlps[i][j](cur_update[:, j])),
                    deterministic=not train,
                )
                for j in range(self.num_rel)
            ]
            update = jnp.stack(per_rel, axis=1).mean(axis=1) * mask
            gate_in = jnp.concatenate([update, cur], axis=-1)
            gate = jax.nn.sigmoid(
                self.drop(self.fa(gate_in), deterministic=not train)
            ) * mask
            cur = gate * update + (1.0 - gate) * cur
        return cur


class GatedGATLayer(nn.Module):
    """Scaled-dot multi-relation gated GAT (reference GraphNN.py:350-409
    'gatLayer'): per relation, attention = softmax(masked (fa x) x^T /
    sqrt(d)); update = sum_r attn (adj (fr x)) + fs x; tanh + sigmoid gate.
    Parameters are shared across hops like the reference.
    """

    input_dim: int
    proj_dim: int = 512
    dropout: float = 0.1
    num_hop: int = 3
    num_rel: int = 2

    def setup(self):
        self.fr = _RelDense(self.num_rel, self.input_dim, self.proj_dim, self.dropout, name="fr")
        self.fa = [
            nn.Dense(self.input_dim, use_bias=False, name=f"fa{j + 1}")
            for j in range(self.num_rel)
        ]
        self.fs = nn.Dense(self.proj_dim, name="fs")
        self.fg = nn.Dense(self.proj_dim, name="fg")
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, x, input_mask, adj, *, train: bool = False):
        """x: (B, N, D); input_mask: (B, N); adj: (B, R, N, N)."""
        mask = input_mask[..., None]
        scale = 1.0 / jnp.sqrt(jnp.asarray(self.input_dim, x.dtype))
        cur = x
        for _ in range(self.num_hop):
            att = jnp.stack(
                [
                    jax.nn.softmax(
                        jnp.where(
                            adj[:, j] > 0,
                            jnp.einsum("bnd,bmd->bnm", self.fa[j](cur), cur) * scale,
                            -9e15,
                        ),
                        axis=-1,
                    )
                    for j in range(self.num_rel)
                ],
                axis=1,
            )  # (B, R, N, N)
            nb = self.fr(cur, train=train) * mask[:, None]  # (B, R, N, P)
            update = jnp.einsum(
                "brnm,brmd->bnd", att, jnp.einsum("brnm,brmd->brnd", adj, nb)
            )
            update = update + self.drop(self.fs(cur), deterministic=not train) * mask
            gate_in = jnp.concatenate([update, cur], axis=-1)
            gate = jax.nn.sigmoid(
                self.drop(self.fg(gate_in), deterministic=not train)
            ) * mask
            cur = gate * jnp.tanh(update) + (1.0 - gate) * cur
        return cur


class GatedGCNLayer(nn.Module):
    """Entity-GCN-style gated multi-relation GCN (reference
    GraphNN.py:411-448 'gcnLayer'); parameters shared across hops."""

    input_dim: int
    proj_dim: int = 512
    dropout: float = 0.1
    num_hop: int = 3
    num_rel: int = 2

    def setup(self):
        self.fr = _RelDense(self.num_rel, self.input_dim, self.proj_dim, self.dropout, name="fr")
        self.fs = nn.Dense(self.proj_dim, name="fs")
        self.fa = nn.Dense(self.proj_dim, name="fa")
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, x, adj, *, train: bool = False):
        """x: (B, N, D); adj: (B, R, N, N)."""
        cur = x
        for _ in range(self.num_hop):
            nb = self.fr(cur, train=train)  # (B, R, N, P)
            update = jnp.einsum("brnm,brmd->bnd", adj, nb)
            update = update + self.drop(self.fs(cur), deterministic=not train)
            gate_in = jnp.concatenate([update, cur], axis=-1)
            gate = jax.nn.sigmoid(self.drop(self.fa(gate_in), deterministic=not train))
            cur = gate * jnp.tanh(update) + (1.0 - gate) * cur
        return cur
