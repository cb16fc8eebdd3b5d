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
softmax over N <= 20 nodes.

Params are declared explicitly (``_declare``) so the fused Pallas cycle
kernel (dualvgr_tpu/ops/gat_pallas.py) can consume the exact same weights
on the inference path.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from dualvgr_tpu.models.init import xavier_uniform_fans


class PunishGAT(nn.Module):
    """Multi-head query-punished GAT (reference GraphNN.py:77-178).

    Params are declared in ``setup`` (not compact) so the parent unit stack
    can read them directly (``gat.w_kernel``) and route them into the fused
    Pallas cycle kernel while sharing the exact same weights.
    """

    n_heads: int = 4
    head_dim: int = 192  # module_dim // 4
    in_dim: int = 768
    dropout: float = 0.15
    alpha: float = 0.01  # LeakyReLU negative slope
    compute_dtype: str = "float32"

    def setup(self):
        nh, hd = self.n_heads, self.head_dim
        # per-head torch Linear(768, 192): fans (768, 192); per-head a is a
        # torch Linear(2*hd, 1): fans (2*hd, 1)
        self.w_kernel = self.param(
            "w_kernel", xavier_uniform_fans(self.in_dim, hd), (self.in_dim, nh, hd)
        )
        self.w_bias = self.param("w_bias", nn.initializers.zeros, (nh, hd))
        self.a = self.param("a", xavier_uniform_fans(2 * hd, 1), (nh, 2 * hd))
        self.a_bias = self.param("a_bias", nn.initializers.zeros, (nh,))
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, h, adj, scores, *, train: bool):
        """h: (B, N, D); adj: (N, N) (>0 everywhere in shipped configs);
        scores: (B, N, head_dim) punishment gates or None.

        Returns (B, N, n_heads * head_dim).
        """
        b, n, d = h.shape
        nh, hd = self.n_heads, self.head_dim
        w_kernel, w_bias, a, a_bias = self.w_kernel, self.w_bias, self.a, self.a_bias

        x = self.drop(h, deterministic=not train)

        # all heads in one (D, H*hd) matmul; per-head bias like nn.Linear;
        # bf16 operand streaming under compute_dtype (fp32 accumulate)
        from dualvgr_tpu.ops.precision import stream_dtype_of, streamed_matmul

        sd = stream_dtype_of(self.compute_dtype)
        wh = streamed_matmul(x, w_kernel.reshape(d, nh * hd), sd)
        wh = wh.reshape(b, n, nh, hd) + w_bias  # (B, N, H, hd)

        # additive attention: a([Wh_i || Wh_j]) = src_i + dst_j + b_a
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
        attn = self.drop(attn, deterministic=not train)
        out = jnp.einsum("bhij,bjhd->bihd", attn, wh)
        out = nn.elu(out)  # per-head ELU (concat=True path, GraphNN.py:110-111)
        out = out.reshape(b, n, nh * hd)
        return self.drop(out, deterministic=not train)


class AttentionSFGCN(nn.Module):
    """2-way soft attention over the [common, specific] stack
    (reference model/Attention.py:11-23; instantiated with hidden=module_dim
    at models.py:103-104)."""

    hidden: int = 768
    in_dim: int = 768
    compute_dtype: str = "float32"

    def setup(self):
        self.proj_kernel = self.param(
            "proj_kernel", nn.initializers.xavier_uniform(), (self.in_dim, self.hidden)
        )
        self.proj_bias = self.param("proj_bias", nn.initializers.zeros, (self.hidden,))
        self.score_kernel = self.param(
            "score_kernel", nn.initializers.xavier_uniform(), (self.hidden, 1)
        )

    def __call__(self, z):
        """z: (B, K, N, D) -> ((B, N, D), beta (B, K, N, 1))."""
        from dualvgr_tpu.ops.precision import stream_dtype_of, streamed_matmul

        sd = stream_dtype_of(self.compute_dtype)
        w = jnp.tanh(streamed_matmul(z, self.proj_kernel, sd) + self.proj_bias)
        w = w @ self.score_kernel
        beta = jax.nn.softmax(w, axis=1)
        return (beta * z).sum(axis=1), beta


class GraphConvolution(nn.Module):
    """Kipf-style GCN layer: adj @ (x @ W) (reference GraphNN.py:9-46).

    Init matches the reference's uniform(-1/sqrt(out), 1/sqrt(out)).
    """

    in_features: int
    out_features: int
    use_bias: bool = False

    def setup(self):
        stdv = 1.0 / (self.out_features ** 0.5)

        def init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -stdv, stdv)

        self.weight = self.param("weight", init, (self.in_features, self.out_features))
        self.bias = (
            self.param("bias", init, (self.out_features,)) if self.use_bias else None
        )

    def __call__(self, x, adj):
        support = x @ self.weight
        out = jnp.einsum("nm,...md->...nd", adj, support)
        return out + self.bias if self.bias is not None else out


class PunishGCN(nn.Module):
    """GCN-flavored punished graph module for ``graph_module: 'GCN'``.

    The reference declares the 'GCN' option (config.py:15) but never
    constructs the modules for it, so selecting it crashes at forward
    (models.py:94-100 builds only the GAT banks). This makes the option
    functional: relu(adj @ ((x * scores) @ W)) with dropout, where the
    per-clip punishment scalar (QueryPunish's sigmoid, model/utils.py:92-105)
    gates the node features before aggregation — the same role it plays in
    PunishGraphAttentionLayer (GraphNN.py:102-108).
    """

    dim: int = 768
    dropout: float = 0.15

    def setup(self):
        self.gc = GraphConvolution(self.dim, self.dim, name="gc1")
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, h, adj, scores, *, train: bool):
        if scores is not None:
            # scores arrive broadcast to head_dim (B, N, dim//4); the gate is
            # the same per-clip scalar in every column — take one column
            h = h * scores[..., :1]
        x = nn.relu(self.gc(h, adj))
        return self.drop(x, deterministic=not train)


def dense_self_loop_adjacency(num_nodes: int, dtype=jnp.float32):
    """The reference's clip-graph adjacency (models.py:114-119).

    All-ones graph + self loops, row-normalized: off-diagonal 1/(n+1),
    diagonal 2/(n+1) — strictly positive, so GAT's adj>0 mask is a no-op.
    Built with plain jnp instead of scipy sparse.
    """
    n = num_nodes
    adj = jnp.full((n, n), 1.0 / (n + 1), dtype) + jnp.eye(n, dtype=dtype) / (n + 1)
    return adj
