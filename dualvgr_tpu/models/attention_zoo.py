"""Attention zoo: the reference's unused-but-functional attention classes.

TPU-idiomatic ports of reference model/Attention.py — provided for
component parity (nothing on the shipped DualVGR path uses them; the live
``AttentionSFGCN`` lives in dualvgr_tpu/models/graph.py). Classes whose
reference source cannot execute (undefined ``FCNet``/``adapt_scale``/
``args``, broken ``super()`` calls: SimpleSelfAttention,
ScaledDotProductAttentionSFGCN, CoAttention*) are omitted; ``Gated_NLT``
is included with plain Dense layers standing in for the reference's
undefined ``FCNet`` (model/Attention.py:329-341).

TPU reformulations vs the torch code:
* MultiHeadAttention keeps heads as a tensor axis (einsum) instead of the
  reference's permute/contiguous/view round-trips (Attention.py:84-100);
* TanhAttention's forward/backward causal masks are ``jnp.tril``/``triu``
  instead of Python loops building masks on 'cuda' (Attention.py:252-262);
* RNNEncoder reuses the masked-scan BiLSTM (ops/lstm.py) — no
  sort/pack/unsort host round-trip (Attention.py:244-262 of ref RNN path).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dualvgr_tpu.ops.lstm import LSTMParams, _xavier_uniform_torch_shape, bilstm, lstm_unroll


class ScaledDotProductAttention(nn.Module):
    """softmax(q k^T / temperature) v (reference Attention.py:25-47)."""

    temperature: float
    attn_dropout: float = 0.1

    @nn.compact
    def __call__(self, q, k, v, mask=None, *, train: bool = False):
        """q: (B, Lq, Dk); k: (B, Lk, Dk); v: (B, Lk, Dv);
        mask: optional (B, Lq, Lk) bool — True positions are masked OUT."""
        attn = jnp.einsum("bqd,bkd->bqk", q, k) / self.temperature
        if mask is not None:
            attn = jnp.where(mask, -jnp.inf, attn)
        attn = jax.nn.softmax(attn, axis=2)
        attn = nn.Dropout(self.attn_dropout, deterministic=not train)(attn)
        return jnp.einsum("bqk,bkd->bqd", attn, v), attn


class MultiHeadAttention(nn.Module):
    """Transformer MHA block with residual + LayerNorm
    (reference Attention.py:49-103). Head projections run as merged
    (d_model, H*d) matmuls; heads stay an einsum axis."""

    n_head: int
    d_model: int
    d_k: int
    d_v: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, q, k, v, mask=None, *, train: bool = False):
        h, dk, dv = self.n_head, self.d_k, self.d_v

        def proj(x, d, name):
            # torch init: normal(0, sqrt(2/(d_model+d)))  (Attention.py:61-63)
            std = float(np.sqrt(2.0 / (self.d_model + d)))
            y = nn.Dense(
                h * d,
                kernel_init=nn.initializers.normal(std),
                name=name,
            )(x)
            return y.reshape(*x.shape[:-1], h, d)

        residual = q
        qh = proj(q, dk, "w_qs")
        kh = proj(k, dk, "w_ks")
        vh = proj(v, dv, "w_vs")

        attn = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / float(np.power(dk, 0.5))
        if mask is not None:
            attn = jnp.where(mask[:, None], -jnp.inf, attn)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(0.1, deterministic=not train)(attn)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh)
        out = out.reshape(*q.shape[:-1], h * dv)
        out = nn.Dense(
            self.d_model,
            kernel_init=nn.initializers.xavier_normal(),
            name="fc",
        )(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return nn.LayerNorm(name="layer_norm")(out + residual), attn


class PositionwiseFeedForward(nn.Module):
    """Two position-wise layers + residual LayerNorm (Attention.py:105-122).
    The reference's 1x1 Conv1d over (B, D, T) is exactly a Dense over the
    feature axis — no transpose dance needed."""

    d_in: int
    d_hid: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        y = nn.Dense(self.d_hid, name="w_1")(x)
        y = nn.relu(y)
        y = nn.Dense(self.d_in, name="w_2")(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return nn.LayerNorm(name="layer_norm")(y + x)


class EncoderLayer(nn.Module):
    """MHA + position-wise FFN block (reference Attention.py:124-143)."""

    d_model: int
    d_inner: int
    n_head: int
    d_k: int
    d_v: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, q, k, v, non_pad_mask=None, slf_attn_mask=None, *, train: bool = False):
        out, attn = MultiHeadAttention(
            self.n_head, self.d_model, self.d_k, self.d_v, self.dropout,
            name="slf_attn",
        )(q, k, v, mask=slf_attn_mask, train=train)
        if non_pad_mask is not None:
            out = out * non_pad_mask
        out = PositionwiseFeedForward(
            self.d_model, self.d_inner, self.dropout, name="pos_ffn"
        )(out, train=train)
        if non_pad_mask is not None:
            out = out * non_pad_mask
        return out, attn


class AttentionC(nn.Module):
    """Question-gated channel attention (reference Attention.py:145-168,
    'Attention_C'): score = tanh(op v + proj(q)), sigmoid head-mix gate."""

    dim: int
    num_hid: int
    head: int = 16

    @nn.compact
    def __call__(self, v, q1):
        """v: (B, 1, num_hid); q1: (B, dim). Returns gated v (B, 1, num_hid)."""
        b = v.shape[0]
        op = self.param("op", nn.initializers.ones, (1, self.head, 1))
        q_proj = nn.Dense(self.num_hid, name="fc1")(q1).reshape(b, 1, self.num_hid)
        score = jnp.tanh(op * v + q_proj)  # (B, head, num_hid)
        score = score.transpose(0, 2, 1)  # (B, num_hid, head)
        weight = jax.nn.sigmoid(nn.Dense(1, name="w")(score)).transpose(0, 2, 1)
        return weight * v


class RNNEncoder(nn.Module):
    """Multi-layer BiLSTM text encoder (reference Attention.py:170-230).

    Same contract: returns (per-step outputs (B, T, dirs*H), final hidden
    states flattened to (B, layers*dirs*H) in [l0_fwd, l0_bwd, l1_fwd, ...]
    order, and the embedded inputs). Zero lengths are clamped to 1 like the
    reference's masked_fill; the masked scan replaces sort/pack/unsort.
    """

    word_size: int
    hidden_size: int
    bidirectional: bool = True
    n_layers: int = 2

    @nn.compact
    def __call__(self, embedded, input_lengths):
        lengths = jnp.maximum(input_lengths.astype(jnp.int32), 1)
        x = embedded
        finals = []
        h = self.hidden_size
        for layer in range(self.n_layers):
            d = x.shape[-1]

            def make(suffix):
                return LSTMParams(
                    self.param(f"w_ih_{suffix}", lambda k: _xavier_uniform_torch_shape(k, (4 * h, d))),
                    self.param(f"w_hh_{suffix}", lambda k: _xavier_uniform_torch_shape(k, (4 * h, h))),
                    self.param(f"b_ih_{suffix}", nn.initializers.zeros, (4 * h,)),
                    self.param(f"b_hh_{suffix}", nn.initializers.zeros, (4 * h,)),
                )

            if self.bidirectional:
                fwd, bwd = make(f"l{layer}_fwd"), make(f"l{layer}_bwd")
                x, final = bilstm(fwd, bwd, x, lengths)
                finals.append(final)
            else:
                fwd = make(f"l{layer}_fwd")
                x, final = lstm_unroll(fwd, x, lengths)
                finals.append(final)
        hidden = jnp.concatenate(finals, axis=-1)
        return x, hidden, embedded


class TanhAttention(nn.Module):
    """Additive cross attention with optional causal direction masks
    (reference Attention.py:232-264)."""

    d_model: int
    dropout: float = 0.0
    direction: str | None = None

    @nn.compact
    def __call__(self, x, memory, memory_mask=None, *, train: bool = False):
        """x: (B, L1, D); memory: (B, L2, D); memory_mask: (B, L2) 0/1."""
        item1 = nn.Dense(self.d_model, name="ws1")(x)
        item2 = nn.Dense(self.d_model, name="ws2")(memory)
        item = item1[:, :, None, :] + item2[:, None, :, :]  # (B, L1, L2, D)
        s = nn.Dense(1, name="wst")(jnp.tanh(item))[..., 0]  # (B, L1, L2)
        if memory_mask is not None:
            s = jnp.where(memory_mask[:, None, :] == 0, -1e30, s)
            l1 = s.shape[1]
            if self.direction == "forward":
                # row i attends to positions >= i (ref zeroes cols < i)
                keep = jnp.triu(jnp.ones((l1, l1), bool))
                s = jnp.where(keep[None], s, -1e30)
            elif self.direction == "backward":
                keep = jnp.tril(jnp.ones((l1, l1), bool))
                s = jnp.where(keep[None], s, -1e30)
        s = jax.nn.softmax(s, axis=-1)
        s = nn.Dropout(self.dropout, deterministic=not train)(s)
        return jnp.einsum("bqk,bkd->bqd", s, memory)


class WordAttention(nn.Module):
    """Context-scored word pooling with post-softmax padding mask
    (reference Attention.py:267-297) — same mask-after-softmax order as the
    live QueryAttn (dualvgr_tpu/models/attention.py)."""

    input_dim: int

    @nn.compact
    def __call__(self, context, embedded, input_labels):
        scores = nn.Dense(1, name="fc")(context)[..., 0]  # (B, T)
        attn = jax.nn.softmax(scores, axis=1)
        attn = attn * (input_labels != 0).astype(attn.dtype)
        attn = attn / (attn.sum(axis=1, keepdims=True) + 1e-5)
        weighted = jnp.einsum("bt,btd->bd", attn, embedded)
        return attn, weighted


class GatedNLT(nn.Module):
    """tanh(fc1 x) gated by tanh(fc2 x) (reference Attention.py:329-341,
    'Gated_NLT'; its FCNet dependency is undefined in the reference — plain
    Dense layers stand in)."""

    in_dim: int
    inner_dim: int

    @nn.compact
    def __call__(self, x):
        y = jnp.tanh(nn.Dense(self.inner_dim, name="fc1")(x))
        g = jnp.tanh(nn.Dense(self.inner_dim, name="fc2")(x))
        return g * y
