"""Query attention / punishment scores / context aggregation.

Reference semantics:

* ``QueryAttn`` (model/utils.py:60-84): Linear(768->768) on the dynamic
  question embedding, L2-normalize the last dim, Linear(768->1), softmax
  over the sequence, THEN zero out padded positions and renormalize by
  (sum + 1e-5) — the reference masks after the softmax, and we reproduce
  that order. The per-sample Python mask loop with a hardcoded 'cuda:1'
  device (model/utils.py:72-75) becomes a vectorized iota mask. The attended
  sum is over the raw 300-d word embeddings.
* ``QueryPunish`` (model/utils.py:86-105): Linear(300->768) of the guided
  query, scores = sigmoid(visual . query) per clip, broadcast to
  module_dim // 4 = per-head GAT width.
* ``ContextSelfAttn`` (model/AnswerDecoder.py:155-182): dropout(0.15) ->
  Linear proj -> ELU -> Linear -> 1 -> softmax over clips -> weighted sum of
  the (post-dropout) visual features.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _l2_normalize(x, axis=-1, eps=1e-12):
    """torch F.normalize(p=2) with a NaN-safe backward.

    Clamping the *sum of squares* before rsqrt keeps the gradient finite at
    exactly-zero rows (which occur at padded positions when biases are zero
    at init); clamping the norm after sqrt does not (0 * inf = nan).
    """
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(sq, eps * eps))


class QueryAttn(nn.Module):
    """Question-guided query re-reading (reference model/utils.py:60-84)."""

    module_dim: int = 768

    @nn.compact
    def __call__(self, word_embedding, dynamic_question_embedding, question_len):
        """word_embedding: (B, T, word_dim); dynamic: (B, T, module_dim);
        question_len: (B,). Returns (guided query (B, word_dim), attn (B, T))."""
        x = nn.Dense(
            self.module_dim,
            kernel_init=nn.initializers.xavier_uniform(),
            name="feat_enhance",
        )(dynamic_question_embedding)
        x = _l2_normalize(x, axis=-1)
        attn = nn.Dense(
            1, kernel_init=nn.initializers.xavier_uniform(), name="fc"
        )(x)[..., 0]
        attn = jax.nn.softmax(attn, axis=1)  # (B, T): softmax BEFORE masking
        t = dynamic_question_embedding.shape[1]
        steps = jnp.arange(t, dtype=jnp.int32)[None, :]
        mask = (steps < question_len[:, None].astype(jnp.int32)).astype(attn.dtype)
        attn = attn * mask
        attn = attn / (attn.sum(axis=1, keepdims=True) + 1e-5)
        guided = jnp.einsum("bt,btd->bd", attn, word_embedding)
        return guided, attn


class QueryPunish(nn.Module):
    """Per-clip sigmoid relevance scores (reference model/utils.py:86-105)."""

    module_dim: int = 768

    @nn.compact
    def __call__(self, question_guided, visual_feature):
        """question_guided: (B, word_dim); visual_feature: (B, N, module_dim).
        Returns scores (B, N, module_dim // 4) — sized to one GAT head."""
        query = nn.Dense(
            self.module_dim,
            kernel_init=nn.initializers.xavier_uniform(),
            name="query_weight",
        )(question_guided)
        scores = jax.nn.sigmoid(
            jnp.einsum("bnd,bd->bn", visual_feature, query)
        )  # (B, N)
        head_dim = visual_feature.shape[-1] // 4
        return jnp.broadcast_to(
            scores[..., None], scores.shape + (head_dim,)
        )


class ContextSelfAttn(nn.Module):
    """Clip aggregation attention (reference model/AnswerDecoder.py:155-182)."""

    module_dim: int = 768
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, visual_feat, *, train: bool):
        """visual_feat: (B, N, module_dim) -> (B, module_dim)."""
        from dualvgr_tpu.ops.precision import SDense, stream_dtype_of

        visual_feat = nn.Dropout(0.15, deterministic=not train)(visual_feat)
        v = SDense(
            self.module_dim,
            use_bias=False,
            stream=stream_dtype_of(self.compute_dtype),
            name="v_proj",
        )(visual_feat)
        v = nn.elu(v)
        attn = nn.Dense(
            1, kernel_init=nn.initializers.xavier_uniform(), name="attn"
        )(v)
        attn = jax.nn.softmax(attn, axis=1)  # (B, N, 1)
        return (attn * visual_feat).sum(axis=1)
