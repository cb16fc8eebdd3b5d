"""Model-utils zoo: the reference's unused helpers (model/utils.py:35-127).

* ``mean_x`` / ``pca`` — numpy PCA helpers (reference :35-54), eigh on the
  covariance instead of ``np.matrix`` algebra (deprecated), same projection.
* ``l2norm`` — row normalization (reference :56-58; the torch original
  divides by a norm without keepdim, which only broadcasts by accident —
  implemented here with keepdims, which is what every call site intends).
* ``VisualEnhanceByQuery`` — cross-modal gated MFB enhancement
  (reference :107-127), composing the attention-zoo TanhAttention with the
  live MFB fusion.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import numpy as np

from dualvgr_tpu.models.attention_zoo import TanhAttention
from dualvgr_tpu.models.fusion import MFB


def mean_x(data):
    """Column means (reference model/utils.py:35-36 'meanX')."""
    return np.mean(np.asarray(data), axis=0)


def pca(x, k: int):
    """Project (m, n) data onto its top-k principal components
    (reference model/utils.py:38-54). Returns (m, k)."""
    x = np.asarray(x, dtype=np.float64)
    m, n = x.shape
    if k > n:
        raise ValueError(f"k={k} must not exceed the feature count {n}")
    centered = x - mean_x(x)
    cov = np.cov(centered.T)
    vals, vecs = np.linalg.eigh(cov)  # symmetric: eigh, ascending
    order = np.argsort(-vals)
    select = vecs[:, order[:k]]  # (n, k)
    return x @ select


def l2norm(x, axis: int = 2, eps: float = 1e-12):
    """Divide by the L2 norm along ``axis`` (reference model/utils.py:56-58)."""
    import jax.numpy as jnp

    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(sq, eps * eps))


class VisualEnhanceByQuery(nn.Module):
    """Text->visual gated MFB enhancement (reference model/utils.py:107-127,
    unused): t2v = TanhAttention(visual, question); each stream gated by a
    sigmoid Linear of the other; MFB-fused."""

    module_dim: int = 768

    @nn.compact
    def __call__(self, dynamic_question_embedding, visual_embedding, *, train: bool = False):
        """dynamic_question_embedding: (B, T, D); visual_embedding: (B, N, D)
        -> (B, N, D)."""
        t2v = TanhAttention(self.module_dim, name="t2v")(
            visual_embedding, dynamic_question_embedding, train=train
        )
        gate = lambda name: nn.Dense(
            self.module_dim, use_bias=False,
            kernel_init=nn.initializers.xavier_uniform(), name=name,
        )
        text_gate = jax.nn.sigmoid(gate("gate1")(t2v))
        visual_final = text_gate * visual_embedding
        visual_gate = jax.nn.sigmoid(gate("gate2")(visual_embedding))
        text_final = visual_gate * t2v
        return MFB(self.module_dim, name="tv_fusion")(text_final, visual_final)
