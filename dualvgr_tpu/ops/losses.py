"""Training losses: cross entropy + the two DualVGR auxiliary losses.

Reference semantics (reference utils.py:10-31, train.py:146-154):

* ``common_loss(emb1, emb2)``: center each embedding over the node dim,
  L2-normalize rows, compare node-covariance matrices with MSE.
* ``loss_dependence(emb1, emb2, N)``: HSIC independence penalty with linear
  kernels K = emb @ emb^T and centering matrix R = I - (1/N) 11^T, summed
  over the batch: sum_b tr(R K1 R K2).

Both are expressed as batched matmuls/einsums (MXU work, no Python loops —
the reference loops ``torch.trace`` per batch element, utils.py:28-30).
``tr(A @ B) == sum(A * B^T)`` avoids materializing the product.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def cross_entropy_loss(logits, labels, valid=None):
    """Mean softmax cross entropy over the batch (torch nn.CrossEntropyLoss).

    ``valid`` (B,) masks padding rows of the final partial batch so the mean
    is over exactly the true samples, like the reference's ragged last batch.
    """
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    if valid is None:
        return ce.mean()
    return (ce * valid).sum() / jnp.maximum(valid.sum(), 1.0)


def common_loss(emb1, emb2, valid=None):
    """MSE between normalized node-covariance matrices (reference utils.py:10-18).

    emb*: (B, N, D). Returns a scalar (masked mean over valid samples).
    """
    emb1 = emb1 - emb1.mean(axis=1, keepdims=True)
    emb2 = emb2 - emb2.mean(axis=1, keepdims=True)
    # clamp the sum of squares BEFORE rsqrt: keeps the backward finite for
    # exactly-zero rows (clamping the norm after sqrt yields 0 * inf = nan)
    emb1 = emb1 * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(emb1 * emb1, axis=2, keepdims=True), 1e-24)
    )
    emb2 = emb2 * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(emb2 * emb2, axis=2, keepdims=True), 1e-24)
    )
    cov1 = jnp.einsum("bnd,bmd->bnm", emb1, emb1)
    cov2 = jnp.einsum("bnd,bmd->bnm", emb2, emb2)
    per_sample = jnp.mean((cov1 - cov2) ** 2, axis=(1, 2))
    if valid is None:
        return per_sample.mean()
    return (per_sample * valid).sum() / jnp.maximum(valid.sum(), 1.0)


def hsic_dependence_loss(emb1, emb2, num_nodes: int, valid=None):
    """HSIC independence penalty summed over batch (reference utils.py:20-31).

    emb*: (B, N, D) with N == num_nodes. Returns a scalar:
    sum_b tr(R K1_b R K2_b) with R = I - (1/N) 11^T. Padding rows (valid=0)
    are zeroed out, contributing exactly 0 to the sum.
    """
    n = num_nodes
    if valid is not None:
        emb1 = emb1 * valid[:, None, None]
        emb2 = emb2 * valid[:, None, None]
    r = jnp.eye(n, dtype=emb1.dtype) - (1.0 / n) * jnp.ones((n, n), emb1.dtype)
    k1 = jnp.einsum("bnd,bmd->bnm", emb1, emb1)
    k2 = jnp.einsum("bnd,bmd->bnm", emb2, emb2)
    rk1 = jnp.einsum("nm,bmk->bnk", r, k1)
    rk2 = jnp.einsum("nm,bmk->bnk", r, k2)
    # tr(RK1 @ RK2) = sum_{ij} RK1[i,j] * RK2[j,i]
    return jnp.einsum("bij,bji->", rk1, rk2)


def dualvgr_total_loss(
    logits,
    labels,
    aq_fusion,
    com_app,
    mq_fusion,
    com_motion,
    *,
    alpha: float,
    beta: float,
    num_of_nodes: int,
    valid=None,
):
    """CE + alpha * mean(common) + beta * mean(HSIC dep) (reference train.py:146-154).

    aq_fusion/com_app/mq_fusion/com_motion: (T, B, N, D) stacks, one entry per
    (unit cycle x graph layer) — the JAX analogue of the reference's lists.
    Averaging over T matches the reference's ``/temp``.
    """
    ce = cross_entropy_loss(logits, labels, valid)
    t = aq_fusion.shape[0]

    def per_layer(i, acc):
        dep_acc, com_acc = acc
        dep = hsic_dependence_loss(aq_fusion[i], com_app[i], num_of_nodes, valid)
        dep = dep + hsic_dependence_loss(mq_fusion[i], com_motion[i], num_of_nodes, valid)
        com = common_loss(com_app[i], com_motion[i], valid)
        return dep_acc + dep, com_acc + com

    dep_total, com_total = jax.lax.fori_loop(
        0, t, per_layer, (jnp.zeros((), logits.dtype), jnp.zeros((), logits.dtype))
    )
    total = ce + alpha * com_total / t + beta * dep_total / t
    aux = {"ce": ce, "common": com_total / t, "dependence": dep_total / t}
    return total, aux
