"""Auxiliary-loss parity vs direct torch implementations of the DualVGR paper
formulas (covariance common loss, HSIC dependence — reference utils.py:10-31),
plus masked-batch semantics."""

import numpy as np
import torch

import jax.numpy as jnp

from dualvgr_tpu.ops.losses import (
    common_loss,
    cross_entropy_loss,
    dualvgr_total_loss,
    hsic_dependence_loss,
)


def torch_common_loss(emb1, emb2):
    emb1 = emb1 - emb1.mean(dim=1, keepdim=True)
    emb2 = emb2 - emb2.mean(dim=1, keepdim=True)
    emb1 = torch.nn.functional.normalize(emb1, p=2, dim=2)
    emb2 = torch.nn.functional.normalize(emb2, p=2, dim=2)
    cov1 = torch.bmm(emb1, emb1.transpose(1, 2))
    cov2 = torch.bmm(emb2, emb2.transpose(1, 2))
    return torch.mean((cov1 - cov2) ** 2)


def torch_hsic(emb1, emb2, dim):
    bs = emb1.size(0)
    r = torch.eye(dim) - (1.0 / dim) * torch.ones(dim, dim)
    k1 = torch.bmm(emb1, emb1.transpose(1, 2))
    k2 = torch.bmm(emb2, emb2.transpose(1, 2))
    rk1 = torch.bmm(r.expand_as(k1), k1)
    rk2 = torch.bmm(r.expand_as(k2), k2)
    ans = torch.bmm(rk1, rk2)
    return sum(torch.trace(ans[i]) for i in range(bs))


def test_common_loss_matches_torch(rng):
    e1 = rng.randn(5, 6, 9).astype(np.float32)
    e2 = rng.randn(5, 6, 9).astype(np.float32)
    got = float(common_loss(jnp.asarray(e1), jnp.asarray(e2)))
    want = float(torch_common_loss(torch.from_numpy(e1), torch.from_numpy(e2)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_hsic_matches_torch(rng):
    e1 = rng.randn(4, 6, 7).astype(np.float32)
    e2 = rng.randn(4, 6, 7).astype(np.float32)
    got = float(hsic_dependence_loss(jnp.asarray(e1), jnp.asarray(e2), 6))
    want = float(torch_hsic(torch.from_numpy(e1), torch.from_numpy(e2), 6))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_cross_entropy_matches_torch(rng):
    logits = rng.randn(8, 11).astype(np.float32)
    labels = rng.randint(0, 11, (8,))
    got = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    want = float(
        torch.nn.functional.cross_entropy(
            torch.from_numpy(logits), torch.from_numpy(labels)
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_masked_equals_unpadded(rng):
    """Losses on a padded batch with valid mask == losses on the true batch."""
    true_b, pad_b = 5, 8
    e1 = rng.randn(pad_b, 4, 6).astype(np.float32)
    e2 = rng.randn(pad_b, 4, 6).astype(np.float32)
    logits = rng.randn(pad_b, 7).astype(np.float32)
    labels = rng.randint(0, 7, (pad_b,))
    valid = np.zeros((pad_b,), np.float32)
    valid[:true_b] = 1.0

    ce_m = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(valid)))
    ce_u = float(cross_entropy_loss(jnp.asarray(logits[:true_b]), jnp.asarray(labels[:true_b])))
    np.testing.assert_allclose(ce_m, ce_u, rtol=1e-6)

    cl_m = float(common_loss(jnp.asarray(e1), jnp.asarray(e2), jnp.asarray(valid)))
    cl_u = float(common_loss(jnp.asarray(e1[:true_b]), jnp.asarray(e2[:true_b])))
    np.testing.assert_allclose(cl_m, cl_u, rtol=1e-5)

    h_m = float(hsic_dependence_loss(jnp.asarray(e1), jnp.asarray(e2), 4, jnp.asarray(valid)))
    h_u = float(hsic_dependence_loss(jnp.asarray(e1[:true_b]), jnp.asarray(e2[:true_b]), 4))
    np.testing.assert_allclose(h_m, h_u, rtol=1e-4)


def test_total_loss_weighting(rng):
    """total = CE + alpha*mean(common) + beta*mean(dep) over T entries
    (reference train.py:147-154)."""
    t, b, n, d = 3, 4, 5, 6
    aqf = jnp.asarray(rng.randn(t, b, n, d).astype(np.float32))
    ca = jnp.asarray(rng.randn(t, b, n, d).astype(np.float32))
    mqf = jnp.asarray(rng.randn(t, b, n, d).astype(np.float32))
    cm = jnp.asarray(rng.randn(t, b, n, d).astype(np.float32))
    logits = jnp.asarray(rng.randn(b, 9).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 9, (b,)))

    alpha, beta = 0.7, 1e-6
    total, aux = dualvgr_total_loss(
        logits, labels, aqf, ca, mqf, cm, alpha=alpha, beta=beta, num_of_nodes=n
    )
    com = np.mean([float(common_loss(ca[i], cm[i])) for i in range(t)])
    dep = np.mean(
        [
            float(hsic_dependence_loss(aqf[i], ca[i], n))
            + float(hsic_dependence_loss(mqf[i], cm[i], n))
            for i in range(t)
        ]
    )
    ce = float(cross_entropy_loss(logits, labels))
    np.testing.assert_allclose(float(total), ce + alpha * com + beta * dep, rtol=1e-4)
    np.testing.assert_allclose(float(aux["common"]), com, rtol=1e-5)
