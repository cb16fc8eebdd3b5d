"""Fused DualVGR graph-reasoning cycle as a single Pallas TPU kernel.

Fuses, for one visual stream, the whole per-cycle clip-graph computation the
reference spreads over four module calls and a dozen HBM round-trips
(reference models.py:150-169):

    common  = punishGAT_c(h, adj, scores)      # 4-head, punished values
    spec    = punishGAT_s(h, adj, scores)
    fused   = AttentionSFGCN([common, spec])   # 2-way soft attention
    out     = h + fused                        # residual

One kernel invocation reasons over a whole block of videos' clip graphs:
the (B, N, D) stream features stay in VMEM across both GATs, the pairwise
attention, the punishment gating, the 2-way fusion, and the residual add.
The N x N attention over N <= 20 clips uses the additive-logit form
(e_ij = a_src . Wh_i + a_dst . Wh_j + b), never materializing the
reference's (B, N, N, 2d) pairwise-concat tensor (GraphNN.py:115-155).

The adjacency is the reference's strictly-positive dense matrix
(models.py:114-119), so its >0 mask is a no-op and is elided here — full
softmax over all N clips (SURVEY.md section 2.3).

Shapes are MXU-aligned: the two weight matmuls are (TB*N, 768) @ (768, 768);
the tiny N x N x head ops run on the VPU. Used on the inference path (the
training path keeps the XLA composition for autodiff); equivalence is
tested in interpret mode against the flax modules (tests/test_pallas.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gat_block(x2, scores2, tb, n, heads, hd, w, b, a_src, a_dst, a_bias, alpha):
    """One punished multi-head GAT over a (TB*N, D) block. Returns (TB*N, D)."""
    wh = jnp.dot(x2, w, preferred_element_type=jnp.float32) + b  # (TB*N, H*hd)
    outs = []
    for h in range(heads):
        wh_h = wh[:, h * hd : (h + 1) * hd]  # (TB*N, hd)
        src = jnp.dot(wh_h, a_src[h][:, None], preferred_element_type=jnp.float32)
        dst = jnp.dot(wh_h, a_dst[h][:, None], preferred_element_type=jnp.float32)
        src = src.reshape(tb, n)
        dst = dst.reshape(tb, n)
        e = src[:, :, None] + dst[:, None, :] + a_bias[h]  # (TB, N, N)
        e = jnp.where(e >= 0, e, alpha * e)  # LeakyReLU
        e = e - jnp.max(e, axis=-1, keepdims=True)
        p = jnp.exp(e)
        attn = p / jnp.sum(p, axis=-1, keepdims=True)
        gated = (wh_h * scores2).reshape(tb, n, hd)
        out_h = jax.lax.dot_general(
            attn, gated,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (TB, N, hd)
        outs.append(out_h.reshape(tb * n, hd))
    out = jnp.concatenate(outs, axis=-1)  # (TB*N, H*hd)
    return jnp.where(out > 0, out, jnp.exp(jnp.minimum(out, 0.0)) - 1.0)  # ELU


def _cycle_kernel(
    h_ref, scores_ref,
    wc_ref, bc_ref, ac_src_ref, ac_dst_ref, ac_b_ref,
    ws_ref, bs_ref, as_src_ref, as_dst_ref, as_b_ref,
    proj_w_ref, proj_b_ref, score_w_ref,
    out_ref, common_ref, spec_ref,
    *, n, heads, hd, alpha,
):
    tb = h_ref.shape[0]
    d = h_ref.shape[2]
    x2 = h_ref[:].reshape(tb * n, d)
    scores2 = scores_ref[:].reshape(tb * n, hd)

    common = _gat_block(
        x2, scores2, tb, n, heads, hd,
        wc_ref[:], bc_ref[:], ac_src_ref[:], ac_dst_ref[:], ac_b_ref[:], alpha,
    )
    spec = _gat_block(
        x2, scores2, tb, n, heads, hd,
        ws_ref[:], bs_ref[:], as_src_ref[:], as_dst_ref[:], as_b_ref[:], alpha,
    )

    # AttentionSFGCN over the [common, spec] pair without materializing the
    # stack: softmax over 2 entries == sigmoid of the score difference.
    def score(z):
        t = jnp.tanh(jnp.dot(z, proj_w_ref[:], preferred_element_type=jnp.float32) + proj_b_ref[:])
        return jnp.dot(t, score_w_ref[:], preferred_element_type=jnp.float32)  # (TB*N, 1)

    s_c = score(common)
    s_s = score(spec)
    beta_c = jax.nn.sigmoid(s_c - s_s)
    fused = beta_c * common + (1.0 - beta_c) * spec
    out_ref[:] = h_ref[:] + fused.reshape(tb, n, d)
    # the true per-cycle GAT embeddings, consumed by the auxiliary losses
    common_ref[:] = common.reshape(tb, n, d)
    spec_ref[:] = spec.reshape(tb, n, d)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def fused_gat_cycle(
    h, scores,
    wc, bc, ac, ac_bias,
    ws, bs, a_s, as_bias,
    proj_w, proj_b, score_w,
    *, block_b: int = 8, interpret: bool = False,
):
    """h: (B, N, D); scores: (B, N, hd). GAT params: w (D, H*hd) merged-head
    kernel, b (H*hd,), a (H, 2*hd), a_bias (H,). SFGCN params: proj_w (D, D),
    proj_b (D,), score_w (D, 1).

    Returns (out, common, spec): out = h + SFGCN([GATc(h), GATs(h)]) plus the
    true common/specific GAT embeddings (each (B, N, D)) — the same values
    the XLA composition feeds the auxiliary losses, written straight from
    VMEM so the fused path's aux outputs are exact, not reconstructed.
    """
    b, n, d = h.shape
    heads = ac.shape[0]
    hd = ac.shape[1] // 2
    alpha = 0.01

    block_b = min(block_b, b)
    pad = (-b) % block_b
    if pad:
        h = jnp.concatenate([h, h[:pad]], axis=0)
        scores = jnp.concatenate([scores, scores[:pad]], axis=0)
    bp = h.shape[0]

    ac_src, ac_dst = ac[:, :hd], ac[:, hd:]
    as_src, as_dst = a_s[:, :hd], a_s[:, hd:]

    kernel = functools.partial(_cycle_kernel, n=n, heads=heads, hd=hd, alpha=alpha)
    grid = (bp // block_b,)

    def batch_spec():
        return pl.BlockSpec(
            (block_b, n, None), lambda i: (i, 0, 0), memory_space=pltpu.ANY
        )

    # batch-blocked inputs
    h_spec = pl.BlockSpec((block_b, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((block_b, n, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    def wspec(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    flops_per_block = 2 * (block_b * n) * d * (heads * hd) * 2 + 2 * (block_b * n) * d * d
    shape = jax.ShapeDtypeStruct((bp, n, d), h.dtype)
    out, common, spec = pl.pallas_call(
        kernel,
        out_shape=(shape, shape, shape),
        grid=grid,
        in_specs=[
            h_spec, s_spec,
            wspec(wc.shape), wspec(bc.shape), wspec(ac_src.shape), wspec(ac_dst.shape), wspec(ac_bias.shape),
            wspec(ws.shape), wspec(bs.shape), wspec(as_src.shape), wspec(as_dst.shape), wspec(as_bias.shape),
            wspec(proj_w.shape), wspec(proj_b.shape), wspec(score_w.shape),
        ],
        out_specs=(h_spec, h_spec, h_spec),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_block * grid[0], bytes_accessed=h.size * 4 * 4, transcendentals=bp * n * n * heads
        ),
        interpret=interpret,
    )(
        h, scores,
        wc, bc, ac_src, ac_dst, ac_bias,
        ws, bs, as_src, as_dst, as_bias,
        proj_w, proj_b, score_w,
    )
    return out[:b], common[:b], spec[:b]
