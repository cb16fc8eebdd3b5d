"""Open-ended answer classifier (reference model/AnswerDecoder.py:184-202).

q' = Linear(q); concat [visual, q'] -> Dropout(0.15) -> Linear(2D -> D) ->
ELU -> BatchNorm1d -> Dropout(0.15) -> Linear(D -> num_answers).

BatchNorm under data parallelism: the train step is jit-compiled over a
sharded global batch (dualvgr_tpu/parallel/mesh.py), so XLA computes the
batch statistics over the FULL global batch — exactly the single-device
reference semantics at batch 256, with the cross-replica reduction lowered
to an ICI all-reduce automatically. flax momentum 0.9 == torch momentum 0.1;
eps 1e-5 matches torch's default.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d with an optional per-sample weight mask.

    Matches torch nn.BatchNorm1d semantics (normalize with the biased batch
    variance, track running stats with the unbiased one, momentum 0.1 torch
    == 0.9 here, eps 1e-5) while excluding the padded rows the loader adds
    to the final partial batch — so batch statistics cover exactly the true
    samples, like the reference's ragged last batch.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, valid=None, *, train: bool):
        d = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((d,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((d,)))
        scale = self.param("scale", nn.initializers.ones, (d,))
        bias = self.param("bias", nn.initializers.zeros, (d,))

        if train:
            if valid is None:
                valid = jnp.ones((x.shape[0],), x.dtype)
            n = jnp.maximum(valid.sum(), 1.0)
            w = (valid / n)[:, None]
            mean = (w * x).sum(axis=0)
            var = (w * (x - mean) ** 2).sum(axis=0)  # biased, used to normalize
            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * unbiased
            use_mean, use_var = mean, var
        else:
            use_mean, use_var = ra_mean.value, ra_var.value
        y = (x - use_mean) * jax.lax.rsqrt(use_var + self.epsilon)
        return y * scale + bias


class OutputUnitOpenEnded(nn.Module):
    """SimpleOutputUnitOpenEnded (reference model/AnswerDecoder.py:184-202)."""

    module_dim: int = 768
    num_answers: int = 1000
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, question_embedding, visual_embedding, valid=None, *, train: bool):
        from dualvgr_tpu.ops.precision import SDense, stream_dtype_of

        sd = stream_dtype_of(self.compute_dtype)
        q = SDense(self.module_dim, stream=sd, name="question_proj")(
            question_embedding
        )
        out = jnp.concatenate([visual_embedding, q], axis=1)
        out = nn.Dropout(0.15, deterministic=not train)(out)
        out = SDense(self.module_dim, stream=sd, name="fc1")(out)
        out = nn.elu(out)
        out = MaskedBatchNorm(name="bn")(out, valid, train=train)
        out = nn.Dropout(0.15, deterministic=not train)(out)
        return SDense(self.num_answers, stream=sd, name="classifier")(out)


class ConcatELUAttn(nn.Module):
    """Question-conditioned visual distillation (reference
    model/AnswerDecoder.py:7-43, unused by the shipped model): attn over
    [v_proj, q_proj*v_proj] concat -> ELU -> softmax over clips ->
    weighted sum of the (post-dropout) visual features."""

    module_dim: int = 768

    @nn.compact
    def __call__(self, question_rep, visual_feat, *, train: bool = False):
        """question_rep: (B, D); visual_feat: (B, N, D) -> (B, D)."""
        visual_feat = nn.Dropout(0.15, deterministic=not train)(visual_feat)
        dense = lambda d, name, bias=True: nn.Dense(
            d, use_bias=bias, kernel_init=nn.initializers.xavier_uniform(), name=name
        )
        q = dense(self.module_dim, "q_proj", bias=False)(question_rep)[:, None]
        v = dense(self.module_dim, "v_proj", bias=False)(visual_feat)
        cat = jnp.concatenate([v, q * v], axis=-1)
        cat = nn.elu(dense(self.module_dim, "cat")(cat))
        attn = jax.nn.softmax(dense(1, "attn")(cat), axis=1)
        return (attn * visual_feat).sum(axis=1)


class MFBAttn(nn.Module):
    """MFB-scored visual distillation (reference AnswerDecoder.py:45-79,
    unused): attention logits from MFB(v_proj, q_proj*v_proj)."""

    module_dim: int = 768

    @nn.compact
    def __call__(self, question_rep, visual_feat, *, train: bool = False):
        from dualvgr_tpu.models.fusion import MFB

        visual_feat = nn.Dropout(0.15, deterministic=not train)(visual_feat)
        dense = lambda d, name: nn.Dense(
            d, use_bias=False, kernel_init=nn.initializers.xavier_uniform(), name=name
        )
        q = dense(self.module_dim, "q_proj")(question_rep)[:, None]
        v = dense(self.module_dim, "v_proj")(visual_feat)
        cat = MFB(self.module_dim, mm_dim=self.module_dim, factor=2, name="cat")(
            v, jnp.broadcast_to(q, v.shape) * v
        )
        attn = jax.nn.softmax(
            nn.Dense(1, kernel_init=nn.initializers.xavier_uniform(), name="attn")(cat),
            axis=1,
        )
        return (attn * visual_feat).sum(axis=1)


class SimpleConcatELUAttn(nn.Module):
    """Plain [v_proj, q_proj] concat distillation (reference
    AnswerDecoder.py:117-153, unused). MFBSimpleAttn (:81-115) is omitted:
    its __init__ calls super(MFBAttn, ...) and cannot construct."""

    module_dim: int = 768

    @nn.compact
    def __call__(self, question_rep, visual_feat, *, train: bool = False):
        visual_feat = nn.Dropout(0.15, deterministic=not train)(visual_feat)
        dense = lambda d, name, bias=True: nn.Dense(
            d, use_bias=bias, kernel_init=nn.initializers.xavier_uniform(), name=name
        )
        q = dense(self.module_dim, "q_proj", bias=False)(question_rep)[:, None]
        v = dense(self.module_dim, "v_proj", bias=False)(visual_feat)
        cat = jnp.concatenate([v, jnp.broadcast_to(q, v.shape)], axis=-1)
        cat = nn.elu(dense(self.module_dim, "cat")(cat))
        attn = jax.nn.softmax(dense(1, "attn")(cat), axis=1)
        return (attn * visual_feat).sum(axis=1)


class GateOutputUnitOpenEnded(nn.Module):
    """GateOutputUnitOpenEnded (reference model/AnswerDecoder.py:204-225).

    Unused by the shipped model (provided for component parity): a learned
    sigmoid-free multiplicative gate over the [visual, q'] concat before the
    same classifier stack.
    """

    module_dim: int = 768
    num_answers: int = 1000

    @nn.compact
    def __call__(self, question_embedding, visual_embedding, valid=None, *, train: bool):
        q = nn.Dense(
            self.module_dim,
            kernel_init=nn.initializers.xavier_uniform(),
            name="question_proj",
        )(question_embedding)
        out = jnp.concatenate([visual_embedding, q], axis=1)
        gate = nn.Dense(
            2 * self.module_dim,
            kernel_init=nn.initializers.xavier_uniform(),
            name="gate",
        )(out)
        out = gate * out
        out = nn.Dropout(0.15, deterministic=not train)(out)
        out = nn.Dense(
            self.module_dim, kernel_init=nn.initializers.xavier_uniform(), name="fc1"
        )(out)
        out = nn.elu(out)
        out = MaskedBatchNorm(name="bn")(out, valid, train=train)
        out = nn.Dropout(0.15, deterministic=not train)(out)
        return nn.Dense(
            self.num_answers,
            kernel_init=nn.initializers.xavier_uniform(),
            name="classifier",
        )(out)
