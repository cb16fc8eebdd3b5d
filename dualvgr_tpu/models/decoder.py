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
import jax.numpy as jnp


class OutputUnitOpenEnded(nn.Module):
    """SimpleOutputUnitOpenEnded (reference model/AnswerDecoder.py:184-202)."""

    module_dim: int = 768
    num_answers: int = 1000

    @nn.compact
    def __call__(self, question_embedding, visual_embedding, *, train: bool):
        q = nn.Dense(
            self.module_dim,
            kernel_init=nn.initializers.xavier_uniform(),
            name="question_proj",
        )(question_embedding)
        out = jnp.concatenate([visual_embedding, q], axis=1)
        out = nn.Dropout(0.15, deterministic=not train)(out)
        out = nn.Dense(
            self.module_dim,
            kernel_init=nn.initializers.xavier_uniform(),
            name="fc1",
        )(out)
        out = nn.elu(out)
        out = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            name="bn",
        )(out)
        out = nn.Dropout(0.15, deterministic=not train)(out)
        return nn.Dense(
            self.num_answers,
            kernel_init=nn.initializers.xavier_uniform(),
            name="classifier",
        )(out)
