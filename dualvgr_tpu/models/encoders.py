"""Question and appearance encoders (reference model/Preprocessing.py).

* ``QuestionEncoder`` == InputUnitLinguisticDynamic (Preprocessing.py:89-127):
  Embedding -> dropout(0.15) -> tanh -> two parallel BiLSTMs:
  (a) per-token outputs (the "dynamic" question embedding, B x T x 768),
  (b) final-state sentence embedding (B x 768) with dropout(0.18).
* ``AppearanceEncoder`` == VisualAppearanceEncoder (Preprocessing.py:191-234):
  dropout(0.15) -> tanh on (B, C, F, 2048), BiLSTM over the F=16 frames of
  each of B*C clips, concat final fwd/bwd states -> dropout(0.18) ->
  (B, C, module_dim).

Both BiLSTMs are masked ``lax.scan``s with a single fused input-projection
matmul (see dualvgr_tpu/ops/lstm.py for the packed-vs-masked equivalence
argument). Parameter init matches the reference: xavier_uniform weights /
zero biases everywhere (model/utils.py:8-33), embedding U(-1,1)
(models.py:53) — overwritten by GloVe at train start (train.py:75-79).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from dualvgr_tpu.ops.lstm import LSTMParams, _xavier_uniform_torch_shape, bilstm
from dualvgr_tpu.ops.precision import stream_dtype_of


class BiLSTM(nn.Module):
    """Bidirectional masked LSTM over (B, T, D) with torch-compatible params.

    ``fused_final=True`` (valid only for full-length sequences where only the
    final states are consumed — the appearance encoder) runs the recurrence
    through the fused Pallas kernel (dualvgr_tpu/ops/lstm_pallas.py): the
    MXU-peak input projection stays in XLA, the 2*T sequential recurrent
    matmuls + gate transcendentals fuse into one kernel.

    ``compute_dtype`` is the explicit mixed-precision knob (see
    dualvgr_tpu/ops/precision.py): a static module attribute, so jit caches
    key on it and changing cfg.tpu.compute_dtype can never reuse a
    stale-dtype executable.
    """

    hidden: int  # per-direction hidden size
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x, lengths=None, *, fused: str | None = None):
        """fused: None (XLA scan), 'final' (Pallas kernel, final states only)
        or 'outputs' (Pallas kernel, per-step outputs + final states).

        CONTRACT for 'final_trainable': the whole-layer custom-VJP op drops
        dL/dx BY DESIGN (dualvgr_tpu/ops/lstm_pallas_train.py
        appearance_bilstm_train stop-gradients its input) — valid only when
        nothing trainable sits upstream of x, as in AppearanceEncoder where
        x is dropout(tanh(raw features)). Callers with trainable upstream
        layers must use 'trainable'/'trainable_final' instead.
        """
        d = x.shape[-1]
        h = self.hidden

        def make(name_suffix):
            w_ih = self.param(
                f"w_ih_{name_suffix}",
                lambda k: _xavier_uniform_torch_shape(k, (4 * h, d)),
            )
            w_hh = self.param(
                f"w_hh_{name_suffix}",
                lambda k: _xavier_uniform_torch_shape(k, (4 * h, h)),
            )
            # two bias vectors like torch LSTM: identical gradients double the
            # effective Adam bias step (training-dynamics parity)
            b_ih = self.param(f"b_ih_{name_suffix}", nn.initializers.zeros, (4 * h,))
            b_hh = self.param(f"b_hh_{name_suffix}", nn.initializers.zeros, (4 * h,))
            return LSTMParams(w_ih, w_hh, b_ih, b_hh)

        fwd, bwd = make("fwd"), make("bwd")
        sd = stream_dtype_of(self.compute_dtype)
        if fused is not None and not self.is_initializing():
            from dualvgr_tpu.ops import lstm_pallas
            from dualvgr_tpu.ops.lstm import time_major_input_proj

            # time-major (T, B, 4H) written DIRECTLY by the matmul: XLA emits
            # the transposed output tiling for free, where reshape+transpose
            # costs a full extra HBM round-trip per direction (~1 ms each at
            # flagship shapes — measured in benchmarks/eval_breakdown.py).
            # Under a stream dtype the matmul also consumes bf16 operands
            # with fp32 accumulation (see time_major_input_proj).
            if fused == "final_trainable":
                # whole-layer custom-VJP op (projection + recurrence): skips
                # the never-needed dX matmul and, under a stream dtype, runs
                # both heavy matmuls (fwd projection, dW_ih) on bf16 operands
                from dualvgr_tpu.ops.lstm_pallas_train import (
                    appearance_bilstm_train,
                )

                final = appearance_bilstm_train(
                    x, fwd.w_ih, fwd.b, fwd.w_hh, bwd.w_ih, bwd.b, bwd.w_hh,
                    stream_dtype=sd,
                )
                return None, final
            xf = time_major_input_proj(x, fwd, sd)
            xb = time_major_input_proj(x, bwd, sd)[::-1]
            if fused in ("trainable", "trainable_final") and sd is not None:
                # the trainable kernels stream fp32; round-trip through the
                # stream dtype so their forward numerics match the XLA path
                # (which applies the same rounding — see ops/lstm.py).
                # stream_roundtrip keeps the gradient exact-f32: on TPU the
                # forward pair folds and the backward is identity, so the
                # kernel-path bf16 training matches fp32 bitwise here too.
                from dualvgr_tpu.ops.precision import stream_roundtrip

                xf = stream_roundtrip(xf, sd)
                xb = stream_roundtrip(xb, sd)
            if fused in ("trainable", "trainable_final"):
                # masked custom-VJP kernel pair (the question encoders'
                # training path); per-step outputs only where consumed
                from dualvgr_tpu.ops.lstm_pallas_train import bilstm_trainable

                final, outs = bilstm_trainable(
                    xf, xb, fwd.w_hh, bwd.w_hh, lengths,
                    with_outputs=(fused == "trainable"),
                )
                return outs, final
            if sd is not None:
                xf = xf.astype(sd)
                xb = xb.astype(sd)
            if fused == "outputs":
                final, outs = lstm_pallas.bilstm_pallas(
                    xf, xb, fwd.w_hh, bwd.w_hh, lengths, with_outputs=True
                )
                return outs.astype(x.dtype), final.astype(x.dtype)
            final = lstm_pallas.bilstm_pallas(
                xf, xb, fwd.w_hh, bwd.w_hh, lengths, with_outputs=False
            )
            return None, final.astype(x.dtype)
        return bilstm(fwd, bwd, x, lengths, stream_dtype=sd)


class QuestionEncoder(nn.Module):
    """InputUnitLinguisticDynamic (reference model/Preprocessing.py:89-127)."""

    vocab_size: int
    word_dim: int = 300
    module_dim: int = 768
    use_pallas: bool = False
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, question, question_len, *, train: bool):
        """question: (B, T) int32; question_len: (B,) int32.

        Returns (question_embedding (B, module_dim),
                 words (B, T, word_dim),
                 dynamic_question_embedding (B, T, module_dim)).
        """
        # U(-1, 1) init like torch nn.init.uniform_(w, -1, 1)
        # (reference models.py:53); overwritten by GloVe at train start.
        embed = nn.Embed(
            self.vocab_size,
            self.word_dim,
            embedding_init=lambda k, s, d=jnp.float32: jax.random.uniform(
                k, s, d, minval=-1.0, maxval=1.0
            ),
            name="encoder_embed",
        )
        words = embed(question)
        words = nn.Dropout(0.15, deterministic=not train)(words)
        words = jnp.tanh(words)

        rnn_dim = self.module_dim // 2
        if self.use_pallas:
            # eval: inference kernel; train: masked custom-VJP kernel pair
            mode_outputs = "outputs" if not train else "trainable"
            mode_final = "final" if not train else "trainable_final"
        else:
            mode_outputs = mode_final = None
        # (a) per-token outputs == DynamicRNN(words, len) (Preprocessing.py:117)
        dynamic, _ = BiLSTM(rnn_dim, self.compute_dtype, name="concat_rnn")(
            words, question_len, fused=mode_outputs
        )
        # (b) final-state sentence embedding (Preprocessing.py:119-124)
        _, final = BiLSTM(rnn_dim, self.compute_dtype, name="encoder")(
            words, question_len, fused=mode_final
        )
        question_embedding = nn.Dropout(0.18, deterministic=not train)(final)
        return question_embedding, words, dynamic


class AppearanceEncoder(nn.Module):
    """VisualAppearanceEncoder (reference model/Preprocessing.py:191-234)."""

    module_dim: int = 768
    use_pallas: bool = False
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, clips, *, train: bool):
        """clips: (B, C, F, vision_dim) -> (B, C, module_dim)."""
        b, c, f, d = clips.shape
        x = nn.Dropout(0.15, deterministic=not train)(clips)
        x = jnp.tanh(x)
        # fold clips into the batch: each clip is one length-F sequence
        x = x.reshape(b * c, f, d)
        if self.use_pallas:
            # eval: inference kernel (optionally bf16-streamed);
            # train: custom-VJP kernel pair (fused fwd + bwd recurrence).
            # 'final_trainable' drops dL/dx by design — safe here because
            # x is dropout(tanh(raw features)): nothing trainable upstream.
            mode = "final" if not train else "final_trainable"
        else:
            mode = None
        _, final = BiLSTM(self.module_dim // 2, self.compute_dtype, name="encoder")(
            x, fused=mode
        )
        final = nn.Dropout(0.18, deterministic=not train)(final)
        return final.reshape(b, c, self.module_dim)


class SimpleQuestionEncoder(nn.Module):
    """InputUnitLinguistic (reference model/Preprocessing.py:47-86).

    Single-BiLSTM variant (unused by the shipped model, provided for
    component parity): ONE shared BiLSTM supplies both the per-step outputs
    and the final-state sentence embedding.
    """

    vocab_size: int
    word_dim: int = 300
    module_dim: int = 768

    @nn.compact
    def __call__(self, question, question_len, *, train: bool):
        embed = nn.Embed(
            self.vocab_size,
            self.word_dim,
            embedding_init=lambda k, s, d=jnp.float32: jax.random.uniform(
                k, s, d, minval=-1.0, maxval=1.0
            ),
            name="encoder_embed",
        )
        words = embed(question)
        words = nn.Dropout(0.15, deterministic=not train)(words)
        words = jnp.tanh(words)
        outputs, final = BiLSTM(self.module_dim // 2, name="concat_rnn")(
            words, question_len
        )
        question_embedding = nn.Dropout(0.18, deterministic=not train)(final)
        return question_embedding, words, outputs


class MultiGranularQuestionEncoder(nn.Module):
    """MultiGranularInputUnitLinguistic (reference Preprocessing.py:129-189).

    Word / phrase (1-2-3-gram dilated convs + max pool) / sentence
    granularities concatenated, then a BiLSTM over the concat. Unused by the
    shipped model; provided for component parity.
    """

    vocab_size: int
    word_dim: int = 300
    module_dim: int = 512

    @nn.compact
    def __call__(self, question, question_len, *, train: bool):
        d = self.module_dim
        embed = nn.Embed(
            self.vocab_size,
            self.word_dim,
            embedding_init=lambda k, s, dt=jnp.float32: jax.random.uniform(
                k, s, dt, minval=-1.0, maxval=1.0
            ),
            name="encoder_embed",
        )
        words = embed(question)  # (B, T, word_dim)
        words = nn.Dropout(0.15, deterministic=not train)(words)
        words = jnp.tanh(words)

        # length-preserving n-gram convs (torch Conv1d k/p/d = 1/0/1, 2/1/2, 3/2/2)
        conv = lambda k, pad, dil, name: nn.Conv(
            d, (k,), padding=((pad, pad),), kernel_dilation=(dil,),
            kernel_init=nn.initializers.xavier_uniform(), name=name,
        )
        uni = conv(1, 0, 1, "unigram_conv")(words)
        bi = conv(2, 1, 2, "bigram_conv")(words)
        tri = conv(3, 2, 2, "trigram_conv")(words)
        phrase = jnp.max(jnp.stack([uni, bi, tri], axis=2), axis=2)  # (B, T, d)

        sentence, _ = BiLSTM(d // 2, name="encoder")(phrase)
        concat = jnp.concatenate([words, phrase, sentence], axis=2)
        dynamic, final = BiLSTM(d, name="concat_rnn")(concat, question_len)
        dynamic = nn.Dropout(0.15, deterministic=not train)(dynamic)
        final = nn.Dropout(0.15, deterministic=not train)(final)
        return final, words, dynamic


class MotionEncoder(nn.Module):
    """Linear 2048 -> module_dim (reference models.py:46,74)."""

    module_dim: int = 768
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, motion_feat):
        from dualvgr_tpu.ops.precision import SDense, stream_dtype_of

        return SDense(
            self.module_dim,
            stream=stream_dtype_of(self.compute_dtype),
            name="proj",
        )(motion_feat)
