"""DualVGR: the full video-QA network (reference model/models.py:36-173).

Composition (reference models.py:36-53):
  QuestionEncoder (GloVe + two BiLSTMs) ||| AppearanceEncoder (clip BiLSTM)
  ||| MotionEncoder (Linear 2048->768) -> stacked DualVGR units -> MFB
  appearance x motion fusion -> ContextSelfAttn clip aggregation ->
  open-ended classifier.

One DualVGR unit cycle (reference models.py:141-169):
  1. QueryAttn re-reads the question into a 300-d guided query,
  2. QueryPunish produces per-clip sigmoid relevance for both streams,
  3. per graph layer: a "common" punished-GAT and a "specific" punished-GAT
     over the dense clip graph for each stream,
  4. AttentionSFGCN 2-way attention fuses [common, specific],
  5. residual add into the running stream features.

Deliberate fixes of reference quirks (SURVEY.md section 2.11):
  * ``unit_layers`` is wired through everywhere (the reference train driver
    silently dropped it and always trained with the default 2,
    train.py:58-66 vs models.py:36),
  * GAT bank indexing uses cycle * graph_layers + layer (the reference's
    ``[i+j]`` under-indexes when graph_layers > 1, models.py:151-158),
  * no hardcoded devices (reference models.py:118-119 pins 'cuda:1'); the
    adjacency is computed with jnp,
  * the auxiliary embeddings stay on device as stacked (T, B, N, D) arrays
    instead of the reference's per-layer ``.cpu()`` round-trips
    (models.py:153-160).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dualvgr_tpu.models.attention import ContextSelfAttn, QueryAttn, QueryPunish
from dualvgr_tpu.models.decoder import OutputUnitOpenEnded
from dualvgr_tpu.models.encoders import AppearanceEncoder, MotionEncoder, QuestionEncoder
from dualvgr_tpu.models.fusion import MFB
from dualvgr_tpu.models.graph import (
    AttentionSFGCN,
    PunishGAT,
    PunishGCN,
    dense_self_loop_adjacency,
)


class DualVGROutput(NamedTuple):
    """Forward outputs (reference models.py:83,173).

    logits: (B, num_answers)
    aq_embed / mq_embed: (B, N, D) — last cycle's fused embeddings
    com_app / com_motion / aq_fusion / mq_fusion: (T, B, N, D) stacks with
    T = unit_layers * graph_layers, consumed by the auxiliary losses
    (reference train.py:147-154).
    """

    logits: Any
    aq_embed: Any
    mq_embed: Any
    com_app: Any
    com_motion: Any
    aq_fusion: Any
    mq_fusion: Any


class DualVGRUnitStack(nn.Module):
    """Stacked DualVGR reasoning units (reference models.py:86-173).

    With ``use_pallas`` the per-cycle graph reasoning (inference path; the
    training path keeps XLA autodiff for the graph cycle — its dropout
    sites and small N make autodiff competitive there, while the BiLSTM
    recurrences train through custom-VJP Pallas kernel pairs)
    — common GAT + specific GAT + 2-way fusion + residual — runs as ONE
    fused Pallas kernel per stream (dualvgr_tpu/ops/gat_pallas.py), sharing
    the exact same parameters as the XLA composition. The kernel also emits
    the true common/specific embeddings, so the auxiliary outputs are
    identical to the XLA path's (tests/test_pallas.py). Training always
    uses the XLA path (grads via autodiff).
    """

    word_dim: int = 300
    module_dim: int = 768
    num_of_nodes: int = 8
    graph_layers: int = 1
    unit_layers: int = 2
    use_pallas: bool = False
    graph_module: str = "GAT"  # 'GAT' (reference-live) or 'GCN' (fixed, see PunishGCN)
    compute_dtype: str = "float32"
    # XLA path: run each iteration's FOUR PunishGATs (common/specific x
    # appearance/motion) as ONE stacked computation — 4x fewer softmax/
    # einsum/dropout ops, same math (exact with dropout off; with dropout
    # on the masks come from one draw per site instead of four, identical
    # distribution). Off by default until the in-network TPU A/B wins
    # (house rule: isolated wins must be confirmed in-network).
    batch_gats: bool = False

    def setup(self):
        d = self.module_dim
        cd = self.compute_dtype
        u, g = self.unit_layers, self.graph_layers
        self.query_attns = [QueryAttn(d, name=f"query_attn_{i}") for i in range(u)]
        self.punish_appear = [
            QueryPunish(d, name=f"query_punish_appear_{i}") for i in range(u)
        ]
        self.punish_motion = [
            QueryPunish(d, name=f"query_punish_motion_{i}") for i in range(u)
        ]
        if self.graph_module == "GAT":
            mk_gat = lambda name: PunishGAT(
                4, d // 4, in_dim=d, compute_dtype=cd, name=name
            )
        elif self.graph_module == "GCN":
            mk_gat = lambda name: PunishGCN(d, name=name)
        else:
            raise ValueError(f"unknown graph_module {self.graph_module!r}")
        self.ac_gats = [mk_gat(f"ac_gat_{k}") for k in range(u * g)]
        self.appearance_gats = [mk_gat(f"appearance_gat_{k}") for k in range(u * g)]
        self.mc_gats = [mk_gat(f"mc_gat_{k}") for k in range(u * g)]
        self.motion_gats = [mk_gat(f"motion_gat_{k}") for k in range(u * g)]
        self.attention_appearance = [
            AttentionSFGCN(
                d, in_dim=d, compute_dtype=cd, name=f"attention_appearance_{i}"
            )
            for i in range(u)
        ]
        self.attention_motion = [
            AttentionSFGCN(
                d, in_dim=d, compute_dtype=cd, name=f"attention_motion_{i}"
            )
            for i in range(u)
        ]
        self.visual_fusion = MFB(d, compute_dtype=cd, name="visual_fusion")
        # paramless; used by the batched-GAT path (one mask draw per site).
        # Rate comes from the bank itself so a non-default PunishGAT dropout
        # keeps the two execution paths' training distributions identical.
        self.cycle_drop = nn.Dropout(
            self.ac_gats[0].dropout if self.graph_module == "GAT" else 0.15
        )

    def _gat4_batched(self, x4, scores4, adj, gats, *, train: bool):
        """One iteration's four PunishGATs as ONE stacked computation.

        x4: (4, B, N, D) = [aq, aq, mq, mq]; scores4: (4, B, N, hd);
        gats: [ac, appearance, mc, motion] modules (identical hyperparams,
        distinct weights). Exactly PunishGAT.__call__'s math
        (graph.py:62-101) vectorized over the bank dim — one stacked
        projection einsum, one softmax, one dropout draw per site instead
        of four of each. Exact vs the per-module path with dropout off
        (tests/test_batched_gats.py); with dropout on the masks are one
        draw per site — identical distribution, different stream.
        """
        from dualvgr_tpu.ops.precision import stream_dtype_of, streamed_einsum

        g0 = gats[0]
        nh, hd, alpha = g0.n_heads, g0.head_dim, g0.alpha
        k4, b, n, d = x4.shape
        w4 = jnp.stack([g.w_kernel.reshape(d, nh * hd) for g in gats])
        b4 = jnp.stack([g.w_bias.reshape(nh * hd) for g in gats])
        a4 = jnp.stack([g.a for g in gats])  # (4, H, 2*hd)
        ab4 = jnp.stack([g.a_bias for g in gats])  # (4, H)

        x4 = self.cycle_drop(x4, deterministic=not train)
        sd = stream_dtype_of(self.compute_dtype)
        wh = streamed_einsum("kbnd,kdh->kbnh", x4, w4, sd)
        wh = wh.reshape(k4, b, n, nh, hd) + b4.reshape(k4, 1, 1, nh, hd)

        a_src, a_dst = a4[..., :hd], a4[..., hd:]
        src = jnp.einsum("kbnhd,khd->kbhn", wh, a_src)
        dst = jnp.einsum("kbnhd,khd->kbhn", wh, a_dst)
        e = src[..., :, None] + dst[..., None, :] + ab4[:, None, :, None, None]
        e = nn.leaky_relu(e, negative_slope=alpha)  # (4, B, H, N, N)
        e = jnp.where(adj[None, None, None] > 0, e, jnp.full_like(e, -9e15))

        wh = wh * scores4[:, :, :, None, :]  # punishment: values only
        attn = jax.nn.softmax(e, axis=-1)
        attn = self.cycle_drop(attn, deterministic=not train)
        out = jnp.einsum("kbhij,kbjhd->kbihd", attn, wh)
        out = nn.elu(out).reshape(k4, b, n, nh * hd)
        return self.cycle_drop(out, deterministic=not train)

    def _fused_cycle(self, h, scores, gat_c, gat_s, sfgcn):
        """One stream's cycle through the fused Pallas kernel."""
        from dualvgr_tpu.ops.gat_pallas import fused_gat_cycle

        d = self.module_dim
        nh, hd = gat_c.n_heads, gat_c.head_dim
        return fused_gat_cycle(
            h, scores,
            gat_c.w_kernel.reshape(d, nh * hd), gat_c.w_bias.reshape(nh * hd),
            gat_c.a, gat_c.a_bias,
            gat_s.w_kernel.reshape(d, nh * hd), gat_s.w_bias.reshape(nh * hd),
            gat_s.a, gat_s.a_bias,
            sfgcn.proj_kernel, sfgcn.proj_bias, sfgcn.score_kernel,
        )

    def __call__(
        self,
        appearance_feat,
        motion_feat,
        dynamic_question_embedding,
        word_embedding,
        question_len,
        *,
        train: bool,
    ):
        d = self.module_dim
        adj = dense_self_loop_adjacency(self.num_of_nodes, appearance_feat.dtype)
        # the fused kernel covers exactly one GAT (common, specific, fuse,
        # residual) cycle; multi-graph-layer stacks and GCN fall back to XLA
        fused = (
            self.use_pallas
            and not train
            and self.graph_layers == 1
            and self.graph_module == "GAT"
        )

        aq_fusion_list, mq_fusion_list = [], []
        com_app_list, com_motion_list = [], []
        aq_embed = mq_embed = None

        for i in range(self.unit_layers):
            aq = appearance_feat
            mq = motion_feat
            guided, _ = self.query_attns[i](
                word_embedding, dynamic_question_embedding, question_len
            )
            app_scores = self.punish_appear[i](guided, aq)
            mot_scores = self.punish_motion[i](guided, mq)

            if fused:
                appearance_feat, com_a, spec_a = self._fused_cycle(
                    aq, app_scores, self.ac_gats[i], self.appearance_gats[i],
                    self.attention_appearance[i],
                )
                motion_feat, com_m, spec_m = self._fused_cycle(
                    mq, mot_scores, self.mc_gats[i], self.motion_gats[i],
                    self.attention_motion[i],
                )
                # aux outputs: identical values to the XLA composition —
                # the kernel writes the true common/specific embeddings,
                # and the SFGCN fusion is exactly the residual delta
                aq_embed = appearance_feat - aq
                mq_embed = motion_feat - mq
                aq_fusion_list.append(spec_a)
                com_app_list.append(com_a)
                mq_fusion_list.append(spec_m)
                com_motion_list.append(com_m)
                continue

            com_app = com_motion = None
            if self.batch_gats and self.graph_module == "GAT":
                # the four independent GATs of each iteration as one
                # stacked computation (common/specific read the SAME input,
                # so batching each iteration is exact — see _gat4_batched)
                for j in range(self.graph_layers):
                    k = i * self.graph_layers + j
                    o4 = self._gat4_batched(
                        jnp.stack([aq, aq, mq, mq]),
                        jnp.stack([app_scores, app_scores, mot_scores, mot_scores]),
                        adj,
                        [
                            self.ac_gats[k],
                            self.appearance_gats[k],
                            self.mc_gats[k],
                            self.motion_gats[k],
                        ],
                        train=train,
                    )
                    com_app, aq, com_motion, mq = o4[0], o4[1], o4[2], o4[3]
                    aq_fusion_list.append(aq)
                    com_app_list.append(com_app)
                    mq_fusion_list.append(mq)
                    com_motion_list.append(com_motion)
            else:
                for j in range(self.graph_layers):
                    k = i * self.graph_layers + j  # fixed bank indexing
                    com_app = self.ac_gats[k](aq, adj, app_scores, train=train)
                    aq = self.appearance_gats[k](aq, adj, app_scores, train=train)
                    aq_fusion_list.append(aq)
                    com_app_list.append(com_app)

                for j in range(self.graph_layers):
                    k = i * self.graph_layers + j
                    com_motion = self.mc_gats[k](mq, adj, mot_scores, train=train)
                    mq = self.motion_gats[k](mq, adj, mot_scores, train=train)
                    mq_fusion_list.append(mq)
                    com_motion_list.append(com_motion)

            # common-vs-specific fusion (reference models.py:162-166)
            aq_embed, _ = self.attention_appearance[i](jnp.stack([com_app, aq], axis=1))
            mq_embed, _ = self.attention_motion[i](jnp.stack([com_motion, mq], axis=1))
            appearance_feat = appearance_feat + aq_embed
            motion_feat = motion_feat + mq_embed

        visual = self.visual_fusion(appearance_feat, motion_feat)
        return (
            visual,
            aq_embed,
            mq_embed,
            jnp.stack(com_app_list),
            jnp.stack(com_motion_list),
            jnp.stack(aq_fusion_list),
            jnp.stack(mq_fusion_list),
        )


class DualVGR(nn.Module):
    """Full network (reference model/models.py:36-83).

    Construction args mirror the reference signature; ``vocab`` sizes are
    passed explicitly so the module stays a pure pytree-of-arrays factory.
    """

    vision_dim: int = 2048
    module_dim: int = 768
    word_dim: int = 300
    question_vocab_size: int = 1000
    num_answers: int = 1000
    num_of_nodes: int = 8
    graph_layers: int = 1
    unit_layers: int = 2
    # run the fused Pallas graph-reasoning cycle on the inference path
    use_pallas: bool = False
    graph_module: str = "GAT"
    # mixed-precision knob (cfg.tpu.compute_dtype): static module attribute,
    # so jit functions closing over the model re-key their caches on it
    compute_dtype: str = "float32"
    # stacked-bank GAT execution on the XLA path (see DualVGRUnitStack)
    batch_gats: bool = False

    @nn.compact
    def __call__(
        self,
        video_appearance_feat,
        video_motion_feat,
        question,
        question_len,
        valid=None,
        *,
        train: bool = False,
    ) -> DualVGROutput:
        """video_appearance_feat: (B, C, F, vision_dim) float;
        video_motion_feat: (B, C, vision_dim) float;
        question: (B, T) int32; question_len: (B,) int32;
        valid: optional (B,) float mask for padded final-batch rows
        (consumed by the classifier's batch statistics).

        Visual features may arrive in a narrower transfer dtype (bfloat16,
        cfg.tpu.transfer_dtype — half the host->device bytes); they are
        upcast to float32 here so every downstream numerics path (fp32
        recurrences/softmaxes, compute_dtype streaming at the matmuls) is
        unchanged. XLA fuses the upcast into the first elementwise pass."""
        video_appearance_feat = video_appearance_feat.astype(jnp.float32)
        video_motion_feat = video_motion_feat.astype(jnp.float32)
        question_embedding, words, dynamic = QuestionEncoder(
            self.question_vocab_size,
            self.word_dim,
            self.module_dim,
            self.use_pallas,
            self.compute_dtype,
            name="linguistic_input_unit",
        )(question, question_len, train=train)

        app = AppearanceEncoder(
            self.module_dim,
            self.use_pallas,
            self.compute_dtype,
            name="visual_appearance_input_unit",
        )(video_appearance_feat, train=train)
        motion = MotionEncoder(
            self.module_dim, self.compute_dtype, name="visual_motion_input_unit"
        )(video_motion_feat)

        visual, aq_embed, mq_embed, com_app, com_motion, aq_f, mq_f = (
            DualVGRUnitStack(
                self.word_dim,
                self.module_dim,
                self.num_of_nodes,
                self.graph_layers,
                self.unit_layers,
                self.use_pallas,
                self.graph_module,
                self.compute_dtype,
                self.batch_gats,
                name="visual_input_unit",
            )(app, motion, dynamic, words, question_len, train=train)
        )

        visual = ContextSelfAttn(
            self.module_dim, self.compute_dtype, name="feature_aggregation"
        )(visual, train=train)
        logits = OutputUnitOpenEnded(
            self.module_dim,
            self.num_answers,
            self.compute_dtype,
            name="output_unit",
        )(question_embedding, visual, valid, train=train)

        return DualVGROutput(
            logits, aq_embed, mq_embed, com_app, com_motion, aq_f, mq_f
        )
