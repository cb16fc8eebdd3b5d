"""Independent PyTorch implementation of the DualVGR architecture.

Written from the architecture spec (SURVEY.md sections 2.3-2.7; paper
"DualVGR: A Dual-Visual Graph Reasoning Unit for Video Question Answering")
— NOT a copy of the reference code. Two purposes:

1. **Full-model numerical parity**: tests port the flax model's weights into
   this twin and require logits to agree in eval mode, validating every
   module's math (LSTM packing, GAT punishment order, MFB factorization,
   BatchNorm, attention renormalization) in one shot.
2. **Throughput baseline**: benchmarks/torch_reference_baseline.py measures
   this twin's eval throughput as the "reference PyTorch pipeline" proxy for
   bench.py's vs_baseline.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class TorchPunishGATHead(nn.Module):
    def __init__(self, in_dim, out_dim, alpha=0.01):
        super().__init__()
        self.W = nn.Linear(in_dim, out_dim)
        self.a = nn.Linear(2 * out_dim, 1)
        self.alpha = alpha

    def forward(self, h, adj, scores):
        wh = self.W(h)  # (B, N, hd)
        b, n, hd = wh.shape
        # additive form of a([Wh_i || Wh_j])
        a_src = self.a.weight[:, :hd]
        a_dst = self.a.weight[:, hd:]
        src = wh @ a_src.T  # (B, N, 1)
        dst = wh @ a_dst.T
        e = F.leaky_relu(src + dst.transpose(1, 2) + self.a.bias, negative_slope=self.alpha)
        e = torch.where(torch.as_tensor(adj) > 0, e, torch.full_like(e, -9e15))
        wh = wh * scores
        attn = torch.softmax(e, dim=-1)
        return F.elu(torch.bmm(attn, wh))


class TorchPunishGAT(nn.Module):
    def __init__(self, dim=768, heads=4):
        super().__init__()
        self.heads = nn.ModuleList(
            [TorchPunishGATHead(dim, dim // heads) for _ in range(heads)]
        )

    def forward(self, x, adj, scores):
        return torch.cat([h(x, adj, scores) for h in self.heads], dim=2)


class TorchSFGCNAttention(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.proj = nn.Linear(dim, dim)
        self.score = nn.Linear(dim, 1, bias=False)

    def forward(self, z):  # (B, K, N, D)
        w = self.score(torch.tanh(self.proj(z)))
        beta = torch.softmax(w, dim=1)
        return (beta * z).sum(1)


class TorchMFB(nn.Module):
    def __init__(self, dim=768, mm_dim=256, factor=2):
        super().__init__()
        self.linear0 = nn.Linear(dim, mm_dim * factor)
        self.linear1 = nn.Linear(dim, mm_dim * factor)
        self.linear_out = nn.Linear(mm_dim, dim)
        self.mm_dim, self.factor = mm_dim, factor

    def forward(self, x0, x1):
        z = F.elu(self.linear0(x0)) * F.elu(self.linear1(x1))
        z = z.view(*z.shape[:-1], self.mm_dim, self.factor).sum(-1)
        return F.elu(self.linear_out(z))


class TorchDualVGR(nn.Module):
    """Eval-mode twin; dropout layers omitted (inert in eval)."""

    def __init__(self, vision_dim, module_dim, word_dim, vocab_size, num_answers,
                 num_of_nodes, graph_layers=1, unit_layers=1):
        super().__init__()
        d = module_dim
        self.unit_layers = unit_layers
        self.graph_layers = graph_layers
        self.num_of_nodes = num_of_nodes
        self.module_dim = d

        self.embedding = nn.Embedding(vocab_size, word_dim)
        self.concat_rnn = nn.LSTM(word_dim, d // 2, batch_first=True, bidirectional=True)
        self.encoder = nn.LSTM(word_dim, d // 2, batch_first=True, bidirectional=True)
        self.app_rnn = nn.LSTM(vision_dim, d // 2, batch_first=False, bidirectional=True)
        self.motion_proj = nn.Linear(vision_dim, d)

        self.query_attn_enhance = nn.ModuleList(nn.Linear(d, d) for _ in range(unit_layers))
        self.query_attn_fc = nn.ModuleList(nn.Linear(d, 1) for _ in range(unit_layers))
        self.punish_app = nn.ModuleList(nn.Linear(word_dim, d) for _ in range(unit_layers))
        self.punish_mot = nn.ModuleList(nn.Linear(word_dim, d) for _ in range(unit_layers))
        nbanks = unit_layers * graph_layers
        self.ac_gat = nn.ModuleList(TorchPunishGAT(d) for _ in range(nbanks))
        self.app_gat = nn.ModuleList(TorchPunishGAT(d) for _ in range(nbanks))
        self.mc_gat = nn.ModuleList(TorchPunishGAT(d) for _ in range(nbanks))
        self.mot_gat = nn.ModuleList(TorchPunishGAT(d) for _ in range(nbanks))
        self.attn_app = nn.ModuleList(TorchSFGCNAttention(d) for _ in range(unit_layers))
        self.attn_mot = nn.ModuleList(TorchSFGCNAttention(d) for _ in range(unit_layers))
        self.mfb = TorchMFB(d)

        self.ctx_proj = nn.Linear(d, d, bias=False)
        self.ctx_attn = nn.Linear(d, 1)
        self.question_proj = nn.Linear(d, d)
        self.fc1 = nn.Linear(2 * d, d)
        self.bn = nn.BatchNorm1d(d)
        self.classifier_out = nn.Linear(d, num_answers)

        n = num_of_nodes
        adj = np.full((n, n), 1.0 / (n + 1), np.float32) + np.eye(n, dtype=np.float32) / (n + 1)
        self.register_buffer("adj", torch.from_numpy(adj))

    def forward(self, app, motion, question, qlen, return_aux=False):
        b, c, f, vd = app.shape
        aq_list, mq_list, com_app_list, com_mot_list = [], [], [], []
        t = question.shape[1]
        words = torch.tanh(self.embedding(question))

        packed = nn.utils.rnn.pack_padded_sequence(
            words, qlen.cpu(), batch_first=True, enforce_sorted=False
        )
        out, _ = self.concat_rnn(packed)
        dynamic, _ = nn.utils.rnn.pad_packed_sequence(out, batch_first=True, total_length=t)
        _, (h, _) = self.encoder(packed)
        q_embed = torch.cat([h[0], h[1]], -1)

        a = torch.tanh(app).permute(2, 0, 1, 3).reshape(f, b * c, vd)
        _, (ha, _) = self.app_rnn(a)
        app_feat = torch.cat([ha[0], ha[1]], -1).view(b, c, self.module_dim)
        mot_feat = self.motion_proj(motion)

        mask = (torch.arange(t)[None, :] < qlen[:, None]).float()
        for i in range(self.unit_layers):
            aq, mq = app_feat, mot_feat
            x = F.normalize(self.query_attn_enhance[i](dynamic), p=2, dim=-1)
            attn = torch.softmax(self.query_attn_fc[i](x).squeeze(-1), dim=1)
            attn = attn * mask
            attn = attn / (attn.sum(1, keepdim=True) + 1e-5)
            guided = torch.bmm(attn.unsqueeze(1), words).squeeze(1)

            qa = self.punish_app[i](guided)
            scores_a = torch.sigmoid(torch.bmm(aq, qa.unsqueeze(2)))
            scores_a = scores_a.expand(b, c, self.module_dim // 4)
            qm = self.punish_mot[i](guided)
            scores_m = torch.sigmoid(torch.bmm(mq, qm.unsqueeze(2)))
            scores_m = scores_m.expand(b, c, self.module_dim // 4)

            for j in range(self.graph_layers):
                k = i * self.graph_layers + j
                com_app = self.ac_gat[k](aq, self.adj, scores_a)
                aq = self.app_gat[k](aq, self.adj, scores_a)
                aq_list.append(aq)
                com_app_list.append(com_app)
            for j in range(self.graph_layers):
                k = i * self.graph_layers + j
                com_mot = self.mc_gat[k](mq, self.adj, scores_m)
                mq = self.mot_gat[k](mq, self.adj, scores_m)
                mq_list.append(mq)
                com_mot_list.append(com_mot)

            aq_embed = self.attn_app[i](torch.stack([com_app, aq], 1))
            mq_embed = self.attn_mot[i](torch.stack([com_mot, mq], 1))
            app_feat = app_feat + aq_embed
            mot_feat = mot_feat + mq_embed

        visual = self.mfb(app_feat, mot_feat)
        v = F.elu(self.ctx_proj(visual))
        beta = torch.softmax(self.ctx_attn(v), dim=1)
        visual = (beta * visual).sum(1)

        q = self.question_proj(q_embed)
        out = torch.cat([visual, q], 1)
        out = self.bn(F.elu(self.fc1(out)))
        logits = self.classifier_out(out)
        if return_aux:
            return logits, com_app_list, com_mot_list, aq_list, mq_list
        return logits


def _copy_linear(dst: nn.Linear, kernel, bias=None):
    with torch.no_grad():
        dst.weight.copy_(torch.from_numpy(np.asarray(kernel)).T)
        if bias is not None:
            dst.bias.copy_(torch.from_numpy(np.asarray(bias)))


def _copy_lstm(dst: nn.LSTM, p, reverse_suffix=True):
    sd = dst.state_dict()
    with torch.no_grad():
        for sfx, d in (("", "fwd"), ("_reverse", "bwd")):
            sd[f"weight_ih_l0{sfx}"].copy_(torch.from_numpy(np.asarray(p[f"w_ih_{d}"])).T)
            sd[f"weight_hh_l0{sfx}"].copy_(torch.from_numpy(np.asarray(p[f"w_hh_{d}"])).T)
            sd[f"bias_ih_l0{sfx}"].copy_(torch.from_numpy(np.asarray(p[f"b_ih_{d}"])))
            sd[f"bias_hh_l0{sfx}"].copy_(torch.from_numpy(np.asarray(p[f"b_hh_{d}"])))


def load_flax_params(twin: TorchDualVGR, params, batch_stats) -> None:
    """Copy a flax DualVGR param tree into the torch twin."""
    lp = params["linguistic_input_unit"]
    with torch.no_grad():
        twin.embedding.weight.copy_(
            torch.from_numpy(np.asarray(lp["encoder_embed"]["embedding"]))
        )
    _copy_lstm(twin.concat_rnn, lp["concat_rnn"])
    _copy_lstm(twin.encoder, lp["encoder"])
    _copy_lstm(twin.app_rnn, params["visual_appearance_input_unit"]["encoder"])
    mp = params["visual_motion_input_unit"]["proj"]
    _copy_linear(twin.motion_proj, mp["kernel"], mp["bias"])

    vu = params["visual_input_unit"]
    for i in range(twin.unit_layers):
        qa = vu[f"query_attn_{i}"]
        _copy_linear(twin.query_attn_enhance[i], qa["feat_enhance"]["kernel"], qa["feat_enhance"]["bias"])
        _copy_linear(twin.query_attn_fc[i], qa["fc"]["kernel"], qa["fc"]["bias"])
        _copy_linear(twin.punish_app[i], vu[f"query_punish_appear_{i}"]["query_weight"]["kernel"],
                     vu[f"query_punish_appear_{i}"]["query_weight"]["bias"])
        _copy_linear(twin.punish_mot[i], vu[f"query_punish_motion_{i}"]["query_weight"]["kernel"],
                     vu[f"query_punish_motion_{i}"]["query_weight"]["bias"])
        at = vu[f"attention_appearance_{i}"]
        _copy_linear(twin.attn_app[i].proj, at["proj_kernel"], at["proj_bias"])
        _copy_linear(twin.attn_app[i].score, at["score_kernel"])
        at = vu[f"attention_motion_{i}"]
        _copy_linear(twin.attn_mot[i].proj, at["proj_kernel"], at["proj_bias"])
        _copy_linear(twin.attn_mot[i].score, at["score_kernel"])

    def copy_gat(dst: TorchPunishGAT, src):
        kernel = np.asarray(src["w_kernel"])  # (D, H, hd)
        bias = np.asarray(src["w_bias"])  # (H, hd)
        a = np.asarray(src["a"])  # (H, 2hd)
        ab = np.asarray(src["a_bias"])  # (H,)
        for h, head in enumerate(dst.heads):
            _copy_linear(head.W, kernel[:, h, :], bias[h])
            with torch.no_grad():
                head.a.weight.copy_(torch.from_numpy(a[h : h + 1]))
                head.a.bias.copy_(torch.from_numpy(ab[h : h + 1]))

    nbanks = twin.unit_layers * twin.graph_layers
    for k in range(nbanks):
        copy_gat(twin.ac_gat[k], vu[f"ac_gat_{k}"])
        copy_gat(twin.app_gat[k], vu[f"appearance_gat_{k}"])
        copy_gat(twin.mc_gat[k], vu[f"mc_gat_{k}"])
        copy_gat(twin.mot_gat[k], vu[f"motion_gat_{k}"])

    mfb = vu["visual_fusion"]
    _copy_linear(twin.mfb.linear0, mfb["linear0"]["kernel"], mfb["linear0"]["bias"])
    _copy_linear(twin.mfb.linear1, mfb["linear1"]["kernel"], mfb["linear1"]["bias"])
    _copy_linear(twin.mfb.linear_out, mfb["linear_out"]["kernel"], mfb["linear_out"]["bias"])

    fa = params["feature_aggregation"]
    _copy_linear(twin.ctx_proj, fa["v_proj"]["kernel"])
    _copy_linear(twin.ctx_attn, fa["attn"]["kernel"], fa["attn"]["bias"])

    ou = params["output_unit"]
    _copy_linear(twin.question_proj, ou["question_proj"]["kernel"], ou["question_proj"]["bias"])
    _copy_linear(twin.fc1, ou["fc1"]["kernel"], ou["fc1"]["bias"])
    _copy_linear(twin.classifier_out, ou["classifier"]["kernel"], ou["classifier"]["bias"])
    bn = ou["bn"]
    bns = batch_stats["output_unit"]["bn"]
    with torch.no_grad():
        twin.bn.weight.copy_(torch.from_numpy(np.asarray(bn["scale"])))
        twin.bn.bias.copy_(torch.from_numpy(np.asarray(bn["bias"])))
        twin.bn.running_mean.copy_(torch.from_numpy(np.asarray(bns["mean"])))
        twin.bn.running_var.copy_(torch.from_numpy(np.asarray(bns["var"])))
