"""Load reference (PyTorch DualVGR-VideoQA) checkpoints into this framework.

Maps the reference model's ``state_dict`` names (reference model/models.py
module tree: linguistic_input_unit.concatRNN.rnn / encoder LSTMs,
visual_input_unit.{queryAttn,queryPunish_*,acGCN,appearance_GCN,mcGCN,
motion_GCN,attention_*,visualfusion}, feature_aggregation, output_unit
Sequential classifier indices 1/3/5) onto this framework's flax tree, so a
user switching from the reference can keep their trained checkpoints:

    import torch
    from dualvgr_tpu.utils.port_reference import port_reference_state_dict
    ckpt = torch.load("..._model.pt", map_location="cpu")
    variables = port_reference_state_dict(ckpt["state_dict"],
                                          unit_layers=..., graph_layers=1)

Verified end to end against the actual reference implementation when it is
available (tests/test_reference_port.py): random reference weights ported
through this mapping produce matching eval logits.

Note on GAT banks: the reference indexes its banks ``[i+j]`` which reuses
layers when graph_layers > 1 (reference models.py:151-158, SURVEY 2.11-3);
this port maps bank k -> bank k directly, which is identical for the
shipped graph_layers=1 configs.
"""

from __future__ import annotations

import numpy as np


def _t(sd, key):
    v = sd[key]
    return v.numpy() if hasattr(v, "numpy") else np.asarray(v)


def _linear(sd, prefix, bias=True):
    out = {"kernel": _t(sd, f"{prefix}.weight").T}
    if bias:
        out["bias"] = _t(sd, f"{prefix}.bias")
    return out


def _lstm(sd, prefix):
    out = {}
    for sfx, d in (("", "fwd"), ("_reverse", "bwd")):
        out[f"w_ih_{d}"] = _t(sd, f"{prefix}.weight_ih_l0{sfx}").T
        out[f"w_hh_{d}"] = _t(sd, f"{prefix}.weight_hh_l0{sfx}").T
        out[f"b_ih_{d}"] = _t(sd, f"{prefix}.bias_ih_l0{sfx}")
        out[f"b_hh_{d}"] = _t(sd, f"{prefix}.bias_hh_l0{sfx}")
    return out


def _gat(sd, prefix, n_heads=4):
    """acGCN.{k}.attention_{h}.{W,a} -> merged-head w_kernel/w_bias/a/a_bias."""
    ws, wbs, avs, abs_ = [], [], [], []
    for h in range(n_heads):
        ws.append(_t(sd, f"{prefix}.attention_{h}.W.weight").T)  # (D, hd)
        wbs.append(_t(sd, f"{prefix}.attention_{h}.W.bias"))  # (hd,)
        avs.append(_t(sd, f"{prefix}.attention_{h}.a.weight")[0])  # (2hd,)
        abs_.append(_t(sd, f"{prefix}.attention_{h}.a.bias")[0])  # scalar
    return {
        "w_kernel": np.stack(ws, axis=1),  # (D, H, hd)
        "w_bias": np.stack(wbs, axis=0),  # (H, hd)
        "a": np.stack(avs, axis=0),  # (H, 2hd)
        "a_bias": np.asarray(abs_),  # (H,)
    }


def _sfgcn(sd, prefix):
    return {
        "proj_kernel": _t(sd, f"{prefix}.project.0.weight").T,
        "proj_bias": _t(sd, f"{prefix}.project.0.bias"),
        "score_kernel": _t(sd, f"{prefix}.project.2.weight").T,
    }


def port_reference_state_dict(
    sd: dict, unit_layers: int, graph_layers: int = 1
) -> dict:
    """Reference DualVGR state_dict -> {'params', 'batch_stats'} variables."""
    sd = {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in sd.items()
    }
    p: dict = {}

    p["linguistic_input_unit"] = {
        "encoder_embed": {"embedding": _t(sd, "linguistic_input_unit.encoder_embed.weight")},
        "concat_rnn": _lstm(sd, "linguistic_input_unit.concatRNN.rnn"),
        "encoder": _lstm(sd, "linguistic_input_unit.encoder"),
    }
    p["visual_appearance_input_unit"] = {
        "encoder": _lstm(sd, "visual_appearance_input_unit.encoder")
    }
    p["visual_motion_input_unit"] = {"proj": _linear(sd, "visual_motion_input_unit")}

    vu: dict = {}
    for i in range(unit_layers):
        vu[f"query_attn_{i}"] = {
            "feat_enhance": _linear(sd, f"visual_input_unit.queryAttn.{i}.feat_enhance"),
            "fc": _linear(sd, f"visual_input_unit.queryAttn.{i}.fc"),
        }
        vu[f"query_punish_appear_{i}"] = {
            "query_weight": _linear(sd, f"visual_input_unit.queryPunish_appear.{i}.query_weight")
        }
        vu[f"query_punish_motion_{i}"] = {
            "query_weight": _linear(sd, f"visual_input_unit.queryPunish_motion.{i}.query_weight")
        }
        vu[f"attention_appearance_{i}"] = _sfgcn(sd, f"visual_input_unit.attention_appearance.{i}")
        vu[f"attention_motion_{i}"] = _sfgcn(sd, f"visual_input_unit.attention_motion.{i}")
    for k in range(unit_layers * graph_layers):
        vu[f"ac_gat_{k}"] = _gat(sd, f"visual_input_unit.acGCN.{k}")
        vu[f"appearance_gat_{k}"] = _gat(sd, f"visual_input_unit.appearance_GCN.{k}")
        vu[f"mc_gat_{k}"] = _gat(sd, f"visual_input_unit.mcGCN.{k}")
        vu[f"motion_gat_{k}"] = _gat(sd, f"visual_input_unit.motion_GCN.{k}")
    vu["visual_fusion"] = {
        "linear0": _linear(sd, "visual_input_unit.visualfusion.linear0"),
        "linear1": _linear(sd, "visual_input_unit.visualfusion.linear1"),
        "linear_out": _linear(sd, "visual_input_unit.visualfusion.linear_out"),
    }
    p["visual_input_unit"] = vu

    p["feature_aggregation"] = {
        "v_proj": _linear(sd, "feature_aggregation.v_proj", bias=False),
        "attn": _linear(sd, "feature_aggregation.attn"),
    }
    p["output_unit"] = {
        "question_proj": _linear(sd, "output_unit.question_proj"),
        "fc1": _linear(sd, "output_unit.classifier.1"),
        "bn": {
            "scale": _t(sd, "output_unit.classifier.3.weight"),
            "bias": _t(sd, "output_unit.classifier.3.bias"),
        },
        "classifier": _linear(sd, "output_unit.classifier.5"),
    }
    batch_stats = {
        "output_unit": {
            "bn": {
                "mean": _t(sd, "output_unit.classifier.3.running_mean"),
                "var": _t(sd, "output_unit.classifier.3.running_var"),
            }
        }
    }
    return {"params": p, "batch_stats": batch_stats}


def load_reference_checkpoint(path: str, unit_layers: int, graph_layers: int = 1):
    """Convenience: torch.load a reference *_model.pt and port it.

    Returns (variables, model_kwargs) — model_kwargs as saved by the
    reference (train.py:359-367).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt["state_dict"] if isinstance(ckpt, dict) and "state_dict" in ckpt else ckpt
    kwargs = ckpt.get("model_kwargs", {}) if isinstance(ckpt, dict) else {}
    return port_reference_state_dict(sd, unit_layers, graph_layers), kwargs
