"""Subprocess worker: run the ACTUAL reference trainer on a synthetic fixture.

Imports /root/reference's own train.py and executes its real ``train(cfg)``
loop (reference train.py:27-326) — its torch DataLoader, loss loop
(CE + alpha*common + beta*HSIC, train.py:146-154), Adam + clip-12 +
step-decay optimizer, and its validate() (validate.py:23-235) — on the
synthetic fixture, with the same CPU-safe patches tests/test_reference_port.py
uses plus two more the trainer needs:

* ``torch.Tensor.to``: ignore hardcoded 'cuda:*' targets (models.py:118-119,
  model/utils.py:72),
* ``torch.Tensor.cuda``: identity (train.py:138,152-153; utils.py:22),
* ``time.sleep`` inside the reference train module: no-op (the reference
  sleeps 10 s before every checkpoint save, train.py:366).

Runs as a SUBPROCESS so the reference's top-level module names (train,
validate, config, utils, DataLoader) never collide with this repo's own
modules in the parent's sys.modules.

Writes into --out:
  ref_init_state.pt   torch state_dict at construction (pre-GloVe; the
                      parent ports it into the TPU model and applies the
                      same GloVe matrix, mirroring reference train.py:75-79)
  ref_final_state.pt  state_dict after the last epoch
  ref_accs.json       {"val_acc": [per-epoch], "categories": last epoch's
                      15-way accuracies, "n_val": int}

STEP mode (--steps N, used by benchmarks/flagship_step_parity.py): the
reference train() runs exactly N batches of ONE epoch and two DOCUMENTED
determinism patches are applied so per-step LOSSES are comparable at fp32
tolerance — F.dropout becomes identity and BatchNorm1d always normalizes
with its running statistics (dropout streams and batch-stat mixing are the
only two legitimately-divergent elements between frameworks; the same
convention as tests/test_training_parity.py). Each consumed batch and each
total loss (CE + alpha*common + beta*HSIC, captured at loss.backward,
reference train.py:146-155) is recorded, so the parent can replay the
IDENTICAL data through its own train step. Extra outputs:
  ref_step_losses.json  [N total-loss floats, in step order]
  ref_batches.npz       step_{i}_{app,mot,q,qlen,ans} arrays
  ref_grads0.pt         {param name: grad} after the FIRST backward (the
                        deterministic pre-optimizer numerics gate)

NOTE the reference trainer quirk (SURVEY.md 2.11-1): train.py never passes
unit_layers to the model, so the reference ALWAYS trains with the signature
default unit_layers=2 (models.py:36). The parent must therefore build the
TPU model with unit_layers=2 to compare like against like.
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import sys
import types

REFERENCE = "/root/reference"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True, help="synthetic fixture dir")
    ap.add_argument("--out", required=True)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--vision-dim", type=int, default=64)
    ap.add_argument("--module-dim", type=int, default=64)
    ap.add_argument("--word-dim", type=int, default=32)
    ap.add_argument("--num-of-nodes", type=int, default=4)
    ap.add_argument("--alpha", type=float, default=1.0)
    ap.add_argument("--beta", type=float, default=1e-8)
    ap.add_argument("--seed", type=int, default=666)
    ap.add_argument(
        "--steps", type=int, default=0,
        help="run exactly N batches of one epoch with deterministic "
        "(dropout-off, BN-running-stats) forwards and record per-step "
        "losses + batches (0 = normal epoch mode)",
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import numpy as np
    import torch

    # ---- CPU-safe reference import (cf. tests/test_reference_port.py) ----
    sys.path.insert(0, REFERENCE)
    if "easydict" not in sys.modules:
        m = types.ModuleType("easydict")

        class EasyDict(dict):
            # like the real easydict: dicts assigned via attribute access
            # are recursively wrapped (the reference relies on this —
            # config.py does ``__C.train = dict(__C.train)`` and still uses
            # cfg.train.lr afterwards)
            __getattr__ = dict.__getitem__

            def __setattr__(self, k, v):
                if isinstance(v, dict) and not isinstance(v, EasyDict):
                    v = EasyDict(v)
                self[k] = v

        m.EasyDict = EasyDict
        sys.modules["easydict"] = m

    orig_to = torch.Tensor.to

    def cpu_to(self, *a, **k):
        if a and isinstance(a[0], str) and a[0].startswith("cuda"):
            return self
        return orig_to(self, *a, **k)

    torch.Tensor.to = cpu_to
    torch.Tensor.cuda = lambda self, *a, **k: self

    step_losses: list = []
    captured_batches: list = []
    if args.steps:
        # deterministic forwards, documented (see module docstring):
        # dropout -> identity at the functional root (nn.Dropout.forward
        # resolves F.dropout at call time)
        import torch.nn.functional as F

        F.dropout = lambda x, p=0.5, training=False, inplace=False: x

        # BatchNorm1d -> always running statistics (never batch stats)
        def bn_eval_forward(self, x):
            return torch.nn.functional.batch_norm(
                x, self.running_mean, self.running_var, self.weight,
                self.bias, False, 0.0, self.eps,
            )

        torch.nn.BatchNorm1d.forward = bn_eval_forward

        # per-step TOTAL loss (CE + alpha*common + beta*HSIC): the only
        # backward() in the loop is the total loss (reference train.py:155).
        # After the FIRST backward, also snapshot every parameter gradient —
        # the pre-optimizer step-0 gradients are the deterministic numerics
        # gate (Adam's first step is ~±lr*sign(g), so near-zero-gradient
        # elements amplify fp32 reduction-order noise into whole-update
        # sign flips — trajectories chaos-diverge even between two correct
        # implementations; raw gradients cannot).
        orig_backward = torch.Tensor.backward
        grads0: dict = {}

        def recording_backward(self, *a, **k):
            step_losses.append(float(self.detach()))
            out = orig_backward(self, *a, **k)
            if len(step_losses) == 1 and "model" in captured:
                for n, p in captured["model"].named_parameters():
                    if p.grad is not None:
                        grads0[n] = p.grad.detach().clone()
            return out

        torch.Tensor.backward = recording_backward

    import train as ref_train  # /root/reference/train.py
    from config import cfg  # reference global config defaults

    if args.steps:
        # truncate the epoch to N batches, recording each consumed batch so
        # the parent replays IDENTICAL data through its own train step
        real_loader_cls = ref_train.VideoQADataLoader

        class StepLoader(real_loader_cls):
            def __iter__(self):
                for j, b in enumerate(super().__iter__()):
                    if j >= args.steps:
                        break
                    captured_batches.append([np.asarray(x) for x in b])
                    yield b

        ref_train.VideoQADataLoader = StepLoader

    # no 10 s naps before checkpoint saves (reference train.py:366)
    import time as _time

    ref_train.time = types.SimpleNamespace(
        sleep=lambda s: None, localtime=_time.localtime, strftime=_time.strftime
    )

    # ---- capture the constructed model's initial + final weights ---------
    real_ctor = ref_train.modelset.DualVGR
    captured = {}

    def capturing_ctor(**kw):
        model = real_ctor(**kw)
        captured["init"] = copy.deepcopy(model.state_dict())
        captured["model"] = model
        return model

    ref_train.modelset = types.SimpleNamespace(DualVGR=capturing_ctor)

    # ---- record every per-epoch validation -------------------------------
    real_validate = ref_train.validate
    accs = {"val_acc": [], "categories": None, "n_val": None}

    def recording_validate(cfg_, model, data, device, write_preds=False):
        out = real_validate(cfg_, model, data, device, write_preds)
        accs["val_acc"].append(float(out[0]))
        accs["categories"] = [float(x) for x in out[1:]]
        accs["n_val"] = len(data.dataset)
        return out

    ref_train.validate = recording_validate

    # ---- reference cfg, pointed at the fixture ---------------------------
    name = "svqa"
    d = args.data_dir
    cfg.dataset.name = name
    cfg.dataset.data_dir = d
    cfg.dataset.save_dir = os.path.join(args.out, "ref_results")
    cfg.dataset.appearance_feat = os.path.join(d, f"{name}_appearance_feat.h5")
    cfg.dataset.motion_feat = os.path.join(d, f"{name}_motion_feat.h5")
    cfg.dataset.vocab_json = os.path.join(d, f"{name}_vocab.json")
    cfg.dataset.train_question_pt = os.path.join(d, f"{name}_train_questions.pt")
    cfg.dataset.val_question_pt = os.path.join(d, f"{name}_val_questions.pt")
    cfg.model_type = "DualVGR"
    cfg.graph_module = "GAT"
    cfg.graph_layers = 1
    cfg.num_workers = 0
    cfg.multi_gpus = False
    cfg.train.lr = args.lr
    cfg.train.batch_size = args.batch_size
    cfg.train.max_epochs = args.epochs
    cfg.train.vision_dim = args.vision_dim
    cfg.train.word_dim = args.word_dim
    cfg.train.module_dim = args.module_dim
    cfg.train.num_of_nodes = args.num_of_nodes
    cfg.train.train_num = 0
    cfg.train.glove = True
    cfg.train.restore = False
    cfg.val.flag = not args.steps  # step mode: no val loader, no validate()
    cfg.val.val_num = 0
    if args.steps:
        cfg.train.max_epochs = 1
    cfg.alpha = args.alpha
    cfg.beta = args.beta
    os.makedirs(cfg.dataset.save_dir, exist_ok=True)

    # seeding exactly as reference main() does (train.py:425-428)
    torch.manual_seed(args.seed)
    np.random.seed(args.seed)

    ref_train.train(cfg)

    torch.save(captured["init"], os.path.join(args.out, "ref_init_state.pt"))
    torch.save(
        captured["model"].state_dict(), os.path.join(args.out, "ref_final_state.pt")
    )
    with open(os.path.join(args.out, "ref_accs.json"), "w") as f:
        json.dump(accs, f, indent=2)
    if args.steps:
        with open(os.path.join(args.out, "ref_step_losses.json"), "w") as f:
            json.dump(step_losses, f)
        torch.save(grads0, os.path.join(args.out, "ref_grads0.pt"))
        # svqa batch layout (reference DataLoader.py:77-84): (video_idx,
        # q_idx, category, answer, app, mot, question, q_len)
        arrays = {}
        for i, b in enumerate(captured_batches):
            arrays[f"step_{i}_ans"] = b[-5]
            arrays[f"step_{i}_app"] = b[-4]
            arrays[f"step_{i}_mot"] = b[-3]
            arrays[f"step_{i}_q"] = b[-2]
            arrays[f"step_{i}_qlen"] = b[-1]
        np.savez(os.path.join(args.out, "ref_batches.npz"), **arrays)
    print("REF_WORKER_OK", json.dumps(step_losses if args.steps else accs["val_acc"]))


if __name__ == "__main__":
    main()
