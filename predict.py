"""End-to-end video->answer pipeline: raw video + question -> answer, on TPU.

The fused form of BASELINE config #5: clip sampling + ResNet-101 appearance +
3D ResNeXt-101 motion feature extraction + the DualVGR network run as one
program (the reference splits this across two offline CLIs plus an HDF5
round-trip; here the features go straight from the backbones into the
reasoning network on device).

    python predict.py --cfg configs/msvd_qa_DualVGR.yml \
        --video clip.mp4 --question "what is the man doing?" \
        [--appearance_ckpt resnet101.pth --motion_ckpt resnext101.pth] \
        [--unit_layers 1] [--topk 5]

Requires a trained DualVGR checkpoint under {save_dir}/{exp_name}/ckpt (from
train.py) and the dataset vocab json. Backbone checkpoints are optional
(random weights otherwise — useful only for smoke tests).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from dualvgr_tpu import config as config_mod
from dualvgr_tpu.config import cfg_from_file, model_runtime_kwargs, resolve_dataset_paths
from dualvgr_tpu.data.vocab import load_vocab
from dualvgr_tpu.models import DualVGR
from dualvgr_tpu import train_lib
from dualvgr_tpu.parallel import mesh_for, place_state
from dualvgr_tpu.utils.checkpoint import load_model_kwargs, restore_checkpoint

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from preprocess.datautils.questions_common import (  # noqa: E402
    encode_tokens,
    tokenize_question,
)
from preprocess.preprocess_features import (  # noqa: E402
    build_appearance_extractor,
    build_motion_extractor,
    extract_clips_with_consecutive_frames,
)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", dest="cfg_file", required=True)
    p.add_argument("--video", required=True, nargs="+", help="video file(s)")
    p.add_argument("--question", required=True, nargs="+", help="question(s), quoted")
    p.add_argument("--unit_layers", type=int, default=1)
    p.add_argument("--appearance_ckpt", default="")
    p.add_argument("--motion_ckpt", default="")
    p.add_argument("--topk", type=int, default=5)
    # reduced resolutions mirror preprocess_features' flags: random-weight
    # smoke runs (and the e2e test) don't need the full 224/112 cost
    p.add_argument("--appearance_size", type=int, default=224)
    p.add_argument("--motion_size", type=int, default=112)
    args = p.parse_args(argv)
    if len(args.video) != len(args.question):
        if len(args.video) == 1:
            args.video = args.video * len(args.question)
        else:
            p.error("--video and --question counts must match (or one video)")

    cfg = cfg_from_file(args.cfg_file)
    cfg.dataset.save_dir = os.path.join(cfg.dataset.save_dir, cfg.exp_name)
    ckpt_dir = os.path.join(cfg.dataset.save_dir, "ckpt")
    cfg = resolve_dataset_paths(cfg)
    vocab = load_vocab(cfg.dataset.vocab_json)

    mesh = mesh_for(cfg)
    num_clips = cfg.train.num_of_nodes  # clips == graph nodes (SURVEY section 2.1)

    # ---- stage 1: video -> clip features, straight through the backbones
    app_extract = build_appearance_extractor(args.appearance_ckpt, mesh)
    mot_extract = build_motion_extractor(args.motion_ckpt, mesh)
    app_feats, mot_feats = [], []
    def pad_rows(x):
        """Pad the leading dim up to a mesh.size multiple by cycling rows
        (a plain x[:pad] tail under-pads whenever pad > len(x), e.g.
        num_clips=2 on an 8-device mesh)."""
        pad = (-len(x)) % mesh.size
        if not pad:
            return x
        return x[np.arange(len(x) + pad) % len(x)]

    a_hw = (args.appearance_size, args.appearance_size)
    m_hw = (args.motion_size, args.motion_size)
    for path in args.video:
        clips_a, ok_a = extract_clips_with_consecutive_frames(
            path, num_clips, 16, a_hw, motion_layout=False
        )
        clips_m, ok_m = extract_clips_with_consecutive_frames(
            path, num_clips, 16, m_hw, motion_layout=True
        )
        if not (ok_a and ok_m):
            print(f"WARNING: failed to decode {path}; using zero features")
        frames = pad_rows(clips_a.reshape(num_clips * 16, 3, *a_hw))
        app = app_extract(frames)[: num_clips * 16].reshape(num_clips, 16, 2048)
        mot = mot_extract(pad_rows(clips_m))[:num_clips]
        app_feats.append(app)
        mot_feats.append(mot)
    app_feats = np.stack(app_feats).astype(np.float32)
    mot_feats = np.stack(mot_feats).astype(np.float32)

    # ---- stage 2: questions -> padded token ids
    encoded = [
        encode_tokens(tokenize_question(q if q.endswith("?") else q + "?"),
                      vocab["question_token_to_idx"])
        for q in args.question
    ]
    qlen = np.asarray([len(e) for e in encoded], np.int32)
    t = int(qlen.max())
    questions = np.zeros((len(encoded), t), np.int32)
    for i, e in enumerate(encoded):
        questions[i, : len(e)] = e

    # ---- stage 3: DualVGR inference from the restored checkpoint
    kw = load_model_kwargs(ckpt_dir)
    model = DualVGR(
        vision_dim=kw["vision_dim"],
        module_dim=kw["module_dim"],
        word_dim=kw["word_dim"],
        question_vocab_size=len(vocab["question_token_to_idx"]),
        num_answers=len(vocab["answer_token_to_idx"]),
        num_of_nodes=kw["num_of_nodes"],
        graph_layers=kw["graph_layers"],
        unit_layers=args.unit_layers,
        graph_module=kw.get("graph_module", "GAT"),
        **model_runtime_kwargs(cfg),
    )
    import jax

    optimizer = train_lib.make_optimizer(
        cfg.train.lr, 1,
        # the checkpointed opt_state's STRUCTURE depends on grad_accum
        # (optax.MultiSteps wraps the chain): build the restore target
        # with the same cfg knob or orbax rejects the tree
        grad_accum=int(cfg.tpu.get("grad_accum", 1)),
    )
    state = train_lib.create_train_state(
        model, jax.random.key(cfg.seed, impl=config_mod.resolved_prng_impl(cfg)),
        (app_feats[:1], mot_feats[:1], questions[:1], qlen[:1]), optimizer,
    )
    _, state = restore_checkpoint(ckpt_dir, state)
    state = place_state(state, mesh)

    eval_fn = train_lib.jit_eval_step(model)
    logits = np.asarray(eval_fn(state, (app_feats, mot_feats, questions, qlen)))

    answer_vocab = vocab["answer_idx_to_token"]
    for i, q in enumerate(args.question):
        order = np.argsort(-logits[i])[: args.topk]
        probs = np.exp(logits[i] - logits[i].max())
        probs /= probs.sum()
        print(f"\nvideo: {args.video[i]}")
        print(f"Q: {q}")
        for rank, idx in enumerate(order, 1):
            print(f"  {rank}. {answer_vocab[int(idx)]}  (p={probs[idx]:.3f})")
    return logits


if __name__ == "__main__":
    main()
