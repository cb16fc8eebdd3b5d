"""Eval driver — reference CLI surface on the TPU-native stack.

Usage (identical to reference validate.py:238-242):
    python validate.py --cfg configs/svqa_DualVGR_20.yml --unit_layers 1

Loads the best checkpoint saved by train.py (from {save_dir}/{exp_name}/ckpt
— fixing the reference's hardcoded timestamped filename, validate.py:252),
rebuilds the model from the saved model_kwargs + fresh vocab + CLI
--unit_layers (validate.py:281-284), runs the test split, and prints overall
+ per-category accuracy; with test.write_preds it dumps preds/test_preds.json
and prints 10 qualitative samples (validate.py:328-363).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

import jax
import numpy as np

from dualvgr_tpu.config import cfg_from_file, model_runtime_kwargs, resolve_dataset_paths
from dualvgr_tpu import config as config_mod
from dualvgr_tpu.data import VideoQADataLoader
from dualvgr_tpu.models import DualVGR
from dualvgr_tpu import train_lib, validate_lib
from dualvgr_tpu.parallel import mesh_for, place_state
from dualvgr_tpu.utils import colored, setup_logging
from dualvgr_tpu.utils.checkpoint import load_model_kwargs, restore_checkpoint


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", dest="cfg_file", default="msvdqa_DualVGR.yml", type=str)
    parser.add_argument("--unit_layers", dest="unit_layers", default=1, type=int)
    args = parser.parse_args(argv)

    cfg = cfg_from_file(args.cfg_file)
    assert cfg.dataset.name in ["svqa", "msrvtt-qa", "msvd-qa"]
    assert os.path.exists(cfg.dataset.data_dir)
    setup_logging()

    cfg.dataset.save_dir = os.path.join(cfg.dataset.save_dir, cfg.exp_name)
    ckpt_dir = os.path.join(cfg.dataset.save_dir, "ckpt")
    assert os.path.exists(os.path.join(ckpt_dir, "model")), f"no checkpoint in {ckpt_dir}"
    cfg = resolve_dataset_paths(cfg)

    test_loader = VideoQADataLoader(
        question_pt=cfg.dataset.test_question_pt,
        vocab_json=cfg.dataset.vocab_json,
        appearance_feat=cfg.dataset.appearance_feat,
        motion_feat=cfg.dataset.motion_feat,
        test_num=cfg.test.test_num,
        batch_size=cfg.train.batch_size,
        num_workers=cfg.num_workers,
        shuffle=False,
        seed=cfg.seed,
        feature_cache_gb=cfg.tpu.feature_cache_gb,
        prefetch=cfg.tpu.prefetch,
        transfer_dtype=cfg.tpu.transfer_dtype,
    )

    # rebuild model from saved kwargs + fresh vocab + CLI unit_layers
    # (reference validate.py:281-284)
    kw = load_model_kwargs(ckpt_dir)
    if "unit_layers" in kw and kw["unit_layers"] != args.unit_layers:
        # a mismatch otherwise surfaces as an opaque orbax tree-structure
        # error; common with IMPORTED reference checkpoints, which hold 2
        # banks regardless of the training flag (the reference trainer
        # never forwards --unit_layers, reference train.py:58-66)
        logging.warning(
            "checkpoint was saved with unit_layers=%d but --unit_layers=%d; "
            "restore will fail unless they match",
            kw["unit_layers"], args.unit_layers,
        )
    vocab = test_loader.vocab
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

    # metadata-only example shapes (no batch pull, no producer thread)
    example = test_loader.example_batch(1)
    optimizer = train_lib.make_optimizer(
        cfg.train.lr, len(test_loader),
        # the checkpointed opt_state's STRUCTURE depends on grad_accum
        # (optax.MultiSteps wraps the chain): build the restore target
        # with the same cfg knob or orbax rejects the tree
        grad_accum=int(cfg.tpu.get("grad_accum", 1)),
    )
    state = train_lib.create_train_state(model, jax.random.key(cfg.seed, impl=config_mod.resolved_prng_impl(cfg)), example, optimizer)
    _, state = restore_checkpoint(ckpt_dir, state)

    mesh = mesh_for(cfg)
    state = place_state(state, mesh)
    eval_fn = train_lib.jit_pred_step(model)

    cat_names = validate_lib.category_names(cfg.dataset.name)
    if cfg.test.write_preds:
        acc, preds, gts, v_ids, q_ids, *cat_accs = validate_lib.validate(
            cfg, eval_fn, state, test_loader, write_preds=True, mesh=mesh
        )
    else:
        acc, *cat_accs = validate_lib.validate(
            cfg, eval_fn, state, test_loader, write_preds=False, mesh=mesh
        )

    sys.stdout.write(
        "~~~~~~ Test Accuracy: {} ~~~~~~~\n".format(colored(f"{acc:.4f}", "red"))
    )
    for nm, a in zip(cat_names, cat_accs):
        sys.stdout.write("    {} Accuracy: {}\n".format(nm, colored(f"{a:.4f}", "red")))
    sys.stdout.flush()

    if cfg.test.write_preds:
        # dump preds JSON + 10 qualitative samples, same fields as the
        # reference (validate.py:328-363): video_id, question_id, video_name,
        # decoded question tokens, answer, prediction
        import pickle

        out_dir = os.path.join(cfg.dataset.save_dir, "preds")
        os.makedirs(out_dir, exist_ok=True)
        out_path = os.path.join(out_dir, "test_preds.json")
        qvocab = test_loader.vocab["question_idx_to_token"]
        with open(cfg.dataset.test_question_pt, "rb") as f:
            obj = pickle.load(f)
        by_qid = {
            str(qid): (name, q_row)
            for qid, name, q_row in zip(
                obj["question_id"], obj["video_names"], obj["questions"]
            )
        }
        instances = [
            {
                "video_id": v,
                "question_id": q,
                "video_name": str(by_qid[str(q)][0]),
                "question": [qvocab[int(w)] for w in by_qid[str(q)][1] if w != 0],
                "answer": gt,
                "prediction": p,
            }
            for v, q, gt, p in zip(v_ids, q_ids, gts, preds)
        ]
        with open(out_path, "w") as f:
            json.dump(instances, f)
        logging.info("wrote %d predictions to %s", len(instances), out_path)
        sys.stdout.write("Display 10 samples...\n")
        for inst in instances[:10]:
            sys.stdout.write(
                "Video name: {}\nQuestion: {}?\nPrediction: {}\nGroundtruth: {}\n".format(
                    inst["video_name"], " ".join(inst["question"]),
                    inst["prediction"], inst["answer"],
                )
            )
    return acc


if __name__ == "__main__":
    main()
