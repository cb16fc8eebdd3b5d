"""Train driver — reference CLI surface on the TPU-native stack.

Usage (identical to reference train.py:370-376):
    python train.py --cfg configs/svqa_DualVGR_20.yml --alpha 1 --beta 1e-8 --unit_layers 1

Behavior mirrored from the reference train loop (reference train.py:27-326):
path templating, seeding (seed 666), loader construction, GloVe injection,
epoch loop with the colored ticker, CE + auxiliary losses with --alpha/--beta,
grad clip 12, Adam with x0.5 LR decay every 10 epochs, per-epoch validation
with per-category accuracy logging, and best-on-val checkpointing.

Deliberate fixes (SURVEY.md section 2.11): --unit_layers actually reaches the
model (the reference dropped it, train.py:58-66); the aux-loss loop no longer
shadows the batch index (train.py:151); checkpoints restore from the same
path they are saved to; no hardcoded CUDA devices.
"""

from __future__ import annotations

import argparse
import logging
import os
import shutil
import signal
import sys
import threading

import jax
import numpy as np

from dualvgr_tpu.config import cfg_from_file, model_runtime_kwargs, resolve_dataset_paths
from dualvgr_tpu import config as config_mod
from dualvgr_tpu.data import VideoQADataLoader
from dualvgr_tpu.models import DualVGR
from dualvgr_tpu import train_lib, validate_lib
from dualvgr_tpu.parallel import mesh_for, place_state, prefetch_to_device, shard_batch
from dualvgr_tpu.utils import MetricsWriter, setup_logging, train_ticker
from dualvgr_tpu.utils.checkpoint import (
    restore_checkpoint,
    save_checkpoint,
    saved_epoch,
)


def build_model(cfg, vocab) -> DualVGR:
    return DualVGR(
        vision_dim=cfg.train.vision_dim,
        module_dim=cfg.train.module_dim,
        word_dim=cfg.train.word_dim,
        question_vocab_size=len(vocab["question_token_to_idx"]),
        num_answers=len(vocab["answer_token_to_idx"]),
        num_of_nodes=cfg.train.num_of_nodes,
        graph_layers=cfg.graph_layers,
        unit_layers=cfg.unit_layers,
        graph_module=cfg.graph_module,
        **model_runtime_kwargs(cfg),
    )


def model_kwargs_tosave(cfg) -> dict:
    # reference saves model_kwargs minus vocab (train.py:67)
    return {
        "vision_dim": cfg.train.vision_dim,
        "module_dim": cfg.train.module_dim,
        "word_dim": cfg.train.word_dim,
        "num_of_nodes": cfg.train.num_of_nodes,
        "graph_module": cfg.graph_module,
        "graph_layers": cfg.graph_layers,
        "unit_layers": cfg.unit_layers,
    }


def train(cfg, stop_event=None):
    """``stop_event`` (threading.Event) requests a preemption-safe stop:
    the loop checkpoints to {ckpt}_autosave at the next metrics boundary
    and returns. The CLI wires SIGTERM/SIGINT to it (TPU pods preempt with
    a grace window); library callers may set it directly."""
    from dualvgr_tpu.parallel import maybe_initialize_distributed, process_batch_bounds

    # distributed bring-up FIRST: the train loader's host-sharded mode needs
    # jax.process_count()/index, and the mesh must span all hosts
    if maybe_initialize_distributed():
        logging.info("jax.distributed initialized (multi-host)")
    mesh = mesh_for(cfg)
    logging.info("device mesh: %s over %s", dict(mesh.shape), jax.devices()[0].platform)

    # host-sharded train loading: each host gathers only its contiguous
    # slice of the global batch (verified against the mesh's actual row
    # ownership); validation keeps global loading — every host sees the
    # full val set, matching the reference's accuracy bookkeeping
    host_index, host_count = 0, 1
    if jax.process_count() > 1:
        bs, per = cfg.train.batch_size, cfg.train.batch_size // jax.process_count()
        lo, hi = process_batch_bounds(mesh, cfg.tpu.mesh_axis, bs)
        if (lo, hi) == (jax.process_index() * per, (jax.process_index() + 1) * per):
            host_index, host_count = jax.process_index(), jax.process_count()
            logging.info(
                "host-sharded loading: rows [%d, %d) of each global batch", lo, hi
            )
        else:
            logging.warning(
                "process rows %s not the canonical slice; falling back to "
                "global loading on every host", (lo, hi),
            )

    logging.info("Create train_loader and val_loader.........")
    train_loader = VideoQADataLoader(
        question_pt=cfg.dataset.train_question_pt,
        vocab_json=cfg.dataset.vocab_json,
        appearance_feat=cfg.dataset.appearance_feat,
        motion_feat=cfg.dataset.motion_feat,
        train_num=cfg.train.train_num,
        batch_size=cfg.train.batch_size,
        num_workers=cfg.num_workers,
        shuffle=True,
        seed=cfg.seed,
        feature_cache_gb=cfg.tpu.feature_cache_gb,
        prefetch=cfg.tpu.prefetch,
        transfer_dtype=cfg.tpu.transfer_dtype,
        host_index=host_index,
        host_count=host_count,
    )
    logging.info("number of train instances: %d", train_loader.num_samples)
    val_loader = None
    if cfg.val.flag:
        val_loader = VideoQADataLoader(
            question_pt=cfg.dataset.val_question_pt,
            vocab_json=cfg.dataset.vocab_json,
            appearance_feat=cfg.dataset.appearance_feat,
            motion_feat=cfg.dataset.motion_feat,
            val_num=cfg.val.val_num,
            batch_size=cfg.train.batch_size,
            num_workers=cfg.num_workers,
            shuffle=False,
            seed=cfg.seed,
            feature_cache_gb=cfg.tpu.feature_cache_gb,
            prefetch=cfg.tpu.prefetch,
            transfer_dtype=cfg.tpu.transfer_dtype,
        )
        logging.info("number of val instances: %d", val_loader.num_samples)

    logging.info("Create model.........")
    model = build_model(cfg, train_loader.vocab)

    steps_per_epoch = len(train_loader)
    grad_accum = int(cfg.tpu.get("grad_accum", 1))
    optimizer = train_lib.make_optimizer(
        cfg.train.lr, steps_per_epoch, grad_accum=grad_accum
    )
    if grad_accum > 1:
        logging.info(
            "gradient accumulation: %d micro-batches per update "
            "(effective batch %d)", grad_accum, grad_accum * cfg.train.batch_size,
        )

    # example batch for shape-driven init: metadata-only (no RNG shuffle
    # consumed, no producer thread started — epoch-0 order stays identical
    # across train() calls with the same seed)
    example = train_loader.example_batch(1)
    # typed key carries the impl through splits; the checkpointer stores its
    # raw key_data (utils/checkpoint.py)
    rng = jax.random.key(cfg.seed, impl=config_mod.resolved_prng_impl(cfg))
    state = train_lib.create_train_state(model, rng, example, optimizer)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    logging.info("num of params: %d", n_params)

    if cfg.train.glove and train_loader.glove_matrix is not None:
        logging.info("load glove vectors")
        state = train_lib.set_glove(state, train_loader.glove_matrix)

    start_epoch = 0
    ckpt_dir = os.path.join(cfg.dataset.save_dir, "ckpt")
    autosave_dir = ckpt_dir + "_autosave"
    if cfg.train.restore:
        logging.info("Restore checkpoint and optimizer...")
        # prefer the autosave when it is at least as new as the best-val
        # checkpoint (a preempted/crashed run leaves one behind; a cleanly
        # finished run deletes it, restoring best-checkpoint semantics)
        best_ep, auto_ep = saved_epoch(ckpt_dir), saved_epoch(autosave_dir)
        if auto_ep is not None and (best_ep is None or auto_ep >= best_ep):
            restore_dir = autosave_dir
            logging.info("resuming from autosave (epoch %d)", auto_ep)
        elif best_ep is not None:
            restore_dir = ckpt_dir
        else:
            raise FileNotFoundError(
                f"train.restore is True but no checkpoint exists under {ckpt_dir} "
                f"or {autosave_dir} (best checkpoints are only written when "
                "validation accuracy improves)"
            )
        epoch, state = restore_checkpoint(restore_dir, state)
        # the restored epoch replays from its start: a partially-filled
        # grad-accum window would double-count its samples — drop it
        state = train_lib.reset_grad_accum(state)
        start_epoch = epoch + 1
    state = place_state(state, mesh, zero_opt=cfg.tpu.get("zero_opt", False))

    step_fn = train_lib.jit_train_step(model, optimizer, cfg.alpha, cfg.beta)
    eval_fn = train_lib.jit_pred_step(model)

    best_val = 0.0
    best_cats = None
    cat_names = validate_lib.category_names(cfg.dataset.name)

    profile_dir = cfg.tpu.get("profile_dir", "")
    profiling = False

    autosave_on = bool(cfg.tpu.get("autosave", True))
    preempted = False

    def _autosave(save_epoch: int, why: str):
        save_checkpoint(autosave_dir, save_epoch, state, model_kwargs_tosave(cfg))
        logging.info("autosaved train state (%s, resume epoch %d)", why, save_epoch + 1)

    metrics_path = str(cfg.tpu.get("metrics_jsonl", "") or "")
    if metrics_path and not os.path.isabs(metrics_path):
        metrics_path = os.path.join(cfg.dataset.save_dir, "log", metrics_path)
    if jax.process_index() != 0:
        metrics_path = ""  # one writer per run: other hosts would append
        # duplicate interleaved records to the same file on shared storage
    metrics_writer = MetricsWriter(metrics_path)
    # the lr actually applied is keyed on the optimizer STEP, which diverges
    # from epoch*steps_per_epoch after restores (imported checkpoints carry
    # epoch with step=0) — log the real schedule value, not an epoch formula
    # micro-step-unit schedule; the applied-lr lookup below converts the
    # last APPLIED update's count back to micro-steps (exactly what
    # make_optimizer's inner schedule sees, including non-divisible epochs)
    lr_schedule = train_lib.make_lr_schedule(cfg.train.lr, steps_per_epoch)

    logging.info("Start training........")
    for epoch in range(start_epoch, cfg.train.max_epochs):
        if profile_dir and epoch == start_epoch + 1 and not profiling:
            # trace the 2nd epoch (1st is compile-dominated)
            jax.profiler.start_trace(profile_dir)
            profiling = True
        logging.info(">>>>>> epoch %d <<<<<<", epoch)
        total_correct, total_count, total_loss, logged_steps = 0, 0, 0.0, 0
        log_every = max(int(cfg.tpu.get("log_every", 1)), 1)
        pending = []  # metrics fetched lazily so the device never idles

        def host_batches():
            for b in train_loader:
                yield (
                    b.appearance_feat,
                    b.motion_feat,
                    b.question,
                    b.question_len,
                    b.answer,
                    b.valid,
                )

        device_batches = prefetch_to_device(
            host_batches(), mesh, cfg.tpu.mesh_axis, size=cfg.tpu.prefetch,
            local=host_count > 1,
        )
        for i, device_batch in enumerate(device_batches):
            state, metrics = step_fn(state, device_batch)
            pending.append(metrics)
            if stop_event is not None and stop_event.is_set():
                # mid-epoch preemption: save with epoch-1 so resume re-runs
                # this epoch from its start (epoch-level granularity)
                if autosave_on:
                    _autosave(epoch - 1, f"preempted at step {i + 1}")
                preempted = True
                break
            if (i + 1) % log_every == 0 or (i + 1) == steps_per_epoch:
                for m in pending:
                    total_loss += float(m["loss"])
                    total_correct += float(m["correct"])
                    total_count += int(m["count"])
                    logged_steps += 1
                last = pending[-1]
                pending = []
                progress = epoch + (i + 1) / steps_per_epoch
                train_ticker(
                    progress,
                    float(last["ce"]),
                    total_loss / max(logged_steps, 1),
                    float(last["correct"]) / max(int(last["count"]), 1),
                    total_correct / max(total_count, 1),
                    cfg.exp_name,
                )
                if metrics_writer.enabled:  # int(state.step) is a device
                    # fetch; skip the sync entirely when the stream is off
                    opt_step = int(state.step)
                    metrics_writer.write(
                        "train",
                        epoch=epoch,
                        step=opt_step,
                        ce=round(float(last["ce"]), 6),
                        avg_loss=round(total_loss / max(logged_steps, 1), 6),
                        batch_acc=round(
                            float(last["correct"]) / max(int(last["count"]), 1), 6
                        ),
                        avg_acc=round(total_correct / max(total_count, 1), 6),
                        lr=float(
                            lr_schedule(
                                max((opt_step // grad_accum - 1) * grad_accum, 0)
                            )
                        ),
                    )
        sys.stdout.write("\n")
        if preempted:
            logging.warning(
                "stopping on preemption signal (epoch %d); resume with "
                "train.restore: True", epoch,
            )
            break
        logging.info(
            "Epoch = %d   avg_loss = %.3f    avg_acc = %.3f",
            epoch,
            total_loss / max(steps_per_epoch, 1),
            total_correct / max(total_count, 1),
        )

        if profiling:
            jax.profiler.stop_trace()
            profiling = False
            logging.info("wrote profiler trace to %s", profile_dir)

        if cfg.val.flag and val_loader is not None:
            valid_acc, *cat_accs = validate_lib.validate(
                cfg, eval_fn, state, val_loader, write_preds=False, mesh=mesh
            )
            logging.info("~~~~~~ Valid Accuracy: %.4f ~~~~~~~", valid_acc)
            for nm, a in zip(cat_names, cat_accs):
                logging.info("  %s accuracy: %.4f", nm, a)
            metrics_writer.write(
                "val",
                epoch=epoch,
                acc=round(float(valid_acc), 6),
                categories={nm: round(float(a), 6)
                            for nm, a in zip(cat_names, cat_accs)},
                best=bool(valid_acc > best_val),
            )
            if valid_acc > best_val:
                best_val = valid_acc
                best_cats = cat_accs
                save_checkpoint(ckpt_dir, epoch, state, model_kwargs_tosave(cfg))
                logging.info("saved best checkpoint (val acc %.4f)", best_val)

        if autosave_on:
            _autosave(epoch, "epoch end")

    if not preempted and os.path.exists(autosave_dir):
        # clean completion: drop the autosave so `train.restore: True`
        # restores the BEST checkpoint (reference semantics), not the last
        shutil.rmtree(autosave_dir)

    if best_cats is not None:
        logging.info("~~~~~~ Best Valid Accuracy: %.4f ~~~~~~~", best_val)
        for nm, a in zip(cat_names, best_cats):
            logging.info("  best %s accuracy: %.4f", nm, a)
    metrics_writer.close()
    return best_val, state


def main(argv=None):
    parser = argparse.ArgumentParser()
    # same four flags + defaults as reference train.py:370-375
    parser.add_argument("--cfg", dest="cfg_file", default="msvd_qa_DualVGR.yml", type=str)
    parser.add_argument("--alpha", dest="alpha", default=1, type=float)
    parser.add_argument("--beta", dest="beta", default=1e-8, type=float)
    parser.add_argument("--unit_layers", dest="unit_layers", default=1, type=int)
    args = parser.parse_args(argv)

    cfg = cfg_from_file(args.cfg_file)
    assert cfg.dataset.name in ["svqa", "msrvtt-qa", "msvd-qa"]
    assert os.path.exists(cfg.dataset.data_dir)

    cfg.dataset.save_dir = os.path.join(cfg.dataset.save_dir, cfg.exp_name)
    os.makedirs(cfg.dataset.save_dir, exist_ok=True)
    setup_logging(cfg.dataset.save_dir, cfg.model_type)

    cfg.alpha = args.alpha
    cfg.beta = args.beta
    cfg.unit_layers = args.unit_layers
    for k, v in cfg.items():
        logging.info("%s:%s", k, v)
    cfg = resolve_dataset_paths(cfg)

    np.random.seed(cfg.seed)

    # preemption-safe stop: first SIGTERM/SIGINT requests a checkpoint-and-
    # stop at the next step boundary; a second one falls through to the
    # default handler (hard kill) for operators who really mean it
    stop = threading.Event()
    prev_handlers = {}

    def _request_stop(signum, frame):
        logging.warning(
            "received signal %d: checkpointing to autosave, then stopping "
            "(send again to force)", signum,
        )
        stop.set()
        for s, h in prev_handlers.items():
            signal.signal(s, h)

    if threading.current_thread() is threading.main_thread():
        for s in (signal.SIGTERM, signal.SIGINT):
            prev_handlers[s] = signal.signal(s, _request_stop)
    try:
        return train(cfg, stop_event=stop)
    finally:
        for s, h in prev_handlers.items():
            signal.signal(s, h)


if __name__ == "__main__":
    main()
