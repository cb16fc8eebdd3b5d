"""Serving driver — batched video-QA inference over HTTP.

Beyond the reference (which ships only offline train/validate CLIs): loads
the best train.py checkpoint and the precomputed feature HDF5s, then serves

    POST /answer   {"video_id": "<id>", "question": "what is ...?"}
        -> {"answer": "...", "topk": [{"answer": ..., "score": ...}, ...]}
    GET  /healthz  -> {"ok": true}
    GET  /stats    -> batching/latency counters

All concurrent requests funnel through one fixed-shape compiled program via
``dualvgr_tpu.serving.BatchingEngine`` (the measured throughput curve is
flat from batch 8 — benchmarks/serving_latency.py — so a single padded
batch shape is optimal; see dualvgr_tpu/serving.py).

    python serve.py --cfg configs/msvd_qa_DualVGR.yml [--port 8000]
        [--max-batch 32] [--max-wait-ms 2] [--topk 5] [--unit_layers 1]

AOT deployment: ``--artifact model.dvgr`` serves a pre-exported StableHLO
program (``python -m dualvgr_tpu.export``) instead of re-tracing the
checkpoint — see dualvgr_tpu/export.py.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from dualvgr_tpu.config import cfg_from_file, model_runtime_kwargs, resolve_dataset_paths
from dualvgr_tpu import config as config_mod
from dualvgr_tpu.data.features import FeatureStore
from dualvgr_tpu.data.vocab import load_vocab
from dualvgr_tpu.export import build_predict_fn, load_artifact, per_device_predict_fns
from dualvgr_tpu.models import DualVGR
from dualvgr_tpu.serving import BatchingEngine, ReplicatedEngine
from dualvgr_tpu import train_lib
from dualvgr_tpu.utils import setup_logging
from dualvgr_tpu.utils.checkpoint import load_model_kwargs, restore_checkpoint

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from preprocess.datautils.questions_common import (  # noqa: E402
    encode_tokens,
    tokenize_question,
)


def _assemble(cfg, predict, max_batch: int, max_wait_ms: float, max_q_len: int):
    """Stores + vocab + engine + answer closure around a predict fn (or a
    list of per-replica predict fns -> ReplicatedEngine)."""
    cfg = resolve_dataset_paths(cfg)
    vocab = load_vocab(cfg.dataset.vocab_json)
    app_store = FeatureStore(
        cfg.dataset.appearance_feat, "resnet_features",
        cache_gb=cfg.tpu.feature_cache_gb,
    )
    mot_store = FeatureStore(
        cfg.dataset.motion_feat, "resnext_features",
        cache_gb=cfg.tpu.feature_cache_gb,
    )
    app_shape = tuple(app_store.shape[1:])  # (clips, frames, D)
    mot_shape = tuple(mot_store.shape[1:])  # (clips, D)
    kwargs = dict(
        max_batch=max_batch,
        max_wait_ms=max_wait_ms,
        max_q_len=max_q_len,
        feature_shapes=(app_shape, mot_shape),
    )
    if isinstance(predict, (list, tuple)):
        engine = ReplicatedEngine(list(predict), **kwargs)
    else:
        engine = BatchingEngine(predict, **kwargs)
    ans_vocab = vocab["answer_idx_to_token"]
    q_vocab = vocab["question_token_to_idx"]

    def answer(video_id: str, question: str) -> dict:
        try:
            rows = app_store.rows_for_video_ids([video_id])
            app = app_store.gather(rows)[0]
            mot = mot_store.gather(mot_store.rows_for_video_ids([video_id]))[0]
        except (KeyError, ValueError):
            raise KeyError(f"unknown video_id {video_id!r}")
        tokens = tokenize_question(question if question.endswith("?") else question + "?")
        ids = np.asarray(encode_tokens(tokens, q_vocab), np.int32)[:max_q_len]
        top_i, top_p = engine.submit(app, mot, ids)
        return {
            "answer": ans_vocab[int(top_i[0])],
            "topk": [
                {"answer": ans_vocab[int(i)], "score": round(float(p), 6)}
                for i, p in zip(top_i, top_p)
            ],
        }

    return engine, answer, (app_store, mot_store)


def _replicate(predict, replicas: int, model=None, variables=None, topk=None):
    """1 replica -> the plain predict fn; N -> per-device pinned copies."""
    if replicas <= 1:
        return predict
    import jax

    devices = jax.devices()
    if replicas > len(devices):
        raise ValueError(f"--replicas {replicas} > {len(devices)} devices")
    if model is not None:
        return per_device_predict_fns(
            model, variables, topk, devices=devices[:replicas]
        )
    return per_device_predict_fns(predict, devices=devices[:replicas])


def build_engine_from_artifact(cfg, artifact: str, max_wait_ms: float,
                               replicas: int = 1):
    """AOT path: the serving program comes from a ``.dvgr`` export artifact
    (dualvgr_tpu/export.py) — no checkpoint, no model re-trace; batch
    shape / q-len / top-k come from the artifact header."""
    predict, meta = load_artifact(artifact)
    return _assemble(
        cfg, _replicate(predict, replicas),
        meta["max_batch"], max_wait_ms, meta["max_q_len"],
    )


def build_engine(cfg, unit_layers: int, max_batch: int, max_wait_ms: float,
                 topk: int, max_q_len: int = 32, replicas: int = 1):
    """Checkpoint + features + vocab -> (engine, answer_fn, stores)."""
    import jax
    import jax.numpy as jnp

    ckpt_dir = os.path.join(cfg.dataset.save_dir, "ckpt")
    assert os.path.exists(os.path.join(ckpt_dir, "model")), f"no checkpoint in {ckpt_dir}"
    paths_cfg = resolve_dataset_paths(cfg)

    vocab = load_vocab(paths_cfg.dataset.vocab_json)
    kw = load_model_kwargs(ckpt_dir)
    model = DualVGR(
        vision_dim=kw["vision_dim"],
        module_dim=kw["module_dim"],
        word_dim=kw["word_dim"],
        question_vocab_size=len(vocab["question_token_to_idx"]),
        num_answers=len(vocab["answer_token_to_idx"]),
        num_of_nodes=kw["num_of_nodes"],
        graph_layers=kw["graph_layers"],
        unit_layers=unit_layers,
        graph_module=kw.get("graph_module", "GAT"),
        **model_runtime_kwargs(cfg),
    )

    example_dims = FeatureStore(paths_cfg.dataset.appearance_feat, "resnet_features")
    app_shape = tuple(example_dims.shape[1:])
    example_dims.close()
    example = (
        np.zeros((1,) + app_shape, np.float32),
        np.zeros((1, app_shape[0], app_shape[-1]), np.float32),
        np.zeros((1, max_q_len), np.int32),
        np.ones((1,), np.int32),
    )
    optimizer = train_lib.make_optimizer(
        cfg.train.lr, 1,
        # the checkpointed opt_state's STRUCTURE depends on grad_accum
        # (optax.MultiSteps wraps the chain): build the restore target
        # with the same cfg knob or orbax rejects the tree
        grad_accum=int(cfg.tpu.get("grad_accum", 1)),
    )
    state = train_lib.create_train_state(
        model,
        jax.random.key(cfg.seed, impl=config_mod.resolved_prng_impl(cfg)),
        example,
        optimizer,
    )
    _, state = restore_checkpoint(ckpt_dir, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    k = min(topk, len(vocab["answer_token_to_idx"]))
    if replicas > 1:
        predict = _replicate(None, replicas, model=model, variables=variables, topk=k)
    else:
        predict = jax.jit(build_predict_fn(model, variables, k))
    return _assemble(cfg, predict, max_batch, max_wait_ms, max_q_len)


class _Handler(BaseHTTPRequestHandler):
    # set on the server instance: .engine, .answer_fn
    def _send(self, code: int, obj: dict):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 (stdlib API)
        if self.path == "/healthz":
            self._send(200, {"ok": True})
        elif self.path == "/stats":
            self._send(200, self.server.engine.stats())
        else:
            self._send(404, {"error": "not found"})

    def do_POST(self):  # noqa: N802
        if self.path != "/answer":
            self._send(404, {"error": "not found"})
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(length) or b"{}")
            video_id = payload["video_id"]
            question = payload["question"]
        except (KeyError, ValueError) as e:
            self._send(400, {"error": f"bad request: {e}"})
            return
        try:
            self._send(200, self.server.answer_fn(video_id, question))
        except KeyError as e:
            self._send(404, {"error": str(e)})
        except Exception as e:  # noqa: BLE001 — surface, don't crash the server
            logging.exception("inference error")
            self._send(500, {"error": f"{type(e).__name__}: {e}"})

    def log_message(self, fmt, *args):  # route to logging, not stderr
        logging.info("%s %s", self.address_string(), fmt % args)


def make_server(host: str, port: int, engine, answer_fn) -> ThreadingHTTPServer:
    srv = ThreadingHTTPServer((host, port), _Handler)
    srv.engine = engine
    srv.answer_fn = answer_fn
    return srv


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", dest="cfg_file", required=True)
    p.add_argument("--unit_layers", type=int, default=1)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-batch", type=int, default=32)
    p.add_argument("--max-wait-ms", type=float, default=2.0)
    p.add_argument("--topk", type=int, default=5)
    p.add_argument(
        "--replicas", type=int, default=1,
        help="serve N per-device model replicas with round-robin dispatch "
        "(multi-chip serving scales by replication — the model saturates "
        "one chip at batch 8; see dualvgr_tpu/serving.py)",
    )
    p.add_argument(
        "--artifact", default=None,
        help="serve an AOT .dvgr export (python -m dualvgr_tpu.export) "
        "instead of loading the checkpoint; batch/q-len/top-k come from "
        "the artifact header",
    )
    args = p.parse_args(argv)

    cfg = cfg_from_file(args.cfg_file)
    cfg.dataset.save_dir = os.path.join(cfg.dataset.save_dir, cfg.exp_name)
    setup_logging()

    if args.artifact:
        engine, answer_fn, _stores = build_engine_from_artifact(
            cfg, args.artifact, args.max_wait_ms, replicas=args.replicas
        )
    else:
        engine, answer_fn, _stores = build_engine(
            cfg, args.unit_layers, args.max_batch, args.max_wait_ms, args.topk,
            replicas=args.replicas,
        )
    # warm the compiled program(s) before accepting traffic (first compile of
    # the flagship program is tens of seconds; healthz turns green after).
    # Round-robin dispatch means `replicas` submissions touch every replica.
    logging.info("warming up (first compile)...")
    app_shape, mot_shape = engine._feature_shapes
    for _ in range(max(1, args.replicas)):
        engine.submit(
            np.zeros(app_shape, np.float32),
            np.zeros(mot_shape, np.float32),
            np.array([1], np.int32),
            timeout=600.0,
        )
    logging.info("warm; compiled batch shape (%d, ...)", engine.max_batch)
    srv = make_server(args.host, args.port, engine, answer_fn)
    logging.info("serving on %s:%d (max_batch=%d, max_wait=%.1fms)",
                 args.host, args.port, args.max_batch, args.max_wait_ms)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.shutdown()
        engine.close()


if __name__ == "__main__":
    main()
