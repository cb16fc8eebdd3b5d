"""Ahead-of-time serving export: model + weights -> one StableHLO artifact.

Beyond the reference (NJUPT-MCC/DualVGR-VideoQA ships only offline
train/validate drivers): a deployment path where the serving program is
exported ONCE — forward + softmax + top-k, weights embedded as constants —
and production hosts load the artifact and run it without the model code,
the checkpoint, or a re-trace. This is the TPU-native equivalent of the
torch ecosystem's TorchScript/ONNX export step, built on ``jax.export``
(StableHLO serialization with versioned compatibility guarantees).

Artifact format (single file, ``.dvgr``): an 8-byte magic, a 4-byte
little-endian JSON-header length, the JSON header (shapes, top_k, export
platforms — everything a serving host needs to validate inputs), then the
``jax.export`` payload. The payload embeds the variables, so the file is
self-contained; loading returns a callable with the exact
``predict_fn(app, mot, q, qlen) -> (top_ids, top_probs)`` contract that
``dualvgr_tpu.serving.BatchingEngine`` and serve.py consume.

The TPU-fast defaults survive export: Mosaic (Pallas) custom calls are on
``jax.export``'s stable-ABI allowlist, and a ``use_pallas=True`` artifact
was verified to serialize, deserialize and execute bit-identically to the
live model on a real v5e.

CLI (mirrors serve.py's checkpoint/feature plumbing)::

    python -m dualvgr_tpu.export --cfg configs/msvd_qa_DualVGR.yml \
        --out msvd.dvgr [--max-batch 32] [--topk 5] [--platforms cpu,tpu]

then ``python serve.py --cfg ... --artifact msvd.dvgr``.
"""

from __future__ import annotations

import json
import struct

import numpy as np

__all__ = [
    "build_predict_fn",
    "per_device_predict_fns",
    "export_serving",
    "save_artifact",
    "load_artifact",
]

_MAGIC = b"DVGRXPT1"


def build_predict_fn(model, variables, top_k: int):
    """The serving program: eval forward + softmax + top-k.

    Matches the contract of the reference's validate step
    (/root/reference/validate.py:28-76) with only (B, k) scalars crossing
    the host boundary.
    """
    import jax

    def predict(app, mot, q, qlen):
        logits = model.apply(variables, app, mot, q, qlen, train=False).logits
        probs = jax.nn.softmax(logits, axis=-1)
        top_p, top_i = jax.lax.top_k(probs, top_k)
        return top_i, top_p  # (ids, scores) — the BatchingEngine contract

    return predict


def per_device_predict_fns(fn_or_model, variables=None, top_k=None, devices=None):
    """Replica closures for :class:`dualvgr_tpu.serving.ReplicatedEngine`.

    Two forms: ``per_device_predict_fns(model, variables, top_k)`` builds the
    live predict fn then pins one jitted copy (weights included) per device;
    ``per_device_predict_fns(loaded_fn)`` pins copies of an
    :func:`load_artifact` callable. Each replica's numpy inputs commit to its
    own device via a SingleDeviceSharding, so the per-device programs never
    exchange data — multi-chip serving scales by replication (the single-chip
    batch-8 curve already saturates a chip; see serving.py).
    """
    import jax
    from jax.sharding import SingleDeviceSharding

    if devices is None:
        devices = jax.devices()
    fns = []
    for dev in devices:
        if variables is not None:
            # weights pinned to this replica's device BEFORE tracing, so the
            # closure never mixes placements across replicas
            base = build_predict_fn(
                fn_or_model, jax.device_put(variables, dev), top_k
            )
        else:
            base = fn_or_model
        s = SingleDeviceSharding(dev)
        fns.append(jax.jit(base, in_shardings=s, out_shardings=s))
    return fns


def export_serving(
    model,
    variables,
    *,
    max_batch: int,
    app_shape: tuple,
    mot_shape: tuple,
    max_q_len: int,
    top_k: int,
    platforms: tuple | None = None,
) -> tuple[bytes, dict]:
    """Export the fixed-shape serving program; returns (payload, meta).

    ``platforms`` lowers for multiple backends in one artifact (e.g.
    ``("cpu", "tpu")`` so the same file smoke-tests on a dev box and
    deploys to a chip); None = the current default backend only.
    """
    import jax
    from jax import export as jax_export

    predict = build_predict_fn(model, variables, top_k)
    args = (
        jax.ShapeDtypeStruct((max_batch,) + tuple(app_shape), np.float32),
        jax.ShapeDtypeStruct((max_batch,) + tuple(mot_shape), np.float32),
        jax.ShapeDtypeStruct((max_batch, max_q_len), np.int32),
        jax.ShapeDtypeStruct((max_batch,), np.int32),
    )
    fn = jax.jit(predict)
    if platforms is None:
        exported = jax_export.export(fn)(*args)
    else:
        exported = jax_export.export(fn, platforms=tuple(platforms))(*args)
    meta = {
        "max_batch": int(max_batch),
        "app_shape": [int(d) for d in app_shape],
        "mot_shape": [int(d) for d in mot_shape],
        "max_q_len": int(max_q_len),
        "top_k": int(top_k),
        "platforms": list(exported.platforms),
    }
    return exported.serialize(), meta


def save_artifact(path: str, payload: bytes, meta: dict) -> None:
    header = json.dumps(meta).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(header)))
        f.write(header)
        f.write(payload)


def load_artifact(path: str):
    """-> (predict_fn, meta). ``predict_fn`` is jitted for this process's
    default backend; raises ValueError if the artifact was not exported
    for it (the header's ``platforms`` list says what it supports)."""
    import jax
    from jax import export as jax_export

    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not a dualvgr export artifact")
        (hlen,) = struct.unpack("<I", f.read(4))
        meta = json.loads(f.read(hlen).decode())
        payload = f.read()
    exported = jax_export.deserialize(payload)
    backend = jax.default_backend()
    if backend not in {p.lower() for p in exported.platforms}:
        raise ValueError(
            f"{path}: exported for {exported.platforms}, but this process's "
            f"backend is {backend!r} — re-export with --platforms {backend}"
        )
    return jax.jit(exported.call), meta


def _main(argv=None):
    import argparse
    import logging
    import os

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cfg", dest="cfg_file", required=True)
    p.add_argument("--out", required=True, help="artifact path (.dvgr)")
    p.add_argument("--unit_layers", type=int, default=1)
    p.add_argument("--max-batch", type=int, default=32)
    p.add_argument("--max-q-len", type=int, default=32)
    p.add_argument("--topk", type=int, default=5)
    p.add_argument(
        "--platforms", default=None,
        help="comma-separated lowering platforms, e.g. cpu,tpu (default: "
        "current backend)",
    )
    args = p.parse_args(argv)

    import jax

    from dualvgr_tpu import config as config_mod
    from dualvgr_tpu import train_lib
    from dualvgr_tpu.config import (
        cfg_from_file,
        model_runtime_kwargs,
        resolve_dataset_paths,
    )
    from dualvgr_tpu.data.features import FeatureStore
    from dualvgr_tpu.data.vocab import load_vocab
    from dualvgr_tpu.models import DualVGR
    from dualvgr_tpu.utils import setup_logging
    from dualvgr_tpu.utils.checkpoint import load_model_kwargs, restore_checkpoint

    cfg = cfg_from_file(args.cfg_file)
    cfg.dataset.save_dir = os.path.join(cfg.dataset.save_dir, cfg.exp_name)
    setup_logging()
    ckpt_dir = os.path.join(cfg.dataset.save_dir, "ckpt")
    assert os.path.exists(os.path.join(ckpt_dir, "model")), f"no checkpoint in {ckpt_dir}"
    cfg = resolve_dataset_paths(cfg)

    vocab = load_vocab(cfg.dataset.vocab_json)
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
    app_store = FeatureStore(cfg.dataset.appearance_feat, "resnet_features")
    mot_store = FeatureStore(cfg.dataset.motion_feat, "resnext_features")
    try:
        app_shape = tuple(app_store.shape[1:])
        mot_shape = tuple(mot_store.shape[1:])
    finally:
        app_store.close()
        mot_store.close()

    example = (
        np.zeros((1,) + app_shape, np.float32),
        np.zeros((1,) + mot_shape, np.float32),
        np.zeros((1, args.max_q_len), np.int32),
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

    platforms = tuple(args.platforms.split(",")) if args.platforms else None
    payload, meta = export_serving(
        model,
        variables,
        max_batch=args.max_batch,
        app_shape=app_shape,
        mot_shape=mot_shape,
        max_q_len=args.max_q_len,
        top_k=min(args.topk, len(vocab["answer_token_to_idx"])),
        platforms=platforms,
    )
    save_artifact(args.out, payload, meta)
    logging.info(
        "wrote %s (%.1f MB, platforms=%s, batch=%d, topk=%d)",
        args.out, len(payload) / 1e6, meta["platforms"], meta["max_batch"],
        meta["top_k"],
    )


if __name__ == "__main__":
    _main()
