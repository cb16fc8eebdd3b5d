"""Orbax checkpointing: best-on-val policy + restore.

Reference behavior being matched (reference train.py:359-367, 113-119;
validate.py:252-286): save {epoch, weights, optimizer state, model_kwargs}
when validation accuracy improves; restore rebuilds the model from the
saved model_kwargs + fresh vocab. Fixed reference quirks: no 10-second
sleep before saving (train.py:366), and save/restore use the SAME path so
resume needs no manual rename (the reference saves timestamped names but
restores a fixed 'model.pt', train.py:115 vs :367).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import orbax.checkpoint as ocp

from dualvgr_tpu.train_lib import TrainState

_STATE_DIR = "state"
_KWARGS_FILE = "model_kwargs.json"
_META_FILE = "meta.json"


def saved_epoch(ckpt_dir: str) -> int | None:
    """Epoch of the checkpoint under ``ckpt_dir``, or None if there is no
    checkpoint. Checkpoints from before meta.json existed report -1 (valid
    but never preferred over one with a recorded epoch)."""
    model_dir = os.path.join(ckpt_dir, "model")
    if not os.path.exists(model_dir):
        return None
    try:
        with open(os.path.join(model_dir, _META_FILE)) as f:
            return int(json.load(f)["epoch"])
    except (OSError, ValueError, KeyError):
        return -1


def jnp_is_typed_key(x) -> bool:
    import jax.numpy as jnp

    return hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jax.dtypes.prng_key)


def save_checkpoint(ckpt_dir: str, epoch: int, state: TrainState, model_kwargs: dict):
    """Write the train state + model_kwargs under {ckpt_dir}/model."""
    path = os.path.abspath(os.path.join(ckpt_dir, "model"))
    os.makedirs(ckpt_dir, exist_ok=True)
    rng = state.rng
    # typed PRNG keys aren't serializable; store the raw key data (the impl
    # is re-derived from the live state's key on restore)
    if jnp_is_typed_key(rng):
        rng = jax.random.key_data(rng)
    tree = {
        "epoch": epoch,
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "rng": rng,
    }
    with ocp.StandardCheckpointer() as ck:
        ck.save(os.path.join(path, _STATE_DIR), jax.device_get(tree), force=True)
    with open(os.path.join(path, _KWARGS_FILE), "w") as f:
        json.dump(model_kwargs, f, indent=2)
    # epoch readable WITHOUT a full restore (resume-policy choice between
    # best-val and autosave checkpoints needs only this)
    with open(os.path.join(path, _META_FILE), "w") as f:
        json.dump({"epoch": int(epoch), "step": int(state.step)}, f)


def load_model_kwargs(ckpt_dir: str) -> dict:
    path = os.path.abspath(os.path.join(ckpt_dir, "model", _KWARGS_FILE))
    with open(path, "r") as f:
        return json.load(f)


def restore_checkpoint(ckpt_dir: str, state: TrainState) -> tuple[int, TrainState]:
    """Restore into the structure of ``state``; returns (epoch, new_state)."""
    path = os.path.abspath(os.path.join(ckpt_dir, "model", _STATE_DIR))
    live_rng = state.rng
    typed = jnp_is_typed_key(live_rng)
    rng_target = jax.random.key_data(live_rng) if typed else live_rng
    target = {
        "epoch": 0,
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "rng": rng_target,
    }
    with ocp.StandardCheckpointer() as ck:
        tree: Any = ck.restore(path, target)
    rng = tree["rng"]
    if typed:
        rng = jax.random.wrap_key_data(rng, impl=jax.random.key_impl(live_rng))
    new_state = state.replace(
        step=tree["step"],
        params=tree["params"],
        batch_stats=tree["batch_stats"],
        opt_state=tree["opt_state"],
        rng=rng,
    )
    return int(tree["epoch"]), new_state
