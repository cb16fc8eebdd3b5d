"""Train/eval steps, optimizer, and train state for DualVGR on TPU.

Optimization recipe (reference train.py:85,158,179-180,341-349):
  Adam(lr=cfg.train.lr) with global-norm grad clipping at 12 and a x0.5
  learning-rate decay every 10 epochs. The decay is an optax schedule keyed
  on the step counter (lr = base * 0.5^(epoch // 10)), replacing the
  reference's in-place optimizer mutation.

The train step is one jit-compiled function over the batch-sharded global
batch: forward (with dropout + BatchNorm batch stats), CE + auxiliary
losses (reference train.py:146-154), backward, clip, Adam update. All
cross-device reductions are XLA collectives over ICI inserted automatically
by jit over the sharded inputs.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from dualvgr_tpu.models.dualvgr import DualVGR
from dualvgr_tpu.ops.losses import dualvgr_total_loss


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array


def make_lr_schedule(base_lr: float, steps_per_epoch: int, decay_epochs: int = 10):
    """lr = base * 0.5^(epoch // decay_epochs) (reference train.py:341-349)."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return base_lr * (0.5 ** (epoch // decay_epochs))

    return schedule


def make_optimizer(
    base_lr: float,
    steps_per_epoch: int,
    max_grad_norm: float = 12.0,
    grad_accum: int = 1,
):
    """Adam + global-norm clip (+ optional gradient accumulation).

    ``grad_accum=K`` (cfg.tpu.grad_accum) makes every K consecutive
    ``train_step`` calls one optimizer update over their MEAN gradient —
    an effective batch of K x cfg.train.batch_size without K x the
    activation memory (the accumulator is one extra params-sized buffer,
    ZeRO-sharded like the Adam moments under ``tpu.zero_opt``). Clipping
    and the x0.5/10-epoch decay see accumulated UPDATES: the schedule's
    epoch length is converted from micro-steps here, so decay boundaries
    stay at the same epochs. Note the batch-coupled terms (classifier
    BatchNorm statistics, the HSIC dependence loss's batch Gram matrices)
    still see each micro-batch separately — the same caveat gradient
    accumulation has in any framework.

    ``steps_per_epoch`` is always in loader-batch (micro-step) units.
    """
    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")
    # the inner schedule sees UPDATE counts; convert exactly back to
    # micro-steps before dividing by the epoch length so decay boundaries
    # land on the same epochs even when grad_accum doesn't divide
    # steps_per_epoch (flooring updates_per_epoch would decay early)
    micro_schedule = make_lr_schedule(base_lr, steps_per_epoch)
    if grad_accum == 1:
        # identical trace to the pre-accumulation optimizer (keeps compiled
        # train-step cache entries valid for the default configuration)
        schedule = micro_schedule
    else:
        schedule = lambda count: micro_schedule(count * grad_accum)
    inner = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adam(schedule),
    )
    if grad_accum == 1:
        return inner
    return optax.MultiSteps(inner, every_k_schedule=grad_accum)


def reset_grad_accum(state: TrainState) -> TrainState:
    """Drop a partially-filled gradient-accumulation window after a restore.

    Resume replays the interrupted epoch from its start, so micro-gradients
    accumulated before the preemption would double-count their samples in
    the first post-resume update; zero the MultiSteps accumulator and its
    mini-step counter (the applied-update counter the lr schedule runs on
    is kept). No-op when the optimizer has no accumulation state.
    """
    if not isinstance(state.opt_state, optax.MultiStepsState):
        return state
    os_ = state.opt_state
    return state.replace(
        opt_state=os_._replace(
            mini_step=jnp.zeros_like(os_.mini_step),
            acc_grads=jax.tree_util.tree_map(jnp.zeros_like, os_.acc_grads),
        )
    )


def create_train_state(
    model: DualVGR,
    rng: jax.Array,
    example_batch,
    optimizer: optax.GradientTransformation,
) -> TrainState:
    """Initialize params/batch_stats from an example batch."""
    app, motion, question, qlen = example_batch
    init_rng, state_rng = jax.random.split(rng)
    variables = model.init(
        {"params": init_rng, "dropout": init_rng},
        app,
        motion,
        question,
        qlen,
        train=False,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = optimizer.init(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        rng=state_rng,
    )


def set_glove(state: TrainState, glove_matrix) -> TrainState:
    """Overwrite the question embedding with GloVe (reference train.py:75-79)."""
    params = flax.core.unfreeze(state.params) if hasattr(state.params, "unfreeze") else dict(state.params)
    emb = jnp.asarray(glove_matrix, dtype=jnp.float32)
    path = params["linguistic_input_unit"]["encoder_embed"]
    expected = path["embedding"].shape
    if emb.shape != expected:
        raise ValueError(f"GloVe matrix shape {emb.shape} != embedding {expected}")
    new_params = jax.tree_util.tree_map(lambda x: x, params)
    new_params["linguistic_input_unit"] = dict(new_params["linguistic_input_unit"])
    new_params["linguistic_input_unit"]["encoder_embed"] = {"embedding": emb}
    return state.replace(params=new_params)


def train_step(
    state: TrainState,
    batch,
    *,
    model: DualVGR,
    optimizer: optax.GradientTransformation,
    alpha: float,
    beta: float,
):
    """One optimization step.

    batch = (app, motion, question, qlen, answers) or the same + (valid,)
    where valid (B,) float masks padded rows of the final partial batch.
    Returns (new_state, metrics) with metrics = {loss, ce, common,
    dependence, correct, count}.
    """
    if len(batch) == 6:
        app, motion, question, qlen, answers, valid = batch
    else:
        app, motion, question, qlen, answers = batch
        valid = jnp.ones((answers.shape[0],), jnp.float32)
    rng = jax.random.fold_in(state.rng, state.step)

    def loss_fn(params):
        out, mutated = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            app,
            motion,
            question,
            qlen,
            valid,
            train=True,
            rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        total, aux = dualvgr_total_loss(
            out.logits,
            answers,
            out.aq_fusion,
            out.com_app,
            out.mq_fusion,
            out.com_motion,
            alpha=alpha,
            beta=beta,
            num_of_nodes=model.num_of_nodes,
            valid=valid,
        )
        return total, (aux, out.logits, mutated["batch_stats"])

    (loss, (aux, logits, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)

    preds = jnp.argmax(logits, axis=1)
    metrics = {
        "loss": loss,
        "ce": aux["ce"],
        "common": aux["common"],
        "dependence": aux["dependence"],
        "correct": ((preds == answers) * valid).sum(),
        "count": valid.sum().astype(jnp.int32),
    }
    new_state = state.replace(
        step=state.step + 1,
        params=new_params,
        batch_stats=new_stats,
        opt_state=new_opt_state,
    )
    return new_state, metrics


def eval_step(state: TrainState, batch, *, model: DualVGR):
    """Deterministic forward; batch = (app, motion, question, qlen).

    Returns logits (B, num_answers).
    """
    app, motion, question, qlen = batch
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        app,
        motion,
        question,
        qlen,
        train=False,
    )
    return out.logits


def jit_train_step(model, optimizer, alpha, beta, *, donate=True):
    f = functools.partial(
        train_step, model=model, optimizer=optimizer, alpha=alpha, beta=beta
    )
    return jax.jit(f, donate_argnums=(0,) if donate else ())


def jit_eval_step(model):
    return jax.jit(functools.partial(eval_step, model=model))


def jit_pred_step(model):
    """Eval forward + on-device argmax: fetches (B,) answer ids instead of
    the full (B, num_answers) logits — the host only ever needs predictions
    (reference validate.py:59)."""

    def pred(state, batch):
        return jnp.argmax(eval_step(state, batch, model=model), axis=1)

    return jax.jit(pred)
