"""Training-loop semantics: schedule, masked batches, checkpoint round-trip,
and an end-to-end learning smoke test on the sharded mesh."""

import pytest

import numpy as np

import jax
import jax.numpy as jnp

from dualvgr_tpu.models import DualVGR
from dualvgr_tpu import train_lib
from dualvgr_tpu.parallel import data_mesh, replicate, shard_batch

pytestmark = pytest.mark.slow


def tiny_model(**kw):
    args = dict(
        vision_dim=24,
        module_dim=16,
        word_dim=8,
        question_vocab_size=30,
        num_answers=10,
        num_of_nodes=4,
        graph_layers=1,
        unit_layers=1,
    )
    args.update(kw)
    return DualVGR(**args)


def tiny_batch(rng, b=16, c=4, f=3, t=5, v=30, a=10, vis=24):
    app = rng.randn(b, c, f, vis).astype(np.float32)
    mot = rng.randn(b, c, vis).astype(np.float32)
    q = rng.randint(1, v, (b, t)).astype(np.int32)
    qlen = rng.randint(1, t + 1, (b,)).astype(np.int32)
    for i in range(b):
        q[i, qlen[i]:] = 0
    ans = rng.randint(0, a, (b,)).astype(np.int32)
    return app, mot, q, qlen, ans


def test_lr_schedule_halves_every_10_epochs():
    sched = train_lib.make_lr_schedule(1e-4, steps_per_epoch=7)
    assert float(sched(0)) == 1e-4
    assert float(sched(7 * 9)) == 1e-4  # epoch 9
    assert float(sched(7 * 10)) == 5e-5  # epoch 10
    assert float(sched(7 * 20)) == 2.5e-5  # epoch 20


def test_masked_final_batch_equals_unpadded(rng):
    """A padded batch with valid mask gives the same loss/metrics as the
    unpadded true batch (exact partial-batch semantics)."""
    model = tiny_model()
    app, mot, q, qlen, ans = tiny_batch(rng, b=8)
    opt = train_lib.make_optimizer(1e-3, 10)
    state = train_lib.create_train_state(
        model, jax.random.PRNGKey(0), (app[:1], mot[:1], q[:1], qlen[:1]), opt
    )

    true_b = 5
    valid = np.zeros((8,), np.float32)
    valid[:true_b] = 1.0
    # padded rows replicate the last valid row like the loader does
    for arr in (app, mot, q, qlen, ans):
        arr[true_b:] = arr[true_b - 1]

    step = train_lib.jit_train_step(model, opt, 1.0, 1e-8, donate=False)
    _, m_pad = step(state, (app, mot, q, qlen, ans, valid))
    _, m_true = step(
        state, (app[:true_b], mot[:true_b], q[:true_b], qlen[:true_b], ans[:true_b])
    )
    np.testing.assert_allclose(float(m_pad["ce"]), float(m_true["ce"]), rtol=2e-4)
    np.testing.assert_allclose(float(m_pad["loss"]), float(m_true["loss"]), rtol=2e-3)
    assert int(m_pad["count"]) == true_b


def test_sharded_matches_single_device(rng):
    """The mesh-sharded step must produce the same metrics as unsharded
    execution — data parallelism is semantics-preserving."""
    model = tiny_model()
    batch = tiny_batch(rng, b=16)
    app, mot, q, qlen, ans = batch
    opt = train_lib.make_optimizer(1e-3, 10)
    state = train_lib.create_train_state(
        model, jax.random.PRNGKey(1), (app[:1], mot[:1], q[:1], qlen[:1]), opt
    )
    step = train_lib.jit_train_step(model, opt, 1.0, 1e-8, donate=False)

    mesh = data_mesh()
    assert mesh.size == 8
    sharded = shard_batch(batch, mesh)
    s1, m1 = step(replicate(state, mesh), sharded)
    s2, m2 = step(state, jax.tree_util.tree_map(jnp.asarray, batch))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["correct"]), float(m2["correct"]))
    # params after the step agree too
    p1 = jax.tree_util.tree_leaves(s1.params)
    p2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_overfit_tiny_batch(rng):
    model = tiny_model()
    batch = tiny_batch(rng, b=16)
    app, mot, q, qlen, ans = batch
    opt = train_lib.make_optimizer(3e-3, 1000)
    state = train_lib.create_train_state(
        model, jax.random.PRNGKey(2), (app[:1], mot[:1], q[:1], qlen[:1]), opt
    )
    step = train_lib.jit_train_step(model, opt, 1.0, 1e-8)
    batch_j = jax.tree_util.tree_map(jnp.asarray, batch)
    first = None
    for i in range(30):
        state, m = step(state, batch_j)
        if first is None:
            first = float(m["loss"])
    assert float(m["loss"]) < first * 0.7
    assert np.isfinite(float(m["loss"]))


def test_checkpoint_roundtrip(rng, tmp_path):
    from dualvgr_tpu.utils.checkpoint import (
        load_model_kwargs,
        restore_checkpoint,
        save_checkpoint,
    )

    model = tiny_model()
    app, mot, q, qlen, ans = tiny_batch(rng, b=4)
    opt = train_lib.make_optimizer(1e-3, 10)
    state = train_lib.create_train_state(
        model, jax.random.PRNGKey(3), (app, mot, q, qlen), opt
    )
    step = train_lib.jit_train_step(model, opt, alpha=1.0, beta=0.0, donate=False)
    state, _ = step(state, (app, mot, q, qlen, ans))
    kwargs = {"vision_dim": 24, "module_dim": 16}
    save_checkpoint(str(tmp_path), 3, state, kwargs)

    fresh = train_lib.create_train_state(
        model, jax.random.PRNGKey(99), (app, mot, q, qlen), opt
    )
    epoch, restored = restore_checkpoint(str(tmp_path), fresh)
    assert epoch == 3
    assert load_model_kwargs(str(tmp_path)) == kwargs
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored state continues training identically
    _, m1 = step(state, (app, mot, q, qlen, ans))
    _, m2 = step(restored, (app, mot, q, qlen, ans))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)


def test_unit_layers_and_graph_layers_stack(rng):
    """T = unit_layers * graph_layers aux entries; params differ per bank
    (fixes the reference's [i+j] indexing, models.py:151-158)."""
    model = tiny_model(unit_layers=2, graph_layers=2)
    app, mot, q, qlen, ans = tiny_batch(rng, b=2)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        app, mot, q, qlen, train=False,
    )
    out = model.apply(variables, app, mot, q, qlen, train=False)
    assert out.aq_fusion.shape[0] == 4
    assert out.com_motion.shape[0] == 4
    # four distinct GAT banks exist per stream
    unit = variables["params"]["visual_input_unit"]
    assert {f"appearance_gat_{k}" in unit for k in range(4)} == {True}


def test_saved_epoch_meta(rng, tmp_path):
    from dualvgr_tpu.utils.checkpoint import save_checkpoint, saved_epoch

    assert saved_epoch(str(tmp_path / "nope")) is None
    model = tiny_model()
    app, mot, q, qlen, ans = tiny_batch(rng, b=2)
    opt = train_lib.make_optimizer(1e-3, 10)
    state = train_lib.create_train_state(
        model, jax.random.PRNGKey(0), (app[:1], mot[:1], q[:1], qlen[:1]), opt
    )
    save_checkpoint(str(tmp_path), 3, state, {"module_dim": 16})
    assert saved_epoch(str(tmp_path)) == 3


@pytest.mark.slow
def test_preemption_autosave_and_resume(synth_dir, tmp_path):
    """Preemption-safe training: a stop request mid-epoch checkpoints to
    {ckpt}_autosave and stops; a restore run resumes from the autosave,
    completes, deletes the autosave, and leaves a best-val checkpoint."""
    import os
    import sys
    import threading

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import train as train_cli
    from dualvgr_tpu.config import cfg_from_file, resolve_dataset_paths
    from dualvgr_tpu.utils.checkpoint import saved_epoch

    cfg = cfg_from_file(synth_dir["config"])
    cfg.dataset.save_dir = str(tmp_path)
    cfg.alpha, cfg.beta, cfg.unit_layers = 1.0, 1e-8, 1
    cfg.train.max_epochs = 2
    cfg = resolve_dataset_paths(cfg)
    ckpt_dir = os.path.join(cfg.dataset.save_dir, "ckpt")
    autosave_dir = ckpt_dir + "_autosave"

    # pre-set stop: train() must checkpoint at the first step boundary of
    # epoch 0 (saved epoch -1 -> resume re-runs epoch 0) and return early
    stop = threading.Event()
    stop.set()
    train_cli.train(cfg, stop_event=stop)
    assert saved_epoch(autosave_dir) == -1
    assert saved_epoch(ckpt_dir) is None  # never reached validation

    # resume: prefers the autosave, completes both epochs, cleans it up
    cfg.train.restore = True
    best_val, _state = train_cli.train(cfg)
    assert not os.path.exists(autosave_dir)
    assert saved_epoch(ckpt_dir) is not None
    assert best_val > 0.0
