"""Gradient accumulation (cfg.tpu.grad_accum, optax.MultiSteps).

Contract: every K train steps apply ONE optimizer update over the MEAN of
the K micro-batch gradients — an effective batch of K x batch_size without
K x the activation memory. Verified three ways: the optimizer
transformation is exact against a hand-accumulated inner update, the
model-level train_step defers the parameter write until the K-th call, and
the lr-decay boundary stays at the same EPOCH (the schedule's epoch length
is converted from micro-steps).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from dualvgr_tpu import train_lib
from tests.test_train import tiny_batch, tiny_model


def _grads_like(params, seed):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.RandomState(seed)
    return jax.tree_util.tree_unflatten(
        treedef,
        [jnp.asarray(rng.randn(*l.shape).astype(np.float32)) for l in leaves],
    )


def test_accum_update_equals_mean_gradient_update():
    """K accumulated micro-grads == one inner update on their mean (exact)."""
    params = {"w": jnp.zeros((3, 4)), "b": jnp.zeros((4,))}
    k = 3
    acc = train_lib.make_optimizer(1e-3, steps_per_epoch=30, grad_accum=k)
    inner = train_lib.make_optimizer(1e-3, steps_per_epoch=10)

    g = [_grads_like(params, s) for s in range(k)]
    mean_g = jax.tree_util.tree_map(lambda *x: sum(x) / k, *g)

    acc_state = acc.init(params)
    for i in range(k):
        upd, acc_state = acc.update(g[i], acc_state, params)
        if i < k - 1:  # accumulating: the emitted update must be a no-op
            assert all(
                float(jnp.abs(u).max()) == 0.0
                for u in jax.tree_util.tree_leaves(upd)
            )

    ref_upd, _ = inner.update(mean_g, inner.init(params), params)
    for a, b in zip(
        jax.tree_util.tree_leaves(upd), jax.tree_util.tree_leaves(ref_upd)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_train_step_defers_params_until_kth_micro_batch(rng):
    """With grad_accum=2, params are untouched after step 1 and move after
    step 2; batch stats and the step counter advance every micro-step."""
    model = tiny_model()
    app, mot, q, qlen, ans = tiny_batch(rng, b=8)
    opt = train_lib.make_optimizer(1e-3, 10, grad_accum=2)
    state = train_lib.create_train_state(
        model, jax.random.PRNGKey(0), (app[:1], mot[:1], q[:1], qlen[:1]), opt
    )
    step = train_lib.jit_train_step(model, opt, alpha=1.0, beta=1e-8, donate=False)

    p0 = jax.tree_util.tree_map(lambda x: np.asarray(x), state.params)
    s1, m1 = step(state, (app[:4], mot[:4], q[:4], qlen[:4], ans[:4]))
    for a, b in zip(
        jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(s1.params)
    ):
        np.testing.assert_array_equal(a, np.asarray(b))
    assert int(s1.step) == 1
    assert np.isfinite(float(m1["loss"]))

    s2, _ = step(s1, (app[4:], mot[4:], q[4:], qlen[4:], ans[4:]))
    moved = sum(
        float(jnp.abs(a - b).max()) > 0
        for a, b in zip(
            jax.tree_util.tree_leaves(p0),
            jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(lambda x: np.asarray(x), s2.params)
            ),
        )
    )
    assert moved > 0, "second micro-batch must apply the accumulated update"


def test_decay_boundary_counts_updates_not_micro_steps():
    """steps_per_epoch is micro-steps; with grad_accum=4 the inner schedule
    must halve after 10 epochs of UPDATES (steps_per_epoch/4 per epoch)."""
    k, spe = 4, 20
    acc = train_lib.make_optimizer(1e-2, steps_per_epoch=spe, grad_accum=k)
    params = {"w": jnp.ones((2, 2))}
    state = acc.init(params)
    g = {"w": jnp.ones((2, 2))}

    lrs = []
    for _ in range(spe * 11):  # 11 epochs of micro-steps
        upd, state = acc.update(g, state, params)
        mx = float(jnp.abs(upd["w"]).max())
        if mx > 0:
            lrs.append(mx)
    # Adam's |update| == lr once moments warm up; epoch 10 must halve it
    updates_per_epoch = spe // k
    lr_epoch9 = lrs[updates_per_epoch * 10 - 1]
    lr_epoch10 = lrs[updates_per_epoch * 10]
    assert lr_epoch10 == pytest.approx(lr_epoch9 / 2, rel=1e-5)


def test_grad_accum_config_key_merges():
    from dualvgr_tpu.config import _merge_into, default_config

    cfg = default_config()
    assert cfg.tpu.grad_accum == 1
    _merge_into({"tpu": {"grad_accum": 8}}, cfg)
    assert cfg.tpu.grad_accum == 8


def test_make_optimizer_rejects_bad_accum():
    with pytest.raises(ValueError):
        train_lib.make_optimizer(1e-3, 10, grad_accum=0)


def test_decay_boundary_non_divisible_epoch():
    """grad_accum NOT dividing steps_per_epoch must still decay at the same
    EPOCH: spe=15, K=8 -> update u runs at micro-step 8(u+1); the halving
    belongs at micro >= 150 (epoch 10), i.e. from update u=19 on — a
    floored updates-per-epoch schedule would halve ~2x early (u=10)."""
    k, spe = 8, 15
    acc = train_lib.make_optimizer(1e-2, steps_per_epoch=spe, grad_accum=k)
    params = {"w": jnp.ones((2, 2))}
    state = acc.init(params)
    g = {"w": jnp.ones((2, 2))}
    lrs = []
    for _ in range(8 * 21):
        upd, state = acc.update(g, state, params)
        mx = float(jnp.abs(upd["w"]).max())
        if mx > 0:
            lrs.append(mx)
    assert lrs[18] == pytest.approx(lrs[0], rel=1e-5)  # update 18: micro 144 < 150
    assert lrs[19] == pytest.approx(lrs[0] / 2, rel=1e-5)  # update 19: micro 152


def test_checkpoint_roundtrip_with_accum(rng, tmp_path):
    """A grad_accum train state (MultiSteps opt_state) survives the orbax
    save/restore round trip when the restore target is built with the same
    grad_accum — the contract validate/predict/serve/export now honor by
    passing cfg.tpu.grad_accum to make_optimizer."""
    from dualvgr_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    model = tiny_model()
    app, mot, q, qlen, ans = tiny_batch(rng, b=8)
    opt = train_lib.make_optimizer(1e-3, 10, grad_accum=2)
    state = train_lib.create_train_state(
        model, jax.random.PRNGKey(0), (app[:1], mot[:1], q[:1], qlen[:1]), opt
    )
    step = train_lib.jit_train_step(model, opt, alpha=1.0, beta=1e-8, donate=False)
    state, _ = step(state, (app, mot, q, qlen, ans))  # mini_step = 1

    save_checkpoint(str(tmp_path / "ck"), 0, state, {})
    target = train_lib.create_train_state(
        model, jax.random.PRNGKey(1), (app[:1], mot[:1], q[:1], qlen[:1]), opt
    )
    epoch, restored = restore_checkpoint(str(tmp_path / "ck"), target)
    assert epoch == 0
    for a, b in zip(
        jax.tree_util.tree_leaves(state.opt_state),
        jax.tree_util.tree_leaves(restored.opt_state),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_reset_grad_accum_drops_partial_window(rng):
    """reset_grad_accum zeroes the accumulator + mini-step (resume replays
    the epoch) and keeps the applied-update counter; no-op without accum."""
    import optax

    model = tiny_model()
    app, mot, q, qlen, ans = tiny_batch(rng, b=8)
    opt = train_lib.make_optimizer(1e-3, 10, grad_accum=2)
    state = train_lib.create_train_state(
        model, jax.random.PRNGKey(0), (app[:1], mot[:1], q[:1], qlen[:1]), opt
    )
    step = train_lib.jit_train_step(model, opt, alpha=1.0, beta=1e-8, donate=False)
    state, _ = step(state, (app, mot, q, qlen, ans))
    assert int(state.opt_state.mini_step) == 1
    assert any(
        float(jnp.abs(x).max()) > 0
        for x in jax.tree_util.tree_leaves(state.opt_state.acc_grads)
    )
    reset = train_lib.reset_grad_accum(state)
    assert int(reset.opt_state.mini_step) == 0
    assert int(reset.opt_state.gradient_step) == int(state.opt_state.gradient_step)
    assert all(
        float(jnp.abs(x).max()) == 0
        for x in jax.tree_util.tree_leaves(reset.opt_state.acc_grads)
    )

    plain_opt = train_lib.make_optimizer(1e-3, 10)
    plain = train_lib.create_train_state(
        model, jax.random.PRNGKey(0), (app[:1], mot[:1], q[:1], qlen[:1]), plain_opt
    )
    assert train_lib.reset_grad_accum(plain) is plain


def test_accum_state_shards_with_zero_opt_on_mesh(rng):
    """The MultiSteps accumulator (a params-sized buffer) rides the ZeRO
    stage-1 sharding like the Adam moments: a sharded-mesh train step with
    grad_accum=2 + zero_opt runs, defers the first update, and applies the
    second — README's claim, exercised on the 8-device mesh."""
    from dualvgr_tpu.parallel import data_mesh, shard_batch
    from dualvgr_tpu.parallel.tp import place_state

    model = tiny_model()
    app, mot, q, qlen, ans = tiny_batch(rng, b=16)
    opt = train_lib.make_optimizer(1e-3, 10, grad_accum=2)
    state = train_lib.create_train_state(
        model, jax.random.PRNGKey(0), (app[:1], mot[:1], q[:1], qlen[:1]), opt
    )
    mesh = data_mesh()
    state = place_state(state, mesh, zero_opt=True)

    # the accumulator exists and at least one of its big leaves is sharded
    # over the data axis
    import optax

    assert isinstance(
        jax.tree_util.tree_leaves(state.opt_state)[0], jax.Array
    )
    sharded = sum(
        leaf.sharding.spec != jax.sharding.PartitionSpec()
        for leaf in jax.tree_util.tree_leaves(state.opt_state)
        if hasattr(leaf, "sharding")
        and isinstance(leaf.sharding, jax.sharding.NamedSharding)
    )
    assert sharded > 0, "zero_opt must shard optimizer-state leaves"

    step = train_lib.jit_train_step(model, opt, alpha=1.0, beta=1e-8, donate=False)
    batch1 = shard_batch((app[:8], mot[:8], q[:8], qlen[:8], ans[:8]), mesh)
    batch2 = shard_batch((app[8:], mot[8:], q[8:], qlen[8:], ans[8:]), mesh)
    p0 = jax.tree_util.tree_map(lambda x: np.asarray(x), state.params)
    s1, _ = step(state, batch1)
    for a, b in zip(
        jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(s1.params)
    ):
        np.testing.assert_array_equal(a, np.asarray(b))
    s2, m2 = step(s1, batch2)
    assert np.isfinite(float(m2["loss"]))
    moved = any(
        float(jnp.abs(jnp.asarray(a) - b).max()) > 0
        for a, b in zip(
            jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(s2.params)
        )
    )
    assert moved
