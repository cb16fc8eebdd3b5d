"""Stacked-bank GAT execution (DualVGR(batch_gats=True), XLA path).

Each DualVGR iteration runs four independent PunishGATs (common/specific x
appearance/motion); the batched path executes them as ONE stacked
computation (dualvgr.py::_gat4_batched) — 4x fewer softmax/einsum/dropout
ops. Contract: with dropout off it is EXACTLY the per-module path (same
params tree, same outputs, same gradients); parameter structure is
unchanged so checkpoints are interchangeable between the two.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_train import tiny_batch, tiny_model


def _variables_and_batch(rng, **model_kw):
    model = tiny_model(**model_kw)
    app, mot, q, qlen, ans = tiny_batch(rng, b=8)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        app[:1], mot[:1], q[:1], qlen[:1], train=False,
    )
    return model, variables, (app, mot, q, qlen)


@pytest.mark.parametrize("layers", [(1, 1), (2, 1), (1, 2)])
def test_batched_matches_per_module_forward(rng, layers):
    unit_layers, graph_layers = layers
    base, variables, batch = _variables_and_batch(
        rng, unit_layers=unit_layers, graph_layers=graph_layers
    )
    batched = tiny_model(
        unit_layers=unit_layers, graph_layers=graph_layers, batch_gats=True
    )

    out_a = base.apply(variables, *batch, train=False)
    out_b = batched.apply(variables, *batch, train=False)
    for field in (
        "logits", "aq_embed", "mq_embed", "com_app", "com_motion",
        "aq_fusion", "mq_fusion",
    ):
        np.testing.assert_allclose(
            np.asarray(getattr(out_a, field)),
            np.asarray(getattr(out_b, field)),
            atol=2e-5,
            err_msg=field,
        )


def test_batched_matches_per_module_gradients(rng):
    base, variables, batch = _variables_and_batch(rng)
    batched = tiny_model(batch_gats=True)

    def loss(model):
        def f(params):
            out = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                *batch,
                train=False,
            )
            return (
                jnp.sum(out.logits ** 2)
                + jnp.sum(out.com_app ** 2)
                + jnp.sum(out.aq_fusion ** 2)
            )

        return jax.grad(f)(variables["params"])

    ga = loss(base)
    gb = loss(batched)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(ga)[0],
        jax.tree_util.tree_flatten_with_path(gb)[0],
    ):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, err_msg=str(pa)
        )


def test_batched_trains_with_dropout(rng):
    """The batched path's dropout sites draw fresh masks and a jitted train
    step runs and learns (stream differs from per-module by design)."""
    from dualvgr_tpu import train_lib

    model = tiny_model(batch_gats=True)
    app, mot, q, qlen, ans = tiny_batch(rng, b=8)
    opt = train_lib.make_optimizer(1e-3, 10)
    state = train_lib.create_train_state(
        model, jax.random.PRNGKey(0), (app[:1], mot[:1], q[:1], qlen[:1]), opt
    )
    step = train_lib.jit_train_step(model, opt, alpha=1.0, beta=1e-8, donate=False)
    s1, m1 = step(state, (app, mot, q, qlen, ans))
    s2, m2 = step(s1, (app, mot, q, qlen, ans))
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    moved = any(
        float(jnp.abs(a - b).max()) > 0
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(s2.params),
        )
    )
    assert moved
