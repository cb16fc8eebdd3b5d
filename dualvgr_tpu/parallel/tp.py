"""Tensor parallelism: a 2-D (data, model) mesh with GSPMD param sharding.

The reference has no model parallelism at all (its only parallelism is the
single-process ``nn.DataParallel`` wrapper, reference train.py:80-83). On
TPU the idiomatic way to go beyond data parallelism is NOT manual collective
calls but *placement*: lay the parameters out sharded over a ``model`` mesh
axis and let XLA's SPMD partitioner propagate the shardings through the
jitted train step and insert the all-gathers / reduce-scatters over ICI
itself. That is what this module does — no model-code changes, no
``shard_map``: the same ``train_lib.train_step`` runs 1-device, DP, or
DP x TP purely depending on where its inputs live.

Sharding rule (``leaf_spec``): a weight leaf is sharded on its LAST axis
over ``model`` when that axis divides evenly and the per-shard slice stays
MXU-friendly; everything else (scalars, RNG keys, small vectors, the GloVe
embedding's 300-wide rows on odd TP degrees) is replicated. The last axis
is the OUTPUT feature axis for every Dense/LSTM kernel in this model, so
the rule yields classic column-parallel layers — including the 4H LSTM
input/recurrent projections (the 4 gate blocks stay shard-aligned because
H % tp == 0 whenever 4H % tp == 0 at these widths) and the vocab-parallel
answer classifier (768 x 4000) — with Adam moments and biases following
their parameters automatically because the rule is shape-based.

Scope note (why TP and not PP/SP/EP): DualVGR is a shallow model —
``unit_layers`` <= 3 shared-parameter units, no expert branches, and
16-node graphs over 16-clip sequences — so pipeline, expert, and
sequence parallelism have no structure to bite on; the two axes that
matter are batch (data) and feature width (model). Use
``cfg.tpu.tensor_parallel > 1`` to enable; the Pallas kernel path is
disabled under TP (a ``pallas_call`` is opaque to the SPMD partitioner,
so the XLA path — which partitions cleanly — is used instead).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dualvgr_tpu.parallel.mesh import _put

DATA_AXIS = "data"
MODEL_AXIS = "model"


def dp_tp_mesh(
    n_data: int,
    n_model: int,
    devices=None,
    data_axis: str = DATA_AXIS,
    model_axis: str = MODEL_AXIS,
) -> Mesh:
    """2-D mesh: ``n_data`` x ``n_model`` devices, axes (data, model).

    The model axis is the FASTER-varying one so TP collectives (which fire
    inside every layer) ride neighboring devices on ICI while DP's single
    gradient all-reduce spans the slower axis.
    """
    devices = jax.devices() if devices is None else devices
    if n_data * n_model > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, "
            f"have {len(devices)}"
        )
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (data_axis, model_axis))


def leaf_spec(shape, n_model: int, min_shard: int = 8) -> P:
    """PartitionSpec for one state leaf under TP degree ``n_model``.

    Shard the last axis over ``model`` iff it divides evenly and each
    shard keeps >= ``min_shard`` columns (tiny slices waste lanes and
    can force XLA into degenerate layouts); otherwise replicate.
    """
    if n_model <= 1 or not shape:
        return P()
    last = shape[-1]
    if last % n_model == 0 and last // n_model >= min_shard:
        return P(*([None] * (len(shape) - 1) + [MODEL_AXIS]))
    return P()


def zero_leaf_spec(
    shape, n_data: int, n_model: int, data_axis: str = DATA_AXIS, min_shard: int = 8
) -> P:
    """ZeRO-style PartitionSpec for an OPTIMIZER-STATE leaf: the TP spec of
    its parameter, plus the first remaining axis that divides evenly over
    the data axis. Adam's mu/nu are pure elementwise state — sharding them
    over data costs nothing in the update math (XLA reshards the incoming
    gradient, updates locally, and gathers the applied update), and divides
    the largest optimizer-memory term by the DP degree (ZeRO stage 1).
    """
    base = list(leaf_spec(shape, n_model, min_shard))
    base += [None] * (len(shape) - len(base))
    if n_data > 1:
        for i, dim in enumerate(shape):
            if base[i] is None and dim % n_data == 0 and dim // n_data >= 1:
                base[i] = data_axis
                break
    while base and base[-1] is None:
        base.pop()
    return P(*base)


def _is_key(x) -> bool:
    return jax.dtypes.issubdtype(getattr(x, "dtype", np.float32), jax.dtypes.prng_key)


def shard_state_tp(tree, mesh: Mesh):
    """Place a train-state pytree on a (data, model) mesh, TP-sharded.

    Shape-based: params, Adam moments, biases, and batch stats all get
    ``leaf_spec`` of their own shape, so optimizer state automatically
    follows its parameter. Scalars, PRNG keys, and indivisible leaves are
    replicated. The result feeds ``train_lib.jit_train_step`` unchanged —
    jit reads the placements and partitions the whole step.
    """
    n_model = mesh.shape[MODEL_AXIS]

    def place(x):
        shape = getattr(x, "shape", ())
        spec = P() if _is_key(x) else leaf_spec(shape, n_model)
        return _put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, tree)


def shard_opt_state_zero(opt_state, mesh: Mesh, data_axis: str = DATA_AXIS):
    """Re-place an optimizer-state pytree with ZeRO sharding over the data
    axis (stacking on top of any model-axis sharding the mesh carries)."""
    n_data = mesh.shape.get(data_axis, 1)
    n_model = mesh.shape.get(MODEL_AXIS, 1)

    def place(x):
        shape = getattr(x, "shape", ())
        spec = (
            P()
            if _is_key(x) or not shape
            else zero_leaf_spec(shape, n_data, n_model, data_axis)
        )
        return _put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, opt_state)


def mesh_for(cfg) -> Mesh:
    """Build the mesh a driver should run on from ``cfg.tpu``: a 1-D data
    mesh when ``tensor_parallel`` is 1 (the default — pure DP, the
    reference-equivalent mode), else a (devices/tp) x tp (data, model)
    mesh."""
    from dualvgr_tpu.parallel.mesh import data_mesh

    tp = int(cfg.tpu.get("tensor_parallel", 1))
    if tp <= 1:
        return data_mesh(cfg.tpu.mesh_axis)
    n = len(jax.devices())
    if n % tp:
        raise ValueError(
            f"tpu.tensor_parallel={tp} does not divide the {n} available devices"
        )
    return dp_tp_mesh(n // tp, tp, data_axis=cfg.tpu.mesh_axis)


def place_state(state, mesh: Mesh, *, zero_opt: bool = False):
    """Put the train state on ``mesh`` the way its shape demands:
    TP-sharded when the mesh has a model axis, replicated otherwise.
    ``zero_opt`` additionally shards the optimizer state over the data
    axis (ZeRO stage 1) — cfg.tpu.zero_opt."""
    from dualvgr_tpu.parallel.mesh import replicate

    if MODEL_AXIS in mesh.axis_names:
        state = shard_state_tp(state, mesh)
    else:
        state = replicate(state, mesh)
    if zero_opt and hasattr(state, "opt_state"):
        state = state.replace(
            opt_state=shard_opt_state_zero(
                state.opt_state, mesh, data_axis=mesh.axis_names[0]
            )
        )
    return state


def tp_sharded_leaf_count(tree, mesh: Mesh) -> int:
    """How many leaves of ``tree`` are actually split over the model axis
    (diagnostic; >0 certifies TP is engaged rather than silently DP)."""
    if MODEL_AXIS not in mesh.axis_names:
        return 0
    n_model = mesh.shape[MODEL_AXIS]
    count = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        sharding = getattr(leaf, "sharding", None)
        if isinstance(sharding, NamedSharding) and MODEL_AXIS in jax.tree_util.tree_leaves(
            tuple(sharding.spec)
        ):
            count += 1
    return count if n_model > 1 else 0
