"""Device mesh + sharding: the distributed-communication layer.

The reference's only parallelism is single-process nn.DataParallel
(reference train.py:80-83, off in all shipped configs); its TPU-native
equivalent is batch-dim data parallelism over a 1-D ``jax.sharding.Mesh``:

* params + optimizer state: replicated,
* batches: sharded on the leading axis across the mesh,
* gradients: XLA inserts the all-reduce (psum) over ICI automatically when
  the loss is jit-compiled over the sharded batch — no NCCL/MPI analogue is
  needed, and semantics are global-batch (so BatchNorm statistics and loss
  normalization match single-device execution exactly).

Multi-host scaling rides the same code path: ``jax.distributed.initialize``
extends ``jax.devices()`` across hosts, DP stays on ICI within a slice and
DCN across slices. Tests exercise the mesh on 8 virtual CPU devices via
``XLA_FLAGS=--xla_force_host_platform_device_count=8`` (tests/conftest.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed() -> bool:
    """Multi-host bring-up: call ``jax.distributed.initialize`` when a
    coordinator is configured, so ``jax.devices()`` spans all hosts and the
    same data mesh scales DP across DCN. No-op (returns False) on a single
    host. Safe to call more than once.
    """
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    ):
        # CPU backends need an explicit cross-process collectives impl
        # (TPU/ICI needs none); harmless if unsupported by the jax build.
        if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
            try:
                jax.config.update("jax_cpu_collectives_implementation", "gloo")
            except Exception:
                pass
        kw = {}
        if os.environ.get("JAX_NUM_PROCESSES"):
            kw = dict(
                coordinator_address=os.environ.get("JAX_COORDINATOR_ADDRESS")
                or os.environ.get("COORDINATOR_ADDRESS"),
                num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                process_id=int(os.environ["JAX_PROCESS_ID"]),
            )
        try:
            jax.distributed.initialize(**kw)
            return True
        except RuntimeError:
            return True  # already initialized
    return False


def data_mesh(axis_name: str = "data", devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated across the mesh (params, optimizer state)."""
    return NamedSharding(mesh, P())


def _put(x, sharding):
    """Place one host array under ``sharding``.

    Single-process: plain (async) ``device_put``. Multi-process: the mesh
    spans devices this process cannot address, so build the global array
    from per-shard callbacks — every process passes the same global value
    and jax materializes only the locally-addressable shards.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    import numpy as np_

    x = np_.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (e.g. the train state) onto every mesh device.

    Needed after checkpoint restore: orbax returns arrays committed to one
    device, which jit refuses to mix with mesh-sharded batches.
    """
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: _put(x, sharding), tree)


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a pytree of host arrays onto the mesh, batch-sharded.

    Leading dims must be divisible by the mesh size; the data loader pads
    the final partial batch (dualvgr_tpu/data/loader.py) so this holds.
    Under multi-host (jax.process_count() > 1) every process must pass the
    same global batch; only local shards are materialized.
    """
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: _put(x, sharding), batch)


def prefetch_to_device(iterator, mesh: Mesh, axis_name: str = "data", size: int = 2):
    """Keep ``size`` batches in flight to the device ahead of consumption.

    ``jax.device_put`` is asynchronous, so enqueueing the next batches while
    the current one computes overlaps the host->device transfer (134 MB per
    flagship batch) with device compute — the standard input-pipeline
    pattern for feeding TPUs.
    """
    import collections

    buf = collections.deque()
    it = iter(iterator)

    def enqueue():
        try:
            buf.append(shard_batch(next(it), mesh, axis_name))
            return True
        except StopIteration:
            return False

    for _ in range(max(size, 1)):
        if not enqueue():
            break
    while buf:
        batch = buf.popleft()
        enqueue()
        yield batch
