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


def process_batch_bounds(mesh: Mesh, axis_name: str, global_batch: int):
    """(start, stop) rows of a global batch owned by THIS process's devices
    under the batch sharding — i.e. what a host-sharded data loader should
    gather. Raises if the process's rows are not one contiguous block (they
    are for the standard process-major device order)."""
    sharding = batch_sharding(mesh, axis_name)
    spans = []
    for idx in sharding.addressable_devices_indices_map((global_batch,)).values():
        s = idx[0]
        spans.append((s.start or 0, global_batch if s.stop is None else s.stop))
    spans.sort()
    for (_, a_stop), (b_start, _) in zip(spans, spans[1:]):
        if a_stop != b_start:
            raise ValueError(
                f"process rows are not contiguous under this mesh: {spans}"
            )
    return spans[0][0], spans[-1][1]


def shard_batch_local(batch, mesh: Mesh, axis_name: str = "data"):
    """Multi-host batch placement from PER-PROCESS data: each process passes
    only its own rows (global_batch / process_count — the slice given by
    :func:`process_batch_bounds`), so hosts gather 1/H of the batch instead
    of all of it (vs :func:`shard_batch`, where every process materializes
    the full global batch). Single-process this is identical to shard_batch.
    """
    sharding = batch_sharding(mesh, axis_name)
    nproc = jax.process_count()

    def put(x):
        x = np.asarray(x)
        if nproc == 1:
            return jax.device_put(x, sharding)
        global_shape = (x.shape[0] * nproc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree_util.tree_map(put, batch)


def prefetch_to_device(
    iterator, mesh: Mesh, axis_name: str = "data", size: int = 2, local: bool = False
):
    """Keep ``size`` batches in flight to the device ahead of consumption.

    ``jax.device_put`` is asynchronous, so enqueueing the next batches while
    the current one computes overlaps the host->device transfer (134 MB per
    flagship batch) with device compute — the standard input-pipeline
    pattern for feeding TPUs.

    ``local=True`` places per-process rows via :func:`shard_batch_local`
    (host-sharded loading); default expects the full global batch from
    every process.
    """
    import collections

    buf = collections.deque()
    it = iter(iterator)
    place = shard_batch_local if local else shard_batch

    def enqueue():
        try:
            buf.append(place(next(it), mesh, axis_name))
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
