"""Worker process for the 2-process multi-host test (tests/test_multihost.py).

Each process: jax.distributed.initialize via the package's
maybe_initialize_distributed (env-configured coordinator), 2 virtual CPU
devices per process -> a 4-device global data mesh, one jitted DualVGR
train step + one eval step over a globally-sharded batch. Prints
``MULTIHOST <pid> loss=<loss> logits=<checksum>`` — the parent asserts both
processes print identical finite values.
"""

import os
import sys


def main():
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")

    from dualvgr_tpu.parallel import (
        data_mesh,
        maybe_initialize_distributed,
        replicate,
        shard_batch,
    )

    assert maybe_initialize_distributed(), "coordinator env not picked up"
    nproc = int(os.environ["JAX_NUM_PROCESSES"])
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 2 * nproc, jax.device_count()

    import numpy as np

    from dualvgr_tpu import train_lib
    from dualvgr_tpu.models import DualVGR

    model = DualVGR(
        vision_dim=16, module_dim=16, word_dim=8, question_vocab_size=30,
        num_answers=10, num_of_nodes=4, graph_layers=1, unit_layers=1,
    )
    rng = np.random.RandomState(0)  # same seed in EVERY process: same batch
    b = 2 * jax.device_count()
    app = rng.randn(b, 4, 3, 16).astype(np.float32)
    mot = rng.randn(b, 4, 16).astype(np.float32)
    q = rng.randint(1, 30, (b, 6)).astype(np.int32)
    qlen = rng.randint(1, 7, (b,)).astype(np.int32)
    for i in range(b):
        q[i, qlen[i]:] = 0
    ans = rng.randint(0, 10, (b,)).astype(np.int32)
    valid = np.ones((b,), np.float32)

    opt = train_lib.make_optimizer(1e-3, 10)
    state = train_lib.create_train_state(
        model, jax.random.PRNGKey(666), (app[:1], mot[:1], q[:1], qlen[:1]), opt
    )
    mesh = data_mesh()
    state = replicate(state, mesh)
    batch = shard_batch((app, mot, q, qlen, ans, valid), mesh)

    step = train_lib.jit_train_step(model, opt, alpha=1.0, beta=1e-8)
    state, metrics = step(state, batch)
    loss = float(metrics["loss"])

    eval_fn = train_lib.jit_eval_step(model)
    logits = eval_fn(state, batch[:4])
    # logits are globally sharded; reduce to a scalar checksum on device
    checksum = float(jax.jit(lambda x: x.sum())(logits))

    print(
        f"MULTIHOST {jax.process_index()} loss={loss:.6f} logits={checksum:.6f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
