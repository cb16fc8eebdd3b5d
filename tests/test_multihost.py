"""Multi-host distributed bring-up: 2 real processes, one global mesh.

Exercises dualvgr_tpu/parallel/mesh.py's multi-host path end to end:
``maybe_initialize_distributed`` (env-configured coordinator + gloo CPU
collectives), the process-spanning data mesh, multi-process ``replicate``/
``shard_batch`` (jax.make_array_from_callback), and a full jitted train +
eval step whose gradient all-reduce crosses process boundaries.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn_workers(port, extra_env=None):
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            PYTHONPATH=REPO,
            # NOTE: deliberately NOT sharing the persistent compile cache
            # with the workers: XLA:CPU AOT entries written by ordinary
            # processes fail to load inside jax.distributed workers
            # ("+prefer-no-scatter is not supported on the host machine",
            # cpu_aot_loader.cc) — measured here, both tests fail with it
            **(extra_env or {}),
        )
        env.pop("JAX_PLATFORMS", None)  # the worker pins cpu itself
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.join(REPO, "tests", "multihost_worker.py")],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        # ~160 s cold on an idle box; 600 s keeps headroom when the suite
        # shares the machine with a TPU bench (observed 300 s blown once)
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
    return outs


def _parse(outs, tag):
    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith(f"{tag} "):
                parts = line.split()
                results[int(parts[1])] = tuple(parts[2:])
    assert set(results) == {0, 1}, (results, outs)
    return results


@pytest.fixture(scope="module")
def worker_outs(synth_dir):
    """ONE 2-process spawn serves both tests: the worker always runs the
    replicated train/eval step (MULTIHOST lines) and, given the synth dir,
    the host-sharded loader phase too (MULTIHOST_LOADER lines). Each spawn
    pays full jax.distributed bring-up + uncached XLA compiles (~150 s on
    this box — workers can't use the persistent cache, see _spawn_workers),
    so sharing it halves the file's wall time."""
    return _spawn_workers(
        _free_port(), extra_env={"MULTIHOST_SYNTH_DIR": synth_dir["dir"]}
    )


def test_two_process_train_step(worker_outs):
    results = _parse(worker_outs, "MULTIHOST")
    # both processes computed the SAME global step: identical loss + logits
    assert results[0] == results[1], results
    loss = float(results[0][0].split("=")[1])
    assert 0.0 < loss < 50.0, loss


def test_two_process_hostsharded_loader(worker_outs, synth_dir):
    """Each process gathers only ITS rows of the global batch (loader
    host_index/host_count + shard_batch_local); the train-step loss must
    equal a single-process run over the full batch — host-sharded loading
    preserves global-batch semantics exactly."""
    import jax
    import numpy as np

    results = _parse(worker_outs, "MULTIHOST_LOADER")
    assert results[0] == results[1], results
    worker_loss = float(results[0][0].split("=")[1])

    # single-process reference: same loader seed, full global batch
    from dualvgr_tpu import train_lib
    from dualvgr_tpu.data import VideoQADataLoader
    from dualvgr_tpu.models import DualVGR

    d = synth_dir["dir"]
    loader = VideoQADataLoader(
        question_pt=f"{d}/svqa_train_questions.pt",
        vocab_json=f"{d}/svqa_vocab.json",
        appearance_feat=f"{d}/svqa_appearance_feat.h5",
        motion_feat=f"{d}/svqa_motion_feat.h5",
        batch_size=8,
        shuffle=True,
        seed=11,
    )
    model = DualVGR(
        vision_dim=32, module_dim=32, word_dim=16,
        question_vocab_size=len(loader.vocab["question_token_to_idx"]),
        num_answers=len(loader.vocab["answer_token_to_idx"]),
        num_of_nodes=4, graph_layers=1, unit_layers=1,
    )
    opt = train_lib.make_optimizer(1e-3, 10)
    state = train_lib.create_train_state(
        model, jax.random.PRNGKey(7), loader.example_batch(1), opt
    )
    step = train_lib.jit_train_step(model, opt, alpha=1.0, beta=1e-8)
    it = iter(loader)
    b0 = next(it)
    _, m = step(
        state,
        (b0.appearance_feat, b0.motion_feat, b0.question, b0.question_len,
         b0.answer, b0.valid),
    )
    loader.close()
    np.testing.assert_allclose(worker_loss, float(m["loss"]), rtol=2e-5)


def test_two_process_zero_grad_accum_hostsharded(worker_outs, synth_dir):
    """ZeRO-1-sharded Adam moments x grad_accum=2 x host-sharded loading,
    all at once across 2 real processes (round-3 verdict item 6): the
    micro-step-2 loss must equal a single-process grad-accum run over the
    same two global batches, and the accumulated update must have been
    applied exactly at micro-step 2."""
    import jax
    import numpy as np

    results = _parse(worker_outs, "MULTIHOST_ZGA")
    assert results[0] == results[1], results
    worker_loss = float(results[0][0].split("=")[1])
    assert results[0][1] == "moved=yes", results

    from dualvgr_tpu import train_lib
    from dualvgr_tpu.data import VideoQADataLoader
    from dualvgr_tpu.models import DualVGR

    d = synth_dir["dir"]
    loader = VideoQADataLoader(
        question_pt=f"{d}/svqa_train_questions.pt",
        vocab_json=f"{d}/svqa_vocab.json",
        appearance_feat=f"{d}/svqa_appearance_feat.h5",
        motion_feat=f"{d}/svqa_motion_feat.h5",
        batch_size=8,
        shuffle=True,
        seed=11,
    )
    model = DualVGR(
        vision_dim=32, module_dim=32, word_dim=16,
        question_vocab_size=len(loader.vocab["question_token_to_idx"]),
        num_answers=len(loader.vocab["answer_token_to_idx"]),
        num_of_nodes=4, graph_layers=1, unit_layers=1,
    )
    opt = train_lib.make_optimizer(1e-3, 10, grad_accum=2)
    state = train_lib.create_train_state(
        model, jax.random.PRNGKey(7), loader.example_batch(1), opt
    )
    step = train_lib.jit_train_step(model, opt, alpha=1.0, beta=1e-8)
    it = iter(loader)
    losses = []
    for _ in range(2):
        b = next(it)
        state, m = step(
            state,
            (b.appearance_feat, b.motion_feat, b.question, b.question_len,
             b.answer, b.valid),
        )
        losses.append(float(m["loss"]))
    loader.close()
    np.testing.assert_allclose(worker_loss, losses[1], rtol=2e-5)
