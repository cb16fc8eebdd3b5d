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


def test_two_process_train_step():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            PYTHONPATH=REPO,
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

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("MULTIHOST "):
                _, pid, loss, logits = line.split()
                results[int(pid)] = (loss, logits)
    assert set(results) == {0, 1}, (results, outs)
    # both processes computed the SAME global step: identical loss + logits
    assert results[0] == results[1], results
    loss = float(results[0][0].split("=")[1])
    assert 0.0 < loss < 50.0, loss
