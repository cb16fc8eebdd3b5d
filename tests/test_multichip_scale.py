"""Multi-chip correctness at scale (round-2 verdict item 9).

* Global-batch invariance: the SAME global batch must produce the SAME
  train-step loss whether the mesh has 1, 4, or 8 devices (per-device batch
  varies; semantics are global under jit-over-sharded-inputs). This is the
  property that makes the data-parallel design a drop-in for the
  reference's single-GPU training (reference train.py:80-83).
* The driver-facing dryrun (__graft_entry__.dryrun_multichip) must stay
  green beyond 8 virtual devices: 16 and 32 run in subprocesses.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_setup():
    import jax

    from dualvgr_tpu import train_lib
    from dualvgr_tpu.models import DualVGR

    model = DualVGR(
        vision_dim=24, module_dim=16, word_dim=8, question_vocab_size=30,
        num_answers=10, num_of_nodes=4, graph_layers=1, unit_layers=1,
    )
    rng = np.random.RandomState(7)
    b, c, f, t = 8, 4, 3, 5
    app = rng.randn(b, c, f, 24).astype(np.float32)
    mot = rng.randn(b, c, 24).astype(np.float32)
    q = rng.randint(1, 30, (b, t)).astype(np.int32)
    qlen = rng.randint(1, t + 1, (b,)).astype(np.int32)
    for i in range(b):
        q[i, qlen[i]:] = 0
    ans = rng.randint(0, 10, (b,)).astype(np.int32)
    valid = np.ones((b,), np.float32)
    opt = train_lib.make_optimizer(1e-3, 10)
    state = train_lib.create_train_state(
        model, jax.random.PRNGKey(666), (app[:1], mot[:1], q[:1], qlen[:1]), opt
    )
    return model, opt, state, (app, mot, q, qlen, ans, valid)


def test_global_batch_invariance():
    """Identical loss + grad-updated param checksum for the same global
    batch at mesh sizes 1, 4, 8 (per-device batch 8, 2, 1)."""
    import jax

    from dualvgr_tpu import train_lib
    from dualvgr_tpu.parallel import data_mesh, replicate, shard_batch

    model, opt, state, batch = _tiny_setup()
    results = {}
    for n in (1, 4, 8):
        mesh = data_mesh(devices=jax.devices()[:n])
        st = replicate(state, mesh)
        sb = shard_batch(batch, mesh)
        step = train_lib.jit_train_step(model, opt, alpha=1.0, beta=1e-8, donate=False)
        new_state, metrics = step(st, sb)
        checksum = float(
            sum(
                jax.tree_util.tree_reduce(
                    lambda a, x: a + float(np.abs(np.asarray(x)).sum()),
                    new_state.params,
                    0.0,
                )
                for _ in (0,)
            )
        )
        results[n] = (float(metrics["loss"]), float(metrics["correct"]), checksum)

    l1, c1, s1 = results[1]
    for n in (4, 8):
        ln, cn, sn = results[n]
        # same math, different collective/accumulation order: tight but not
        # bitwise tolerance
        np.testing.assert_allclose(ln, l1, rtol=2e-6)
        assert cn == c1
        np.testing.assert_allclose(sn, s1, rtol=2e-6)


@pytest.mark.slow
@pytest.mark.parametrize("n_devices", [16, 32])
def test_dryrun_multichip_scales(n_devices):
    """The driver's dryrun entry compiles + executes at 16 and 32 virtual
    devices (the driver itself runs it at 8)."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    # share the suite's persistent compile cache (conftest.py sets it only
    # in-process): warm re-runs skip the 16/32-device XLA compiles
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(REPO, ".jax_cache_cpu")
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.5"
    proc = subprocess.run(
        [sys.executable, "__graft_entry__.py", str(n_devices)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert f"dryrun_multichip OK: {n_devices}-device mesh" in proc.stdout
