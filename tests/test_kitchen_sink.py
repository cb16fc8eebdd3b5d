"""Kitchen-sink integration: every tpu: knob at once through the REAL CLI.

The round-3 features (grad_accum, zero_opt, tensor_parallel,
transfer_dtype, metrics_jsonl, autosave/restore) are each tested in
isolation and in some pairs; THIS test drives the real ``train.py`` CLI in
a subprocess with ALL of them enabled simultaneously, preempts it with a
real SIGTERM mid-epoch, resumes from the autosave with ``train.restore:
True``, trains to completion, and runs ``validate.py`` on the result — the
likeliest place for cross-feature breakage (e.g. reset_grad_accum on a
ZeRO-sharded MultiStepsState, TP placement of a restored accumulator).

Subprocesses are used (not in-process main()) so the SIGTERM handler path
in train.main (train.py:384-401) is exercised by a real OS signal. Each
subprocess forces the CPU backend + 4 virtual devices (a 2x2 (data, model)
mesh — 8 devices make XLA:CPU's 40s collective-rendezvous deadline flaky on
this 1-core box; tests/test_multichip_scale.py covers 8/16/32) through a -c
prelude (the axon TPU plugin ignores JAX_PLATFORMS, so an env var alone is
not enough) and shares the repo's persistent compile cache.
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow

TPU_SECTION = """
tpu:
  grad_accum: 2
  zero_opt: True
  tensor_parallel: 2
  compute_dtype: 'bfloat16'
  transfer_dtype: 'bfloat16'
  metrics_jsonl: 'metrics.jsonl'
  autosave: True
  prefetch: 2
"""

PRELUDE = (
    "import jax; jax.config.update('jax_platforms','cpu'); "
    "jax.config.update('jax_compilation_cache_dir', %r); "
    "jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5); "
    "import sys; sys.path.insert(0, %r); "
) % (os.path.join(REPO, ".jax_cache_cpu"), REPO)


def _spawn(module: str, argv: list[str], log_path: str):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    ).strip()
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONUNBUFFERED"] = "1"
    code = (
        PRELUDE
        + f"import {module}; rc = {module}.main({argv!r}); "
        + "sys.exit(0 if rc is None or not isinstance(rc, int) else rc)"
    )
    log = open(log_path, "w")
    return subprocess.Popen(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        stdout=log, stderr=subprocess.STDOUT,
    )


def _wait(proc, timeout):
    try:
        return proc.wait(timeout)
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.wait(30)
        raise


def test_all_knobs_with_preemption_and_resume(tmp_path):
    from dualvgr_tpu.data.synthetic import generate

    data_dir = str(tmp_path / "data")
    generate(
        data_dir, dataset="svqa", num_videos=32, questions_per_video=4,
        num_clips=4, vision_dim=32, frames=3, num_answers=12, vocab_size=40,
        max_q_len=8, word_dim=16, module_dim=32, batch_size=8, max_epochs=6,
    )
    base_yaml = open(os.path.join(data_dir, "svqa_synth.yml")).read()
    cfg_run = str(tmp_path / "sink.yml")
    with open(cfg_run, "w") as f:
        f.write(base_yaml + TPU_SECTION)
    cfg_resume = str(tmp_path / "sink_resume.yml")
    with open(cfg_resume, "w") as f:
        f.write(
            base_yaml.replace("restore: False", "restore: True") + TPU_SECTION
        )
    save_dir = os.path.join(data_dir, "results", "expSynth-svqa")
    metrics_path = os.path.join(save_dir, "log", "metrics.jsonl")
    train_argv = ["--cfg", cfg_run, "--alpha", "1", "--beta", "1e-8",
                  "--unit_layers", "1"]

    # ---- run 1: train with everything on, SIGTERM mid-epoch-1 ----
    log1 = str(tmp_path / "run1.log")
    proc = _spawn("train", train_argv, log1)
    deadline = time.time() + 900
    try:
        while time.time() < deadline:
            if proc.poll() is not None:
                pytest.fail(
                    f"train exited rc={proc.returncode} before the preemption "
                    f"point:\n{open(log1).read()[-4000:]}"
                )
            if os.path.exists(metrics_path):
                recs = [json.loads(l) for l in open(metrics_path)]
                if any(r["type"] == "train" and r["epoch"] >= 1 for r in recs):
                    break  # mid-epoch 1: epoch-0 autosave exists
            time.sleep(0.5)
        else:
            pytest.fail(f"never reached epoch 1:\n{open(log1).read()[-4000:]}")
        proc.send_signal(signal.SIGTERM)
        rc = _wait(proc, 300)
    finally:
        if proc.poll() is None:
            proc.kill()
    run1_log = open(log1).read()
    assert rc == 0, f"preempted run exited rc={rc}:\n{run1_log[-4000:]}"
    assert "checkpointing to autosave" in run1_log
    autosave = os.path.join(save_dir, "ckpt_autosave")
    assert os.path.isdir(autosave), run1_log[-2000:]

    # ---- run 2: resume from the autosave, train to completion ----
    log2 = str(tmp_path / "run2.log")
    proc = _spawn(
        "train",
        ["--cfg", cfg_resume, "--alpha", "1", "--beta", "1e-8",
         "--unit_layers", "1"],
        log2,
    )
    rc = _wait(proc, 1200)
    run2_log = open(log2).read()
    assert rc == 0, f"resumed run exited rc={rc}:\n{run2_log[-4000:]}"
    assert "resuming from autosave" in run2_log
    # clean completion drops the autosave (restore -> best-ckpt semantics)
    assert not os.path.exists(autosave), run2_log[-2000:]
    assert os.path.isdir(os.path.join(save_dir, "ckpt"))

    # metrics stream: monotone optimizer steps across BOTH runs' records of
    # the resumed epochs; exactly one val record per completed epoch in run 2
    recs = [json.loads(l) for l in open(metrics_path)]
    val_epochs = [r["epoch"] for r in recs if r["type"] == "val"]
    assert sorted(set(val_epochs))[-1] == 5, val_epochs

    # ---- validate.py on the trained checkpoint, same kitchen-sink cfg ----
    log3 = str(tmp_path / "run3.log")
    proc = _spawn("validate", ["--cfg", cfg_resume, "--unit_layers", "1"], log3)
    rc = _wait(proc, 900)
    run3_log = open(log3).read()
    assert rc == 0, f"validate exited rc={rc}:\n{run3_log[-4000:]}"
    assert "Test Accuracy" in run3_log
    # the fixture is learnable: well above 12-way chance (~0.083) proves the
    # restored + ZeRO/TP/grad-accum-trained weights are real, not garbage
    import re

    m = re.search(r"Test Accuracy[^0-9]*([0-9.]+)", run3_log)
    assert m and float(m.group(1)) >= 0.2, run3_log[-2000:]
