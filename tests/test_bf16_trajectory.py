"""Guards for the bf16-training trajectory probes
(benchmarks/bf16_divergence_bisect.py, benchmarks/bf16_chaos_control.py).

The real evidence is the committed chip artifacts
(bf16_divergence_bisect.json: first divergence = 5 bias leaves at ~1e-9 on
step 0 — f32 bias-grad sum-reductions re-associated between the two
programs; bf16_chaos_control.json: the converged-accuracy deltas vs the
pure-fp32 one-ulp chaos band). These tests keep the probes executable and
non-vacuous on the CPU tier, where streaming applies GENUINE rounding (no
DEFAULT-precision truncation) — so the bisect must detect divergence
immediately; a probe that reported bitwise equality on CPU would be
meaningless on chip too.
"""

import jax
import pytest

TINY = dict(
    num_videos=24, questions_per_video=4, num_clips=4, vision_dim=32,
    frames=3, num_answers=12, vocab_size=40, max_q_len=8, word_dim=16,
    module_dim=32, batch_size=16,
)


@pytest.mark.slow
def test_divergence_bisect_detects_on_cpu(tmp_path):
    from benchmarks.bf16_divergence_bisect import run

    r = run(str(tmp_path), epochs=2, fixture_overrides=TINY,
            write_artifact=False)
    assert r["init_diverged"] == 0  # init params are dtype-independent
    if jax.default_backend() == "cpu":
        # CPU: real RNE rounding in the streamed ops — forward differs and
        # the very first step must diverge (non-vacuousness)
        assert not r["fwd_bitwise_at_harness_shape"]
        fd = r["first_divergence"]
        assert fd is not None and fd["global_step"] == 0
        assert fd["diverged_leaves"] > 0 and fd["leaves"]


@pytest.mark.slow
def test_chaos_control_harness(tmp_path):
    from benchmarks.bf16_chaos_control import run

    r = run(str(tmp_path), n_seeds=1, epochs=3, fixture_overrides=TINY,
            write_artifact=False)
    (row,) = r["runs"]
    for k in ("fp32", "bf16", "fp32_ulp", "fp32_stepnoise"):
        assert 0.0 <= row[k] <= 1.0
    assert row["bf16_delta"] == pytest.approx(row["bf16"] - row["fp32"])
    assert r["fp32_ulp_spread"] >= 0.0
    assert r["fp32_stepnoise_spread"] >= 0.0
    assert r["fp32_seed_spread"] == 0.0  # single seed
    assert "bf16_mean_delta" in r and "bf16_delta_range" in r
