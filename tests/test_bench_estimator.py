"""Unit guard for bench._per_step, the floor estimator every throughput
number in BENCH_r*.json rides on.

Contract (bench.py:113): (min(t_{n+1}) - min(t_1)) / steps, robust to the
tunnel-stall pathologies seen in practice — a stalled 1-iteration probe
must not produce an impossibly fast estimate (the pairwise-min bias), and
no input may ever yield 0.0 (division crashes would lose the whole
artifact before the JSON prints).
"""

import bench


def test_per_step_normal():
    # overhead ~0.1s, 10 steps of ~0.1s each
    assert abs(bench._per_step([(0.1, 1.1), (0.12, 1.15)], 10) - 0.1) < 1e-9


def test_per_step_ignores_stalled_probe():
    # round 1's t1 probe stalled to 5s; pairwise-min would report
    # (1.1 - 5.0) -> clamped garbage, min-min stays at the true 0.1
    assert abs(bench._per_step([(5.0, 1.1), (0.1, 1.2)], 10) - 0.1) < 1e-9


def test_per_step_never_zero():
    # every t1 probe outran its n-step run (sustained stall during probes):
    # falls back to a positive overestimate, never 0.0 (qps = batch / est)
    est = bench._per_step([(5.0, 4.0), (5.0, 4.5)], 10)
    assert est > 0.0
    # the fallback is the loose tn/steps overestimate
    assert abs(est - 0.4) < 1e-9


def test_per_step_caps_sliver_floor():
    # every t1 probe stalled but the floor stays barely positive
    # ((5.0-4.999)/30 = 67 us/step, an impossible rate): the half-median
    # sanity cap replaces it with the median pairwise estimate
    est = bench._per_step([(4.999, 5.0), (4.998, 5.2)], 30)
    assert abs(est - (5.2 - 4.998) / 30) < 1e-9


def test_per_step_cap_leaves_clean_data_alone():
    # clean rounds: floor within ~10% of the median — cap must not engage
    pairs = [(0.10, 1.10), (0.11, 1.16), (0.10, 1.12)]
    assert abs(bench._per_step(pairs, 10) - 0.1) < 1e-9


def test_per_step_median_fallback():
    # min-min collapses (min(tn)=4.0 < min(t1)=4.5) but one round's
    # pairwise diff is clean: the median pairwise diff (0.1) is used
    est = bench._per_step([(5.0, 4.0), (4.5, 5.5)], 10)
    assert abs(est - 0.1) < 1e-9
