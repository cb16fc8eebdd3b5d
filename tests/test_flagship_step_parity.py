"""Flagship-dims per-step trainer parity guard (benchmarks/flagship_step_parity.py).

Drives the harness end-to-end at the REAL flagship operand widths
(vision_dim 2048, module_dim 768, num_of_nodes 16, word_dim 300) for two
steps: the reference's own train() loop runs in a subprocess in
deterministic step mode, and our stack replays the identical captured
batches from the ported identical init. A shape-dependent numerics bug
(wide-operand reduction precision, a Pallas/XLA tile boundary, a
fan-in-dependent init) shows up here and nowhere in the toy-dims parity
(tests/test_reference_train_parity.py). Two steps keep the torch-CPU cost
bounded; the committed artifact benchmarks/flagship_step_parity.json runs
four.
"""

import pytest

pytestmark = pytest.mark.slow


def test_flagship_step_parity(tmp_path):
    from benchmarks.flagship_step_parity import run

    r = run(str(tmp_path), steps=2)
    assert len(r["reference_step_losses"]) == 2
    assert len(r["ours_step_losses"]) == 2
    # losses move (the optimizer actually stepped on both sides)
    assert r["reference_step_losses"][1] != r["reference_step_losses"][0]
    # forward parity is exact at fp32 (step 0 loss is pre-optimizer)
    assert r["per_step_rel_delta"][0] < 1e-5, r
    # the aggregate gate: per-step losses + step-0 gradients, each against
    # max(fixed tol, CHAOS_K x the measured permuted-batch noise floor)
    assert r["ok"], r
