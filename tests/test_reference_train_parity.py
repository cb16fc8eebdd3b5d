"""FULL-STACK training parity against the ACTUAL reference trainer.

Runs the reference's own train() (its DataLoader, loss loop, optimizer,
validate) in a subprocess on a learnable synthetic fixture, trains this
framework from the PORTED identical init, and compares converged val
accuracy plus a deterministic final-weights anchor. See
benchmarks/reference_train_parity.py for the full protocol.
"""

import os

import pytest

REFERENCE = "/root/reference"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REFERENCE, "model")),
        reason="reference repo not mounted",
    ),
]


def test_full_training_stack_parity(tmp_path):
    from benchmarks.reference_train_parity import run

    epochs = 6
    r = run(str(tmp_path), epochs=epochs)
    ref, ours = r["reference_val_acc"], r["ours_val_acc"]
    assert len(ref) == len(ours) == epochs
    two = r["anchor_tolerance_two_samples"]

    # (a) deterministic anchor: our loader+validate stack on the reference's
    # FINAL trained weights reproduces the reference's own final val
    # accuracy (identical weights, dropout-free eval; tolerance = two
    # fp-boundary argmax flips)
    assert r["anchor_abs_delta"] <= two, r

    # (b) the fixture is DE-SATURATED (30% label noise): both stacks must
    # learn well above chance (~0.1) yet stay at/below the clean-label
    # ceiling — parity at a sub-ceiling plateau actually discriminates,
    # because any roughly-correct stack saturates a noise-free fixture
    ceiling = r["val_clean_fraction"]
    assert ceiling <= 0.85, f"fixture failed to de-saturate: {r}"
    for name, plateau in (("ref", r["ref_plateau"]), ("ours", r["ours_plateau"])):
        assert 0.4 <= plateau <= ceiling + two, (name, plateau, r)

    # (c) plateau-level accuracy parity (trajectories legitimately differ
    # in shuffle order + dropout streams; the mean of the last 3 epochs is
    # the comparable). 0.05 covers two independently-trained stacks' seed
    # variation at 6 epochs on n_val=96 while still catching any
    # systematic stack-level accuracy gap (the 10-epoch artifact in
    # benchmarks/reference_train_parity.json measures |delta| ~0.007).
    assert abs(r["plateau_delta"]) <= 0.05 + 1e-9, r
