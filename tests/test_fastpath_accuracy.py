"""Guard for the fast-path accuracy harness (benchmarks/fastpath_accuracy.py).

Runs the harness at tiny dims on the CPU backend: trains the anchor to a
plateau on the label-noised fixture, evaluates the trained weights under
the bf16 fast paths, trains end-to-end under bf16, and round-trips the
trained-weights bundle that bench.py's trained gates consume. The Pallas
paths are skipped off-TPU (resolved inside the harness); the REAL evidence
at flagship precision shapes is the committed artifact
benchmarks/fastpath_accuracy.json produced on the chip.
"""

import numpy as np
import pytest

TINY = dict(
    num_videos=36, questions_per_video=4, num_clips=4, vision_dim=32,
    frames=3, num_answers=12, vocab_size=40, max_q_len=8, word_dim=16,
    module_dim=32, batch_size=16,
    # explicit eval size: the flagship FIXTURE default (680/video, built for
    # resolving the 0.2% gate on-chip) would make this CPU guard eval-bound
    eval_questions_per_video=170,
)


@pytest.mark.slow
def test_fastpath_accuracy_harness(tmp_path):
    import jax

    from benchmarks.fastpath_accuracy import run

    bundle_path = str(tmp_path / "bundle.msgpack")
    r = run(
        str(tmp_path), epochs=6, fixture_overrides=TINY,
        save_trained=True, bundle_path=bundle_path,
    )
    paths = r["paths"]
    assert set(paths) >= {
        "fp32_xla", "pallas", "bf16_compute", "bf16_transfer", "combined",
        "bf16_trained_end_to_end",
    }
    # on TPU the harness also trains the full pallas+bf16 deployment
    assert set(paths) - {
        "fp32_xla", "pallas", "bf16_compute", "bf16_transfer", "combined",
        "bf16_trained_end_to_end", "pallas_bf16_trained_end_to_end",
    } == set()

    # the fixture de-saturates (label noise) and the anchor learns it well
    # above 12-way chance (~0.083). The gate is 0.20, not higher: at this
    # n_eval the accuracy is a PRECISE estimate of the tiny fixture's
    # plateau (~0.25), not a noisy draw that can be gated at its mean.
    assert r["val_clean_fraction"] <= 0.9
    anchor = paths["fp32_xla"]["accuracy"]
    assert anchor >= 0.20, r

    on_tpu = jax.default_backend() == "tpu"
    for name in ("pallas", "combined"):
        if not on_tpu:
            assert "skipped" in paths[name], paths[name]

    # bf16 fast paths at trained weights: loose tiny-fixture bounds,
    # generous on accuracy, tight on agreement — a real numerics bug flips
    # far more than 20% of confidently-separated trained logits
    for name in ("bf16_compute", "bf16_transfer") + (
        ("pallas", "combined") if on_tpu else ()
    ):
        p = paths[name]
        assert abs(p["delta_vs_anchor"]) <= 0.15, (name, p)
        assert p["argmax_agreement"] >= 0.8, (name, p)

    # end-to-end bf16 training converges to a comparable plateau
    assert abs(paths["bf16_trained_end_to_end"]["delta_vs_fp32_trained"]) <= 0.25, r

    # the trained bundle round-trips and matches the anchor model's shapes
    import flax.serialization

    with open(bundle_path, "rb") as f:
        bundle = flax.serialization.msgpack_restore(f.read())
    assert set(bundle) >= {"params", "batch_stats", "model_kwargs", "val_batch"}
    vb = bundle["val_batch"]
    assert vb["app"].shape[1:] == (TINY["num_clips"], TINY["frames"], TINY["vision_dim"])
    assert vb["q"].dtype == np.int32 and len(vb["qlen"]) == len(vb["q"])

    # the bundle drives a forward pass (what bench.py's trained gates do)
    from dualvgr_tpu.models import DualVGR

    mk = {k: (int(v) if isinstance(v, (np.integer, int)) else v)
          for k, v in bundle["model_kwargs"].items()}
    model = DualVGR(use_pallas=False, **mk)
    logits = model.apply(
        {"params": bundle["params"], "batch_stats": bundle["batch_stats"] or {}},
        vb["app"], vb["mot"], vb["q"], vb["qlen"], train=False,
    ).logits
    assert logits.shape == (len(vb["q"]), TINY["num_answers"])
    assert np.isfinite(np.asarray(logits)).all()
