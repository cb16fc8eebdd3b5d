"""The reference CLI surface, driven end to end through the REAL main()s.

train.py --cfg --alpha --beta --unit_layers and validate.py --cfg
--unit_layers are the public contract (reference train.py:370-376,
validate.py:238-242). These run both on the synthetic fixture exactly as a
user would, checkpoint included — the rot-guard that predict.py lacked
(its untested CLI silently broke behind three refactors). Plus the GloVe
converter CLI, previously untested.
"""

import os
import pickle

import numpy as np
import pytest


@pytest.fixture(scope="module")
def cli_workdir(synth_dir, tmp_path_factory):
    """The synth config with save_dir redirected to an isolated tmp dir
    (the session fixture's own save_dir is shared; the CLI offers no
    override flag, matching the reference surface)."""
    out = tmp_path_factory.mktemp("cli_drivers")
    text = open(synth_dir["config"]).read()
    assert "save_dir" in text
    cfg_path = str(out / "svqa_cli.yml")
    lines = [
        f"  save_dir: '{out}/results/'" if l.strip().startswith("save_dir") else l
        for l in text.splitlines()
    ]
    with open(cfg_path, "w") as f:
        f.write("\n".join(lines))
    return {"config": cfg_path, "out": str(out)}


@pytest.mark.slow
def test_train_then_validate_cli(cli_workdir, capsys):
    import train
    import validate

    train.main([
        "--cfg", cli_workdir["config"],
        "--alpha", "1", "--beta", "1e-8", "--unit_layers", "1",
    ])
    ckpt = os.path.join(cli_workdir["out"], "results", "expSynth-svqa", "ckpt", "model")
    assert os.path.exists(os.path.join(ckpt, "model_kwargs.json"))

    acc = validate.main(["--cfg", cli_workdir["config"], "--unit_layers", "1"])
    out = capsys.readouterr().out
    assert "Test Accuracy" in out
    assert 0.0 <= float(acc) <= 1.0


@pytest.mark.slow
def test_metrics_jsonl_stream(synth_dir, tmp_path):
    """cfg.tpu.metrics_jsonl: train records at every log boundary with
    monotone steps + one val record per epoch, each line valid JSON."""
    import json

    import train as train_cli
    from dualvgr_tpu.config import cfg_from_file, resolve_dataset_paths

    cfg = cfg_from_file(synth_dir["config"])
    cfg.dataset.save_dir = str(tmp_path)
    cfg.alpha, cfg.beta, cfg.unit_layers = 1.0, 1e-8, 1
    cfg.train.max_epochs = 2
    cfg.tpu.metrics_jsonl = "metrics.jsonl"  # relative -> {save_dir}/log/
    cfg = resolve_dataset_paths(cfg)
    train_cli.train(cfg)

    path = os.path.join(str(tmp_path), "log", "metrics.jsonl")
    records = [json.loads(l) for l in open(path)]
    train_recs = [r for r in records if r["type"] == "train"]
    val_recs = [r for r in records if r["type"] == "val"]
    assert train_recs and len(val_recs) == 2
    steps = [r["step"] for r in train_recs]
    assert steps == sorted(steps) and len(set(steps)) == len(steps)
    for r in train_recs:
        assert np.isfinite(r["ce"]) and r["lr"] > 0 and r["wall_s"] >= 0
    for r in val_recs:
        assert 0.0 <= r["acc"] <= 1.0 and set(r["categories"]) and "best" in r


def test_glove_txt2pickle_cli(tmp_path):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "glove"))
    try:
        import txt2pickle
    finally:
        sys.path.pop(0)

    txt = tmp_path / "glove.txt"
    # the 840B vocab contains tokens with internal spaces — the vector is
    # always the LAST dim fields (txt2pickle handles this; pandas doesn't)
    txt.write_text(
        "the 0.1 0.2 0.3\n"
        "a 1.0 2.0 3.0\n"
        ". . 9.0 9.5 9.9\n"
    )
    outp = tmp_path / "glove.pkl"
    n = txt2pickle.convert(str(txt), str(outp))
    assert n == 3
    with open(outp, "rb") as f:
        glove = pickle.load(f)
    np.testing.assert_allclose(glove["the"], [0.1, 0.2, 0.3], rtol=1e-6)
    np.testing.assert_allclose(glove[". ."], [9.0, 9.5, 9.9], rtol=1e-6)
    assert glove["a"].dtype == np.float32
