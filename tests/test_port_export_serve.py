"""Deployment chain on a PORTED reference checkpoint (round-3 verdict 7).

port -> export -> serve, cross-checked against validate.py: a synthesized
(random-weight) reference ``*_model.pt`` with the reference's checkpoint
schema (reference train.py:359-367) is imported through the
``port_reference import`` CLI, AOT-exported through the real
``dualvgr_tpu.export`` CLI main, loaded back as a StableHLO artifact,
served through the BatchingEngine, and the served top-1 answers must equal
the predictions the real ``validate.py`` CLI writes for the same fixture —
eval is deterministic per-row (dropout off, BatchNorm running stats), so
the chain must agree exactly.
"""

import json
import os
import pickle

import h5py
import numpy as np
import pytest

pytestmark = pytest.mark.slow

TINY = dict(
    vision_dim=32, module_dim=32, word_dim=16, question_vocab_size=40,
    num_answers=12, num_of_nodes=4, graph_layers=1, unit_layers=1,
)
REF_KWARG_KEYS = (
    "vision_dim", "module_dim", "word_dim", "num_of_nodes",
    "graph_module", "graph_layers",
)


def _fake_reference_pt(path, epoch=3):
    """Random-weight checkpoint in the reference's schema, shaped for the
    session synth fixture (24 videos, 4 clips, 3 frames, vision 32)."""
    import jax
    import torch

    from dualvgr_tpu import train_lib
    from dualvgr_tpu.models import DualVGR
    from dualvgr_tpu.utils import port_reference

    model = DualVGR(**TINY)
    example = (
        np.zeros((1, 4, 3, 32), np.float32),
        np.zeros((1, 4, 32), np.float32),
        np.ones((1, 8), np.int32),
        np.asarray([8], np.int32),
    )
    opt = train_lib.make_optimizer(1e-3, 1)
    state = train_lib.create_train_state(
        model, jax.random.PRNGKey(123), example, opt
    )
    sd = port_reference.export_reference_state_dict(
        {"params": jax.device_get(state.params),
         "batch_stats": jax.device_get(state.batch_stats)}
    )
    model_kwargs = {k: TINY[k] for k in REF_KWARG_KEYS if k in TINY}
    model_kwargs["graph_module"] = "GAT"
    torch.save(
        {"epoch": epoch,
         "state_dict": {k: torch.tensor(np.asarray(v)) for k, v in sd.items()},
         "optimizer": None, "model_kwargs": model_kwargs},
        path,
    )


def test_port_export_serve_matches_validate(synth_dir, tmp_path, capsys):
    import validate as validate_cli
    from dualvgr_tpu.export import _main as export_main, load_artifact
    from dualvgr_tpu.serving import BatchingEngine
    from dualvgr_tpu.utils import port_reference

    # config copy with an isolated save_dir (the CLIs derive every path
    # from it: {save_dir}/{exp_name}/{ckpt,preds})
    text = open(synth_dir["config"]).read()
    cfg_path = str(tmp_path / "svqa_roundtrip.yml")
    with open(cfg_path, "w") as f:
        f.write("\n".join(
            f"  save_dir: '{tmp_path}/results/'"
            if l.strip().startswith("save_dir") else l
            for l in text.splitlines()
        ))
    save_dir = os.path.join(str(tmp_path), "results", "expSynth-svqa")
    ckpt_dir = os.path.join(save_dir, "ckpt")

    # ---- 1. port: reference .pt -> orbax ckpt via the real CLI ----
    pt = str(tmp_path / "ref_model.pt")
    _fake_reference_pt(pt)
    port_reference.main(["import", pt, ckpt_dir])
    assert os.path.exists(os.path.join(ckpt_dir, "model"))

    # ---- 2. validate.py on the ported checkpoint (writes preds JSON) ----
    acc = validate_cli.main(["--cfg", cfg_path, "--unit_layers", "1"])
    assert 0.0 <= float(acc) <= 1.0
    capsys.readouterr()
    preds_path = os.path.join(save_dir, "preds", "test_preds.json")
    with open(preds_path) as f:
        validate_preds = {
            int(inst["question_id"]): inst["prediction"] for inst in json.load(f)
        }
    assert validate_preds

    # ---- 3. export the same checkpoint to a StableHLO artifact ----
    art = str(tmp_path / "model.dvgr")
    export_main([
        "--cfg", cfg_path, "--out", art, "--unit_layers", "1",
        "--max-batch", "8", "--max-q-len", "8", "--topk", "3",
    ])
    fn, meta = load_artifact(art)
    assert meta["max_batch"] == 8 and meta["top_k"] == 3

    # ---- 4. serve the artifact; top-1 answers == validate.py's ----
    d = synth_dir["dir"]
    with open(os.path.join(d, "svqa_test_questions.pt"), "rb") as f:
        test_split = pickle.load(f)
    with h5py.File(os.path.join(d, "svqa_appearance_feat.h5")) as f:
        app = np.asarray(f["resnet_features"], np.float32)
    with h5py.File(os.path.join(d, "svqa_motion_feat.h5")) as f:
        mot = np.asarray(f["resnext_features"], np.float32)
    with open(os.path.join(d, "svqa_vocab.json")) as f:
        vocab = json.load(f)
    idx_to_answer = {v: k for k, v in vocab["answer_token_to_idx"].items()}

    served = {}
    with BatchingEngine(
        fn, max_batch=8, max_wait_ms=1.0, max_q_len=8,
        feature_shapes=(app.shape[1:], mot.shape[1:]),
    ) as eng:
        for qid, vid, qrow, qlen in zip(
            test_split["question_id"], test_split["video_ids"],
            test_split["questions"], test_split["questions_len"],
        ):
            ids, scores = eng.submit(
                app[int(vid)], mot[int(vid)],
                np.asarray(qrow[: int(qlen)], np.int32),
            )
            assert scores[0] >= scores[-1]  # top-k sorted
            served[int(qid)] = idx_to_answer[int(ids[0])]

    assert set(served) == set(validate_preds)
    mismatches = {q: (served[q], validate_preds[q])
                  for q in served if served[q] != validate_preds[q]}
    assert not mismatches, mismatches
