"""Dataset integrity checker: clean fixture passes; corruptions are named."""

import os
import pickle
import shutil

import h5py
import numpy as np

from dualvgr_tpu.data import check as check_mod


def test_checker_passes_on_synth(synth_dir, capsys):
    rc = check_mod.main(["--cfg", synth_dir["config"]])
    out = capsys.readouterr().out
    assert rc == 0 and "OK" in out


def test_checker_names_corruptions(synth_dir, tmp_path):
    d = synth_dir["dir"]
    work = str(tmp_path)
    for name in os.listdir(d):
        src = os.path.join(d, name)
        if os.path.isfile(src):
            shutil.copy(src, os.path.join(work, name))

    # corruption 1: a question token beyond the vocabulary
    qpt = os.path.join(work, "svqa_test_questions.pt")
    with open(qpt, "rb") as f:
        obj = pickle.load(f)
    obj["questions"] = np.asarray(obj["questions"], np.int32)
    obj["questions"][0, 0] = 10_000
    with open(qpt, "wb") as f:
        pickle.dump(obj, f)

    # corruption 2: drop the last video row from the motion h5
    mot = os.path.join(work, "svqa_motion_feat.h5")
    with h5py.File(mot, "r") as f:
        feats = f["resnext_features"][()]
        ids = f["ids"][()]
    os.remove(mot)
    with h5py.File(mot, "w") as f:
        f.create_dataset("resnext_features", data=feats[:-1])
        f.create_dataset("ids", data=ids[:-1])

    errors, warnings = check_mod.check_dataset(
        os.path.join(work, "svqa_vocab.json"),
        {"test": qpt},
        os.path.join(work, "svqa_appearance_feat.h5"),
        mot,
        dataset="svqa",
        num_of_nodes=4,
    )
    assert any("token ids outside" in e for e in errors), errors
    assert any("missing from the motion h5" in e for e in errors), errors
    # the untouched appearance h5 raises no missing-id error
    assert not any("appearance h5" in e and "missing" in e for e in errors), errors


def test_checker_rejects_clip_mismatch(synth_dir, tmp_path):
    """num_of_nodes != h5 clips is the classic config/feature mismatch."""
    d = synth_dir["dir"]
    errors, _ = check_mod.check_dataset(
        os.path.join(d, "svqa_vocab.json"),
        {},
        os.path.join(d, "svqa_appearance_feat.h5"),
        os.path.join(d, "svqa_motion_feat.h5"),
        num_of_nodes=16,
    )
    assert any("num_of_nodes" in e for e in errors), errors
