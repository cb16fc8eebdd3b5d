"""End-to-end feature extraction: tiny real videos -> generate_h5 main loop
(threaded decode, batched sharded inference, incremental H5 writes, broken-
video zero rows) -> reference HDF5 schema -> VideoQADataLoader round-trip.

Mirrors the reference driver's contract (reference
preprocess/preprocess_features.py:143-203): dataset names
resnet_features/resnext_features, ids vector, zero features for unreadable
videos. Random-weight backbones at reduced resolution keep this CPU-fast.
"""

import json
import os
import pickle
import types

import h5py
import numpy as np
import pytest

from preprocess import preprocess_features
from preprocess.datautils import svqa

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def video_corpus(tmp_path_factory):
    """3 video ids: 0 and 1 real tiny mp4s, 2 missing (broken-video path)."""
    import cv2

    root = tmp_path_factory.mktemp("extract_e2e")
    vdir = root / "videos"
    vdir.mkdir()
    for vid, n_frames in ((0, 24), (1, 9)):
        fourcc = cv2.VideoWriter_fourcc(*"mp4v")
        w = cv2.VideoWriter(str(vdir / f"{vid}.mp4"), fourcc, 10.0, (32, 32))
        if not w.isOpened():
            pytest.skip("no mp4 encoder available")
        rng = np.random.RandomState(vid)
        for _ in range(n_frames):
            w.write(rng.randint(0, 255, (32, 32, 3), np.uint8))
        w.release()

    questions = [
        ("what color is the ball?", "red", "query_color", 0),
        ("is there a cube?", "yes", "exist", 0),
        ("how many spheres are there?", "3", "count", 1),
        ("what color is the cube?", "blue", "query_color", 1),
        ("is there a cylinder?", "yes", "exist", 2),
    ]
    insts = [
        {"question": q, "ans": a, "id": vid, "program": [{"function": cat}]}
        for q, a, cat, vid in questions
    ]
    ann = root / "train_qa.json"
    ann.write_text(json.dumps(insts))
    glove = {"the": np.ones(8, np.float32), "what": np.full(8, 2.0, np.float32)}
    with open(root / "glove.pkl", "wb") as f:
        pickle.dump(glove, f)
    return root


@pytest.fixture(scope="module")
def extracted(video_corpus):
    """Run the real driver for BOTH feature types (random weights)."""
    root = video_corpus
    app_h5 = str(root / "svqa_appearance_feat.h5")
    # appearance through the actual CLI surface (reduced resolution)
    preprocess_features.main([
        "--dataset", "svqa",
        "--model", "resnet101",
        "--annotation_file", str(root / "train_qa.json"),
        "--video_dir", str(root / "videos") + "/",
        "--outfile", app_h5,
        "--num_clips", "2",
        "--image_height", "48",
        "--image_width", "48",
        "--videos_per_batch", "3",
        "--decode_threads", "2",
    ])
    # motion via generate_h5 directly so the test can shrink the 112^2 the
    # CLI pins for resnext101 (main(), preprocess_features.py:320-321)
    mot_h5 = str(root / "svqa_motion_feat.h5")
    args = types.SimpleNamespace(
        feature_type="motion", ckpt="", outfile=mot_h5, num_clips=2,
        image_height=48, image_width=48, videos_per_batch=3, decode_threads=2,
        annotation_file=str(root / "train_qa.json"),
        video_dir=str(root / "videos") + "/",
    )
    preprocess_features.generate_h5(args, svqa.load_video_paths(args))
    return {"appearance": app_h5, "motion": mot_h5, "dir": root}


def test_h5_schema_and_broken_video_rows(extracted):
    with h5py.File(extracted["appearance"], "r") as f:
        feats = f["resnet_features"][()]
        ids = f["ids"][()]
    assert feats.shape == (3, 2, 16, 2048) and feats.dtype == np.float32
    assert set(ids.tolist()) == {0, 1, 2}
    row = {int(i): k for k, i in enumerate(ids)}
    # missing video 2 -> zero features (failure-detection contract)
    assert (feats[row[2]] == 0).all()
    for vid in (0, 1):
        assert np.abs(feats[row[vid]]).sum() > 0

    with h5py.File(extracted["motion"], "r") as f:
        mfeats = f["resnext_features"][()]
        mids = f["ids"][()]
    assert mfeats.shape == (3, 2, 2048) and mfeats.dtype == np.float32
    mrow = {int(i): k for k, i in enumerate(mids)}
    assert (mfeats[mrow[2]] == 0).all()
    assert np.abs(mfeats[mrow[0]]).sum() > 0


def test_extracted_h5_roundtrips_through_loader(extracted):
    from dualvgr_tpu.data import VideoQADataLoader
    from preprocess import preprocess_questions

    root = extracted["dir"]
    preprocess_questions.main([
        "--dataset", "svqa",
        "--mode", "train",
        "--annotation_file", str(root / "train_qa.json"),
        "--glove_pt", str(root / "glove.pkl"),
        "--output_pt", str(root / "{}_{}_{}_questions.pt"),
        "--vocab_json", str(root / "{}_{}_vocab.json"),
        "--answer_top", "4",
    ])
    loader = VideoQADataLoader(
        question_pt=str(root / "svqa_svqa_train_questions.pt"),
        vocab_json=str(root / "svqa_svqa_vocab.json"),
        appearance_feat=extracted["appearance"],
        motion_feat=extracted["motion"],
        batch_size=5,
        shuffle=False,
    )
    assert loader.num_samples == 5
    batch = next(iter(loader))
    assert batch.appearance_feat.shape == (5, 2, 16, 2048)
    assert batch.motion_feat.shape == (5, 2, 2048)
    # row alignment: each batch row carries the h5 features of its video id
    with h5py.File(extracted["appearance"], "r") as f:
        feats = f["resnet_features"][()]
        row = {int(i): k for k, i in enumerate(f["ids"][()])}
    for k, vid in enumerate(batch.video_idx):
        np.testing.assert_array_equal(batch.appearance_feat[k], feats[row[int(vid)]])
    # question 4 references the broken video -> zero features, still trainable
    assert (batch.appearance_feat[4] == 0).all()
    loader.close()


def test_bf16_extraction_close_to_fp32(extracted):
    """--compute-dtype bfloat16 extraction: same schema, features within
    ~1% relative of fp32 (the claim the CLI help makes)."""
    root = extracted["dir"]
    app16 = str(root / "svqa_appearance_feat_bf16.h5")
    preprocess_features.main([
        "--dataset", "svqa",
        "--model", "resnet101",
        "--annotation_file", str(root / "train_qa.json"),
        "--video_dir", str(root / "videos") + "/",
        "--outfile", app16,
        "--num_clips", "2",
        "--image_height", "48",
        "--image_width", "48",
        "--videos_per_batch", "3",
        "--decode_threads", "2",
        "--compute-dtype", "bfloat16",
    ])
    with h5py.File(extracted["appearance"], "r") as f:
        ref = f["resnet_features"][()]
        rows = {int(i): k for k, i in enumerate(f["ids"][()])}
    with h5py.File(app16, "r") as f:
        got = f["resnext_features" if False else "resnet_features"][()]
        rows16 = {int(i): k for k, i in enumerate(f["ids"][()])}
    assert got.dtype == np.float32  # h5 contract stays fp32
    for vid in (0, 1):
        a = ref[rows[vid]].reshape(-1, 2048)
        b = got[rows16[vid]].reshape(-1, 2048)
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-9)
        assert rel < 0.02, rel
        cos = (a * b).sum(-1) / (
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-9
        )
        assert cos.min() > 0.995, cos.min()
    # broken video still zero
    assert (got[rows16[2]] == 0).all()
