"""Offline preprocessing tests: question pipeline + clip sampler."""

import json
import os
import pickle

import numpy as np
import pytest

from preprocess import preprocess_questions
from preprocess.preprocess_features import extract_clips_with_consecutive_frames


@pytest.fixture
def svqa_annotations(tmp_path):
    insts = []
    questions = [
        ("what color is the ball?", "red", "query_color", 0),
        ("is there a cube?", "yes", "exist", 0),
        ("how many spheres are there?", "3", "count", 1),
        ("what color is the cube?", "blue", "query_color", 1),
        ("is there a cylinder moving?", "rareanswer", "exist", 2),
    ]
    for i, (q, a, cat, vid) in enumerate(questions):
        insts.append(
            {"question": q, "ans": a, "id": vid, "program": [{"function": cat}]}
        )
    path = tmp_path / "train_qa.json"
    path.write_text(json.dumps(insts))
    # val split with one OOV answer
    val = [
        {"question": "what color is the mat?", "ans": "neverseen", "id": 0,
         "program": [{"function": "query_color"}]}
    ]
    (tmp_path / "val_qa.json").write_text(json.dumps(val))
    # tiny glove
    glove = {"the": np.ones(8, np.float32), "what": np.full(8, 2.0, np.float32),
             "color": np.full(8, 3.0, np.float32)}
    with open(tmp_path / "glove.pkl", "wb") as f:
        pickle.dump(glove, f)
    return tmp_path


def _run(tmp_path, mode):
    preprocess_questions.main([
        "--dataset", "svqa",
        "--mode", mode,
        "--annotation_file", str(tmp_path / f"{mode}_qa.json"),
        "--glove_pt", str(tmp_path / "glove.pkl"),
        "--output_pt", str(tmp_path / "{}_{}_{}_questions.pt"),
        "--vocab_json", str(tmp_path / "{}_{}_vocab.json"),
        "--answer_top", "3",
    ])


def test_question_pipeline_train(svqa_annotations):
    tmp = svqa_annotations
    _run(tmp, "train")
    with open(tmp / "svqa_svqa_vocab.json") as f:
        vocab = json.load(f)
    # answers: 2 UNKs + top-3 by frequency
    assert vocab["answer_token_to_idx"]["<UNK0>"] == 0
    assert vocab["answer_token_to_idx"]["<UNK1>"] == 1
    assert len(vocab["answer_token_to_idx"]) == 5
    assert vocab["question_token_to_idx"]["<NULL>"] == 0
    assert vocab["question_token_to_idx"]["<UNK>"] == 1
    assert "what" in vocab["question_token_to_idx"]
    # trailing '?' stripped before tokenize => '?' never in vocab
    assert "?" not in vocab["question_token_to_idx"]

    with open(tmp / "svqa_svqa_train_questions.pt", "rb") as f:
        obj = pickle.load(f)
    assert obj["questions"].dtype == np.int32
    assert (obj["questions"][:, 0] > 0).all()
    # all rows padded to the max length with 0
    lens = obj["questions_len"]
    for row, L in zip(obj["questions"], lens):
        assert (row[L:] == 0).all()
    # categories stored as ints
    assert obj["question_category"][0] == 2  # query_color
    # OOV train answer -> 0: 'rareanswer' fell outside top-3
    oov_idx = 4
    assert obj["answers"][oov_idx] == 0
    # glove aligned to vocab: row for 'what' is the glove vector
    w = json.loads((tmp / "svqa_svqa_vocab.json").read_text())["question_token_to_idx"]["what"]
    np.testing.assert_allclose(obj["glove"][w], np.full(8, 2.0), rtol=1e-6)
    # OOV vocab words get zero vectors
    assert (obj["glove"][0] == 0).all()


def test_question_pipeline_val_oov_answer(svqa_annotations):
    tmp = svqa_annotations
    _run(tmp, "train")
    _run(tmp, "val")
    with open(tmp / "svqa_svqa_val_questions.pt", "rb") as f:
        obj = pickle.load(f)
    assert obj["answers"][0] == 1  # val OOV -> <UNK1>
    assert obj["glove"] is None


def _write_video(path, n_frames, size=(32, 32)):
    import cv2

    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    w = cv2.VideoWriter(str(path), fourcc, 10.0, size)
    if not w.isOpened():
        pytest.skip("no mp4 encoder available")
    for i in range(n_frames):
        # encode the frame index in the blue channel (BGR order in cv2)
        frame = np.zeros((size[1], size[0], 3), np.uint8)
        frame[:, :, 0] = i * 5
        w.write(frame)
    w.release()


def test_clip_sampler_structure(tmp_path):
    path = tmp_path / "v.mp4"
    n_frames = 40
    _write_video(path, n_frames)
    num_clips, f = 3, 16
    clips, valid = extract_clips_with_consecutive_frames(
        str(path), num_clips, f, (24, 24), motion_layout=False
    )
    assert valid
    assert clips.shape == (num_clips, f, 3, 24, 24)
    # centers at linspace(0, 40, 5)[1:4] = 10, 20, 30; windows [2,18),[12,28),[22,38)
    centers = np.linspace(0, n_frames, num_clips + 2, dtype=np.int32)[1 : num_clips + 1]
    for k, c in enumerate(centers):
        start = max(int(c) - 8, 0)
        # index was written to cv2 channel 0 (B); after BGR->RGB it's channel 2
        got_first = clips[k, 0, 2].mean()
        # lossy codec: allow slack around the encoded value
        assert abs(got_first - start * 5) < 12, (k, c, got_first, start * 5)
        got_last = clips[k, -1, 2].mean()
        assert abs(got_last - (start + 15) * 5) < 12, (k, c, got_last)


def test_clip_sampler_short_video_replicates_boundaries(tmp_path):
    path = tmp_path / "short.mp4"
    _write_video(path, 6)  # shorter than one 16-frame clip
    clips, valid = extract_clips_with_consecutive_frames(
        str(path), 2, 16, (24, 24), motion_layout=False
    )
    assert valid
    assert clips.shape == (2, 16, 3, 24, 24)


def test_clip_sampler_motion_layout(tmp_path):
    path = tmp_path / "m.mp4"
    _write_video(path, 20)
    clips, valid = extract_clips_with_consecutive_frames(
        str(path), 2, 16, (16, 16), motion_layout=True
    )
    assert clips.shape == (2, 3, 16, 16, 16)


def test_clip_sampler_broken_video():
    clips, valid = extract_clips_with_consecutive_frames(
        "/nonexistent/file.mp4", 2, 16, (24, 24), motion_layout=False
    )
    assert not valid
    assert clips.shape == (2, 16, 3, 24, 24)
    assert (clips == 0).all()
