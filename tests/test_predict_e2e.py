"""End-to-end predict.py: raw video + question -> ranked answers.

Drives the fused pipeline (clip sampling -> both random-weight CNN
backbones at reduced resolution -> DualVGR inference from a restored
checkpoint) through the actual CLI entry point. Exercises num_clips <
mesh.size (2 clips on the 8-device CPU mesh), the regression case for the
row-padding fix in predict.py's backbone stage.
"""

import os

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def predict_env(tmp_path_factory):
    """Backbone-shaped synthetic dataset (vision 2048, 16 frames) + a
    saved random-init checkpoint + one tiny mp4."""
    import cv2

    from dualvgr_tpu import train_lib
    from dualvgr_tpu.config import cfg_from_file
    from dualvgr_tpu.data.synthetic import generate
    from dualvgr_tpu.data.vocab import load_vocab
    from dualvgr_tpu.models import DualVGR
    from dualvgr_tpu.utils.checkpoint import save_checkpoint

    out = str(tmp_path_factory.mktemp("predict_e2e"))
    paths = generate(
        out, dataset="svqa", num_videos=8, questions_per_video=1,
        num_clips=2, vision_dim=2048, frames=16, num_answers=10,
        vocab_size=30, max_q_len=8, word_dim=16, module_dim=32,
        batch_size=8, max_epochs=1,
    )
    cfg = cfg_from_file(paths["config"])
    vocab = load_vocab(os.path.join(out, "svqa_vocab.json"))

    model = DualVGR(
        vision_dim=2048, module_dim=32, word_dim=16,
        question_vocab_size=len(vocab["question_token_to_idx"]),
        num_answers=len(vocab["answer_token_to_idx"]),
        num_of_nodes=2, graph_layers=1, unit_layers=1,
    )
    example = (
        np.zeros((1, 2, 16, 2048), np.float32),
        np.zeros((1, 2, 2048), np.float32),
        np.ones((1, 5), np.int32),
        np.asarray([5], np.int32),
    )
    opt = train_lib.make_optimizer(1e-4, 1)
    state = train_lib.create_train_state(model, jax.random.PRNGKey(1), example, opt)
    ckpt_dir = os.path.join(cfg.dataset.save_dir, cfg.exp_name, "ckpt")
    kwargs = dict(
        vision_dim=2048, module_dim=32, word_dim=16, num_of_nodes=2,
        graph_module="GAT", graph_layers=1, unit_layers=1,
    )
    save_checkpoint(ckpt_dir, 0, state, kwargs)

    video = os.path.join(out, "clip.mp4")
    w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (32, 32))
    if not w.isOpened():
        pytest.skip("no mp4 encoder available")
    rng = np.random.RandomState(5)
    for _ in range(20):
        w.write(rng.randint(0, 255, (32, 32, 3), np.uint8))
    w.release()
    return {"config": paths["config"], "video": video, "n_answers": 10}


def test_predict_cli_end_to_end(predict_env, capsys):
    import predict

    logits = predict.main([
        "--cfg", predict_env["config"],
        "--video", predict_env["video"],
        "--question", "what color is the ball",
        "--appearance_size", "48",
        "--motion_size", "48",
        "--topk", "3",
    ])
    assert logits.shape == (1, predict_env["n_answers"])
    assert np.all(np.isfinite(logits))
    out = capsys.readouterr().out
    assert "Q: what color is the ball" in out
    assert "  1. " in out and "(p=" in out


def test_predict_one_video_many_questions(predict_env, capsys):
    """One --video broadcast across several questions; ranked output for
    each; probabilities sum to 1 per question (softmax sanity)."""
    import predict

    logits = predict.main([
        "--cfg", predict_env["config"],
        "--video", predict_env["video"],
        "--question", "what is it", "how many cubes",
        "--appearance_size", "48",
        "--motion_size", "48",
    ])
    assert logits.shape == (2, predict_env["n_answers"])
    # identical video + different questions: logits must differ
    assert not np.allclose(logits[0], logits[1])
    out = capsys.readouterr().out
    assert out.count("Q: ") == 2
