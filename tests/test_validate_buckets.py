"""MSVD/MSRVTT first-word bucketing and the end-to-end msvd-qa dataset path
(the loader's no-category branch + the 5-way validator)."""

import numpy as np

import jax

from dualvgr_tpu.config import Config, cfg_from_file, default_config
from dualvgr_tpu.data import VideoQADataLoader
from dualvgr_tpu.data.synthetic import generate
from dualvgr_tpu.models import DualVGR
from dualvgr_tpu import train_lib, validate_lib


def test_msvd_dataset_end_to_end(tmp_path, rng):
    out = str(tmp_path)
    generate(
        out, dataset="msvd-qa", num_videos=20, questions_per_video=5,
        num_clips=3, vision_dim=16, frames=2, num_answers=10, vocab_size=30,
        max_q_len=7, word_dim=8, module_dim=16, batch_size=8,
    )
    loader = VideoQADataLoader(
        question_pt=f"{out}/msvd-qa_train_questions.pt",
        vocab_json=f"{out}/msvd-qa_vocab.json",
        appearance_feat=f"{out}/msvd-qa_appearance_feat.h5",
        motion_feat=f"{out}/msvd-qa_motion_feat.h5",
        batch_size=8,
        shuffle=False,
    )
    batch = next(iter(loader))
    assert batch.question_category is None  # msvd pickles carry no categories

    cfg = default_config()
    cfg.dataset.name = "msvd-qa"

    model = DualVGR(
        vision_dim=16, module_dim=16, word_dim=8,
        question_vocab_size=len(loader.vocab["question_token_to_idx"]),
        num_answers=len(loader.vocab["answer_token_to_idx"]),
        num_of_nodes=3, graph_layers=1, unit_layers=1,
    )
    opt = train_lib.make_optimizer(1e-3, 5)
    state = train_lib.create_train_state(
        model, jax.random.PRNGKey(0),
        (batch.appearance_feat[:1], batch.motion_feat[:1],
         batch.question[:1], batch.question_len[:1]), opt,
    )
    eval_fn = train_lib.jit_pred_step(model)
    acc, what, who, how, when, where = validate_lib.validate(
        cfg, eval_fn, state, loader, write_preds=False
    )
    # every synthetic question starts with one of the five bucket words, so
    # the weighted bucket mean must reproduce the overall accuracy
    n = loader.num_samples
    per_bucket = n / 5  # generator round-robins the five first-words
    recon = (what + who + how + when + where) * per_bucket / n
    np.testing.assert_allclose(recon, acc, atol=1e-6)


def test_msvd_bucket_assignment(rng):
    """Bucketing keys on the FIRST question token through the vocab
    (reference validate.py:68-80)."""
    cfg = default_config()
    cfg.dataset.name = "msvd-qa"

    class FakeLoader:
        vocab = {
            "question_idx_to_token": {2: "what", 3: "who", 4: "how", 5: "when", 6: "where"},
            "answer_idx_to_token": {0: "a", 1: "b"},
        }

        def __iter__(self):
            from dualvgr_tpu.data.loader import Batch

            q = np.asarray([[2, 9], [3, 9], [2, 9], [4, 9]], np.int32)
            yield Batch(
                video_idx=np.arange(4),
                question_idx=np.arange(4),
                question_category=None,
                answer=np.asarray([0, 0, 1, 1], np.int32),
                appearance_feat=np.zeros((4, 1, 1, 2), np.float32),
                motion_feat=np.zeros((4, 1, 2), np.float32),
                question=q,
                question_len=np.full((4,), 2, np.int32),
                valid=np.ones((4,), np.float32),
            )

    # predictions: right for rows 0,1; wrong for rows 2,3
    def eval_fn(state, inputs):
        return np.asarray([0, 0, 0, 0], np.int64)

    acc, what, who, how, when, where = validate_lib.validate(
        cfg, eval_fn, None, FakeLoader(), write_preds=False
    )
    assert acc == 0.5
    assert what == 0.5  # rows 0 (right) and 2 (wrong)
    assert who == 1.0  # row 1 right
    assert how == 0.0  # row 3 wrong
    assert when == 0.0 and where == 0.0  # empty buckets -> 0.0
