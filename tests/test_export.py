"""AOT serving export (dualvgr_tpu/export.py): the StableHLO artifact must
reproduce the live model's predictions bit-for-bit on the export platform,
roundtrip through the single-file format, and plug into serve.py's engine.

Beyond-reference surface: the reference has no deployment/export story at
all (offline train/validate only, /root/reference/train.py, validate.py).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dualvgr_tpu.export import (
    build_predict_fn,
    export_serving,
    load_artifact,
    save_artifact,
)

KW = dict(
    vision_dim=24, module_dim=16, word_dim=8, question_vocab_size=30,
    num_answers=10, num_of_nodes=4, graph_layers=1, unit_layers=1,
)
B, C, F, T, K = 4, 4, 3, 5, 3


def _model_and_batch():
    import jax

    from dualvgr_tpu import train_lib
    from dualvgr_tpu.models import DualVGR

    model = DualVGR(**KW)
    rng = np.random.RandomState(3)
    app = rng.randn(B, C, F, 24).astype(np.float32)
    mot = rng.randn(B, C, 24).astype(np.float32)
    q = rng.randint(1, 30, (B, T)).astype(np.int32)
    qlen = rng.randint(1, T + 1, (B,)).astype(np.int32)
    for i in range(B):
        q[i, qlen[i]:] = 0
    opt = train_lib.make_optimizer(1e-3, 10)
    state = train_lib.create_train_state(
        model, jax.random.PRNGKey(5), (app[:1], mot[:1], q[:1], qlen[:1]), opt
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    return model, variables, (app, mot, q, qlen)


def test_export_roundtrip_matches_live_model(tmp_path):
    model, variables, batch = _model_and_batch()
    payload, meta = export_serving(
        model, variables, max_batch=B, app_shape=(C, F, 24), mot_shape=(C, 24),
        max_q_len=T, top_k=K,
    )
    assert meta["max_batch"] == B and meta["top_k"] == K
    assert meta["app_shape"] == [C, F, 24]

    path = str(tmp_path / "tiny.dvgr")
    save_artifact(path, payload, meta)
    loaded_fn, loaded_meta = load_artifact(path)
    assert loaded_meta == meta

    live_i, live_p = build_predict_fn(model, variables, K)(*batch)
    got_i, got_p = loaded_fn(*batch)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(live_i))
    np.testing.assert_allclose(
        np.asarray(got_p), np.asarray(live_p), rtol=1e-6, atol=1e-7
    )
    # scores are a softmax top-k: descending, in (0, 1]
    p = np.asarray(got_p)
    assert (np.diff(p, axis=1) <= 1e-7).all() and (p > 0).all() and (p <= 1).all()


def test_load_rejects_non_artifact(tmp_path):
    path = str(tmp_path / "junk.dvgr")
    with open(path, "wb") as f:
        f.write(b"definitely not an export artifact")
    with pytest.raises(ValueError, match="not a dualvgr export artifact"):
        load_artifact(path)


@pytest.mark.slow
def test_export_cli_and_serve_from_artifact(synth_dir):
    """python -m dualvgr_tpu.export on the synthetic dataset's checkpoint,
    then serve.py's artifact path answers a real request through the
    BatchingEngine."""
    import jax

    import serve
    from dualvgr_tpu import train_lib
    from dualvgr_tpu.config import cfg_from_file
    from dualvgr_tpu.data.vocab import load_vocab
    from dualvgr_tpu.export import _main as export_main
    from dualvgr_tpu.models import DualVGR
    from dualvgr_tpu.utils.checkpoint import save_checkpoint

    cfg = cfg_from_file(synth_dir["config"])
    cfg.dataset.save_dir = os.path.join(cfg.dataset.save_dir, cfg.exp_name)
    ckpt_dir = os.path.join(cfg.dataset.save_dir, "ckpt")

    vocab = load_vocab(synth_dir["vocab"])
    kw = dict(
        vision_dim=32, module_dim=32, word_dim=16, num_of_nodes=4,
        graph_layers=1, graph_module="GAT",
    )
    model = DualVGR(
        question_vocab_size=len(vocab["question_token_to_idx"]),
        num_answers=len(vocab["answer_token_to_idx"]),
        unit_layers=1,
        **kw,
    )
    example = (
        np.zeros((1, 4, 3, 32), np.float32),
        np.zeros((1, 4, 32), np.float32),
        np.zeros((1, 32), np.int32),
        np.ones((1,), np.int32),
    )
    opt = train_lib.make_optimizer(cfg.train.lr, 1)
    state = train_lib.create_train_state(model, jax.random.PRNGKey(0), example, opt)
    save_checkpoint(ckpt_dir, 0, state, kw)

    artifact = os.path.join(cfg.dataset.save_dir, "synth.dvgr")
    export_main([
        "--cfg", synth_dir["config"], "--out", artifact,
        "--max-batch", "4", "--topk", "3",
    ])
    assert os.path.exists(artifact)

    engine, answer_fn, stores = serve.build_engine_from_artifact(
        cfg, artifact, max_wait_ms=1.0
    )
    try:
        assert engine.max_batch == 4
        video_id = next(iter(stores[0].id_to_index))
        out = answer_fn(video_id, "what is moving?")
        answers = set(vocab["answer_token_to_idx"])
        assert out["answer"] in answers
        assert len(out["topk"]) == 3
        assert out["topk"][0]["answer"] == out["answer"]
    finally:
        engine.close()
        stores[0].close()
        stores[1].close()

    # the same artifact drives multi-device serving: 2 per-device replicas
    engine, answer_fn, stores = serve.build_engine_from_artifact(
        cfg, artifact, max_wait_ms=1.0, replicas=2
    )
    try:
        out2 = answer_fn(video_id, "what is moving?")
        assert out2["answer"] == out["answer"]
        assert engine.stats()["replicas"] == 2
    finally:
        engine.close()
        stores[0].close()
        stores[1].close()
