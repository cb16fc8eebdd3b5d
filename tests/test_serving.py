"""Serving layer: request batcher semantics + the HTTP driver end-to-end.

The engine contract (dualvgr_tpu/serving.py): all concurrent callers funnel
into one fixed-shape predict call, padded to ``max_batch``; per-request
results match a direct call on that request's inputs; errors fan out to the
waiting callers without killing the worker. The HTTP test drives serve.py's
real ``build_engine`` (checkpoint + feature HDF5s + vocab) and server
against the synthetic dataset — beyond-reference surface (the reference has
no serving path).
"""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from dualvgr_tpu.serving import BatchingEngine

APP = (2, 3, 8)
MOT = (2, 8)


def _np_predict(app, mot, q, qlen):
    """Deterministic stand-in for the jitted forward: per-row checksums."""
    b = app.shape[0]
    ids = (
        app.reshape(b, -1).sum(1) + mot.reshape(b, -1).sum(1) + qlen
    ).astype(np.int64)
    scores = np.stack([q.sum(1), qlen], axis=1).astype(np.float32)
    return ids, scores


def _req(rng, L=5):
    app = rng.randn(*APP).astype(np.float32)
    mot = rng.randn(*MOT).astype(np.float32)
    q = rng.randint(1, 30, (L,)).astype(np.int32)
    return app, mot, q


def test_engine_matches_direct_and_batches(rng):
    with BatchingEngine(
        _np_predict, max_batch=8, max_wait_ms=60.0, max_q_len=6,
        feature_shapes=(APP, MOT),
    ) as eng:
        reqs = [_req(rng, L=3 + i % 4) for i in range(16)]
        results = [None] * 16

        def call(i):
            results[i] = eng.submit(*reqs[i])

        threads = [threading.Thread(target=call, args=(i,)) for i in range(16)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        for (app, mot, q), (got_id, got_scores) in zip(reqs, results):
            want_id, want_scores = _np_predict(
                app[None], mot[None],
                np.pad(q, (0, 6 - len(q)))[None], np.array([len(q)]),
            )
            assert int(got_id) == int(want_id[0])
            np.testing.assert_array_equal(got_scores, want_scores[0])

        s = eng.stats()
        assert s["requests"] == 16
        # 16 concurrent requests into batch-of-8 with a generous wait window
        # must coalesce: strictly fewer batches than requests
        assert s["batches"] < 16
        assert s["latency_ms_p50"] is not None


def test_engine_pads_partial_batch(rng):
    seen = {}

    def spy(app, mot, q, qlen):
        seen["shape"] = app.shape
        seen["qlen"] = qlen.copy()
        return _np_predict(app, mot, q, qlen)

    with BatchingEngine(
        spy, max_batch=4, max_wait_ms=1.0, max_q_len=6, feature_shapes=(APP, MOT)
    ) as eng:
        eng.submit(*_req(rng))
    assert seen["shape"][0] == 4  # padded to the compiled batch
    assert list(seen["qlen"][1:]) == [1, 1, 1]  # padding rows are valid length-1


def test_engine_error_fanout_and_recovery(rng):
    calls = {"n": 0}

    def flaky(app, mot, q, qlen):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("boom")
        return _np_predict(app, mot, q, qlen)

    with BatchingEngine(
        flaky, max_batch=4, max_wait_ms=1.0, max_q_len=6, feature_shapes=(APP, MOT)
    ) as eng:
        with pytest.raises(RuntimeError, match="boom"):
            eng.submit(*_req(rng))
        # the worker survives and serves the next request
        out = eng.submit(*_req(rng))
        assert out is not None


def test_replicated_engine_round_robin_and_stats(rng):
    from dualvgr_tpu.serving import ReplicatedEngine

    hits = [0, 0, 0]

    def make(i):
        def fn(app, mot, q, qlen):
            hits[i] += 1
            return _np_predict(app, mot, q, qlen)
        return fn

    with ReplicatedEngine(
        [make(i) for i in range(3)], max_batch=2, max_wait_ms=1.0,
        max_q_len=6, feature_shapes=(APP, MOT),
    ) as eng:
        assert eng.max_batch == 2
        reqs = [_req(rng, L=3) for _ in range(6)]
        outs = [eng.submit(*r) for r in reqs]
        for (app, mot, q), (got_id, got_scores) in zip(reqs, outs):
            want_id, want_scores = _np_predict(
                app[None], mot[None],
                np.pad(q, (0, 6 - len(q)))[None], np.array([len(q)]),
            )
            assert int(got_id) == int(want_id[0])
            np.testing.assert_array_equal(got_scores, want_scores[0])
        s = eng.stats()
    assert hits == [2, 2, 2]  # serial submits round-robin evenly
    assert s["replicas"] == 3 and s["requests"] == 6
    assert len(s["per_replica"]) == 3
    assert s["latency_ms_p50"] is not None


def test_per_device_replicas_match_single_device(rng):
    """Per-device pinned predict fns (one per virtual CPU device) agree with
    the unpinned jit and actually live on distinct devices."""
    import jax

    from dualvgr_tpu import train_lib
    from dualvgr_tpu.export import build_predict_fn, per_device_predict_fns
    from dualvgr_tpu.models import DualVGR
    from dualvgr_tpu.serving import ReplicatedEngine

    model = DualVGR(
        vision_dim=24, module_dim=16, word_dim=8, question_vocab_size=30,
        num_answers=10, num_of_nodes=4, graph_layers=1, unit_layers=1,
    )
    b, c, f, t = 2, 4, 3, 5
    app = rng.randn(b, c, f, 24).astype(np.float32)
    mot = rng.randn(b, c, 24).astype(np.float32)
    q = rng.randint(1, 30, (b, t)).astype(np.int32)
    qlen = np.array([t, t - 2], np.int32)
    q[1, qlen[1]:] = 0
    opt = train_lib.make_optimizer(1e-3, 10)
    state = train_lib.create_train_state(
        model, jax.random.PRNGKey(2), (app[:1], mot[:1], q[:1], qlen[:1]), opt
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    devices = jax.devices()[:4]
    fns = per_device_predict_fns(model, variables, 3, devices=devices)
    want_i, want_p = build_predict_fn(model, variables, 3)(app, mot, q, qlen)
    for dev, fn in zip(devices, fns):
        got_i, got_p = fn(app, mot, q, qlen)
        assert got_i.devices() == {dev}
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
        np.testing.assert_allclose(
            np.asarray(got_p), np.asarray(want_p), rtol=1e-6, atol=1e-6
        )

    # end-to-end through the replicated engine, concurrent callers
    with ReplicatedEngine(
        fns, max_batch=2, max_wait_ms=1.0, max_q_len=t,
        feature_shapes=((c, f, 24), (c, 24)),
    ) as eng:
        results = [None] * 8
        def call(i):
            results[i] = eng.submit(app[0], mot[0], q[0][: qlen[0]])
        threads = [threading.Thread(target=call, args=(i,)) for i in range(8)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        for got_i, got_p in results:
            np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i[0]))


def test_engine_input_validation(rng):
    with BatchingEngine(
        _np_predict, max_batch=2, max_wait_ms=1.0, max_q_len=4,
        feature_shapes=(APP, MOT),
    ) as eng:
        app, mot, q = _req(rng, L=3)
        with pytest.raises(ValueError, match="max_q_len"):
            eng.submit(app, mot, np.arange(9, dtype=np.int32))
        with pytest.raises(ValueError, match="appearance shape"):
            eng.submit(app[:1], mot, q)
        with pytest.raises(ValueError, match="empty question"):
            eng.submit(app, mot, np.zeros((0,), np.int32))
        eng.close()
        with pytest.raises(RuntimeError, match="closed"):
            eng.submit(app, mot, q)


@pytest.mark.slow
def test_http_server_end_to_end(synth_dir, tmp_path):
    """serve.py against the synthetic dataset: checkpoint -> engine -> HTTP."""
    import os
    import sys

    import jax

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import serve
    from dualvgr_tpu import train_lib
    from dualvgr_tpu.config import cfg_from_file
    from dualvgr_tpu.data.vocab import load_vocab
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

    engine, answer_fn, stores = serve.build_engine(
        cfg, unit_layers=1, max_batch=4, max_wait_ms=1.0, topk=3
    )
    # warm the compiled program (serve.main does the same before traffic)
    engine.submit(
        np.zeros((4, 3, 32), np.float32), np.zeros((4, 32), np.float32),
        np.array([1], np.int32), timeout=600.0,
    )
    srv = serve.make_server("127.0.0.1", 0, engine, answer_fn)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        def get(path):
            with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
                return r.status, json.loads(r.read())

        def post(path, obj, expect_err=False):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=json.dumps(obj).encode(),
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            try:
                with urllib.request.urlopen(req) as r:
                    return r.status, json.loads(r.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        assert get("/healthz") == (200, {"ok": True})

        answers = set(vocab["answer_token_to_idx"])
        video_id = next(iter(stores[0].id_to_index))
        code, out = post("/answer", {"video_id": video_id, "question": "what is moving?"})
        assert code == 200, out
        assert out["answer"] in answers
        assert len(out["topk"]) == 3
        assert abs(sum(t_["score"] for t_ in out["topk"])) <= 1.001
        # top-1 of topk agrees with the headline answer
        assert out["topk"][0]["answer"] == out["answer"]

        code, out = post("/answer", {"video_id": "999999", "question": "what?"})
        assert code == 404
        code, out = post("/answer", {"question": "no video"})
        assert code == 400
        code, stats = get("/stats")
        assert code == 200 and stats["requests"] >= 1
    finally:
        srv.shutdown()
        engine.close()
