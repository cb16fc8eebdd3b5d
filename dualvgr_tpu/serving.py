"""Request-batching inference engine for production serving.

The measured serving curve (benchmarks/serving_latency.py) is FLAT from
batch 8 up (~32k QA/s at 0.25 ms/batch on one v5e): a batcher needs only a
handful of concurrent requests to saturate the chip, and padding a partial
batch to a fixed size costs nothing that a second compiled program wouldn't.
So the engine runs ONE fixed-shape compiled program (batch = ``max_batch``)
and pads partial batches — no shape buckets, no recompiles, predictable
tail latency.

Beyond the reference: NJUPT-MCC/DualVGR-VideoQA ships only offline drivers
(train.py/validate.py); serving is new surface. The model-facing contract
matches validate.py's eval step (reference validate.py:28-76): appearance
(16, 16, D) + motion (16, D) features, padded token ids, true length.

Design (host side only — the device work is one jitted call):

* callers block in :meth:`BatchingEngine.submit`; a single worker thread
  drains the queue, waits at most ``max_wait_ms`` past the FIRST queued
  request to fill up to ``max_batch``, pads, runs ``predict_fn`` once, and
  fans results back out. Under light load a request pays at most
  ``max_wait_ms`` + one step; under heavy load batches fill instantly and
  the wait never triggers (the queue drain is the batching signal).
* ``predict_fn(app, motion, questions, qlens) -> (ids, scores)`` with the
  leading dim == ``max_batch`` — typically a ``jax.jit`` closure doing
  forward + ``lax.top_k`` so only (B, k) scalars ever cross the PCIe/tunnel.
* stats are plain counters under the queue lock: request/batch counts, mean
  occupancy, latency quantiles over a bounded reservoir.
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field

import numpy as np

__all__ = ["BatchingEngine", "ReplicatedEngine", "Request", "EngineStats"]


@dataclass
class Request:
    """One QA pair, host-side. ``question`` is int32 token ids (any length
    <= the engine's ``max_q_len``; longer is an error, shorter is padded)."""

    appearance: np.ndarray  # (num_clips, frames_per_clip, D)
    motion: np.ndarray  # (num_clips, D)
    question: np.ndarray  # (L,) int32 vocab ids
    _done: threading.Event = field(default_factory=threading.Event, repr=False)
    _result: tuple | None = field(default=None, repr=False)
    _error: BaseException | None = field(default=None, repr=False)
    _t_submit: float = 0.0


@dataclass
class EngineStats:
    requests: int = 0
    batches: int = 0
    occupancy_sum: int = 0
    latencies_ms: list = field(default_factory=list)

    def snapshot(self) -> dict:
        lat = sorted(self.latencies_ms)
        q = lambda p: lat[min(int(p * len(lat)), len(lat) - 1)] if lat else None
        return {
            "requests": self.requests,
            "batches": self.batches,
            "mean_batch": (self.occupancy_sum / self.batches) if self.batches else None,
            "latency_ms_p50": q(0.50),
            "latency_ms_p99": q(0.99),
        }


class BatchingEngine:
    """Single-program request batcher around a fixed-shape predict fn.

    ``predict_fn(app, motion, q, qlen)`` sees arrays with leading dim
    ``max_batch`` and returns a pytree of arrays with the same leading dim
    (e.g. top-k ids + scores); rows past the real occupancy are padding and
    their outputs are discarded.
    """

    def __init__(
        self,
        predict_fn,
        *,
        max_batch: int = 32,
        max_wait_ms: float = 2.0,
        max_q_len: int = 32,
        feature_shapes: tuple | None = None,
        name: str = "dualvgr-serve",
    ):
        if max_batch < 1:
            raise ValueError(f"max_batch must be >= 1, got {max_batch}")
        self._predict_fn = predict_fn
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1e3
        self.max_q_len = int(max_q_len)
        self._feature_shapes = feature_shapes  # ((app...), (mot...)) or None
        self._queue: queue.Queue = queue.Queue()
        self._stats = EngineStats()
        self._lock = threading.Lock()
        self._closed = threading.Event()
        self._worker = threading.Thread(
            target=self._run, name=f"{name}-worker", daemon=True
        )
        self._worker.start()

    # ---------------------------------------------------------------- submit
    def submit(
        self,
        appearance: np.ndarray,
        motion: np.ndarray,
        question: np.ndarray,
        timeout: float | None = 30.0,
    ):
        """Block until the answer for this request is available; returns the
        per-request slice of ``predict_fn``'s output pytree."""
        if self._closed.is_set():
            raise RuntimeError("engine is closed")
        question = np.asarray(question, np.int32).reshape(-1)
        if question.shape[0] > self.max_q_len:
            raise ValueError(
                f"question length {question.shape[0]} > max_q_len {self.max_q_len}"
            )
        if question.shape[0] == 0:
            raise ValueError("empty question")
        req = Request(
            appearance=np.asarray(appearance, np.float32),
            motion=np.asarray(motion, np.float32),
            question=question,
        )
        if self._feature_shapes is not None:
            want_app, want_mot = self._feature_shapes
            if req.appearance.shape != tuple(want_app):
                raise ValueError(
                    f"appearance shape {req.appearance.shape} != {tuple(want_app)}"
                )
            if req.motion.shape != tuple(want_mot):
                raise ValueError(f"motion shape {req.motion.shape} != {tuple(want_mot)}")
        req._t_submit = time.perf_counter()
        self._queue.put(req)
        if not req._done.wait(timeout):
            raise TimeoutError("inference timed out")
        if req._error is not None:
            raise req._error
        return req._result

    # ---------------------------------------------------------------- worker
    def _collect(self) -> list:
        """One batch: block for the first request, then fill until
        ``max_batch`` or ``max_wait_ms`` past the first arrival."""
        while True:
            try:
                first = self._queue.get(timeout=0.1)
                break
            except queue.Empty:
                if self._closed.is_set():
                    return []
        if first is None:  # close() sentinel
            return []
        batch = [first]
        deadline = time.perf_counter() + self.max_wait_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                nxt = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                self._queue.put(None)  # keep the sentinel for the next loop
                break
            batch.append(nxt)
        return batch

    def _run(self):
        while not self._closed.is_set():
            batch = self._collect()
            if not batch:
                if self._closed.is_set():
                    break
                continue
            try:
                out = self._step(batch)
                for i, req in enumerate(batch):
                    req._result = _tree_row(out, i)
                    req._done.set()
            except BaseException as e:  # noqa: BLE001 — fan the error out
                for req in batch:
                    req._error = e
                    req._done.set()
            now = time.perf_counter()
            with self._lock:
                self._stats.requests += len(batch)
                self._stats.batches += 1
                self._stats.occupancy_sum += len(batch)
                for req in batch:
                    if len(self._stats.latencies_ms) < 100_000:
                        self._stats.latencies_ms.append(
                            (now - req._t_submit) * 1e3
                        )

    def _step(self, batch: list):
        n = len(batch)
        b = self.max_batch
        app = np.zeros((b,) + batch[0].appearance.shape, np.float32)
        mot = np.zeros((b,) + batch[0].motion.shape, np.float32)
        q = np.zeros((b, self.max_q_len), np.int32)
        qlen = np.ones((b,), np.int32)  # padding rows: length 1 over token 0
        for i, req in enumerate(batch):
            app[i] = req.appearance
            mot[i] = req.motion
            q[i, : req.question.shape[0]] = req.question
            qlen[i] = req.question.shape[0]
        out = self._predict_fn(app, mot, q, qlen)
        return _tree_np(out, n)

    # ---------------------------------------------------------------- admin
    def stats(self) -> dict:
        with self._lock:
            return self._stats.snapshot()

    def close(self, timeout: float = 10.0):
        if self._closed.is_set():
            return
        self._closed.set()
        self._queue.put(None)
        self._worker.join(timeout)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class ReplicatedEngine:
    """One :class:`BatchingEngine` per device replica, round-robin dispatch.

    The measured single-chip curve is FLAT from batch 8 (the model saturates
    one chip at tiny batches), so multi-chip serving scales by REPLICATION,
    not by sharding one batch across chips: each device gets its own copy of
    the program + weights and its own batcher; requests round-robin. On a
    v5e-8 VM this is ~8x the single-chip throughput with the single-chip
    latency (no cross-chip collectives on the serving path at all).

    ``predict_fns`` is one fixed-shape predict per replica (use
    :func:`dualvgr_tpu.export.per_device_predict_fns`, or build them from a
    loaded artifact). The submit/stats/close surface matches
    :class:`BatchingEngine` so serve.py treats both uniformly.
    """

    def __init__(self, predict_fns, **engine_kwargs):
        if not predict_fns:
            raise ValueError("need at least one predict_fn")
        name = engine_kwargs.pop("name", "dualvgr-serve")
        self._engines = [
            BatchingEngine(fn, name=f"{name}-r{i}", **engine_kwargs)
            for i, fn in enumerate(predict_fns)
        ]
        self._next = 0
        self._lock = threading.Lock()

    # mirrored engine attributes serve.py's warmup/handler reads
    @property
    def max_batch(self):
        return self._engines[0].max_batch

    @property
    def _feature_shapes(self):
        return self._engines[0]._feature_shapes

    def submit(self, appearance, motion, question, timeout=30.0):
        with self._lock:
            i = self._next
            self._next = (i + 1) % len(self._engines)
        return self._engines[i].submit(appearance, motion, question, timeout)

    def stats(self) -> dict:
        per = [e.stats() for e in self._engines]
        lat = sorted(
            x for e in self._engines for x in e._stats.latencies_ms
        )
        q = lambda p: lat[min(int(p * len(lat)), len(lat) - 1)] if lat else None
        total_b = sum(s["batches"] for s in per)
        return {
            "replicas": len(per),
            "requests": sum(s["requests"] for s in per),
            "batches": total_b,
            "mean_batch": (
                sum(s["requests"] for s in per) / total_b if total_b else None
            ),
            "latency_ms_p50": q(0.50),
            "latency_ms_p99": q(0.99),
            "per_replica": per,
        }

    def close(self, timeout: float = 10.0):
        for e in self._engines:
            e.close(timeout)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _tree_np(out, n: int):
    """Fetch device output to numpy, sliced to the real occupancy."""
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x)[:n], out)


def _tree_row(out, i: int):
    import jax

    return jax.tree_util.tree_map(lambda x: x[i], out)
