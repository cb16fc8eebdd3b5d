"""HDF5 clip-feature store with optional RAM caching and batched gathers.

Artifact contract (reference preprocess/preprocess_features.py:158-198,
DataLoader.py:71-74, 140-147):

* ``{ds}_appearance_feat.h5``: dataset ``resnet_features`` float32
  (N_videos, num_clips, 16, 2048) + ``ids`` int.
* ``{ds}_motion_feat.h5``: dataset ``resnext_features`` float32
  (N_videos, num_clips, 2048) + ``ids``.

TPU-first changes vs the reference: the reference re-opens both HDF5 files
inside every worker ``__getitem__`` (DataLoader.py:71-74); here each file is
opened once, whole batches are gathered with one sorted fancy-index read
(h5py requires increasing indices), and files that fit the configured RAM
budget are loaded once into a numpy array so epoch reads are memcpy-speed.
"""

from __future__ import annotations

import threading

import h5py
import numpy as np


class FeatureStore:
    """One HDF5 feature file: id -> row lookups + batched row gathers."""

    def __init__(
        self,
        path: str,
        dataset_name: str,
        cache_gb: float = 8.0,
        n_threads: int | None = None,
    ):
        self.path = path
        self.dataset_name = dataset_name
        # gather parallelism for the native threaded row copy; None = auto
        # (min(cpus, 8)). The loader maps the reference's ``num_workers``
        # here (reference DataLoader.py:165 forked torch workers).
        self.n_threads = n_threads
        self._lock = threading.Lock()
        with h5py.File(path, "r") as f:
            ids = f["ids"][()]
            dset = f[dataset_name]
            self.shape = dset.shape
            self.dtype = dset.dtype
            nbytes = dset.dtype.itemsize * int(np.prod(dset.shape))
            self._cache = dset[()] if nbytes <= cache_gb * 1e9 else None
        # {str(video_id): h5 row} exactly like the reference (DataLoader.py:141-147)
        self.id_to_index = {str(i): idx for idx, i in enumerate(ids)}
        self._file = None if self._cache is not None else h5py.File(path, "r")

    @property
    def cached(self) -> bool:
        return self._cache is not None

    def rows_for_video_ids(self, video_ids) -> np.ndarray:
        return np.asarray(
            [self.id_to_index[str(int(v))] for v in video_ids], dtype=np.int64
        )

    def gather(self, rows: np.ndarray) -> np.ndarray:
        """Gather feature rows (duplicates allowed, any order).

        RAM-cached stores route through the native threaded gather
        (data/_gather.cpp) when it is available — batch assembly for the
        flagship appearance features copies 0.5 GB/step, which numpy fancy
        indexing runs on one core; numpy remains the fallback."""
        if self._cache is not None:
            from dualvgr_tpu.data import native

            out = native.gather_rows(self._cache, rows, n_threads=self.n_threads)
            return out if out is not None else self._cache[rows]
        uniq, inverse = np.unique(rows, return_inverse=True)
        with self._lock:
            block = self._file[self.dataset_name][uniq]  # sorted unique read
        return block[inverse]

    def close(self):
        if self._file is not None:
            self._file.close()
            self._file = None
