"""Native threaded row-gather (data/_gather.cpp via data/native.py)."""

import numpy as np
import pytest

from dualvgr_tpu.data import native


@pytest.fixture(scope="module")
def lib_available():
    if not native.available():
        pytest.skip("no C++ toolchain available to build _gather.so")


def test_gather_matches_numpy(rng, lib_available):
    src = rng.randn(37, 4, 6).astype(np.float32)
    rows = rng.randint(0, 37, (64,)).astype(np.int64)  # dups, any order
    got = native.gather_rows(src, rows)
    np.testing.assert_array_equal(got, src[rows])


def test_gather_multithreaded_and_dtypes(rng, lib_available):
    for dtype in (np.float32, np.float16, np.int32):
        src = (rng.randn(50, 33) * 10).astype(dtype)
        rows = rng.randint(0, 50, (101,)).astype(np.int64)
        got = native.gather_rows(src, rows, n_threads=4)
        np.testing.assert_array_equal(got, src[rows])


def test_gather_rejects_out_of_range(rng, lib_available):
    src = rng.randn(5, 3).astype(np.float32)
    with pytest.raises(IndexError):
        native.gather_rows(src, np.asarray([0, 5], np.int64))
    with pytest.raises(IndexError):
        native.gather_rows(src, np.asarray([-1], np.int64))


def test_feature_store_uses_native_path(rng, lib_available, tmp_path):
    import h5py

    from dualvgr_tpu.data.features import FeatureStore

    path = str(tmp_path / "feat.h5")
    feats = rng.randn(9, 2, 4).astype(np.float32)
    with h5py.File(path, "w") as f:
        f.create_dataset("resnet_features", data=feats)
        f.create_dataset("ids", data=np.arange(9))
    cached = FeatureStore(path, "resnet_features", cache_gb=1.0)
    rows = np.asarray([3, 0, 3, 8, 1], np.int64)
    np.testing.assert_array_equal(cached.gather(rows), feats[rows])
