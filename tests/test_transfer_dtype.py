"""bfloat16 transfer path (cfg.tpu.transfer_dtype): native threaded cast,
FeatureStore store_dtype, loader batch dtype, and model upcast-on-entry.

The point of the path: the flagship fp32 appearance batch is 537 MB/step —
host-side bf16 halves RAM cache and host->device bytes while the model
upcasts on device (fused into its first elementwise pass), so only the
inputs are quantized; every on-device numerics path is unchanged.
"""

import numpy as np
import ml_dtypes
import pytest

from dualvgr_tpu.data import VideoQADataLoader
from dualvgr_tpu.data import native
from dualvgr_tpu.data.features import FeatureStore, _cast_bf16

BF16 = np.dtype(ml_dtypes.bfloat16)


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


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_cast_bit_exact_vs_mldtypes(rng):
    x = rng.randn(65537).astype(np.float32)
    with np.errstate(over="ignore"):  # scaling to 1e38 overflows by design
        x *= rng.choice([1e-38, 1e-3, 1.0, 1e38], size=x.shape).astype(np.float32)
    x[:6] = [np.inf, -np.inf, np.nan, 0.0, -0.0, 3.3895314e38]  # last rounds up
    got = native.cast_f32_to_bf16(x)
    want = x.astype(BF16)
    gb, wb = got.view(np.uint16), want.view(np.uint16)
    mism = np.nonzero(gb != wb)[0]
    # NaN payloads may legally differ; everything else must be bit-equal
    for i in mism:
        assert np.isnan(float(got[i])) and np.isnan(float(want[i]))


def test_cast_helper_matches_numpy_astype(rng):
    x = rng.randn(3, 5, 7).astype(np.float32)
    got = _cast_bf16(x)
    np.testing.assert_array_equal(got.view(np.uint16), x.astype(BF16).view(np.uint16))
    out = np.empty_like(got)
    got2 = _cast_bf16(x, out=out)
    assert got2 is out
    np.testing.assert_array_equal(out.view(np.uint16), got.view(np.uint16))


def test_store_bf16_gather_matches_fp32_cast(synth_dir):
    path = f"{synth_dir['dir']}/svqa_appearance_feat.h5"
    f32 = FeatureStore(path, "resnet_features")
    bf = FeatureStore(path, "resnet_features", store_dtype="bfloat16")
    assert bf.cached and bf.out_dtype == BF16
    assert bf.dtype == np.float32  # on-disk dtype is still the contract
    rows = np.array([3, 0, 3, 7], np.int64)
    got = bf.gather(rows)
    assert got.dtype == BF16
    want = f32.gather(rows).astype(BF16)
    np.testing.assert_array_equal(got.view(np.uint16), want.view(np.uint16))
    f32.close(), bf.close()


def test_store_bf16_file_backed_gather(synth_dir):
    """cache_gb below the bf16 size: gathers read fp32 from HDF5 and cast
    per batch."""
    path = f"{synth_dir['dir']}/svqa_appearance_feat.h5"
    bf = FeatureStore(path, "resnet_features", cache_gb=0.0, store_dtype="bfloat16")
    f32 = FeatureStore(path, "resnet_features")
    assert not bf.cached
    rows = np.array([5, 5, 1], np.int64)
    got = bf.gather(rows)
    assert got.dtype == BF16
    np.testing.assert_array_equal(
        got.view(np.uint16), f32.gather(rows).astype(BF16).view(np.uint16)
    )
    f32.close(), bf.close()


def test_store_bf16_halves_the_cache_fit_threshold(synth_dir):
    """The cache-fit decision uses STORED bytes: a file too big to cache in
    fp32 still caches in bf16 at the same budget."""
    path = f"{synth_dir['dir']}/svqa_appearance_feat.h5"
    f32_bytes = 24 * 4 * 3 * 32 * 4  # fixture shape x itemsize
    budget_gb = (f32_bytes * 0.75) / 1e9  # between bf16 and fp32 size
    assert not FeatureStore(path, "resnet_features", cache_gb=budget_gb).cached
    assert FeatureStore(
        path, "resnet_features", cache_gb=budget_gb, store_dtype="bfloat16"
    ).cached


def test_store_rejects_unknown_dtype(synth_dir):
    path = f"{synth_dir['dir']}/svqa_appearance_feat.h5"
    with pytest.raises(ValueError, match="store_dtype"):
        FeatureStore(path, "resnet_features", store_dtype="float16")


def test_loader_transfer_dtype_batches(synth_dir):
    lb = _loader(synth_dir, transfer_dtype="bfloat16")
    lf = _loader(synth_dir)
    try:
        b16 = next(iter(lb))
        b32 = next(iter(lf))
        assert b16.appearance_feat.dtype == BF16
        assert b16.motion_feat.dtype == BF16
        assert b32.appearance_feat.dtype == np.float32
        np.testing.assert_array_equal(
            b16.appearance_feat.view(np.uint16),
            b32.appearance_feat.astype(BF16).view(np.uint16),
        )
        # non-feature fields are untouched
        assert b16.question.dtype == np.int32 and b16.valid.dtype == np.float32
        # example_batch (shape-driven init) matches the transfer dtype
        ex = lb.example_batch()
        assert ex[0].dtype == BF16 and ex[1].dtype == BF16
    finally:
        lb.close(), lf.close()


def test_model_upcasts_bf16_inputs(rng):
    """Same params, bf16-quantized visual inputs: logits stay close to the
    fp32-input logits (the only difference is the 8-bit-mantissa input
    rounding — everything on device runs the identical fp32 path)."""
    import jax
    from tests.test_train import tiny_batch, tiny_model

    model = tiny_model()
    app, mot, q, qlen, _ = tiny_batch(rng, b=8)
    params = model.init(jax.random.PRNGKey(0), app, mot, q, qlen)
    out32 = model.apply(params, app, mot, q, qlen)
    out16 = model.apply(params, app.astype(BF16), mot.astype(BF16), q, qlen)
    assert out16.logits.dtype == np.float32
    np.testing.assert_allclose(
        np.asarray(out16.logits), np.asarray(out32.logits), atol=5e-2
    )


@pytest.mark.slow
def test_train_end_to_end_with_bf16_transfer(synth_dir, tmp_path):
    """The real train() driver on the fixture with tpu.transfer_dtype:
    bfloat16 — loader, prefetch_to_device, jit train step and validation all
    consume bf16 feature batches."""
    import train as train_cli
    from dualvgr_tpu.config import cfg_from_file, resolve_dataset_paths

    cfg = cfg_from_file(synth_dir["config"])
    cfg.dataset.save_dir = str(tmp_path)
    cfg.alpha, cfg.beta, cfg.unit_layers = 1.0, 1e-8, 1
    cfg.train.max_epochs = 1
    cfg.tpu.transfer_dtype = "bfloat16"
    cfg = resolve_dataset_paths(cfg)
    best, _state = train_cli.train(cfg)
    assert 0.0 <= float(best) <= 1.0


def test_config_accepts_transfer_dtype(tmp_path):
    from dualvgr_tpu.config import cfg_from_file, default_config

    assert default_config().tpu.transfer_dtype == "float32"
    y = tmp_path / "t.yml"
    y.write_text("tpu:\n  transfer_dtype: bfloat16\n")
    cfg = cfg_from_file(str(y))
    assert cfg.tpu.transfer_dtype == "bfloat16"
