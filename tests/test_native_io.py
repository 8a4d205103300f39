"""Native decoder tests: exact equivalence with the PIL path and dataset
integration. Skipped wholesale if no C++ toolchain is available."""

import numpy as np
import pytest

from perseus_tpu.data import schema
from perseus_tpu.data.dataset import KeypointDatasetConfig, PrunedKeypointDataset
from perseus_tpu.data.synthetic import generate_synthetic_pruned_dataset
from perseus_tpu.native import io as nio

pytestmark = pytest.mark.skipif(not nio.available(), reason="no native toolchain")

RNG = np.random.default_rng(3)


@pytest.fixture(scope="module")
def fixture_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("nio")
    h = w = 48
    rgb = RNG.uniform(0, 1, (h, w, 3)).astype(np.float32)
    depth = RNG.uniform(0.05, 12.0, (h, w)).astype(np.float32)
    seg = RNG.integers(0, 6, (h, w)).astype(np.uint8)
    schema.save_rgb_png(str(d / "x.png"), rgb)
    schema.save_depth_tiff(str(d / "x.tiff"), depth)
    schema.save_segmentation_png(str(d / "x_seg.png"), seg)
    return d, h, w, rgb, depth, seg


def test_decode_example_matches_pil(fixture_files):
    d, h, w, rgb, depth, seg = fixture_files
    r, dd, ss = nio.decode_example(str(d / "x.png"), str(d / "x.tiff"), str(d / "x_seg.png"), 2, h, w)
    np.testing.assert_allclose(r, schema.load_rgb_png(str(d / "x.png")), atol=1e-7)
    np.testing.assert_array_equal(dd, depth)  # float TIFF is bit-exact
    np.testing.assert_array_equal(ss, (seg == 3).astype(np.float32))


def test_decode_batch_parallel(fixture_files):
    d, h, w, rgb, depth, seg = fixture_files
    n = 16
    rb, db, sb, fails = nio.decode_batch(
        [str(d / "x.png")] * n, [str(d / "x.tiff")] * n, [str(d / "x_seg.png")] * n,
        np.full(n, 2), h, w, threads=4,
    )
    assert fails == 0
    for i in (0, n - 1):
        np.testing.assert_array_equal(db[i], depth)
        np.testing.assert_array_equal(sb[i], (seg == 3).astype(np.float32))


def test_decode_batch_reports_failures(fixture_files):
    d, h, w, *_ = fixture_files
    rb, _, _, fails = nio.decode_batch(
        [str(d / "x.png"), str(d / "missing.png")], None, None, None, h, w
    )
    assert fails == 1
    assert rb[0].any() and not rb[1].any()  # failed item zero-filled


def test_dataset_native_matches_pil(tmp_path):
    generate_synthetic_pruned_dataset(str(tmp_path), n_train=6, n_test=2, h=32, w=32)
    path = str(tmp_path / "data" / "synth" / "pruned.hdf5")
    ds_native = PrunedKeypointDataset(
        KeypointDatasetConfig(dataset_path=path, native_decode=True), train=True
    )
    ds_pil = PrunedKeypointDataset(
        KeypointDatasetConfig(dataset_path=path, native_decode=False), train=True
    )
    assert ds_native._native
    idx = np.arange(len(ds_native))
    b_native = ds_native.batch(idx)
    b_pil = ds_pil.batch(idx)
    for k in b_pil:
        np.testing.assert_allclose(b_native[k], b_pil[k], atol=1e-7, err_msg=k)


def test_dataset_cache_uses_native(tmp_path):
    generate_synthetic_pruned_dataset(str(tmp_path), n_train=4, n_test=2, h=32, w=32)
    path = str(tmp_path / "data" / "synth" / "pruned.hdf5")
    ds = PrunedKeypointDataset(
        KeypointDatasetConfig(dataset_path=path, native_decode=True), train=True, cache=True
    )
    item = ds[0]
    assert item["image"].shape == (32, 32, 3)
    assert np.isfinite(item["depth_image"]).all()
