"""Dataset pipeline round-trip tests on tiny synthetic fixtures:
schema IO, lazy loading + seg binarization, the prefetching loader's
deterministic epoch permutations and sharding, and merge -> prune."""

import os

import numpy as np
import pytest

from perseus_tpu.data import schema
from perseus_tpu.data.dataset import KeypointDatasetConfig, PrefetchingLoader, PrunedKeypointDataset
from perseus_tpu.data.synthetic import generate_synthetic_pruned_dataset


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_root")
    path = generate_synthetic_pruned_dataset(str(root), n_train=12, n_test=6, h=24, w=24)
    return str(root), path


def test_tiff_roundtrip(tmp_path):
    depth = np.random.default_rng(0).uniform(0, 20, size=(16, 16)).astype(np.float32)
    path = str(tmp_path / "d.tiff")
    schema.save_depth_tiff(path, depth)
    loaded = schema.load_depth_tiff(path)
    np.testing.assert_array_equal(loaded, depth)


def test_pruned_hdf5_roundtrip(synth_dataset):
    _, path = synth_dataset
    split, attrs = schema.read_pruned_split(path, train=True)
    assert len(split) == 12
    assert attrs["H"] == 24 and attrs["num_keypoints"] == 8
    assert split.pixel_coordinates.shape == (12, 8, 2)
    assert len(split.weights) == 12


def test_dataset_lazy_loading(synth_dataset):
    _, path = synth_dataset
    ds = PrunedKeypointDataset(KeypointDatasetConfig(dataset_path=path), train=True)
    item = ds[0]
    assert item["image"].shape == (24, 24, 3)
    assert item["image"].dtype == np.float32
    assert 0.0 <= item["image"].min() and item["image"].max() <= 1.0
    assert item["depth_image"].shape == (24, 24)
    # segmentation binarized via asset_id + 1
    seg = item["segmentation_image"]
    assert set(np.unique(seg)).issubset({0.0, 1.0})
    assert seg.sum() > 0
    # keypoints: first corner is on the square, where seg == 1
    kp = item["pixel_coordinates"][0]
    assert seg[int(kp[1]), int(kp[0])] == 1.0


def test_dataset_cache_equivalent(synth_dataset):
    _, path = synth_dataset
    cfg = KeypointDatasetConfig(dataset_path=path)
    lazy = PrunedKeypointDataset(cfg, train=False)
    cached = PrunedKeypointDataset(cfg, train=False, cache=True)
    for i in range(len(lazy)):
        for k in ("image", "depth_image", "segmentation_image"):
            np.testing.assert_array_equal(lazy[i][k], cached[i][k])


def test_loader_epochs_and_sharding(synth_dataset):
    _, path = synth_dataset
    ds = PrunedKeypointDataset(KeypointDatasetConfig(dataset_path=path), train=True)
    loader = PrefetchingLoader(ds, batch_size=4, seed=0)
    # deterministic given (seed, epoch); different across epochs
    np.testing.assert_array_equal(loader.epoch_indices(3), loader.epoch_indices(3))
    assert not np.array_equal(loader.epoch_indices(0), loader.epoch_indices(1))

    batches = list(loader.epoch(0))
    assert len(batches) == loader.num_batches() == 3
    assert batches[0]["image"].shape == (4, 24, 24, 3)
    assert batches[0]["pixel_coordinates"].shape == (4, 8, 2)

    # shards partition the permutation
    shard0 = PrefetchingLoader(ds, batch_size=2, seed=0, shard_index=0, num_shards=2)
    shard1 = PrefetchingLoader(ds, batch_size=2, seed=0, shard_index=1, num_shards=2)
    all_idx = np.concatenate([shard0.epoch_indices(0), shard1.epoch_indices(0)])
    assert sorted(all_idx.tolist()) == sorted(loader.epoch_indices(0).tolist())


def test_loader_shard_equivalence_non_divisible(synth_dataset):
    """1-process and 2-process loaders must iterate IDENTICAL global batches
    (same wrap-padding, same step count) even when the dataset size does not
    divide the global batch — the round-3 code drop-last-truncated the
    single-shard path but wrap-padded the multi-shard one, so the two
    topologies saw different epochs whenever n % global_batch != 0."""

    class _FakeLen:
        def __len__(self):
            return 10  # not divisible by the global batch of 4

    single = PrefetchingLoader(_FakeLen(), batch_size=4, seed=0)
    shard0 = PrefetchingLoader(_FakeLen(), batch_size=2, seed=0, shard_index=0, num_shards=2)
    shard1 = PrefetchingLoader(_FakeLen(), batch_size=2, seed=0, shard_index=1, num_shards=2)
    for epoch in range(3):
        idx = single.epoch_indices(epoch)
        assert len(idx) == 12  # wrap-padded to whole global batches
        i0, i1 = shard0.epoch_indices(epoch), shard1.epoch_indices(epoch)
        # reassemble each global batch from the per-shard contiguous blocks
        rebuilt = np.concatenate(
            [
                np.concatenate([i0[b * 2 : (b + 1) * 2], i1[b * 2 : (b + 1) * 2]])
                for b in range(3)
            ]
        )
        np.testing.assert_array_equal(rebuilt, idx)
    # eval loaders (drop_last=False) keep the exact unpadded order
    ev = PrefetchingLoader(_FakeLen(), batch_size=4, seed=0, shuffle=False, drop_last=False)
    np.testing.assert_array_equal(ev.epoch_indices(0), np.arange(10))


def test_merge_and_prune_roundtrip(tmp_path):
    """Builds two raw trajectory HDF5s, merges, prunes, loads."""
    import h5py

    rng = np.random.default_rng(1)
    h = w = 16
    t_frames = 3

    def write_raw(path: str, n_traj: int, start: int):
        base = os.path.dirname(path)
        with h5py.File(path, "w") as f:
            f.attrs.update({"num_keypoints": 8, "train_frac": 0.67, "H": h, "W": w})
            for split, count in [("train", n_traj), ("test", 1)]:
                g = f.create_group(split)
                names_i, names_d, names_s = [], [], []
                for ti in range(count):
                    ni, nd, ns = [], [], []
                    for fi in range(t_frames):
                        tag = f"{split}_{start}_{ti}_{fi}"
                        rgb = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
                        depth = rng.uniform(1, 20, (h, w)).astype(np.float32)
                        seg = np.zeros((h, w), np.uint8)
                        seg[4:10, 4:10] = 1  # asset 0 -> ratio 36/256 ~ 0.14
                        schema.save_rgb_png(os.path.join(base, f"rgba_{tag}.png"), rgb)
                        schema.save_depth_tiff(os.path.join(base, f"depth_{tag}.tiff"), depth)
                        schema.save_segmentation_png(os.path.join(base, f"seg_{tag}.png"), seg)
                        ni.append(f"rgba_{tag}.png")
                        nd.append(f"depth_{tag}.tiff")
                        ns.append(f"seg_{tag}.png")
                    names_i.append(ni)
                    names_d.append(nd)
                    names_s.append(ns)
                g.create_dataset("image_filenames", data=np.asarray(names_i, dtype="S"))
                g.create_dataset("depth_filenames", data=np.asarray(names_d, dtype="S"))
                g.create_dataset("segmentation_filenames", data=np.asarray(names_s, dtype="S"))
                g.create_dataset("asset_ids", data=np.zeros((count, t_frames), np.int64))
                g.create_dataset(
                    "pixel_coordinates", data=rng.uniform(0, w, (count, t_frames, 8, 2)).astype(np.float32)
                )
                g.create_dataset("object_poses", data=rng.normal(size=(count, t_frames, 7)))
                g.create_dataset("object_scales", data=np.ones((count, t_frames)))
                g.create_dataset("camera_poses", data=rng.normal(size=(count, t_frames, 7)))
                g.create_dataset(
                    "camera_intrinsics", data=np.tile(np.eye(3), (count, t_frames, 1, 1))
                )

    raw1 = tmp_path / "batch1"
    raw2 = tmp_path / "batch2"
    raw1.mkdir()
    raw2.mkdir()
    write_raw(str(raw1 / "mjc_data.hdf5"), 2, 0)
    write_raw(str(raw2 / "mjc_data.hdf5"), 1, 10)

    from perseus_tpu.data.merge import merge
    from perseus_tpu.data.prune import prune_dataset

    data_root = tmp_path / "data"
    data_root.mkdir()
    merged = merge(
        [str(raw1 / "mjc_data.hdf5"), str(raw2 / "mjc_data.hdf5")],
        str(data_root / "merged"),
        workers=2,
    )
    with h5py.File(merged, "r") as f:
        assert f["train"]["pixel_coordinates"].shape == (3, t_frames, 8, 2)
        ratios = f["train"]["segmentation_ratios"][()]
        np.testing.assert_allclose(ratios, 36 / 256, atol=1e-9)
        assert f["train"]["weights"].shape == (3 * t_frames,)

    pruned = prune_dataset(
        merged,
        str(data_root / "pruned_dataset" / "pruned.hdf5"),
        str(data_root / "pruned_dataset" / "images"),
        lb=0.02,
        ub=0.7,
        workers=2,
    )
    ds = PrunedKeypointDataset(KeypointDatasetConfig(dataset_path=pruned), train=True)
    assert len(ds) == 3 * t_frames  # all ratios in bounds
    item = ds[0]
    assert item["image"].shape == (h, w, 3)
    assert item["segmentation_image"].sum() == 36

    # out-of-bounds prune removes everything
    pruned2 = prune_dataset(
        merged,
        str(data_root / "pruned2" / "pruned.hdf5"),
        str(data_root / "pruned2" / "images"),
        lb=0.5,
        ub=0.7,
        workers=2,
    )
    split, _ = schema.read_pruned_split(pruned2, train=True)
    assert len(split) == 0
