"""Synthetic pruned-dataset generation (test fixtures + benchmarks).

Creates a tiny but schema-complete pruned dataset on disk: a textured cube
rendered as a flat-shaded quad projected through a random camera would be
overkill — instead we draw a filled square "cube face" at a random location/
size with its 4+4 corner keypoints at the square corners (twice, front and
back slightly offset), plus noise background, random depth, and the exact
segmentation mask. This exercises every byte of the data contract (PNG/TIFF
decode, seg binarization via asset_id, keypoint alignment) without Kubric.
"""

from __future__ import annotations

import os

import numpy as np

from perseus_tpu.data import schema

__all__ = ["generate_synthetic_pruned_dataset"]


def _make_example(rng: np.random.Generator, h: int, w: int, n_keypoints: int, asset_id: int):
    rgb = rng.uniform(0, 1, size=(h, w, 3)).astype(np.float32) * 0.3
    depth = rng.uniform(8.0, 14.0, size=(h, w)).astype(np.float32)
    seg = np.zeros((h, w), dtype=np.uint8)

    # square "cube face"
    size = int(rng.integers(h // 6, h // 3))
    top = int(rng.integers(0, h - size))
    left = int(rng.integers(0, w - size))
    color = rng.uniform(0.5, 1.0, size=3).astype(np.float32)
    rgb[top : top + size, left : left + size] = color
    cube_depth = float(rng.uniform(3.0, 6.0))
    depth[top : top + size, left : left + size] = cube_depth
    seg[top : top + size, left : left + size] = asset_id + 1

    # keypoints: the 4 corners of the face (u, v), then the same corners
    # nudged as a fake "back face"; pad/truncate to n_keypoints
    corners = np.array(
        [
            [left, top],
            [left + size - 1, top],
            [left, top + size - 1],
            [left + size - 1, top + size - 1],
        ],
        dtype=np.float32,
    )
    back = corners + np.float32(size * 0.15)
    kps = np.concatenate([corners, back], axis=0)[:n_keypoints]
    if len(kps) < n_keypoints:
        kps = np.concatenate([kps, np.tile(kps[-1:], (n_keypoints - len(kps), 1))])
    seg_ratio = float((seg == asset_id + 1).mean())
    return rgb, depth, seg, kps, seg_ratio


def generate_synthetic_pruned_dataset(
    out_dir: str,
    n_train: int = 16,
    n_test: int = 8,
    h: int = 32,
    w: int = 32,
    n_keypoints: int = 8,
    seed: int = 0,
) -> str:
    """Writes images under ``out_dir/data/synth/{train,test}`` and the
    pruned HDF5 at ``out_dir/data/synth/pruned.hdf5``. Returns the HDF5
    path. Filenames stored relative to ``out_dir/data`` per the reference's
    convention (perseus/detector/data.py:74-76)."""
    rng = np.random.default_rng(seed)
    data_dir = os.path.join(out_dir, "data")
    splits = {}
    for split_name, count in [("train", n_train), ("test", n_test)]:
        split_dir = os.path.join(data_dir, "synth", split_name)
        os.makedirs(split_dir, exist_ok=True)
        image_names, depth_names, seg_names, coords, assets, ratios = [], [], [], [], [], []
        for i in range(count):
            asset_id = int(rng.integers(0, 5))
            rgb, depth, seg, kps, seg_ratio = _make_example(rng, h, w, n_keypoints, asset_id)
            img_local = f"synth/{split_name}/rgba_{i:08d}.png"
            dep_local = f"synth/{split_name}/depth_{i:08d}.tiff"
            seg_local = f"synth/{split_name}/segmentation_{i:08d}.png"
            schema.save_rgb_png(os.path.join(data_dir, img_local), rgb)
            schema.save_depth_tiff(os.path.join(data_dir, dep_local), depth)
            schema.save_segmentation_png(os.path.join(data_dir, seg_local), seg)
            image_names.append(img_local)
            depth_names.append(dep_local)
            seg_names.append(seg_local)
            coords.append(kps)
            assets.append(asset_id)
            ratios.append(seg_ratio)
        ratios = np.asarray(ratios)
        splits[split_name] = schema.PrunedSplit(
            image_filenames=image_names,
            depth_filenames=depth_names,
            segmentation_filenames=seg_names,
            pixel_coordinates=np.asarray(coords, dtype=np.float32),
            asset_ids=np.asarray(assets),
            segmentation_ratios=ratios,
            weights=schema.compute_weights(ratios),
        )
    hdf5_path = os.path.join(data_dir, "synth", "pruned.hdf5")
    schema.write_pruned_dataset(
        hdf5_path,
        splits["train"],
        splits["test"],
        attrs={
            "H": h,
            "W": w,
            "num_keypoints": n_keypoints,
            "train_frac": n_train / (n_train + n_test),
            "seg_ratio_lb": 0.02,
            "seg_ratio_ub": 0.7,
        },
    )
    return hdf5_path
