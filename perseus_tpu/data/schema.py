"""HDF5 dataset schema IO: raw per-batch, merged, and pruned layouts.

Implements the reference's de-facto data contracts (SURVEY.md section 2.3):
  * raw per-batch ``mjc_data.hdf5`` written by the labeler (reference:
    data_generation/generate_and_label_keypoints.py:258-318),
  * merged dataset with ``segmentation_ratios`` and inverse-bin-frequency
    ``weights`` (reference: data/merge_hdf5.py:454-506),
  * pruned per-image flat dataset, the training input (reference:
    data/prune_dataset.py:138-154).

Image files on disk: RGB PNGs, float32 depth TIFFs, paletted/byte
segmentation PNGs. tifffile is not available in this environment, so float
TIFFs go through PIL mode-"F" images (same on-disk format the reference's
tifffile wrote).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
import h5py
import numpy as np
from PIL import Image

__all__ = [
    "PRUNED_DATASET_KEYS",
    "PrunedSplit",
    "read_pruned_split",
    "write_pruned_dataset",
    "save_rgb_png",
    "load_rgb_png",
    "save_depth_tiff",
    "load_depth_tiff",
    "save_segmentation_png",
    "load_segmentation_png",
    "compute_weights",
]

# per-image flat rows of the pruned layout (reference: prune_dataset.py:138-144)
PRUNED_DATASET_KEYS = (
    "image_filenames",
    "depth_filenames",
    "segmentation_filenames",
    "pixel_coordinates",
    "asset_ids",
    "segmentation_ratios",
    "weights",
)


@dataclass
class PrunedSplit:
    """In-memory metadata for one split of a pruned dataset."""

    image_filenames: list[str]
    depth_filenames: list[str]
    segmentation_filenames: list[str]
    pixel_coordinates: np.ndarray  # (N, K, 2) float32
    asset_ids: np.ndarray  # (N,) int
    segmentation_ratios: np.ndarray = field(default_factory=lambda: np.zeros(0))
    weights: np.ndarray = field(default_factory=lambda: np.zeros(0))

    def __len__(self) -> int:
        return len(self.image_filenames)


def _decode_names(arr) -> list[str]:
    return [x.decode("utf-8") if isinstance(x, bytes) else str(x) for x in arr[()]]


def read_pruned_split(path: str, train: bool = True) -> tuple[PrunedSplit, dict]:
    """Reads one split plus the file attrs (H, W, num_keypoints, ...)."""
    with h5py.File(path, "r") as f:
        g = f["train" if train else "test"]
        split = PrunedSplit(
            image_filenames=_decode_names(g["image_filenames"]),
            depth_filenames=_decode_names(g["depth_filenames"]),
            segmentation_filenames=_decode_names(g["segmentation_filenames"]),
            pixel_coordinates=np.asarray(g["pixel_coordinates"][()], dtype=np.float32),
            asset_ids=np.asarray(g["asset_ids"][()]),
            segmentation_ratios=np.asarray(g.get("segmentation_ratios", np.zeros(0))[()]),
            weights=np.asarray(g.get("weights", np.zeros(0))[()]),
        )
        attrs = dict(f.attrs)
    return split, attrs


def write_pruned_dataset(
    path: str, train: PrunedSplit, test: PrunedSplit, attrs: dict
) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with h5py.File(path, "w") as f:
        for name, split in [("train", train), ("test", test)]:
            g = f.create_group(name)
            g.create_dataset("image_filenames", data=np.asarray(split.image_filenames, dtype="S"))
            g.create_dataset("depth_filenames", data=np.asarray(split.depth_filenames, dtype="S"))
            g.create_dataset(
                "segmentation_filenames",
                data=np.asarray(split.segmentation_filenames, dtype="S"),
            )
            g.create_dataset("pixel_coordinates", data=split.pixel_coordinates)
            g.create_dataset("asset_ids", data=split.asset_ids)
            g.create_dataset("segmentation_ratios", data=split.segmentation_ratios)
            g.create_dataset("weights", data=split.weights)
        for key, value in attrs.items():
            f.attrs[key] = value


# ----------------------------- image files --------------------------------


def _atomic_save(img: "Image.Image", path: str, fmt: str | None = None) -> None:
    """Write-to-temp + os.replace. Merged/pruned datasets HARD-LINK render
    files (data/merge.py); an in-place overwrite (same inode truncated by a
    re-render into an existing job dir) would silently mutate every dataset
    sharing the link. os.replace points the name at a NEW inode, so existing
    links keep the old bytes."""
    tmp = path + ".tmp"
    img.save(tmp, format=fmt or Image.registered_extensions().get(os.path.splitext(path)[1]))
    os.replace(tmp, path)


def save_rgb_png(path: str, rgb01: np.ndarray) -> None:
    """Saves an (H, W, 3) float [0,1] or uint8 array as PNG."""
    arr = rgb01
    if arr.dtype != np.uint8:
        arr = np.clip(arr * 255.0, 0, 255).astype(np.uint8)
    _atomic_save(Image.fromarray(arr), path)


def load_rgb_png(path: str) -> np.ndarray:
    """Loads a PNG as (H, W, 3) float32 in [0, 1] (reference divides by 255;
    perseus/detector/data.py:84)."""
    with Image.open(path) as im:
        arr = np.asarray(im.convert("RGB"), dtype=np.float32)
    return arr / 255.0


def save_depth_tiff(path: str, depth: np.ndarray) -> None:
    """Saves (H, W) float32 depth as a 32-bit float TIFF."""
    _atomic_save(Image.fromarray(depth.astype(np.float32), mode="F"), path)


def load_depth_tiff(path: str) -> np.ndarray:
    with Image.open(path) as im:
        return np.asarray(im, dtype=np.float32)


def save_segmentation_png(path: str, seg: np.ndarray) -> None:
    """Saves (H, W) small-int segmentation indices as 8-bit PNG."""
    _atomic_save(Image.fromarray(seg.astype(np.uint8)), path)


def load_segmentation_png(path: str) -> np.ndarray:
    with Image.open(path) as im:
        return np.asarray(im)


# ------------------------------- weights ----------------------------------


def compute_weights(segmentation_ratios: np.ndarray, num_bins: int = 100) -> np.ndarray:
    """Inverse-bin-frequency weights over seg-ratio bins (reference:
    data/merge_hdf5.py:175-190; 100 bins over [0, 1])."""
    bin_edges = np.linspace(0, 1, num_bins)
    flat = segmentation_ratios.reshape(-1)
    bin_indices = np.digitize(flat, bins=bin_edges, right=True)
    weights = np.zeros(len(flat))
    for bin_idx in np.unique(bin_indices):
        mask = bin_indices == bin_idx
        weights[mask] = 1.0 / mask.sum()
    return weights
