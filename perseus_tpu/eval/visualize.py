"""Dataset/augmentation/seg-ratio visualization tools.

Capability equivalents of the reference's analysis scripts (reference:
scripts/visualize_data.py, visualize_augmentations.py,
visualize_segmentation_ratios.py), as importable functions with thin CLIs in
scripts/. All render to files (headless matplotlib)."""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from pathlib import Path

import jax
import numpy as np

from perseus_tpu import ROOT
from perseus_tpu.augment.pipeline import AugmentationConfig, KeypointAugmentation
from perseus_tpu.camera import denormalize_pixel_coordinates
from perseus_tpu.data.dataset import KeypointDatasetConfig, PrunedKeypointDataset

__all__ = [
    "VisualizeConfig",
    "visualize_data",
    "visualize_augmentations",
    "visualize_segmentation_ratios",
]


@dataclass(frozen=True)
class VisualizeConfig:
    dataset_config: KeypointDatasetConfig = field(default_factory=KeypointDatasetConfig)
    augmentation_config: AugmentationConfig = field(default_factory=AugmentationConfig)
    train: bool = True
    num_images: int = 16
    seed: int = 0
    output_dir: str = f"{ROOT}/outputs/figures/visualize"


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    return plt


def visualize_data(cfg: VisualizeConfig) -> str:
    """Grid of dataset images with GT keypoints (reference:
    scripts/visualize_data.py)."""
    plt = _plt()
    ds = PrunedKeypointDataset(cfg.dataset_config, train=cfg.train)
    rng = np.random.default_rng(cfg.seed)
    n = min(cfg.num_images, len(ds))
    idx = rng.choice(len(ds), size=n, replace=False)
    side = int(np.ceil(np.sqrt(n)))
    fig, axs = plt.subplots(side, side, figsize=(3 * side, 3 * side))
    jet = plt.cm.jet(np.linspace(0, 1, ds.num_keypoints))
    for ax, i in zip(np.ravel(axs), idx):
        item = ds[int(i)]
        ax.imshow(item["image"])
        for k, kp in enumerate(item["pixel_coordinates"]):
            ax.scatter(kp[0], kp[1], color=jet[k], s=12)
        ax.axis("off")
    for ax in np.ravel(axs)[n:]:
        ax.axis("off")
    os.makedirs(cfg.output_dir, exist_ok=True)
    out = str(Path(cfg.output_dir) / "data_grid.png")
    fig.savefig(out, bbox_inches="tight")
    plt.close(fig)
    return out


def visualize_augmentations(cfg: VisualizeConfig) -> str:
    """4x4 grid of augmented RGB/depth/seg panels with transformed keypoints
    (reference: scripts/visualize_augmentations.py)."""
    import jax.numpy as jnp

    plt = _plt()
    ds = PrunedKeypointDataset(cfg.dataset_config, train=cfg.train)
    n = min(cfg.num_images, len(ds))
    batch = ds.batch(np.arange(n))
    images = np.concatenate(
        [
            batch["image"],
            batch["depth_image"][..., None],
            batch["segmentation_image"][..., None],
        ],
        axis=-1,
    )
    aug = KeypointAugmentation(cfg.augmentation_config, train=cfg.train)
    out_images, out_coords = aug(
        jax.random.key(cfg.seed), jnp.asarray(images), jnp.asarray(batch["pixel_coordinates"])
    )
    out_images = np.asarray(out_images)
    coords_px = np.asarray(
        denormalize_pixel_coordinates(
            np.asarray(out_coords).reshape(n, -1, 2), ds.H, ds.W
        )
    )

    side = int(np.ceil(np.sqrt(n)))
    fig, axs = plt.subplots(side, 3 * side, figsize=(9 * side, 3 * side))
    axs = np.asarray(axs).reshape(side, 3 * side)
    for i in range(n):
        r, c = divmod(i, side)
        ax_rgb = axs[r, 3 * c]
        ax_d = axs[r, 3 * c + 1]
        ax_s = axs[r, 3 * c + 2]
        ax_rgb.imshow(np.clip(out_images[i, ..., :3], 0, 1))
        ax_rgb.scatter(coords_px[i, :, 0], coords_px[i, :, 1], c="r", s=8)
        if out_images.shape[-1] > 3:
            ax_d.imshow(out_images[i, ..., 3], cmap="gray")
        if out_images.shape[-1] > 4:
            ax_s.imshow(out_images[i, ..., 4], cmap="gray")
        for ax in (ax_rgb, ax_d, ax_s):
            ax.axis("off")
    os.makedirs(cfg.output_dir, exist_ok=True)
    out = str(Path(cfg.output_dir) / "augmentations_grid.png")
    fig.savefig(out, bbox_inches="tight")
    plt.close(fig)
    return out


def visualize_segmentation_ratios(cfg: VisualizeConfig) -> str:
    """Histogram + CDF of seg ratios and representative bucket images for
    tuning prune bounds (reference: scripts/visualize_segmentation_ratios.py)."""
    plt = _plt()
    ds = PrunedKeypointDataset(cfg.dataset_config, train=cfg.train)
    ratios = np.asarray(ds.split.segmentation_ratios)

    fig, axs = plt.subplots(1, 2, figsize=(10, 4))
    axs[0].hist(ratios, bins=50)
    axs[0].set_title("segmentation ratio histogram")
    sorted_r = np.sort(ratios)
    axs[1].plot(sorted_r, np.linspace(0, 1, len(sorted_r)))
    axs[1].set_title("CDF")
    os.makedirs(cfg.output_dir, exist_ok=True)
    out = str(Path(cfg.output_dir) / "segmentation_ratios.png")
    fig.savefig(out, bbox_inches="tight")
    plt.close(fig)

    # representative images per quartile bucket
    buckets = np.quantile(ratios, [0.0, 0.25, 0.5, 0.75, 1.0])
    fig, axs = plt.subplots(1, 4, figsize=(12, 3))
    for b in range(4):
        in_bucket = np.where((ratios >= buckets[b]) & (ratios <= buckets[b + 1]))[0]
        if len(in_bucket):
            item = ds[int(in_bucket[0])]
            axs[b].imshow(item["image"])
            axs[b].set_title(f"ratio~[{buckets[b]:.3f},{buckets[b+1]:.3f}]")
        axs[b].axis("off")
    out2 = str(Path(cfg.output_dir) / "segmentation_ratio_buckets.png")
    fig.savefig(out2, bbox_inches="tight")
    plt.close(fig)
    return out
