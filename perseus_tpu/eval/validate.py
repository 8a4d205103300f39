"""Sim validation: loss statistics + GT-vs-pred keypoint overlay figures.

Output-fidelity equivalent of the reference's validate script (reference:
perseus/detector/validate.py): runs the val split through the deterministic
val-mode preprocessing, computes per-example SmoothL1 statistics
(mean/std/min/max/median), saves a semilog loss histogram, and renders
per-image overlay figures (RGB + depth panes, GT stars vs. predicted dots
joined by lines, jet colormap per keypoint).

TPU-first: inference runs through the folded-BN forward in batches sized by
the config; plotting stays on the host (matplotlib), optionally capped by
``max_plots`` (the reference plots every image via an mp.Pool).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from perseus_tpu import ROOT
from perseus_tpu.augment.pipeline import AugmentationConfig, KeypointAugmentation
from perseus_tpu.camera import denormalize_pixel_coordinates
from perseus_tpu.data.dataset import KeypointDatasetConfig, PrefetchingLoader, PrunedKeypointDataset
from perseus_tpu.models import resnet
from perseus_tpu.train import checkpoint as ckpt

__all__ = ["ValConfig", "validate", "main"]


@dataclass(frozen=True)
class ValConfig:
    """Validation configuration (same surface as the reference's ValConfig;
    perseus/detector/validate.py:21-33)."""

    model_path: str = f"{ROOT}/outputs/models/latest"
    batch_size: int = 256 * 4
    dataset_config: KeypointDatasetConfig = field(default_factory=KeypointDatasetConfig)
    depth: bool = True
    augmentation_config: AugmentationConfig = field(default_factory=AugmentationConfig)
    use_train: bool = False
    # TPU-side compute dtype for inference; f32 for strict parity checks
    amp: bool = True
    # cap on overlay figures (0 = none, -1 = all, like the reference)
    max_plots: int = 64


def _per_example_smooth_l1(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """(B, 2K) -> (B,) mean SmoothL1 per example (reference computes
    reduction='none' then mean over the coordinate axis; validate.py:130-135)."""
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)
    return jnp.mean(loss, axis=-1)


def plot_and_save(args: tuple) -> None:
    """Renders one overlay figure (reference: validate.py:36-81)."""
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    image, gt_px, pred_px, index, output_dir, depth, n_keypoints = args
    fig, axs = plt.subplots(1, 2 if depth else 1, figsize=(4, 8))
    axs = np.atleast_1d(axs)
    axs[0].imshow(np.clip(image[..., :3], 0, 1))
    if depth:
        axs[1].imshow(image[..., 3], cmap="gray")
    jet = plt.cm.jet(np.linspace(0, 1, n_keypoints))
    for ax in axs:
        for k in range(n_keypoints):
            ax.scatter(gt_px[k, 0], gt_px[k, 1], color=jet[k], alpha=0.8, marker="*")
            ax.scatter(pred_px[k, 0], pred_px[k, 1], color=jet[k], alpha=0.8)
            ax.plot(
                [gt_px[k, 0], pred_px[k, 0]], [gt_px[k, 1], pred_px[k, 1]], c="k", alpha=0.9
            )
        ax.axis("off")
    plt.tight_layout()
    fig.savefig(Path(output_dir) / f"val_{index}.png", bbox_inches="tight", pad_inches=0)
    plt.close(fig)


def validate(cfg: ValConfig) -> dict:
    """Returns {losses (N,), rmse_px, stats, output_dir}."""
    ckpt_name = os.path.basename(str(cfg.model_path)).split(".")[0]
    output_dir = Path(f"{ROOT}/outputs/figures/{ckpt_name}/sim")
    output_dir.mkdir(parents=True, exist_ok=True)

    params, stats_bn = ckpt.load_model(cfg.model_path)
    params = jax.tree.map(jnp.asarray, params)
    stats_bn = jax.tree.map(jnp.asarray, stats_bn)
    folded = resnet.fold_batchnorm(params, stats_bn)
    compute_dtype = jnp.bfloat16 if cfg.amp else jnp.float32

    dataset = PrunedKeypointDataset(cfg.dataset_config, train=cfg.use_train)
    loader = PrefetchingLoader(dataset, cfg.batch_size, shuffle=False, drop_last=False)
    val_augment = KeypointAugmentation(cfg.augmentation_config, train=False)
    h, w = dataset.H, dataset.W
    n_keypoints = dataset.num_keypoints

    @jax.jit
    def infer(images, coords):
        images, target = val_augment(jax.random.key(0), images, coords)
        images = images[..., : 4 if cfg.depth else 3]
        pred = resnet.keypoint_cnn_apply_folded(folded, images, compute_dtype=compute_dtype)
        losses = _per_example_smooth_l1(pred, target.reshape(target.shape[0], -1))
        pred_px = denormalize_pixel_coordinates(pred.reshape(pred.shape[0], -1, 2), h, w)
        gt_px = denormalize_pixel_coordinates(target.reshape(target.shape[0], -1, 2), h, w)
        return losses, pred_px, gt_px, images

    all_losses, plot_args = [], []
    sq_px_err, n_px = 0.0, 0
    index = 0
    for batch in loader.epoch(0):
        images = batch["image"]
        if cfg.depth:
            images = np.concatenate([images, batch["depth_image"][..., None]], axis=-1)
        losses, pred_px, gt_px, proc_images = infer(
            jnp.asarray(images), jnp.asarray(batch["pixel_coordinates"])
        )
        losses, pred_px, gt_px = map(np.asarray, (losses, pred_px, gt_px))
        all_losses.append(losses)
        sq_px_err += float(np.sum((pred_px - gt_px) ** 2))
        n_px += pred_px.size
        if cfg.max_plots:
            proc_images = np.asarray(proc_images)
            for j in range(len(losses)):
                if cfg.max_plots > 0 and index >= cfg.max_plots:
                    break
                plot_args.append(
                    (proc_images[j], gt_px[j], pred_px[j], index, output_dir, cfg.depth, n_keypoints)
                )
                index += 1

    losses = np.concatenate(all_losses)
    stats = {
        "mean": float(losses.mean()),
        "std": float(losses.std()),
        "min": float(losses.min()),
        "max": float(losses.max()),
        "median": float(np.median(losses)),
    }
    rmse_px = float(np.sqrt(sq_px_err / n_px))

    print("=" * 80)
    print("Validation Loss")
    print(f"Mean +/- Stdev: {stats['mean']} +/- {stats['std']}")
    print(f"Min: {stats['min']}")
    print(f"Max: {stats['max']}")
    print(f"Median: {stats['median']}")
    print(f"Keypoint pixel RMSE: {rmse_px:.3f}")
    print("=" * 80)

    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    plt.hist(losses, bins=100)
    plt.yscale("log")
    plt.savefig(output_dir / "loss_histogram.png")
    plt.close()

    for args in plot_args:
        plot_and_save(args)

    return {"losses": losses, "rmse_px": rmse_px, "stats": stats, "output_dir": str(output_dir)}


def main() -> None:
    from perseus_tpu.configs.cli import cli

    validate(cli(ValConfig))


if __name__ == "__main__":
    main()
