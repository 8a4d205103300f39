"""Cross-domain transfer probe: clean renders vs a sensor domain the model
never trained on.

VERDICT round-3's one "missing" axis is evidence that the detector survives
a visual domain it didn't render. This script measures exactly that gap
without external data: it scores a trained checkpoint on the SAME frames
twice — once as rendered (the training domain) and once pushed through the
camera/sensor model (`perseus_tpu.datagen.generate._apply_camera_effects`:
white balance, film gamma, exposure, vignette, shot noise), which is OFF by
default in datagen, so the training corpus contains none of it. The
per-frame labels are unchanged (the sensor model is photometric only), so
any RMSE delta is pure domain shift. The reference gets the analogous
robustness from Cycles' filmic pipeline + augmentation
(reference: data_generation/custom_renderer.py:8-29,
perseus/detector/augmentations.py); here the augmentation chain (Planckian
jitter, color jiggle, blur, plasma shadow) is what must carry the transfer.

Usage:
    python scripts/eval_sensor_transfer.py \
        --checkpoint outputs/models/scale_run/final \
        --dataset-path outputs/scale_run3/data_full/holdout/pruned/pruned.hdf5

Prints one JSON line: {"clean_rmse_px": ..., "sensor_rmse_px": ...,
"delta_px": ..., "n_frames": ...}.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SensorTransferConfig:
    checkpoint: str = "outputs/models/scale_run/final"
    dataset_path: str = "outputs/scale_run3/data_full/holdout/pruned/pruned.hdf5"
    batch_size: int = 256
    depth: bool = True
    amp: bool = True
    use_train: bool = False
    seed: int = 0
    output: str = ""  # optional path for the JSON record


def main() -> None:
    from perseus_tpu.augment.pipeline import AugmentationConfig, KeypointAugmentation
    from perseus_tpu.camera import denormalize_pixel_coordinates
    from perseus_tpu.configs.cli import cli
    from perseus_tpu.data.dataset import (
        KeypointDatasetConfig,
        PrefetchingLoader,
        PrunedKeypointDataset,
    )
    from perseus_tpu.datagen.generate import _apply_camera_effects
    from perseus_tpu.models import resnet
    from perseus_tpu.train import checkpoint as ckpt

    cfg = cli(SensorTransferConfig)
    params, stats_bn = ckpt.load_model(cfg.checkpoint)
    folded = resnet.fold_batchnorm(
        jax.tree.map(jnp.asarray, params), jax.tree.map(jnp.asarray, stats_bn)
    )
    compute_dtype = jnp.bfloat16 if cfg.amp else jnp.float32

    dataset = PrunedKeypointDataset(
        KeypointDatasetConfig(dataset_path=cfg.dataset_path), train=cfg.use_train
    )
    loader = PrefetchingLoader(dataset, cfg.batch_size, shuffle=False, drop_last=False)
    val_augment = KeypointAugmentation(AugmentationConfig(), train=False)
    h, w = dataset.H, dataset.W

    @jax.jit
    def sq_err(images, coords):
        images, target = val_augment(jax.random.key(0), images, coords)
        images = images[..., : 4 if cfg.depth else 3]
        pred = resnet.keypoint_cnn_apply_folded(folded, images, compute_dtype=compute_dtype)
        pred_px = denormalize_pixel_coordinates(pred.reshape(pred.shape[0], -1, 2), h, w)
        gt_px = denormalize_pixel_coordinates(target.reshape(target.shape[0], -1, 2), h, w)
        return jnp.sum((pred_px - gt_px) ** 2), pred_px.size

    sq = {"clean": 0.0, "sensor": 0.0}
    n_px = 0
    n_frames = 0
    rng = np.random.default_rng(cfg.seed)
    for batch in loader.epoch(0):
        images = batch["image"]
        coords = jnp.asarray(batch["pixel_coordinates"])
        # sensor domain: each row gets its own camera draw (datagen draws
        # per-video; per-row is the same distribution, denser)
        fx = np.stack(
            [_apply_camera_effects(im[None], rng)[0] for im in images.astype(np.float32)]
        )
        if cfg.depth:
            d = batch["depth_image"][..., None]
            images = np.concatenate([images, d], axis=-1)
            fx = np.concatenate([fx, d.astype(np.float32)], axis=-1)
        for name, imgs in (("clean", images), ("sensor", fx)):
            s, k = sq_err(jnp.asarray(imgs), coords)
            sq[name] += float(s)
            n_px_batch = int(k)
        n_px += n_px_batch
        n_frames += len(images)

    record = {
        "clean_rmse_px": float(np.sqrt(sq["clean"] / n_px)),
        "sensor_rmse_px": float(np.sqrt(sq["sensor"] / n_px)),
        "n_frames": n_frames,
        "dataset": cfg.dataset_path,
        "checkpoint": cfg.checkpoint,
    }
    record["delta_px"] = record["sensor_rmse_px"] - record["clean_rmse_px"]
    line = json.dumps(record)
    print(line, flush=True)
    if cfg.output:
        os.makedirs(os.path.dirname(cfg.output) or ".", exist_ok=True)
        with open(cfg.output, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
