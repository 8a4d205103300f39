"""Checkpoint-measured per-row difficulty weights for hard-example sampling.

Round-3/4 val analysis: the worst ~5% of frames carry ~80% of the squared
keypoint error, and they are CENTROID COLLAPSE — the head localizes the cube
(centroid error ~5 px) but hedges all corners toward the center when the
orientation evidence is weak. That failure regime is not isolated by any
metadata bucket (it appears at BOTH seg-ratio extremes), so the only reliable
selector is a trained model's own errors. This script scores every TRAIN row
with a checkpoint (val-mode transform only — the same depth near/far clamp
evaluation uses) and writes per-row weights

    w_i = clip(1 + gain * err_i / mean(err), 1, w_max)

as .npy, consumable by TrainConfig.sample_weights_path: each epoch then draws
rows with replacement proportional to w (train/train.py::make_sample_weights),
so gradient descent SEES hard frames more often without touching per-example
gradient scale. (The reference has no analogous recipe — its sampler is the
uniform DataLoader shuffle, reference train.py:220-232.)

Usage:
    python scripts/compute_difficulty_weights.py \
        --dataset-path outputs/scale_run3/data_full/pruned/pruned.hdf5 \
        --checkpoint outputs/models/abl_tail/final \
        --output outputs/models/abl_tail/difficulty_weights.npy
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DifficultyConfig:
    dataset_path: str = "outputs/scale_run3/data_full/pruned/pruned.hdf5"
    checkpoint: str = "outputs/models/scale_run/final"
    output: str = ""  # default: <checkpoint dir>/../difficulty_weights.npy
    batch_size: int = 256
    in_channels: int = 4
    gain: float = 2.0  # weight slope per unit of mean-normalized error
    w_max: float = 8.0  # cap so a few catastrophic rows don't dominate epochs


def main() -> None:
    from perseus_tpu.augment.pipeline import KeypointAugmentation
    from perseus_tpu.configs.cli import cli
    from perseus_tpu.data.dataset import KeypointDatasetConfig, PrunedKeypointDataset
    from perseus_tpu.models import resnet
    from perseus_tpu.train import checkpoint as ckpt
    from perseus_tpu.train.config import TrainConfig

    cfg = cli(DifficultyConfig)
    params, stats = ckpt.load_model(cfg.checkpoint)
    ds = PrunedKeypointDataset(
        KeypointDatasetConfig(dataset_path=cfg.dataset_path), train=True, cache=False
    )
    tcfg = TrainConfig(batch_size=cfg.batch_size, in_channels=cfg.in_channels)
    val_aug = KeypointAugmentation(tcfg.augmentation_config, train=False)

    @jax.jit
    def frame_rmse(img, crd):
        x, c = val_aug(jax.random.key(0), img, crd)
        pred, _ = resnet.keypoint_cnn_apply(
            params, stats, x[..., : cfg.in_channels], train=False,
            compute_dtype=jnp.bfloat16,
        )
        d = pred.reshape(pred.shape[0], -1, 2) - c.reshape(c.shape[0], -1, 2)
        return jnp.sqrt(jnp.mean(jnp.sum(d * d, axis=-1), axis=-1))

    n = len(ds)
    errs = np.empty(n, np.float64)
    t0 = time.time()
    b = cfg.batch_size
    for s in range(0, n, b):
        rows = np.arange(s, min(s + b, n))
        batch = ds.batch(rows)
        img = batch["image"]
        if cfg.in_channels >= 4:
            img = np.concatenate([img, batch["depth_image"][..., None]], axis=-1)
        # pad the trailing partial batch so one compiled shape serves all
        pad = b - len(rows)
        if pad:
            img = np.concatenate([img, np.repeat(img[-1:], pad, 0)])
            crd = np.concatenate(
                [batch["pixel_coordinates"], np.repeat(batch["pixel_coordinates"][-1:], pad, 0)]
            )
        else:
            crd = batch["pixel_coordinates"]
        e = np.asarray(frame_rmse(jnp.asarray(img, jnp.float32), jnp.asarray(crd, jnp.float32)))
        errs[rows] = e[: len(rows)]
        if s % (20 * b) == 0:
            print(f"[difficulty] {s}/{n} rows ({time.time() - t0:.0f}s)", flush=True)

    # normalized-units errors -> weights
    w = 1.0 + cfg.gain * errs / max(errs.mean(), 1e-12)
    w = np.clip(w, 1.0, cfg.w_max)
    out = cfg.output or os.path.join(os.path.dirname(cfg.checkpoint.rstrip("/")),
                                     "difficulty_weights.npy")
    np.save(out, w)
    stats_line = {
        "rows": n,
        "err_mean": float(errs.mean()),
        "err_p95": float(np.percentile(errs, 95)),
        "w_mean": float(w.mean()),
        "w_at_cap_pct": float(100.0 * np.mean(w >= cfg.w_max)),
        "output": out,
    }
    print(json.dumps(stats_line), flush=True)


if __name__ == "__main__":
    main()
