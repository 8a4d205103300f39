"""At-scale accuracy run: label -> merge -> prune the generated job dirs,
train the detector on-chip with the device-resident dataset path, and emit
an accuracy artifact (outputs/models/scale_run/metrics.json + checkpoint)
that bench.py folds into its JSON line as ``val_rmse_px``.

The offline-pipeline role of the reference's generate_all_videos ->
label_dataset -> merge_hdf5 -> prune_dataset -> train chain
(reference: data_generation/*.py, data/*.py, perseus/detector/train.py),
run at a few-hundred-video scale on the real chip.

Usage:
    python scripts/train_at_scale.py --job-dir outputs/scale_run/jobs \
        --epochs 60 --batch-size 256
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
class ScaleRunConfig:
    job_dir: str = "outputs/scale_run/jobs"
    data_root: str = "outputs/scale_run/data"
    output_dir: str = "outputs/models/scale_run"
    frames: int = 24
    train_frac: float = 0.85
    epochs: int = 60
    batch_size: int = 256
    learning_rate: float = 1e-3
    seg_lb: float = 0.02
    seg_ub: float = 0.7
    skip_prepare: bool = False  # reuse an existing pruned.hdf5
    # bf16 halves the in-HBM dataset (see TrainConfig.device_data_dtype);
    # needed beyond ~7k frames on a 16 GB chip
    data_dtype: str = "bfloat16"


def prepare_dataset(cfg: ScaleRunConfig) -> str:
    from perseus_tpu.data.merge import merge
    from perseus_tpu.data.prune import prune_dataset
    from perseus_tpu.datagen.label_dataset import LabelConfig, label_dataset

    pruned = os.path.join(cfg.data_root, "pruned", "pruned.hdf5")
    if cfg.skip_prepare and os.path.exists(pruned):
        return pruned
    t0 = time.time()
    raw = label_dataset(
        LabelConfig(job_dir=cfg.job_dir, frames=cfg.frames, train_frac=cfg.train_frac)
    )
    print(f"[scale] labeled -> {raw} ({time.time() - t0:.0f}s)", flush=True)
    merged = merge([raw], os.path.join(cfg.data_root, "merged"), new_train_frac=cfg.train_frac)
    print(f"[scale] merged -> {merged}", flush=True)
    pruned = prune_dataset(
        merged, pruned, os.path.join(cfg.data_root, "pruned"), lb=cfg.seg_lb, ub=cfg.seg_ub
    )
    print(f"[scale] pruned -> {pruned}", flush=True)
    return pruned


def val_rmse_px(state, cfg_train, mesh, dd_val) -> float:
    """Pixel keypoint RMSE over the device-resident val split (the metric of
    reference validate.py:161-174), computed without re-uploading images."""
    v_imgs, v_crds, _, v_valid, v_n_local = dd_val
    n_dev = len(mesh.devices.reshape(-1))
    local_bs = max(1, cfg_train.batch_size // n_dev)
    h = w = v_imgs.shape[1]

    from jax.sharding import NamedSharding, PartitionSpec as P

    data_sharded = NamedSharding(mesh, P("data"))

    from perseus_tpu.augment.pipeline import KeypointAugmentation

    val_aug = KeypointAugmentation(cfg_train.augmentation_config, train=False)

    @jax.jit
    def sq_err_sum(state, vi, vc, idx, mask):
        # val arrays passed as args (never closed over: a closure constant
        # can be inlined into the serialized HLO, see the tunnel 413 note)
        imgs = jnp.take(vi, idx, axis=0)
        crds = jnp.take(vc, idx, axis=0)
        # the val-mode depth near/far clamp the model was evaluated with in
        # training — skipping it feeds out-of-distribution depth and
        # roughly triples the reported RMSE
        imgs, _ = val_aug(jax.random.key(0), imgs, crds)
        from perseus_tpu.models import resnet

        pred, _ = resnet.keypoint_cnn_apply(
            state.params, state.batch_stats, imgs[..., : cfg_train.in_channels],
            train=False, compute_dtype=jnp.bfloat16,
        )
        from perseus_tpu.camera import denormalize_pixel_coordinates

        pred_px = denormalize_pixel_coordinates(pred.reshape(pred.shape[0], -1, 2), h, w)
        d2 = jnp.sum((pred_px - crds) ** 2, axis=-1)  # (B, K)
        return jnp.sum(jnp.mean(d2, axis=-1) * mask), jnp.sum(mask), jnp.sqrt(d2)

    valid2d = v_valid.reshape(n_dev, v_n_local)
    total, count = 0.0, 0.0
    corner_errs = []
    for s in range(-(-v_n_local // local_bs)):
        length = min(local_bs, v_n_local - s * local_bs)
        idx2 = np.zeros((n_dev, local_bs), np.int32)
        mask2 = np.zeros((n_dev, local_bs), np.float32)
        idx2[:, :length] = np.arange(s * local_bs, s * local_bs + length)
        mask2[:, :length] = valid2d[:, s * local_bs : s * local_bs + length]
        t, c, errs = sq_err_sum(
            state,
            v_imgs,
            v_crds,
            jax.device_put(idx2.reshape(-1), data_sharded),
            jax.device_put(mask2.reshape(-1), data_sharded),
        )
        total += float(t)
        count += float(c)
        corner_errs.append(np.asarray(errs)[np.asarray(mask2.reshape(-1)) > 0])
    errs = np.concatenate(corner_errs)
    return {
        "val_rmse_px": float(np.sqrt(total / max(count, 1.0))),
        "val_median_corner_err_px": float(np.median(errs)),
        "val_p90_corner_err_px": float(np.percentile(errs, 90)),
    }


def main() -> None:
    from perseus_tpu.configs.cli import cli

    cfg = cli(ScaleRunConfig)
    pruned = prepare_dataset(cfg)

    from perseus_tpu.data.dataset import KeypointDatasetConfig, PrunedKeypointDataset
    from perseus_tpu.train import train as tm
    from perseus_tpu.train.config import TrainConfig

    tcfg = TrainConfig(
        batch_size=cfg.batch_size,
        learning_rate=cfg.learning_rate,
        n_epochs=cfg.epochs,
        dataset_config=KeypointDatasetConfig(dataset_path=pruned),
        data_on_device=True,
        device_data_dtype=cfg.data_dtype,
        save_epochs=max(1, cfg.epochs // 4),
        wandb_project="",
    )
    t0 = time.time()
    result = tm.train(tcfg)
    train_s = time.time() - t0
    state = result["state"]

    mesh = tm.make_mesh(tcfg.multigpu)
    val_ds = PrunedKeypointDataset(tcfg.dataset_config, train=False, cache=False)
    train_ds = PrunedKeypointDataset(tcfg.dataset_config, train=True, cache=False)
    dd_val = tm._device_dataset(val_ds, tcfg, mesh, use_transplant=False)
    rmse_stats = val_rmse_px(state, tcfg, mesh, dd_val)

    os.makedirs(cfg.output_dir, exist_ok=True)
    from perseus_tpu.train import checkpoint as ckpt

    ckpt.save_train_state(
        cfg.output_dir + "/final",
        {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "epoch": cfg.epochs - 1,
            "lr": 0.0,
        },
    )
    metrics = {
        **rmse_stats,
        "val_loss": result["final_val_loss"],
        "train_loss": result["final_train_loss"],
        "epochs": cfg.epochs,
        "n_train": len(train_ds),
        "n_val": len(val_ds),
        "train_wall_s": round(train_s, 1),
        "image_hw": [train_ds.H, train_ds.W],
    }
    with open(os.path.join(cfg.output_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps(metrics), flush=True)


if __name__ == "__main__":
    main()
