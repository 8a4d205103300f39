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
    # Datasets beyond HBM: keep a rotating subset of this many rows
    # device-resident, re-drawn every refresh epochs (0 = whole split).
    device_data_rows: int = 0
    device_data_refresh_epochs: int = 0
    use_example_weights: bool = False
    # Round-4 accuracy levers (see TrainConfig for semantics/rationale):
    head: str = "avgpool"
    oversample_close: float = 0.0
    oversample_outframe: float = 0.0
    outframe_corner_weight: float = 1.0
    outframe_clamp_px: float = -1.0
    # per-row difficulty weights .npy (scripts/compute_difficulty_weights.py)
    sample_weights_path: str = ""
    spread_loss_weight: float = 0.0
    ema_decay: float = 0.0
    # Backbone-only init from a proxy-pretrained checkpoint
    # (scripts/pretrain_backbone.py) — the reference's fine-tune recipe.
    init_backbone: str = ""
    # with init_backbone: also copy the fc head (full warm start; see
    # TrainConfig.init_head)
    init_head: bool = False
    # LR plateau schedule. The round-3 renderer's harder domain needs many
    # more epochs at the base LR before corner identity locks in: the default
    # patience-5/0.25x schedule decays to the floor while the model is still
    # in the predict-the-centroid basin (observed: 191 epochs stuck at val
    # 0.055 vs 0.013 by epoch 24 with LR held). Patient + gentle is robust.
    plateau_patience: int = 20
    plateau_factor: float = 0.5
    # Keep the decoded-f32 split in host RAM so device-subset refreshes are
    # RAM-speed. ~1 MB/frame: fine to ~40k frames on this 125 GB host, but a
    # full 50k+-frame split plus h5py buffers crowds RAM — default off; the
    # C++ decoder refills a 9.5k-row subset in ~2 min.
    host_cache: bool = False
    resume: str = ""  # orbax dir to continue from
    # Held-out STYLE videos (datagen style="holdout": disjoint material /
    # lighting / background ranges): RMSE there measures whether the domain
    # randomization transfers to unseen appearance.
    holdout_job_dir: str = ""
    # Rendered trajectory for the closed-loop pose-tracking metric
    # (eval/pose_eval.py); empty = skip.
    pose_eval_job: str = ""


def prepare_dataset(cfg: ScaleRunConfig) -> str:
    from perseus_tpu.data.merge import merge
    from perseus_tpu.data.prune import prune_dataset
    from perseus_tpu.datagen.label_dataset import LabelConfig, label_dataset

    pruned = os.path.join(cfg.data_root, "pruned", "pruned.hdf5")
    if cfg.skip_prepare and os.path.exists(pruned):
        return pruned
    t0 = time.time()
    raw = label_dataset(
        LabelConfig(
            job_dir=cfg.job_dir,
            frames=cfg.frames,
            train_frac=cfg.train_frac,
            # labels only: merge/prune/training all read pixels from the
            # rendered files; embedding them would rewrite ~30 GB into the
            # raw HDF5 for nothing at this scale
            lazy_images=True,
        )
    )
    print(f"[scale] labeled -> {raw} ({time.time() - t0:.0f}s)", flush=True)
    merged = merge([raw], os.path.join(cfg.data_root, "merged"), new_train_frac=cfg.train_frac)
    print(f"[scale] merged -> {merged}", flush=True)
    pruned = prune_dataset(
        merged, pruned, os.path.join(cfg.data_root, "pruned"), lb=cfg.seg_lb, ub=cfg.seg_ub
    )
    print(f"[scale] pruned -> {pruned}", flush=True)
    return pruned


def val_rmse_px(state, cfg_train, mesh, dd_val) -> dict:
    """Pixel keypoint error stats over the device-resident val split (the
    metric of reference validate.py:161-174), computed without re-uploading
    images. Returns {val_rmse_px, val_median_corner_err_px,
    val_p90_corner_err_px}."""
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
    corner_errs, row_ids = [], []
    n_real = int(v_valid.sum())
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
        keep = np.asarray(mask2.reshape(-1)) > 0
        corner_errs.append(np.asarray(errs)[keep])
        # device d, local row i -> padded row d*n_local+i -> dataset row % n
        global_rows = (
            np.arange(n_dev)[:, None] * v_n_local + idx2
        ).reshape(-1)[keep] % n_real
        row_ids.append(global_rows)
    errs = np.concatenate(corner_errs)  # (N, K) per-corner pixel errors
    rows = np.concatenate(row_ids)
    per_example = np.sqrt(np.mean(errs**2, axis=-1))
    return {
        "val_rmse_px": float(np.sqrt(total / max(count, 1.0))),
        "val_median_corner_err_px": float(np.median(errs)),
        "val_p90_corner_err_px": float(np.percentile(errs, 90)),
        "_per_example_rmse": per_example,
        "_per_example_rows": rows,
    }


def failure_breakdown(dataset, rmse_stats, h: int, w: int) -> dict:
    """Buckets per-example RMSE by the scene factors that plausibly drive
    the error tail: segmentation ratio (cube apparent size / occlusion) and
    whether all GT corners project inside the frame. The analysis artifact
    round-2's verdict asked for (directive 2)."""
    per = rmse_stats["_per_example_rmse"]
    rows = rmse_stats["_per_example_rows"]
    seg = np.asarray(dataset.split.segmentation_ratios)[rows]
    coords = np.asarray(dataset.pixel_coordinates)[rows]  # (N, K, 2)
    in_frame = (
        (coords[..., 0] >= 0)
        & (coords[..., 0] <= w - 1)
        & (coords[..., 1] >= 0)
        & (coords[..., 1] <= h - 1)
    ).all(axis=-1)

    out = {}
    edges = [0.02, 0.05, 0.1, 0.2, 0.4, 0.7]
    for lo, hi in zip(edges[:-1], edges[1:]):
        m = (seg >= lo) & (seg < hi)
        if m.any():
            out[f"seg_{lo:g}_{hi:g}"] = {
                "n": int(m.sum()),
                "rmse_px": float(np.sqrt(np.mean(per[m] ** 2))),
                "median_px": float(np.median(per[m])),
            }
    for name, m in (("corners_in_frame", in_frame), ("corners_out_of_frame", ~in_frame)):
        if m.any():
            out[name] = {
                "n": int(m.sum()),
                "rmse_px": float(np.sqrt(np.mean(per[m] ** 2))),
                "median_px": float(np.median(per[m])),
            }
    return out


def main() -> None:
    from perseus_tpu.configs.cli import cli

    cfg = cli(ScaleRunConfig)
    pruned = prepare_dataset(cfg)

    from perseus_tpu.data.dataset import KeypointDatasetConfig, PrunedKeypointDataset
    from perseus_tpu.train import train as tm
    from perseus_tpu.train.config import TrainConfig

    # the spatial head's fc fan-in is resolution-dependent: derive it from
    # the actual data rather than trusting TrainConfig's 256 default
    res_probe = PrunedKeypointDataset(
        KeypointDatasetConfig(dataset_path=pruned), train=True, cache=False
    )
    input_resolution = int(res_probe.H)
    del res_probe

    tcfg = TrainConfig(
        input_resolution=input_resolution,
        batch_size=cfg.batch_size,
        learning_rate=cfg.learning_rate,
        n_epochs=cfg.epochs,
        dataset_config=KeypointDatasetConfig(dataset_path=pruned),
        data_on_device=True,
        device_data_dtype=cfg.data_dtype,
        device_data_rows=cfg.device_data_rows,
        device_data_refresh_epochs=cfg.device_data_refresh_epochs,
        use_example_weights=cfg.use_example_weights,
        head=cfg.head,
        oversample_close=cfg.oversample_close,
        oversample_outframe=cfg.oversample_outframe,
        outframe_corner_weight=cfg.outframe_corner_weight,
        outframe_clamp_px=cfg.outframe_clamp_px,
        sample_weights_path=cfg.sample_weights_path,
        spread_loss_weight=cfg.spread_loss_weight,
        ema_decay=cfg.ema_decay,
        init_backbone=cfg.init_backbone,
        init_head=cfg.init_head,
        plateau_patience=cfg.plateau_patience,
        plateau_factor=cfg.plateau_factor,
        resume=cfg.resume,
        save_epochs=max(1, cfg.epochs // 8),
        wandb_project="",
        cache_dataset=cfg.host_cache,
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
    ema_rmse = None
    if result.get("ema") is not None:
        # score the Polyak average; promote it to "the model" if it wins
        ema_state = state._replace(
            params=result["ema"]["params"], batch_stats=result["ema"]["batch_stats"]
        )
        ema_stats_full = val_rmse_px(ema_state, tcfg, mesh, dd_val)
        ema_rmse = ema_stats_full["val_rmse_px"]
        if ema_rmse < rmse_stats["val_rmse_px"]:
            state = ema_state
            rmse_stats, ema_rmse = ema_stats_full, rmse_stats["val_rmse_px"]
    breakdown = failure_breakdown(val_ds, rmse_stats, val_ds.H, val_ds.W)
    rmse_stats = {k: v for k, v in rmse_stats.items() if not k.startswith("_")}
    if ema_rmse is not None:
        rmse_stats["other_variant_rmse_px"] = float(ema_rmse)
    for a in dd_val[:3]:
        a.delete()  # free HBM before the holdout upload

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
    if "corners_in_frame" in breakdown:
        # raw RMSE mixes detector error with extrapolation to GT corners far
        # outside the image (the split has frames with corners hundreds of px
        # out); the in-frame number is the detector-quality headline
        rmse_stats["val_rmse_in_frame_px"] = breakdown["corners_in_frame"]["rmse_px"]
        n_in = breakdown["corners_in_frame"]["n"]
        n_out = breakdown.get("corners_out_of_frame", {}).get("n", 0)
        # split health: fraction of val frames with any GT corner outside
        # the frame (the round-4 collision bug drove this to 0.82; the fixed
        # distribution targets ~0.05-0.11)
        rmse_stats["val_oof_frame_rate"] = n_out / max(n_in + n_out, 1)
    metrics = {
        **rmse_stats,
        "val_loss": result["final_val_loss"],
        "train_loss": result["final_train_loss"],
        "epochs": cfg.epochs,
        "n_train": len(train_ds),
        "n_val": len(val_ds),
        "train_wall_s": round(train_s, 1),
        "image_hw": [train_ds.H, train_ds.W],
        "failure_breakdown": breakdown,
    }

    # The checkpoint is already on disk; a failure in either post-train eval
    # must not void the run's metrics record, so each eval degrades to an
    # error note in metrics.json instead of raising.
    if cfg.holdout_job_dir and os.path.isdir(cfg.holdout_job_dir):
        try:
            # unseen-STYLE generalization: label/merge/prune the holdout-style
            # jobs into their own root and score the trained model there
            ho_cfg = dataclasses.replace(
                cfg,
                job_dir=cfg.holdout_job_dir,
                data_root=os.path.join(cfg.data_root, "holdout"),
                train_frac=0.05,  # evaluate on ~all holdout frames (the test split)
            )
            ho_pruned = prepare_dataset(ho_cfg)
            ho_tcfg = dataclasses.replace(
                tcfg, dataset_config=KeypointDatasetConfig(dataset_path=ho_pruned)
            )
            ho_ds = PrunedKeypointDataset(ho_tcfg.dataset_config, train=False, cache=False)
            dd_ho = tm._device_dataset(ho_ds, ho_tcfg, mesh, use_transplant=False)
            ho_stats = val_rmse_px(state, ho_tcfg, mesh, dd_ho)
            for a in dd_ho[:3]:
                a.delete()
            metrics["holdout_style_rmse_px"] = ho_stats["val_rmse_px"]
            metrics["holdout_style_median_corner_err_px"] = ho_stats["val_median_corner_err_px"]
            metrics["holdout_style_n_frames"] = len(ho_ds)

        except Exception as e:  # noqa: BLE001
            metrics["holdout_eval_error"] = repr(e)

    if cfg.pose_eval_job and os.path.isdir(cfg.pose_eval_job):
        try:
            from perseus_tpu.eval.pose_eval import evaluate_pose_tracking

            pose = evaluate_pose_tracking(
                cfg.pose_eval_job,
                params=state.params,
                batch_stats=state.batch_stats,
                window=12,
            )
            metrics["pose_rmse_mm"] = pose["pose_rmse_mm"]
            metrics["pose_rmse_deg"] = pose["pose_rmse_deg"]
            metrics["pose_median_mm"] = pose["pose_median_mm"]
            metrics["pose_median_deg"] = pose["pose_median_deg"]
        except Exception as e:  # noqa: BLE001
            metrics["pose_eval_error"] = repr(e)

    with open(os.path.join(cfg.output_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps(metrics), flush=True)


if __name__ == "__main__":
    main()
