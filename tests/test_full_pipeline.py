"""The full offline pipeline end to end on tiny sizes:

  generate (JAX rasterizer) -> label -> merge -> prune -> train 1 epoch ->
  validate

— every data contract crossing (SURVEY.md section 2.3) exercised in one
test, on real rendered geometry rather than fixtures."""

import dataclasses
import os

import numpy as np
import pytest

from perseus_tpu.data.dataset import KeypointDatasetConfig
from perseus_tpu.data.merge import merge
from perseus_tpu.data.prune import prune_dataset
from perseus_tpu.datagen.generate import VideoConfig, generate_one_video
from perseus_tpu.datagen.label_dataset import LabelConfig, label_dataset


def test_generate_label_merge_prune_train_validate(tmp_path):
    data_root = tmp_path / "data"
    job_dir = data_root / "run0"
    os.makedirs(job_dir)

    # 1. generate three tiny videos (big cube spawn region keeps it in view)
    vcfg = VideoConfig(
        job_dir=str(job_dir), resolution=32, frames=4,
        n_static_range=(1, 2), n_dynamic_range=(1, 1),
        cube_scale_range=(1.0, 1.4), gravity=-0.5, seed=11,
    )
    for i in range(3):
        generate_one_video(vcfg, job_id=f"{i:08x}")

    # 2. label -> raw per-batch HDF5 (lazy: the at-scale production path —
    # labels + filenames only; embedded-image labeling is covered by
    # tests/test_labeler.py)
    raw = label_dataset(
        LabelConfig(job_dir=str(job_dir), frames=4, train_frac=0.67, lazy_images=True)
    )
    assert os.path.exists(raw)

    # 3. merge (writes merged.hdf5 + image tree + seg ratios + weights)
    merged = merge([raw], str(data_root / "merged"), new_train_frac=0.67)
    assert os.path.exists(merged)

    # 4. prune to a permissive seg-ratio band (tiny renders vary)
    pruned = prune_dataset(
        merged, str(data_root / "pruned" / "pruned.hdf5"), str(data_root / "pruned"),
        lb=0.0, ub=1.0,
    )
    assert os.path.exists(pruned)

    # 5. train one epoch on the pruned set
    from perseus_tpu.augment.pipeline import AugmentationConfig
    from perseus_tpu.train import train as train_mod
    from perseus_tpu.train.config import TrainConfig

    cfg = TrainConfig(
        batch_size=8, n_epochs=1, amp=False, save_epochs=1, cache_dataset=True,
        dataset_config=KeypointDatasetConfig(dataset_path=pruned),
        augmentation_config=AugmentationConfig(
            planckian_jitter=False, blur=False, random_plasma_shadow=False, color_jiggle=False
        ),
    )
    result = train_mod.train(cfg)
    assert np.isfinite(result["final_train_loss"])

    # 6. validate the saved checkpoint on the same pruned set
    from perseus_tpu import ROOT
    from perseus_tpu.eval import validate as val_mod

    run_dir = os.path.join(ROOT, "outputs", "models", result["run_id"])
    vcfg2 = val_mod.ValConfig(
        model_path=run_dir, batch_size=4, depth=True, amp=False, max_plots=1,
        dataset_config=KeypointDatasetConfig(dataset_path=pruned),
    )
    out = val_mod.validate(vcfg2)
    assert np.isfinite(out["stats"]["mean"])
    assert out["rmse_px"] > 0
