"""CPU-pinned dataset preparation (label -> merge -> prune) for an at-scale
run, decoupled from training so it can overlap a TPU-bound job: the labeler's
JAX math runs on the host backend and never touches the TPU tunnel, letting
the corpus prep for run N+1 proceed while run N's evals still hold the chip.
Train afterwards with ``train_at_scale.py --skip-prepare``.

Prepares the main split and, when --holdout-job-dir is given, the
holdout-style split into ``<data_root>/holdout`` (the same layout
train_at_scale's in-process prepare produces).

Usage:
    python scripts/prepare_at_scale.py --job-dir outputs/scale_run6/jobs \
        --data-root outputs/scale_run7/data \
        --holdout-job-dir outputs/scale_run6/holdout_jobs
"""

from __future__ import annotations

import dataclasses
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)

from train_at_scale import ScaleRunConfig, prepare_dataset  # noqa: E402


def main() -> None:
    from perseus_tpu.configs.cli import cli

    cfg = cli(ScaleRunConfig)
    print(f"[prep] main split -> {prepare_dataset(cfg)}", flush=True)
    if cfg.holdout_job_dir and os.path.isdir(cfg.holdout_job_dir):
        ho_cfg = dataclasses.replace(
            cfg,
            job_dir=cfg.holdout_job_dir,
            data_root=os.path.join(cfg.data_root, "holdout"),
            train_frac=0.05,
        )
        print(f"[prep] holdout split -> {prepare_dataset(ho_cfg)}", flush=True)


if __name__ == "__main__":
    main()
