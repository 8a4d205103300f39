"""Measure the out-of-frame GT-corner frame rate of a datagen distribution.

The round-4 split regression was diagnosed with exactly this number: the
fraction of frames whose projected cube corners leave the image. Generates
n probe videos at low resolution (the fraction is resolution-invariant),
labels them, and prints one JSON line. Used to validate collision/spawn
model changes BEFORE committing to a multi-hour full-scale regeneration.

Usage:
    python scripts/measure_oof.py --n-videos 40 --seed 11
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


@dataclasses.dataclass(frozen=True)
class OofConfig:
    n_videos: int = 40
    seed: int = 11
    resolution: int = 64
    style: str = "train"
    object_collisions: bool = True
    job_dir: str = ""  # empty -> a fresh temp dir, deleted afterwards


def main() -> None:
    from perseus_tpu.configs.cli import cli

    cfg = cli(OofConfig)
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from perseus_tpu.datagen.generate import VideoConfig, generate_one_video
    from perseus_tpu.datagen.label_dataset import LabelConfig, label_job

    tmp = None
    job_dir = cfg.job_dir
    if not job_dir:
        tmp = tempfile.TemporaryDirectory()
        job_dir = tmp.name
    vcfg = VideoConfig(
        job_dir=job_dir,
        resolution=cfg.resolution,
        style=cfg.style,
        seed=cfg.seed,
        object_collisions=cfg.object_collisions,
    )
    oof_frames = total_frames = 0
    for i in range(cfg.n_videos):
        job_id = f"oof{i:05x}"
        generate_one_video(vcfg, job_id)
        rec = label_job(LabelConfig(job_dir=job_dir), job_id)
        px = np.asarray(rec["pixel_coordinates"])  # (T, 8, 2)
        out = (
            (px[..., 0] < 0)
            | (px[..., 0] >= cfg.resolution)
            | (px[..., 1] < 0)
            | (px[..., 1] >= cfg.resolution)
        )
        oof_frames += int(out.any(axis=-1).sum())
        total_frames += px.shape[0]
    if tmp is not None:
        tmp.cleanup()
    print(
        json.dumps(
            {
                "oof_frame_rate": oof_frames / max(total_frames, 1),
                "frames": total_frames,
                "videos": cfg.n_videos,
                "collisions": cfg.object_collisions,
                "style": cfg.style,
            }
        )
    )


if __name__ == "__main__":
    main()
