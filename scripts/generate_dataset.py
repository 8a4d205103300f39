"""Dataset-scale video generation driver (the reference's
generate_all_videos.py role, data_generation/generate_all_videos.py:24-59).

Forces the CPU backend before any JAX use: datagen is host tooling and must
not contend for (or depend on) the TPU tunnel, and the padded-object-count
renderer compiles exactly once per process on CPU.

Usage:
    python scripts/generate_dataset.py --job-dir outputs/scale_run/jobs \
        --n-videos 1600 --style train
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


@dataclasses.dataclass(frozen=True)
class GenConfig:
    job_dir: str = "outputs/scale_run/jobs"
    n_videos: int = 1600
    start_index: int = 0  # first job id (hex), for resumable fan-out
    style: str = "train"
    seed: int = 0
    resolution: int = 256
    frames: int = 24
    # "cpu" pins the renderer to the host CPU backend; "default" keeps the
    # process default (the TPU when attached) — the sim/labeling stay in
    # numpy on the host either way, so TPU rendering costs only a few
    # device calls per video and leaves the host free for decode/encode.
    platform: str = "cpu"


def main() -> None:
    from perseus_tpu.configs.cli import cli

    cfg = cli(GenConfig)
    if cfg.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from perseus_tpu.datagen.generate import VideoConfig, generate_one_video
    vcfg = VideoConfig(
        job_dir=cfg.job_dir,
        resolution=cfg.resolution,
        frames=cfg.frames,
        style=cfg.style,
        seed=cfg.seed,
    )
    os.makedirs(cfg.job_dir, exist_ok=True)
    t0 = time.time()
    done = 0
    for i in range(cfg.start_index, cfg.start_index + cfg.n_videos):
        job_id = f"{i:08x}"
        if os.path.exists(os.path.join(cfg.job_dir, job_id, "metadata.json")):
            done += 1
            continue  # resumable: skip completed jobs
        try:
            generate_one_video(vcfg, job_id)
            done += 1
        except Exception as exc:  # per-video tolerance (generate_one_video.py:376)
            print(f"video {job_id} failed: {exc}", flush=True)
        if done % 50 == 0:
            rate = done / max(time.time() - t0, 1e-9)
            print(
                f"[gen] {done}/{cfg.n_videos} ({rate:.2f} vids/s, "
                f"eta {(cfg.n_videos - done) / max(rate, 1e-9) / 60:.0f} min)",
                flush=True,
            )
    print(f"[gen] done: {done} videos in {(time.time() - t0) / 60:.1f} min", flush=True)


if __name__ == "__main__":
    main()
