"""Pose-tracking eval pooled over MANY rendered trajectories.

The committed pose metric comes from ONE 24-frame video (train_at_scale's
--pose-eval-job), where 12 scored frames make the RMSE a coin flip: the
round-5 flagship scores median 4.9 deg but RMSE 17.3 deg because exactly two
frames of one video are catastrophic. This script runs the SAME closed-loop
eval (perseus_tpu.eval.pose_eval.evaluate_pose_tracking — detector forward +
fixed-lag smoother, scored against sim GT, the role of reference
perseus/smoother tests on live trajectories) over every job under a
directory and pools the per-frame errors, giving an estimate that one bad
frame cannot dominate.

Usage:
    python scripts/eval_pose_multi.py \
        --job-root outputs/scale_run5/pose_multi_jobs \
        --model-path outputs/models/scale_run5/final \
        --output outputs/models/scale_run5/pose_multi.json \
        [--update-metrics outputs/models/scale_run5/metrics.json]

--update-metrics adds pose_multi_* keys to an existing metrics.json
(never overwrites the single-video pose_rmse_* keys).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


@dataclasses.dataclass(frozen=True)
class MultiPoseConfig:
    job_root: str = "outputs/scale_run5/pose_multi_jobs"
    model_path: str = "outputs/models/scale_run5/final"
    window: int = 12
    amp: bool = True
    output: str = ""
    update_metrics: str = ""
    platform: str = "default"  # cpu | default


def main() -> None:
    from perseus_tpu.configs.cli import cli

    cfg = cli(MultiPoseConfig)
    if cfg.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from perseus_tpu.eval.pose_eval import evaluate_pose_tracking

    jobs = sorted(
        os.path.join(cfg.job_root, d)
        for d in os.listdir(cfg.job_root)
        if os.path.exists(os.path.join(cfg.job_root, d, "metadata.json"))
    )
    if not jobs:
        raise SystemExit(f"no jobs with metadata.json under {cfg.job_root}")

    rot_all, trans_all, per_job = [], [], []
    for job in jobs:
        r = evaluate_pose_tracking(
            job, model_path=cfg.model_path, window=cfg.window, amp=cfg.amp
        )
        rot_all.extend(r["per_frame_rot_deg"])
        trans_all.extend(r["per_frame_trans_mm"])
        per_job.append(
            {
                "job": os.path.basename(job),
                "pose_rmse_deg": round(r["pose_rmse_deg"], 3),
                "pose_rmse_mm": round(r["pose_rmse_mm"], 3),
                "n_scored": r["n_scored"],
            }
        )
        print(f"[pose-multi] {job}: {per_job[-1]}", file=sys.stderr, flush=True)

    rot = np.asarray(rot_all)
    trans = np.asarray(trans_all)
    out = {
        "pose_multi_rmse_deg": float(np.sqrt(np.mean(rot**2))),
        "pose_multi_rmse_mm": float(np.sqrt(np.mean(trans**2))),
        "pose_multi_median_deg": float(np.median(rot)),
        "pose_multi_median_mm": float(np.median(trans)),
        "pose_multi_p90_deg": float(np.percentile(rot, 90)),
        "pose_multi_p90_mm": float(np.percentile(trans, 90)),
        "pose_multi_n_frames": int(rot.size),
        "pose_multi_n_videos": len(jobs),
        "per_job": per_job,
    }
    print(json.dumps(out), flush=True)
    if cfg.output:
        os.makedirs(os.path.dirname(cfg.output) or ".", exist_ok=True)
        with open(cfg.output, "w") as f:
            json.dump(out, f, indent=2)
    if cfg.update_metrics:
        with open(cfg.update_metrics) as f:
            metrics = json.load(f)
        metrics.update({k: v for k, v in out.items() if k != "per_job"})
        with open(cfg.update_metrics, "w") as f:
            json.dump(metrics, f, indent=2)


if __name__ == "__main__":
    main()
