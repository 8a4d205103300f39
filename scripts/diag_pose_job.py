"""Per-frame diagnosis of a pose-eval trajectory: detector vs smoother blame.

For each frame of a rendered job dir, reports
  det_px   — median detector corner error vs the GT projection (labeling.py)
  innov_px — median innovation of the detections vs the smoother's dynamics
             prediction at that frame (what the gate thresholds)
  rot_deg / trans_mm — smoothed pose error vs sim GT

so catastrophic pose_multi trajectories can be attributed: high det_px =>
detector failure; low det_px + high rot_deg => smoother divergence (gate /
cold start / LM basin), the failure the reference stack never measures
because its smoother runtime lives out-of-repo (SURVEY.md L4).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


@dataclasses.dataclass(frozen=True)
class DiagConfig:
    job_dir: str = "outputs/scale_run6/pose_multi_jobs/00000007"
    model_path: str = "outputs/models/scale_run6/final"
    window: int = 12
    amp: bool = True
    platform: str = "default"


def main() -> None:
    from perseus_tpu.configs.cli import cli

    cfg = cli(DiagConfig)
    if cfg.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from perseus_tpu.datagen.labeling import cube_corners, get_pixel_coordinates
    from perseus_tpu.eval.pose_eval import (
        _gt_pose_in_camera,
        load_job_frames,
        rotation_angle,
    )
    from perseus_tpu.runtime.streaming import StreamingConfig, StreamingPipeline
    from perseus_tpu.smoother.lm import SmootherConfig, predict_next
    from perseus_tpu.smoother.residuals import keypoint_projection_residual

    frames, meta = load_job_frames(cfg.job_dir)
    rot_gt, trans_gt, abs_scale = _gt_pose_in_camera(meta)
    t = frames.shape[0]
    res = int(meta["flags"]["resolution"])
    fov = float(meta["camera"]["field_of_view"])
    fps = float(meta["flags"]["frame_rate"])
    def to_xyzw(q):
        q = np.asarray(q, np.float64)
        return np.concatenate([q[..., 1:], q[..., :1]], axis=-1)

    cube = meta["instances"][0]
    cam = meta["camera"]
    kp_gt = np.asarray(
        get_pixel_coordinates(
            np.asarray(cube_corners(float(cube["abs_scale"])), np.float64),
            np.concatenate(
                [np.asarray(cube["positions"], np.float64), to_xyzw(cube["quaternions"])], axis=-1
            ),
            np.concatenate(
                [np.asarray(cam["positions"], np.float64), to_xyzw(cam["quaternions"])], axis=-1
            ),
            fov,
            res,
            res,
        )
    )  # (T, K, 2)

    scfg = StreamingConfig(
        model_path=cfg.model_path,
        num_channels=4,
        model_h=res,
        model_w=res,
        amp=cfg.amp,
        smooth=True,
        smoother=SmootherConfig(window=cfg.window, dt=1.0 / fps),
        camera_fov=fov,
        depth_in_cube_units=True,
        corner_scale=abs_scale,
    )
    pipeline = StreamingPipeline(scfg, params=None, batch_stats=None)
    kp0, *_ = pipeline(frames[0], pipeline.init_carry())
    carry = pipeline.init_carry(pipeline.smoother.coarse_pose_from_keypoints(kp0))
    sm = pipeline.smoother

    unit_to_mm = 0.035 / abs_scale * 1000.0
    print(f"{'t':>3} {'det_px':>8} {'innov_px':>9} {'valid':>5} {'rot_deg':>8} {'trans_mm':>9}")
    for i in range(t):
        pred_pose, _, _ = predict_next(carry.window, sm.cfg.dt, sm.cfg.vel_frame)
        kp, _, carry, pose = pipeline(frames[i], carry)
        kp = np.asarray(kp)
        det = float(np.median(np.linalg.norm(kp - kp_gt[i], axis=-1)))
        innov = keypoint_projection_residual(
            pred_pose,
            sm.intrinsics,
            jnp.asarray(kp),
            sm.points_body,
            sm.camera_pose,
        )
        inn = float(np.median(np.linalg.norm(np.asarray(innov), axis=-1)))
        rel = np.asarray(pose.rot).T @ rot_gt[i]
        rdeg = float(np.degrees(rotation_angle(rel[None]))[0])
        tmm = float(np.linalg.norm(np.asarray(pose.trans) - trans_gt[i]) * unit_to_mm)
        v = float(np.asarray(carry.valid)[-1])
        print(f"{i:>3} {det:8.2f} {inn:9.2f} {v:5.0f} {rdeg:8.2f} {tmm:9.1f}")
    print(json.dumps({"job": cfg.job_dir, "abs_scale": abs_scale}))


if __name__ == "__main__":
    main()
