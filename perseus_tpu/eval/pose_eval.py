"""Closed-loop pose-tracking accuracy: detector + smoother vs simulation GT.

The reference stack never closes this loop — its smoother runtime lives in
the out-of-repo DROP controller (SURVEY.md L4), so no artifact ever reports
pose error of the smoothed trajectory against ground truth. Here the full
runtime path (runtime/streaming.StreamingPipeline: preprocess -> trained
detector -> denormalize -> fixed-lag smoother) consumes a rendered
trajectory (datagen/generate.py job dir) and the smoothed SE(3) poses are
compared frame-by-frame against the ``metadata.json`` ground truth the
renderer wrote (generate.py:290-298) — translation RMSE in millimetres (via
the cube-scale unit convention: 1 scene unit = 0.035 m / abs_scale,
reference: augmentations.py:263) and rotation RMSE in degrees.

Frames are replayed with depth already in cube units
(StreamingConfig.depth_in_cube_units) and the smoother's corner geometry at
the cube's simulated abs_scale (StreamingConfig.corner_scale), so the exact
streaming program that would run against a ZED camera runs here against sim.
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax.numpy as jnp
import numpy as np

from perseus_tpu import lie
from perseus_tpu.camera import blender_to_opencv_pose
from perseus_tpu.data import schema
from perseus_tpu.runtime.streaming import StreamingConfig, StreamingPipeline
from perseus_tpu.smoother.lm import SmootherConfig

__all__ = ["evaluate_pose_tracking", "load_job_frames", "rotation_angle"]


def rotation_angle(rel: np.ndarray) -> np.ndarray:
    """Geodesic angle (radians) of rotation matrices ``rel`` (..., 3, 3).

    Uses the small-angle-stable form theta = 2 asin(||R - I||_F / (2 sqrt 2))
    below 90 deg — arccos((trace-1)/2) in float32 floors every angle under
    ~0.03 deg to exactly 0 (d(arccos)/dx -> inf at x=1 meets eps-level trace
    error), which made committed pose_median_deg a quantization artifact —
    and the arccos form above 90 deg where the asin form saturates instead.
    Evaluated in float64 either way.
    """
    rel = np.asarray(rel, np.float64)
    eye = np.eye(3, dtype=np.float64)
    fro = np.linalg.norm(rel - eye, axis=(-2, -1))
    small = 2.0 * np.arcsin(np.clip(fro / (2.0 * np.sqrt(2.0)), 0.0, 1.0))
    cos = np.clip((np.trace(rel, axis1=-2, axis2=-1) - 1.0) / 2.0, -1.0, 1.0)
    large = np.arccos(cos)
    return np.where(cos > 0.0, small, large)


def load_job_frames(job_dir: str) -> tuple[np.ndarray, dict]:
    """Loads a rendered job dir: ((T, H, W, 4) rgb+depth float32, metadata)."""
    with open(os.path.join(job_dir, "metadata.json")) as f:
        meta = json.load(f)
    t = int(meta["flags"]["frame_end"])
    frames = []
    for i in range(t):
        rgb = schema.load_rgb_png(os.path.join(job_dir, f"rgba_{i:05d}.png"))
        depth = schema.load_depth_tiff(os.path.join(job_dir, f"depth_{i:05d}.tiff"))
        frames.append(np.concatenate([rgb, depth[..., None]], axis=-1).astype(np.float32))
    return np.stack(frames), meta


def _gt_pose_in_camera(meta: dict) -> tuple[np.ndarray, np.ndarray, float]:
    """Per-frame GT cube pose in the OpenCV camera frame:
    T_co = (blender_to_opencv(T_wc))^-1 . T_wo. Returns (rot (T,3,3),
    trans (T,3), abs_scale)."""
    cube = meta["instances"][0]
    cam = meta["camera"]

    def to_rot(quats_wxyz):
        return np.stack(
            [np.asarray(lie.quat_wxyz_to_rot(jnp.asarray(q, jnp.float32))) for q in quats_wxyz]
        )

    r_wo = to_rot(cube["quaternions"])  # (T, 3, 3)
    p_wo = np.asarray(cube["positions"], np.float32)
    r_wc_b = to_rot(cam["quaternions"])
    p_wc = np.asarray(cam["positions"], np.float32)
    cam_cv = blender_to_opencv_pose(lie.SE3(jnp.asarray(r_wc_b), jnp.asarray(p_wc)))
    r_wc = np.asarray(cam_cv.rot)
    rot_co = np.einsum("tji,tjk->tik", r_wc, r_wo)  # R_wc^T R_wo
    trans_co = np.einsum("tji,tj->ti", r_wc, p_wo - p_wc)
    return rot_co, trans_co, float(cube["abs_scale"])


def evaluate_pose_tracking(
    job_dir: str,
    params: dict | None = None,
    batch_stats: dict | None = None,
    model_path: str = "",
    detector_fn=None,
    warmup: int | None = None,
    window: int = 12,
    in_channels: int = 4,
    amp: bool = True,
) -> dict:
    """Runs the streaming pipeline over a rendered trajectory and scores the
    smoothed poses against simulation GT.

    ``detector_fn`` (optional, (T, K, 2) pixel keypoints from frames) stubs
    the detector for pipeline-level tests; normally the trained model from
    ``params``/``model_path`` runs inside the jitted streaming step.
    Returns {pose_rmse_mm, pose_rmse_deg, trans_rmse_units, n_scored, ...}.
    """
    frames, meta = load_job_frames(job_dir)
    rot_gt, trans_gt, abs_scale = _gt_pose_in_camera(meta)
    t = frames.shape[0]
    fov = float(meta["camera"]["field_of_view"])
    fps = float(meta["flags"]["frame_rate"])
    if warmup is None:
        warmup = window  # score after the window has filled with real frames

    res = int(meta["flags"]["resolution"])
    cfg = StreamingConfig(
        model_path=model_path,
        num_channels=in_channels,
        model_h=res,
        model_w=res,
        amp=amp,
        smooth=True,
        # cold-start config: full accept/reject LM (the tracking-mode GN-4
        # config assumes a warm window; a fresh trajectory needs the
        # globalized solve, SmootherConfig's documented split)
        smoother=SmootherConfig(window=window, dt=1.0 / fps),
        camera_fov=fov,
        depth_in_cube_units=True,
        corner_scale=abs_scale,
    )
    if detector_fn is not None:
        kps_all = np.asarray(detector_fn(frames))  # (T, K, 2)
        pipeline = _stub_detector(cfg, kps_all)
        kp0 = jnp.asarray(kps_all[0])
    else:
        pipeline = StreamingPipeline(cfg, params=params, batch_stats=batch_stats)
        kp0, *_ = pipeline(frames[0], pipeline.init_carry())

    # cold-start near the truth: closed-form pose guess from the first
    # frame's detections (the PnP-init role)
    carry = pipeline.init_carry(pipeline.smoother.coarse_pose_from_keypoints(kp0))
    rots, trans, kps = [], [], []
    for i in range(t):
        frame = frames[i] if detector_fn is None else np.float32(i)
        kp, _, carry, pose = pipeline(frame, carry)
        rots.append(np.asarray(pose.rot))
        trans.append(np.asarray(pose.trans))
        kps.append(np.asarray(kp))
    rots, trans = np.stack(rots), np.stack(trans)

    sl = slice(warmup, t)
    terr = np.linalg.norm(trans[sl] - trans_gt[sl], axis=-1)  # scene units
    rel = np.einsum("tji,tjk->tik", rots[sl], rot_gt[sl])  # R_est^T R_gt
    rerr_deg = np.degrees(rotation_angle(rel))

    unit_to_mm = 0.035 / abs_scale * 1000.0
    return {
        "pose_rmse_mm": float(np.sqrt(np.mean(terr**2)) * unit_to_mm),
        "pose_rmse_deg": float(np.sqrt(np.mean(rerr_deg**2))),
        "pose_median_mm": float(np.median(terr) * unit_to_mm),
        "pose_median_deg": float(np.median(rerr_deg)),
        "trans_rmse_units": float(np.sqrt(np.mean(terr**2))),
        "n_scored": int(t - warmup),
        "n_frames": int(t),
        "abs_scale": abs_scale,
        "window": window,
        # per-frame error vectors so multi-video callers can pool exact
        # medians/percentiles instead of aggregating per-job aggregates
        "per_frame_rot_deg": rerr_deg.tolist(),
        "per_frame_trans_mm": (terr * unit_to_mm).tolist(),
    }


class _StubPipeline:
    """Pipeline stand-in that feeds precomputed keypoints to the real
    fixed-lag smoother (for CPU tests without a trained detector)."""

    def __init__(self, smoother, kps_all: np.ndarray):
        import jax

        self.smoother = smoother
        self.kps = jnp.asarray(kps_all, jnp.float32)
        self._update = jax.jit(smoother.update)  # eager LM would compile op-by-op

    def init_carry(self, initial_pose=None):
        return self.smoother.init(initial_pose)

    def __call__(self, frame_index, carry):
        kp = self.kps[int(frame_index)]
        carry, pose = self._update(carry, kp)
        return kp, None, carry, pose


def _stub_detector(cfg: StreamingConfig, kps_all: np.ndarray) -> _StubPipeline:
    from perseus_tpu.camera import intrinsics_from_fov
    from perseus_tpu.datagen.labeling import cube_corners
    from perseus_tpu.smoother.fixed_lag import FixedLagSmoother

    intr = intrinsics_from_fov(jnp.asarray(cfg.camera_fov), cfg.model_h, cfg.model_w)
    corner_scale = cfg.corner_scale or cfg.cube_scale
    smoother = FixedLagSmoother(
        cfg.smoother, intr, cube_corners(corner_scale).astype(jnp.float32)
    )
    return _StubPipeline(smoother, kps_all)


def main() -> None:
    from perseus_tpu.configs.cli import cli

    @dataclasses.dataclass(frozen=True)
    class PoseEvalConfig:
        job_dir: str = "outputs/scale_run/pose_eval_job"
        model_path: str = "outputs/models/scale_run/final"
        window: int = 12
        metrics_out: str = ""  # merge results into this metrics.json

    cfg = cli(PoseEvalConfig)
    result = evaluate_pose_tracking(
        cfg.job_dir, model_path=cfg.model_path, window=cfg.window
    )
    print(json.dumps(result, indent=2))
    if cfg.metrics_out:
        merged = {}
        if os.path.exists(cfg.metrics_out):
            with open(cfg.metrics_out) as f:
                merged = json.load(f)
        merged.update({k: result[k] for k in ("pose_rmse_mm", "pose_rmse_deg")})
        with open(cfg.metrics_out, "w") as f:
            json.dump(merged, f, indent=2)


if __name__ == "__main__":
    main()
