"""Closed-loop pose-tracking eval tests (eval/pose_eval.py): render a
trajectory, feed keypoints (GT-projected, optionally noised) through the
real fixed-lag smoother via the eval harness, and require the smoothed
SE(3) trajectory to track simulation ground truth."""

import numpy as np
import pytest

from perseus_tpu.datagen.generate import VideoConfig, generate_one_video
from perseus_tpu.datagen.labeling import label_trajectory
from perseus_tpu.eval.pose_eval import (
    evaluate_pose_tracking,
    load_job_frames,
    rotation_angle,
)


def _rot_about(axis, angle_rad):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    k = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    return np.eye(3) + np.sin(angle_rad) * k + (1 - np.cos(angle_rad)) * (k @ k)


def test_rotation_angle_small_angles_not_floored():
    """arccos((trace-1)/2) in f32 floors angles < ~0.03 deg to exactly 0
    (the committed round-3 pose_median_deg=0.0 artifact); the stable form
    must recover tiny angles to <=1e-3 deg absolute error."""
    for deg in (1e-3, 5e-3, 0.01, 0.02, 0.05, 0.1, 1.0, 10.0):
        rel = _rot_about([1.0, 2.0, 3.0], np.radians(deg)).astype(np.float32)
        got = np.degrees(rotation_angle(rel))
        assert abs(got - deg) <= 1e-3, (deg, got)
        assert got > 0.0


def test_rotation_angle_large_angles():
    for deg in (90.0, 120.0, 179.5, 180.0):
        rel = _rot_about([0.0, 1.0, 0.0], np.radians(deg))
        got = np.degrees(rotation_angle(rel))
        assert abs(got - deg) <= 1e-4, (deg, got)
    assert rotation_angle(np.eye(3)) == 0.0
    # batched input
    batch = np.stack([_rot_about([1, 0, 0], np.radians(d)) for d in (0.01, 45.0, 170.0)])
    got = np.degrees(rotation_angle(batch))
    np.testing.assert_allclose(got, [0.01, 45.0, 170.0], atol=1e-4)


@pytest.fixture(scope="module")
def pose_job(tmp_path_factory):
    root = tmp_path_factory.mktemp("pose_eval")
    cfg = VideoConfig(
        job_dir=str(root),
        resolution=64,
        frames=40,
        n_static_range=(2, 3),
        n_dynamic_range=(1, 1),
        max_objects=5,
        seed=11,
    )
    return generate_one_video(cfg, job_id="poseeval")


def _gt_keypoints(job_dir):
    import json
    import os

    import jax.numpy as jnp

    with open(os.path.join(job_dir, "metadata.json")) as f:
        meta = json.load(f)
    cube = meta["instances"][0]
    obj7 = np.concatenate(
        [np.asarray(cube["positions"]), np.asarray(cube["quaternions"])], axis=-1
    )
    cam7 = np.concatenate(
        [np.asarray(meta["camera"]["positions"]), np.asarray(meta["camera"]["quaternions"])],
        axis=-1,
    )
    res = int(meta["flags"]["resolution"])
    return np.asarray(
        label_trajectory(
            jnp.asarray(obj7, jnp.float32),
            jnp.asarray(cam7, jnp.float32),
            cube["abs_scale"],
            meta["camera"]["field_of_view"],
            res,
            res,
        )
    )


def test_pose_tracking_with_perfect_detector(pose_job):
    """GT-projected keypoints through the smoother recover the GT pose to
    millimetre/degree level after warmup — validates the whole eval loop
    (camera conversion, unit convention, smoother frames) end to end."""
    gt_kps = _gt_keypoints(pose_job)
    result = evaluate_pose_tracking(
        pose_job, detector_fn=lambda frames: gt_kps, window=8
    )
    assert result["n_scored"] >= 30
    # measured ~1.7 mm / ~3.2 deg: translation is sub-mm-accurate per frame;
    # rotation shows transient spikes at ground-bounce frames where the
    # constant-velocity prior resists the impact's velocity discontinuity
    assert result["pose_rmse_mm"] < 5.0, result
    assert result["pose_rmse_deg"] < 6.0, result


def test_pose_tracking_with_noisy_detector_smooths(pose_job):
    """With pixel noise on the detections, the smoothed trajectory still
    tracks GT (the smoother's purpose)."""
    gt_kps = _gt_keypoints(pose_job)
    noisy = gt_kps + np.random.default_rng(3).normal(0, 1.0, gt_kps.shape).astype(np.float32)
    result = evaluate_pose_tracking(
        pose_job, detector_fn=lambda frames: noisy, window=8
    )
    assert result["pose_rmse_mm"] < 12.0, result
    assert result["pose_rmse_deg"] < 12.0, result


def test_load_job_frames_shapes(pose_job):
    frames, meta = load_job_frames(pose_job)
    assert frames.shape == (40, 64, 64, 4)
    assert np.isfinite(frames).all()
    assert meta["instances"][0]["asset_id"] == "mjc"
