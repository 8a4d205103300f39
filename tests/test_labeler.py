"""Round-trip test for the offline labeler: build a synthetic kubric-style
job dir (metadata.json + frames), label it, check schema + keypoint
geometry, then merge/prune the output end to end."""

import json
import os

import numpy as np

from perseus_tpu import lie
from perseus_tpu.data import schema
from perseus_tpu.datagen.label_dataset import LabelConfig, label_dataset


def _make_job(job_path: str, rng, frames=4, res=32):
    os.makedirs(job_path, exist_ok=True)
    # object straight ahead of a Blender camera looking along -Z from origin
    positions = [[0.0, 0.0, -0.5]] * frames
    quats_wxyz = [[1.0, 0.0, 0.0, 0.0]] * frames
    cam_positions = [[0.0, 0.0, 0.0]] * frames
    cam_quats = [[1.0, 0.0, 0.0, 0.0]] * frames
    metadata = {
        "flags": {"resolution": res},
        "camera": {
            "field_of_view": float(np.pi / 3),
            "positions": cam_positions,
            "quaternions": cam_quats,
        },
        "instances": [
            {"asset_id": "distractor", "positions": positions, "quaternions": quats_wxyz,
             "abs_scale": 1.0},
            {"asset_id": "mjc", "positions": positions, "quaternions": quats_wxyz,
             "abs_scale": 0.02},
        ],
    }
    with open(os.path.join(job_path, "metadata.json"), "w") as f:
        json.dump(metadata, f)
    for i in range(frames):
        schema.save_rgb_png(
            os.path.join(job_path, f"rgba_{i:05d}.png"),
            rng.uniform(0, 1, (res, res, 3)).astype(np.float32),
        )
        schema.save_depth_tiff(
            os.path.join(job_path, f"depth_{i:05d}.tiff"),
            rng.uniform(1, 5, (res, res)).astype(np.float32),
        )
        seg = np.zeros((res, res), np.uint8)
        seg[10:20, 10:20] = 2  # asset index 1 -> label 2
        schema.save_segmentation_png(os.path.join(job_path, f"segmentation_{i:05d}.png"), seg)


def test_label_dataset_roundtrip(tmp_path):
    import h5py

    rng = np.random.default_rng(5)
    job_dir = str(tmp_path / "run1")
    for jid in ("aaa", "bbb", "ccc"):
        _make_job(os.path.join(job_dir, jid), rng)

    cfg = LabelConfig(job_dir=job_dir, train_frac=0.67, frames=4, num_keypoints=8)
    out = label_dataset(cfg)
    with h5py.File(out, "r") as f:
        assert f.attrs["H"] == 32 and f.attrs["num_keypoints"] == 8
        assert f["train"]["pixel_coordinates"].shape == (2, 4, 8, 2)
        assert f["test"]["pixel_coordinates"].shape == (1, 4, 8, 2)
        assert f["train"]["images"].shape == (2, 4, 32, 32, 3)
        px = f["train"]["pixel_coordinates"][0, 0]
        # the identity-pose cube straight ahead projects around image center
        np.testing.assert_allclose(px.mean(axis=0), [16.0, 16.0], atol=0.5)
        # asset index of "mjc" in the instance list is 1
        assert int(f["train"]["asset_ids"][0, 0]) == 1
        # intrinsics follow f = W / (2 tan(fov/2))
        k = f["train"]["camera_intrinsics"][0, 0]
        np.testing.assert_allclose(k[0, 0], 32 / (2 * np.tan(np.pi / 6)), rtol=1e-6)


def test_label_dataset_tolerates_bad_job(tmp_path):
    rng = np.random.default_rng(6)
    job_dir = str(tmp_path / "run2")
    _make_job(os.path.join(job_dir, "good"), rng)
    os.makedirs(os.path.join(job_dir, "broken"))  # no metadata.json
    out = label_dataset(LabelConfig(job_dir=job_dir, train_frac=1.0, frames=4))
    import h5py

    with h5py.File(out, "r") as f:
        assert f["train"]["pixel_coordinates"].shape[0] == 1
