"""End-to-end tests: augmentation pipeline contract, labeling math,
streaming pipeline, validate/validate_real, visualize tools, graft entries."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from perseus_tpu import lie
from perseus_tpu.augment.pipeline import AugmentationConfig, KeypointAugmentation
from perseus_tpu.camera import denormalize_pixel_coordinates, intrinsics_from_fov, project
from perseus_tpu.data.dataset import KeypointDatasetConfig, PrunedKeypointDataset
from perseus_tpu.data.synthetic import generate_synthetic_pruned_dataset
from perseus_tpu.datagen.labeling import cube_corners, get_pixel_coordinates

RNG = np.random.default_rng(21)

LIGHT_AUG = AugmentationConfig(
    planckian_jitter=False, blur=False, random_plasma_shadow=False, color_jiggle=False
)


# ----------------------- augmentation pipeline contract --------------------


def test_pipeline_val_mode_deterministic_and_normalized():
    aug = KeypointAugmentation(AugmentationConfig(), train=False)
    images = jnp.asarray(RNG.uniform(0, 1, (2, 32, 32, 4)).astype(np.float32))
    coords = jnp.asarray(RNG.uniform(0, 31, (2, 8, 2)).astype(np.float32))
    out1, c1 = aug(jax.random.key(0), images, coords)
    out2, c2 = aug(jax.random.key(1), images, coords)  # key must not matter
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    # coords normalized to [-1, 1]; round-trip through denormalize
    assert np.asarray(c1).min() >= -1.0 and np.asarray(c1).max() <= 1.0
    back = denormalize_pixel_coordinates(np.asarray(c1).reshape(2, 8, 2), 32, 32)
    np.testing.assert_allclose(back, np.asarray(coords), atol=1e-5)
    # RGB untouched in val mode
    np.testing.assert_array_equal(np.asarray(out1)[..., :3], np.asarray(images)[..., :3])


def test_pipeline_train_mode_shapes_and_coordconsistency():
    aug = KeypointAugmentation(LIGHT_AUG, train=True)
    images = jnp.asarray(RNG.uniform(0, 1, (4, 32, 32, 5)).astype(np.float32))
    coords = jnp.asarray(RNG.uniform(4, 28, (4, 8, 2)).astype(np.float32))
    out, c = jax.jit(lambda k, i, p: aug(k, i, p))(jax.random.key(2), images, coords)
    assert out.shape == (4, 32, 32, 5)
    assert c.shape == (4, 8, 2)
    assert np.isfinite(np.asarray(out)).all() and np.isfinite(np.asarray(c)).all()


def test_pipeline_flat_coords_shape_preserved():
    aug = KeypointAugmentation(AugmentationConfig(), train=False)
    images = jnp.asarray(RNG.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    coords_flat = jnp.asarray(RNG.uniform(0, 31, (2, 16)).astype(np.float32))
    _, c = aug(jax.random.key(0), images, coords_flat)
    assert c.shape == (2, 16)


# ------------------------------- labeling ----------------------------------


def test_labeling_projects_identity_camera():
    """An object at z=-d in front of a Blender camera at the origin projects
    near the principal point."""
    corners = cube_corners(0.02)
    obj = jnp.asarray([[0.0, 0.0, -0.5, 0.0, 0.0, 0.0, 1.0]])  # xyzw identity quat
    cam = jnp.asarray([[0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0]])
    px = get_pixel_coordinates(corners, obj, cam, fov=np.pi / 3, height=256, width=256)
    assert px.shape == (1, 8, 2)
    center = np.asarray(px).mean(axis=1)[0]
    np.testing.assert_allclose(center, [128.0, 128.0], atol=1.0)
    # corners spread symmetrically around the center
    assert np.asarray(px).std() > 1.0


def test_labeling_matches_manual_projection():
    """Cross-check against composing the transforms by hand."""
    rng = np.random.default_rng(3)
    corners = cube_corners(0.035)
    obj7 = np.concatenate([rng.normal(size=3) * 0.1 + [0, 0, -0.5], np.asarray(
        lie.rot_to_quat_xyzw(lie.so3_exp(jnp.asarray(rng.normal(size=3) * 0.2))))])
    cam7 = np.asarray([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0])
    px = get_pixel_coordinates(
        corners, jnp.asarray(obj7[None]), jnp.asarray(cam7[None]), np.pi / 2, 256, 256
    )

    # manual: world -> blender cam at origin -> opencv flip -> project
    obj_pose = lie.pose7_xyzw_to_se3(jnp.asarray(obj7))
    p_world = lie.transform_from(lie.SE3(obj_pose.rot[None], obj_pose.trans[None]), corners)
    flip = lie.euler_xyz_to_rot(jnp.asarray([np.pi, 0.0, 0.0]))
    p_cv = jnp.einsum("ij,kj->ki", flip.T, p_world)
    k = intrinsics_from_fov(jnp.asarray(np.pi / 2), 256, 256)
    expected = project(k, p_cv)
    np.testing.assert_allclose(np.asarray(px)[0], np.asarray(expected), atol=1e-4)


# ------------------------------ streaming ----------------------------------


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e_root")
    generate_synthetic_pruned_dataset(str(root), n_train=8, n_test=4, h=32, w=32)
    return str(root)


def test_streaming_pipeline_end_to_end(synth_root):
    from perseus_tpu.models import resnet
    from perseus_tpu.runtime.sources import SyntheticSource
    from perseus_tpu.runtime.streaming import StreamingConfig, StreamingPipeline
    from perseus_tpu.smoother.lm import SmootherConfig

    params, stats = resnet.init_keypoint_cnn(jax.random.key(0), 8, 4)
    cfg = StreamingConfig(
        num_channels=4,
        model_h=32,
        model_w=32,
        amp=False,
        smooth=True,
        smoother=SmootherConfig(window=4, max_iterations=2, n_keypoints=8),
    )
    pipeline = StreamingPipeline(cfg, params=params, batch_stats=stats)
    carry = pipeline.init_carry()
    source = SyntheticSource(height=48, width=64, depth=True)
    for _ in range(3):
        keypoints, image, carry, pose = pipeline(source.get_frame(), carry)
    assert keypoints.shape == (8, 2)
    assert image.shape == (32, 32, 4)
    assert np.isfinite(np.asarray(keypoints)).all()
    assert np.isfinite(np.asarray(pose.trans)).all()
    # depth channel was scaled into cube units and NaN-cleaned
    assert np.isfinite(np.asarray(image)).all()


def test_streaming_nan_depth_cleaned():
    from perseus_tpu.models import resnet
    from perseus_tpu.runtime.streaming import StreamingConfig, StreamingPipeline

    params, stats = resnet.init_keypoint_cnn(jax.random.key(1), 8, 4)
    cfg = StreamingConfig(num_channels=4, model_h=32, model_w=32, amp=False, smooth=False)
    pipeline = StreamingPipeline(cfg, params=params, batch_stats=stats)
    frame = RNG.uniform(0, 1, (48, 48, 4)).astype(np.float32)
    frame[::3, ::3, 3] = np.nan
    frame[1::3, 1::3, 3] = np.inf
    keypoints, image, _, _ = pipeline(frame, None)
    assert np.isfinite(np.asarray(image)).all()
    assert np.isfinite(np.asarray(keypoints)).all()


# ----------------------------- eval scripts --------------------------------


def test_validate_on_synthetic(synth_root, tmp_path):
    import perseus_tpu
    from perseus_tpu.models import resnet
    from perseus_tpu.train import checkpoint as ckpt
    from perseus_tpu.eval import validate as val_mod

    params, stats = resnet.init_keypoint_cnn(jax.random.key(2), 8, 4)
    ckpt_dir = str(tmp_path / "model")
    ckpt.save_train_state(ckpt_dir, {"params": params, "batch_stats": stats})

    cfg = val_mod.ValConfig(
        model_path=ckpt_dir,
        batch_size=4,
        dataset_config=KeypointDatasetConfig(
            dataset_path=os.path.join(synth_root, "data", "synth", "pruned.hdf5")
        ),
        depth=True,
        amp=False,
        max_plots=2,
    )
    result = val_mod.validate(cfg)
    assert np.isfinite(result["stats"]["mean"])
    assert result["rmse_px"] > 0
    out = result["output_dir"]
    assert os.path.exists(os.path.join(out, "loss_histogram.png"))
    assert os.path.exists(os.path.join(out, "val_0.png"))


def test_validate_real_on_synthetic(synth_root, tmp_path):
    from perseus_tpu.models import resnet
    from perseus_tpu.train import checkpoint as ckpt
    from perseus_tpu.eval import validate_real as vr

    params, stats = resnet.init_keypoint_cnn(jax.random.key(3), 8, 3)
    ckpt_dir = str(tmp_path / "model_rgb")
    ckpt.save_train_state(ckpt_dir, {"params": params, "batch_stats": stats})

    img_dir = os.path.join(synth_root, "data", "synth", "train")
    cfg = vr.ValConfig(
        model_path=ckpt_dir,
        in_channels=3,
        dataset_cfg=KeypointDatasetConfig(dataset_path=img_dir),
        amp=False,
        model_h=32,
        model_w=32,
        save_every=4,
    )
    written = vr.validate(cfg)
    assert len(written) >= 1
    assert all(os.path.exists(p) for p in written)


def test_visualize_tools(synth_root, tmp_path):
    from perseus_tpu.eval.visualize import (
        VisualizeConfig,
        visualize_augmentations,
        visualize_data,
        visualize_segmentation_ratios,
    )

    cfg = VisualizeConfig(
        dataset_config=KeypointDatasetConfig(
            dataset_path=os.path.join(synth_root, "data", "synth", "pruned.hdf5")
        ),
        augmentation_config=LIGHT_AUG,
        num_images=4,
        output_dir=str(tmp_path / "viz"),
    )
    assert os.path.exists(visualize_data(cfg))
    assert os.path.exists(visualize_augmentations(cfg))
    assert os.path.exists(visualize_segmentation_ratios(cfg))


def test_eval_sensor_transfer_script(synth_root, tmp_path):
    """The cross-domain probe runs end-to-end and the sensor pass really
    perturbs the inputs (same labels, different images -> different RMSE
    for an untrained net is not guaranteed, so assert finiteness + record
    shape instead)."""
    import json
    import runpy
    import sys

    from perseus_tpu.models import resnet
    from perseus_tpu.train import checkpoint as ckpt

    params, stats = resnet.init_keypoint_cnn(jax.random.key(4), 8, 4)
    ckpt_dir = str(tmp_path / "model_fx")
    ckpt.save_train_state(ckpt_dir, {"params": params, "batch_stats": stats})

    out_json = str(tmp_path / "sensor_transfer.json")
    argv_prev = sys.argv
    sys.argv = [
        "eval_sensor_transfer",
        "--checkpoint", ckpt_dir,
        "--dataset-path", os.path.join(synth_root, "data", "synth", "pruned.hdf5"),
        "--batch-size", "4",
        "--no-amp",
        "--output", out_json,
    ]
    try:
        runpy.run_path(
            os.path.join(os.path.dirname(__file__), "..", "scripts", "eval_sensor_transfer.py"),
            run_name="__main__",
        )
    finally:
        sys.argv = argv_prev
    with open(out_json) as f:
        rec = json.loads(f.read())
    assert np.isfinite(rec["clean_rmse_px"]) and rec["clean_rmse_px"] > 0
    assert np.isfinite(rec["sensor_rmse_px"]) and rec["sensor_rmse_px"] > 0
    assert rec["n_frames"] > 0
    assert rec["delta_px"] == rec["sensor_rmse_px"] - rec["clean_rmse_px"]


# ----------------------------- graft entries -------------------------------


def test_graft_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (args[0].shape[0], 16)
    assert np.isfinite(np.asarray(out)).all()


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
