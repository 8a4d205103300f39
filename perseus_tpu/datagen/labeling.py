"""Keypoint labeling math in JAX: project cube corners to pixels.

Re-implements the reference labeler's math (reference:
data_generation/data_utils.py:17-66 and
generate_and_label_keypoints.py:175-318) without pypose/torch:
Blender->OpenCV camera conversion, intrinsics from fov, and projection of
the 8 scaled cube corners through per-frame object/camera poses. Vectorized
over frames (and batchable over trajectories with vmap) — the whole
trajectory labels in one jitted call.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from perseus_tpu import camera, lie

__all__ = ["cube_corners", "get_pixel_coordinates", "label_trajectory"]


def cube_corners(scale: jnp.ndarray | float) -> jnp.ndarray:
    """The 8 cube corners (+/-1 per axis) scaled by `scale`, matching the
    reference's corner ordering (generate_and_label_keypoints.py:187):
    itertools.product order over (x, y, z) in {-1, +1}."""
    signs = np.array(
        [
            [-1, -1, -1],
            [-1, -1, 1],
            [-1, 1, -1],
            [-1, 1, 1],
            [1, -1, -1],
            [1, -1, 1],
            [1, 1, -1],
            [1, 1, 1],
        ],
        dtype=np.float32,
    )
    return jnp.asarray(signs) * scale


def get_pixel_coordinates(
    keypoints: jnp.ndarray,
    object_poses7_xyzw: jnp.ndarray,
    camera_poses7_xyzw: jnp.ndarray,
    fov: float,
    height: int,
    width: int,
) -> jnp.ndarray:
    """Projects object-frame keypoints to pixels for every frame.

    Args:
        keypoints: (K, 3) points in the object frame.
        object_poses7_xyzw: (T, 7) object-to-world poses [xyz, quat xyzw].
        camera_poses7_xyzw: (T, 7) Blender camera-to-world poses.
        fov: camera field of view (radians).

    Returns:
        (T, K, 2) pixel coordinates (u, v).
    """
    obj = lie.pose7_xyzw_to_se3(object_poses7_xyzw)
    cam = lie.pose7_xyzw_to_se3(camera_poses7_xyzw)
    cam_cv = camera.blender_to_opencv_pose(cam)

    # camera_from_object = cam^-1 . obj
    cam_from_obj = lie.se3_compose(lie.se3_inverse(cam_cv), obj)
    k = camera.intrinsics_from_fov(jnp.asarray(fov, dtype=keypoints.dtype), height, width)

    p_cam = lie.transform_from(
        lie.SE3(cam_from_obj.rot[:, None], cam_from_obj.trans[:, None]), keypoints[None, :, :]
    )  # (T, K, 3)
    return camera.project(k, p_cam)


def label_trajectory(
    object_poses7_wxyz: jnp.ndarray,
    camera_poses7_wxyz: jnp.ndarray,
    abs_scale: jnp.ndarray | float,
    fov: float,
    height: int,
    width: int,
) -> jnp.ndarray:
    """Labels one trajectory from kubric-style metadata (quaternions wxyz,
    as written in metadata.json). Returns (T, 8, 2) pixel coordinates."""

    def to_xyzw(p7):
        return jnp.concatenate([p7[..., :3], p7[..., 4:7], p7[..., 3:4]], axis=-1)

    corners = cube_corners(abs_scale)
    return get_pixel_coordinates(
        corners, to_xyzw(object_poses7_wxyz), to_xyzw(camera_poses7_wxyz), fov, height, width
    )
