"""Pinhole camera model, pixel-coordinate conventions, and Blender->OpenCV.

Replaces three native/third-party roles from the reference stack:
  * kornia's (de)normalize_pixel_coordinates (reference:
    perseus/detector/augmentations.py:481, validate.py:144-153,
    scripts/streaming.py:129-131),
  * GTSAM's PinholeCameraCal3_S2 projection + Jacobians (reference:
    perseus/smoother/factors.py:257-261),
  * the pypose-based camera conversion / intrinsics-from-fov math in the
    labeler (reference: data_generation/data_utils.py:39-57).

All functions are pure jnp, broadcast over leading dims, and are jit/vmap
safe.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from perseus_tpu.lie import SE3, euler_xyz_to_rot, se3_compose, transform_to

__all__ = [
    "Intrinsics",
    "normalize_pixel_coordinates",
    "denormalize_pixel_coordinates",
    "intrinsics_from_fov",
    "intrinsics_matrix",
    "project",
    "project_jacobians",
    "blender_to_opencv_pose",
    "center_crop_hw",
]


class Intrinsics(NamedTuple):
    """Pinhole intrinsics (Cal3_S2-style, zero skew)."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray


def normalize_pixel_coordinates(coords: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Pixel coords (..., 2) as (u, v) -> [-1, 1] (kornia convention).

    u_norm = 2 u / (W - 1) - 1, v_norm = 2 v / (H - 1) - 1.
    """
    scale = jnp.array([2.0 / (width - 1.0), 2.0 / (height - 1.0)], dtype=coords.dtype)
    return coords * scale - 1.0


def denormalize_pixel_coordinates(coords: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Inverse of :func:`normalize_pixel_coordinates`."""
    scale = jnp.array([(width - 1.0) / 2.0, (height - 1.0) / 2.0], dtype=coords.dtype)
    return (coords + 1.0) * scale


def intrinsics_from_fov(fov: jnp.ndarray, height: int, width: int) -> Intrinsics:
    """Intrinsics from a field-of-view angle (radians):

    f = size / (2 tan(fov / 2)), principal point at the image center
    (reference labeler math: data_generation/data_utils.py:53-57).
    """
    f_x = width / (2.0 * jnp.tan(fov / 2.0))
    f_y = height / (2.0 * jnp.tan(fov / 2.0))
    return Intrinsics(f_x, f_y, jnp.full_like(f_x, width / 2.0), jnp.full_like(f_y, height / 2.0))


def intrinsics_matrix(k: Intrinsics) -> jnp.ndarray:
    """3x3 camera matrix (leading dims broadcast from the fields)."""
    zero = jnp.zeros_like(k.fx)
    one = jnp.ones_like(k.fx)
    return jnp.stack(
        [
            jnp.stack([k.fx, zero, k.cx], axis=-1),
            jnp.stack([zero, k.fy, k.cy], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )


def project(k: Intrinsics, p_cam: jnp.ndarray) -> jnp.ndarray:
    """Project camera-frame points (..., 3) to pixels (..., 2)."""
    z = p_cam[..., 2]
    u = k.fx * p_cam[..., 0] / z + k.cx
    v = k.fy * p_cam[..., 1] / z + k.cy
    return jnp.stack([u, v], axis=-1)


def project_jacobians(k: Intrinsics, p_cam: jnp.ndarray):
    """Returns (pixel (..., 2), d pixel / d p_cam (..., 2, 3)).

    [[fx/z, 0, -fx x/z^2], [0, fy/z, -fy y/z^2]].
    """
    x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    inv_z = 1.0 / z
    u = k.fx * x * inv_z + k.cx
    v = k.fy * y * inv_z + k.cy
    zero = jnp.zeros_like(z)
    row_u = jnp.stack([k.fx * inv_z + zero, zero, -k.fx * x * inv_z * inv_z], axis=-1)
    row_v = jnp.stack([zero, k.fy * inv_z + zero, -k.fy * y * inv_z * inv_z], axis=-1)
    return jnp.stack([u, v], axis=-1), jnp.stack([row_u, row_v], axis=-2)


def project_world_point(k: Intrinsics, camera_pose: SE3, p_world: jnp.ndarray) -> jnp.ndarray:
    """Project a world point through a camera at `camera_pose` (cam-to-world)."""
    return project(k, transform_to(camera_pose, p_world))


def blender_to_opencv_pose(camera_pose: SE3) -> SE3:
    """Convert a Blender camera pose (looks along -Z, +Y up) to OpenCV
    convention (+Z forward, -Y up) by right-composing a pi rotation about x
    (reference: data_generation/data_utils.py:39-47).
    """
    dtype = camera_pose.trans.dtype
    rot = euler_xyz_to_rot(jnp.array([jnp.pi, 0.0, 0.0], dtype=dtype))
    flip = SE3(rot, jnp.zeros(3, dtype=dtype))
    return se3_compose(camera_pose, flip)


def center_crop_hw(image: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Center-crop (..., H, W, C) images to (..., out_h, out_w, C).

    Matches the streaming path's H//2 +/- crop arithmetic (reference:
    scripts/streaming.py:79-80).
    """
    h, w = image.shape[-3], image.shape[-2]
    top = h // 2 - out_h // 2
    left = w // 2 - out_w // 2
    return image[..., top : top + out_h, left : left + out_w, :]
