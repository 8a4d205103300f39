"""Tests for the camera module: projection Jacobians vs autodiff, pixel
coordinate (de)normalization round-trips and kornia-convention endpoints."""

import jax
import jax.numpy as jnp
import numpy as np

from perseus_tpu import camera, lie

RNG = np.random.default_rng(1)


def test_normalize_denormalize_roundtrip():
    coords = jnp.asarray(RNG.uniform(0, 255, size=(10, 8, 2)))
    n = camera.normalize_pixel_coordinates(coords, 256, 256)
    back = camera.denormalize_pixel_coordinates(n, 256, 256)
    np.testing.assert_allclose(np.asarray(back), np.asarray(coords), atol=1e-9)


def test_normalize_kornia_convention_endpoints():
    """kornia maps pixel 0 -> -1 and pixel (size-1) -> +1."""
    corners = jnp.array([[0.0, 0.0], [255.0, 255.0], [127.5, 127.5]])
    n = camera.normalize_pixel_coordinates(corners, 256, 256)
    np.testing.assert_allclose(
        np.asarray(n), np.array([[-1.0, -1.0], [1.0, 1.0], [0.0, 0.0]]), atol=1e-12
    )
    # non-square images normalize per-axis: coords are (u, v) = (x, y)
    n2 = camera.normalize_pixel_coordinates(jnp.array([31.0, 63.0]), 64, 32)
    np.testing.assert_allclose(np.asarray(n2), np.array([1.0, 1.0]), atol=1e-12)


def test_intrinsics_from_fov():
    k = camera.intrinsics_from_fov(jnp.asarray(np.pi / 2), 256, 256)
    # f = W / (2 tan(fov/2)) = 256/2 = 128 for fov = 90deg
    np.testing.assert_allclose(float(k.fx), 128.0, atol=1e-9)
    m = camera.intrinsics_matrix(k)
    assert m.shape == (3, 3)
    np.testing.assert_allclose(np.asarray(m)[0], [128.0, 0.0, 128.0], atol=1e-9)


def test_projection_jacobian_vs_autodiff():
    k = camera.Intrinsics(
        fx=jnp.asarray(200.0), fy=jnp.asarray(210.0), cx=jnp.asarray(128.0), cy=jnp.asarray(127.0)
    )
    p = jnp.asarray([0.3, -0.2, 1.7])
    pix, d_point = camera.project_jacobians(k, p)
    np.testing.assert_allclose(np.asarray(pix), np.asarray(camera.project(k, p)), atol=1e-12)
    jac_auto = jax.jacfwd(lambda q: camera.project(k, q))(p)
    np.testing.assert_allclose(np.asarray(d_point), np.asarray(jac_auto), atol=1e-9)


def test_blender_to_opencv():
    """A Blender camera at identity looks along -Z; after conversion, a point
    in front of the (Blender) camera must have positive OpenCV z."""
    cam = lie.se3_identity(dtype=jnp.float64)
    cam_cv = camera.blender_to_opencv_pose(cam)
    p_world = jnp.asarray([0.0, 0.0, -2.0])  # in front of a -Z-looking camera
    p_cam = lie.transform_to(cam_cv, p_world)
    assert float(p_cam[2]) > 0
    np.testing.assert_allclose(np.asarray(p_cam), [0.0, 0.0, 2.0], atol=1e-12)


def test_center_crop():
    img = jnp.arange(10 * 8 * 3, dtype=jnp.float32).reshape(10, 8, 3)
    out = camera.center_crop_hw(img, 4, 4)
    assert out.shape == (4, 4, 3)
    # rows 3..6, cols 2..5 (H//2 - out//2 arithmetic)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img[3:7, 2:6]))
