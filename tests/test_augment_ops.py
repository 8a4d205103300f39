"""Differential + property tests for the augmentation primitives.

Oracles: straight-line numpy re-derivations of the reference's mask algebra,
cv2 (warpAffine, GaussianBlur) for the geometry/filter kernels, and
matplotlib's HSV conversions for hue adjustment.
"""

import cv2
import jax
import jax.numpy as jnp
import matplotlib.colors as mcolors
import numpy as np

from perseus_tpu.augment import ops

RNG = np.random.default_rng(3)


def _rand_batch5(b=4, h=32, w=32):
    rgb = RNG.uniform(0, 1, size=(b, h, w, 3))
    depth = RNG.uniform(5, 20, size=(b, h, w, 1))
    seg = (RNG.uniform(size=(b, h, w, 1)) < 0.15).astype(np.float64)
    return np.concatenate([rgb, depth, seg], axis=-1).astype(np.float32)


# ------------------------------ depth ops ---------------------------------


def test_depth_bias_statistics():
    depth = jnp.ones((8, 64, 64), dtype=jnp.float32) * 10.0
    out = ops.depth_bias(jax.random.key(0), depth, dev=0.02, p=0.5, cube_scale=0.035)
    delta = (np.asarray(out) - 10.0) * 0.035
    # ~half the pixels biased; survivors scaled by 1/(1-p)=2 -> |bias| <= 0.04
    frac_biased = np.mean(np.abs(delta) > 1e-9)
    assert 0.45 < frac_biased < 0.55
    assert np.max(np.abs(delta)) <= 0.04 + 1e-6
    assert np.max(np.abs(delta)) > 0.03  # the widened range is actually used


def test_depth_gaussian_noise_statistics():
    depth = jnp.zeros((4, 128, 128), dtype=jnp.float32)
    out = ops.depth_gaussian_noise(jax.random.key(1), depth, std=0.005, cube_scale=0.035)
    scaled = np.asarray(out) * 0.035
    assert abs(np.std(scaled) - 0.005) < 3e-4
    assert abs(np.mean(scaled)) < 1e-4


def test_depth_plane_clamp_deterministic():
    cube_scale = 0.035
    depth = jnp.asarray([0.05, 0.1 - 1e-6, 0.25, 0.5 + 1e-4, 0.9]) / cube_scale
    out = ops.depth_plane_clamp(depth, cube_scale=cube_scale)
    scaled = np.asarray(out) * cube_scale
    np.testing.assert_allclose(scaled, [0.0, 0.0, 0.25, 0.0, 0.0], atol=1e-6)


def test_depth_plane_randomized_bounds():
    cube_scale = 0.035
    depth = jnp.full((16, 32, 32), 0.3 / cube_scale, dtype=jnp.float32)
    out = ops.depth_plane(jax.random.key(2), depth, cube_scale=cube_scale)
    # 0.3m is well inside [0.1 +/- 0.1, 0.5 -/+ 0.1] -> untouched
    np.testing.assert_allclose(np.asarray(out), np.asarray(depth), atol=1e-6)
    # 0.01m is below the near plane unless the sampled plane dips under it:
    # P(keep) * P(0.1 + 0.1 u < 0.01) = 0.5 * 0.045 ~ 2.3% of pixels survive
    near = jnp.full((16, 32, 32), 0.01 / cube_scale, dtype=jnp.float32)
    out_near = np.asarray(ops.depth_plane(jax.random.key(3), near, cube_scale=cube_scale))
    survive_frac = np.mean(out_near > 0)
    assert 0.01 < survive_frac < 0.04
    assert np.all((out_near == 0) | (np.abs(out_near - 0.01 / cube_scale) < 1e-5))


# --------------------------- transplantation ------------------------------


def _transplant_oracle(images_nchw_like: np.ndarray, donor_idx: np.ndarray, lb, ub):
    """Straight-line numpy re-derivation of the reference mask algebra
    (reference: augmentations.py:188-251), in NHWC."""
    imgs = images_nchw_like
    rgb, depth, seg = imgs[..., :3], imgs[..., 3], imgs[..., 4]
    donor = imgs[donor_idx]
    d_rgb, d_depth, d_seg = donor[..., :3], donor[..., 3], donor[..., 4]

    acc_cube = seg == 1.0
    mask = ~acc_cube
    mask |= (d_depth * acc_cube) < (depth * acc_cube)
    d_cube = d_seg == 1.0
    mask = np.where(d_cube, False, mask)

    new_rgb = np.where(mask[..., None], d_rgb, rgb)
    new_depth = np.where(mask, d_depth, depth)
    new_seg = 1.0 - mask.astype(imgs.dtype)
    new_seg = np.where(d_cube & ~acc_cube, 0.0, new_seg)
    cand = np.concatenate([new_rgb, new_depth[..., None], new_seg[..., None]], axis=-1)
    ratio = new_seg.mean(axis=(1, 2))
    ok = (ratio >= lb) & (ratio <= ub)
    return np.where(ok[:, None, None, None], cand, imgs)


def test_transplant_matches_oracle():
    imgs = _rand_batch5(b=6)
    key = jax.random.key(4)
    out = ops.transplant_with_depth(key, jnp.asarray(imgs))
    # recover the donor permutation the op used
    offsets = jax.random.randint(key, (6,), 1, 6)
    donor_idx = (np.arange(6) + np.asarray(offsets)) % 6
    expected = _transplant_oracle(imgs, donor_idx, 0.02, 0.7)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-6)


# ------------------------------- affine -----------------------------------


def test_affine_identity_when_not_applied():
    imgs = jnp.asarray(RNG.uniform(0, 1, size=(2, 16, 16, 3)).astype(np.float32))
    params = {
        "angle": jnp.asarray([30.0, 30.0]),
        "tx": jnp.asarray([2.0, 2.0]),
        "ty": jnp.asarray([1.0, 1.0]),
        "scale": jnp.asarray([1.2, 1.2]),
        "shear_x": jnp.asarray([0.1, 0.1]),
        "shear_y": jnp.asarray([0.0, 0.0]),
        "applied": jnp.asarray([False, True]),
    }
    mats = ops.affine_matrices(params, 16, 16)
    np.testing.assert_allclose(np.asarray(mats[0]), np.eye(3), atol=1e-7)
    out = ops.warp_affine_bilinear(imgs, mats)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(imgs[0]), atol=1e-5)


def test_warp_affine_matches_cv2():
    img = RNG.uniform(0, 1, size=(64, 64, 3)).astype(np.float32)
    params = {
        "angle": jnp.asarray([25.0]),
        "tx": jnp.asarray([3.0]),
        "ty": jnp.asarray([-2.0]),
        "scale": jnp.asarray([1.1]),
        "shear_x": jnp.asarray([0.05]),
        "shear_y": jnp.asarray([-0.03]),
        "applied": jnp.asarray([True]),
    }
    mats = ops.affine_matrices(params, 64, 64)
    out = np.asarray(ops.warp_affine_bilinear(jnp.asarray(img[None]), mats))[0]
    m_cv = np.asarray(mats)[0, :2, :]
    expected = cv2.warpAffine(
        img, m_cv, (64, 64), flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT
    )
    # cv2 uses 5-bit fixed-point interpolation weights; compare loosely on
    # the interior (borders differ by the valid-pixel convention)
    np.testing.assert_allclose(out[4:-4, 4:-4], expected[4:-4, 4:-4], atol=0.04)


def test_keypoints_follow_image_warp():
    """A bright dot warps to where the transformed keypoint lands."""
    h = w = 65
    kp = np.array([[20.0, 40.0]])  # (u, v)
    img = np.zeros((h, w, 3), dtype=np.float32)
    img[int(kp[0, 1]), int(kp[0, 0])] = 1.0
    params = {
        "angle": jnp.asarray([37.0]),
        "tx": jnp.asarray([4.0]),
        "ty": jnp.asarray([-3.0]),
        "scale": jnp.asarray([1.25]),
        "shear_x": jnp.asarray([0.0]),
        "shear_y": jnp.asarray([0.0]),
        "applied": jnp.asarray([True]),
    }
    mats = ops.affine_matrices(params, h, w)
    warped = np.asarray(ops.warp_affine_bilinear(jnp.asarray(img[None]), mats))[0]
    new_kp = np.asarray(ops.transform_keypoints(jnp.asarray(kp[None]), mats))[0, 0]
    # center of mass of the warped dot == transformed keypoint
    total = warped[..., 0].sum()
    ys, xs = np.mgrid[0:h, 0:w]
    com_x = (warped[..., 0] * xs).sum() / total
    com_y = (warped[..., 0] * ys).sum() / total
    np.testing.assert_allclose([com_x, com_y], new_kp, atol=0.05)


# ------------------------------ erasing -----------------------------------


def test_random_erasing_properties():
    imgs = jnp.ones((32, 64, 64, 4), dtype=jnp.float32)
    out = np.asarray(ops.random_erasing(jax.random.key(5), imgs, p=1.0, scale=(0.02, 0.1)))
    erased_frac = 1.0 - out.mean(axis=(1, 2, 3))
    assert np.all(erased_frac > 0.0)
    assert np.all(erased_frac < 0.15)
    # erased pixels are exactly value across all channels
    zero_mask = out[..., 0] == 0.0
    for ch in range(4):
        np.testing.assert_array_equal(out[..., ch] == 0.0, zero_mask)
    # p=0 -> no-op
    out0 = np.asarray(ops.random_erasing(jax.random.key(6), imgs, p=0.0))
    np.testing.assert_array_equal(out0, np.asarray(imgs))


# ------------------------------ RGB ops -----------------------------------


def test_planckian_jitter_green_fixed():
    rgb = jnp.full((8, 8, 8, 3), 0.5, dtype=jnp.float32)
    out = np.asarray(ops.planckian_jitter(jax.random.key(7), rgb, p=1.0))
    np.testing.assert_allclose(out[..., 1], 0.5, atol=1e-6)  # green unchanged
    assert out.min() >= 0.0 and out.max() <= 1.0
    # warm temperatures boost red over blue and vice versa: some variety
    assert np.std(out[..., 0].mean(axis=(1, 2))) > 0.01


def test_color_jiggle_bounds_and_identity():
    rgb = jnp.asarray(RNG.uniform(0, 1, size=(4, 16, 16, 3)).astype(np.float32))
    out = np.asarray(ops.color_jiggle(jax.random.key(8), rgb))
    assert out.min() >= 0.0 and out.max() <= 1.0
    # zero-strength jiggle is the identity
    out_id = np.asarray(
        ops.color_jiggle(jax.random.key(9), rgb, brightness=0.0, contrast=0.0, saturation=0.0, hue=0.0)
    )
    np.testing.assert_allclose(out_id, np.asarray(rgb), atol=1e-5)


def test_hue_adjust_matches_matplotlib():
    rgb = RNG.uniform(0, 1, size=(1, 8, 8, 3)).astype(np.float32)
    shift = np.array([0.1], dtype=np.float32)
    out = np.asarray(ops._adjust_hue(jnp.asarray(rgb), jnp.asarray(shift)))
    hsv = mcolors.rgb_to_hsv(rgb[0])
    hsv[..., 0] = (hsv[..., 0] + 0.1) % 1.0
    expected = mcolors.hsv_to_rgb(hsv)
    np.testing.assert_allclose(out[0], expected, atol=1e-4)


def test_gaussian_blur_matches_cv2():
    img = RNG.uniform(0, 1, size=(32, 32, 3)).astype(np.float32)

    # force a known sigma by monkey-building the taps: use sigma range of
    # width zero so the sampled sigma is deterministic
    out = np.asarray(
        ops.gaussian_blur_5x5(jax.random.key(10), jnp.asarray(img[None]), sigma_range=(4.0, 4.0), p=1.0)
    )[0]
    expected = cv2.GaussianBlur(img, (5, 5), 4.0, borderType=cv2.BORDER_REFLECT_101)
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_plasma_shadow_darkens_only():
    rgb = jnp.asarray(RNG.uniform(0.3, 1, size=(4, 32, 32, 3)).astype(np.float32))
    out = np.asarray(ops.plasma_shadow(jax.random.key(11), rgb, p=1.0))
    assert np.all(out <= np.asarray(rgb) + 1e-6)
    assert out.min() >= 0.0


def test_mxu_warp_exact_for_axis_aligned():
    """The MXU two-pass warp equals the gather warp exactly when the affine
    has no rotation/shear (the passes decouple)."""
    rng = np.random.default_rng(12)
    b, h, w, c = 4, 32, 32, 3
    images = jnp.asarray(rng.uniform(0, 1, (b, h, w, c)).astype(np.float32))
    params = {
        "angle": jnp.zeros(b), "shear_x": jnp.zeros(b), "shear_y": jnp.zeros(b),
        "tx": jnp.asarray(rng.uniform(-3, 3, b).astype(np.float32)),
        "ty": jnp.asarray(rng.uniform(-3, 3, b).astype(np.float32)),
        "scale": jnp.asarray(rng.uniform(0.9, 1.4, b).astype(np.float32)),
        "applied": jnp.ones(b, bool),
    }
    mats = ops.affine_matrices(params, h, w)
    ref = ops.warp_affine_bilinear(images, mats, method="gather")
    out = ops._warp_affine_mxu(images, ops._invert_affine(mats), pick_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_mxu_warp_rotation_geometry():
    """Under rotation the two-pass and direct bilinear differ at hard edges
    (both are valid resamplings) but must agree geometrically: conserved
    mass and matching centroid of a warped disk, including the transpose
    path near +-90 degrees."""
    h = w = 32
    img = np.zeros((1, h, w, 1), np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    # fully interior disk: stays inside the frame for every tested affine,
    # so mass conservation is tight (edge-of-frame mass is redistributed
    # differently by the two schemes and is excluded deliberately)
    img[0, ..., 0] = ((yy - 16) ** 2 + (xx - 16) ** 2 < 9).astype(np.float32)
    img_j = jnp.asarray(img)
    grid = np.mgrid[0:h, 0:w]
    for ang in (37.0, 88.0, -90.0, -45.0):
        p = {
            "angle": jnp.asarray([ang]), "tx": jnp.asarray([2.0]), "ty": jnp.asarray([-1.5]),
            "scale": jnp.asarray([1.1]), "shear_x": jnp.asarray([0.05]),
            "shear_y": jnp.asarray([-0.03]), "applied": jnp.ones(1, bool),
        }
        mats = ops.affine_matrices(p, h, w)
        ref = np.asarray(ops.warp_affine_bilinear(img_j, mats, method="gather"))[0, ..., 0]
        out = np.asarray(
            ops._warp_affine_mxu(img_j, ops._invert_affine(mats), pick_dtype=jnp.float32)
        )[0, ..., 0]
        # the 2-pass scheme's difference peaks at |shear slope| = 1 (45 deg):
        # ~1% mass, 0.02 px centroid — inherent, bounded, acceptable for augs
        assert abs(out.sum() - ref.sum()) / ref.sum() < 2e-2, ang
        cy_r = (grid[0] * ref).sum() / ref.sum()
        cx_r = (grid[1] * ref).sum() / ref.sum()
        cy_o = (grid[0] * out).sum() / out.sum()
        cx_o = (grid[1] * out).sum() / out.sum()
        assert abs(cy_r - cy_o) < 0.05 and abs(cx_r - cx_o) < 0.05, ang


def test_pallas_warp_matches_mxu_two_pass():
    """The Pallas gather warp computes the same Catmull-Smith two-pass
    resampling as the MXU one-hot warp (to f32 rounding — fma contraction of
    the index maps may differ between the separately compiled programs)
    across rotations, shears, the transpose path, and multiple sizes incl.
    >128-lane widths."""
    rng = np.random.default_rng(21)
    for hw in (32, 256):
        b, c = 4, 5
        images = jnp.asarray(rng.uniform(0, 1, (b, hw, hw, c)).astype(np.float32))
        params = ops.sample_affine_params(
            jax.random.key(3), b, hw, hw, degrees=90.0, translate=(0.1, 0.1),
            scale=(0.9, 1.1), shear=10.0,
        )
        mats = ops.affine_matrices(params, hw, hw)
        mxu = ops._warp_affine_mxu(images, ops._invert_affine(mats), pick_dtype=jnp.float32)
        pal = ops.warp_affine_bilinear(images, mats, method="pallas")
        np.testing.assert_allclose(np.asarray(pal), np.asarray(mxu), atol=1e-4), hw


def test_pallas_warp_identity_is_exact():
    """Unaugmented elements (identity affine) pass through bit-exact — the
    f32 gather has no bf16 pick rounding (advisor finding, round 1)."""
    rng = np.random.default_rng(22)
    b, hw, c = 3, 32, 5
    images = jnp.asarray(rng.uniform(0, 1, (b, hw, hw, c)).astype(np.float32))
    eye = jnp.broadcast_to(jnp.eye(3), (b, 3, 3))
    out = ops.warp_affine_bilinear(images, eye, method="pallas")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(images))
