"""Pallas-fused augmentation: golden tests vs the pure-jnp oracle (the
SURVEY.md section 4 pattern: kernel-level golden tests for each Pallas op),
run on the CPU interpreter."""

import jax
import jax.numpy as jnp
import numpy as np

from perseus_tpu.augment import ops
from perseus_tpu.augment.fused import fused_apply, reference_apply, sample_fused_params
from perseus_tpu.augment.pipeline import AugmentationConfig, KeypointAugmentation

RNG = np.random.default_rng(9)


def _params(cfg, b, h, w, c, seed=1):
    return sample_fused_params(jax.random.key(seed), cfg, b, h, w, c)


def test_fused_kernel_matches_oracle_all_channel_counts():
    cfg = AugmentationConfig()
    for c in (3, 4, 5):
        images = jnp.asarray(RNG.uniform(0, 1, (3, 32, 32, c)).astype(np.float32))
        p = _params(cfg, 3, 32, 32, c)
        ref = reference_apply(images, p)
        out = fused_apply(images, p, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_fused_kernel_deterministic():
    cfg = AugmentationConfig()
    images = jnp.asarray(RNG.uniform(0, 1, (2, 32, 32, 4)).astype(np.float32))
    p = _params(cfg, 2, 32, 32, 4)
    a = fused_apply(images, p, interpret=True)
    b = fused_apply(images, p, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_oracle_matches_unfused_ops_when_deterministic():
    """With every random stage disabled the fused chain must be the exact
    depth clamp + identity RGB of the unfused ops."""
    cfg = AugmentationConfig(
        random_erasing=False, planckian_jitter=False, color_jiggle=False,
        blur=False, random_plasma_shadow=False, random_bias=False,
        depth_gaussian_noise=False, random_near_plane=False, random_far_plane=False,
    )
    images = jnp.asarray(RNG.uniform(0, 1, (2, 16, 16, 4)).astype(np.float32))
    p = _params(cfg, 2, 16, 16, 4)
    out = np.asarray(reference_apply(images, p))
    np.testing.assert_array_equal(out[..., :3], np.asarray(images)[..., :3])
    np.testing.assert_allclose(out[..., 3], np.asarray(images)[..., 3], atol=1e-6)


def test_fused_blur_matches_unfused_blur():
    """The in-kernel separable reflect-pad blur equals ops.gaussian_blur_5x5
    for the same taps."""
    rgb = jnp.asarray(RNG.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
    cfg = AugmentationConfig(
        random_erasing=False, planckian_jitter=False, color_jiggle=False,
        blur=True, random_plasma_shadow=False,
    )
    p = _params(cfg, 2, 16, 16, 3, seed=4)
    # force-apply with known sigma taps (scalar layout indices 16-21)
    sigma = np.asarray([3.7, 6.1], dtype=np.float32)
    offsets = np.arange(-2, 3, dtype=np.float32)
    taps = np.exp(-0.5 * (offsets[None] / sigma[:, None]) ** 2)
    taps = taps / taps.sum(-1, keepdims=True)
    p = dict(p)
    scalars = np.array(p["scalars"])  # writable copy
    scalars[:, 16] = 1.0
    scalars[:, 17:22] = taps
    p["scalars"] = jnp.asarray(scalars)
    out = np.asarray(reference_apply(rgb, p))

    padded = jnp.pad(rgb, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
    t = jnp.asarray(taps)
    h = w = 16
    out_h = sum(t[:, i, None, None, None] * padded[:, i : i + h, 2 : 2 + w, :] for i in range(5))
    padded_h = jnp.pad(out_h, ((0, 0), (0, 0), (2, 2), (0, 0)), mode="reflect")
    expect = sum(t[:, i, None, None, None] * padded_h[:, :, i : i + w, :] for i in range(5))
    np.testing.assert_allclose(out, np.asarray(expect), atol=1e-6)


def test_fused_hue_matches_ops_hue():
    """The robust-ordering HSV rewrite must equal ops._adjust_hue."""
    from perseus_tpu.augment.fused import _hue_planes

    rgb = jnp.asarray(RNG.uniform(0, 1, (4, 8, 8, 3)).astype(np.float32))
    shift = jnp.asarray(RNG.uniform(-0.2, 0.2, (4,)).astype(np.float32))
    ref = ops._adjust_hue(rgb, shift)
    out = jnp.stack(
        jax.vmap(_hue_planes)(rgb[..., 0], rgb[..., 1], rgb[..., 2], shift), axis=-1
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_pipeline_fused_path_shapes_and_coords():
    """The fused pipeline preserves the output contract and keypoint math
    (coords transform with the same affine as the unfused path)."""
    cfg = AugmentationConfig()
    images = jnp.asarray(RNG.uniform(0, 1, (4, 32, 32, 5)).astype(np.float32))
    coords = jnp.asarray(RNG.uniform(4, 28, (4, 8, 2)).astype(np.float32))
    key = jax.random.key(7)

    # monkeypatch fused_apply to interpret mode for the CPU test
    from perseus_tpu.augment import fused as fused_mod

    orig = fused_mod.fused_apply
    fused_mod.fused_apply = lambda imgs, p: orig(imgs, p, interpret=True)
    try:
        aug_fused = KeypointAugmentation(cfg, train=True, fused=True)
        out_f, c_f = aug_fused(key, images, coords)
    finally:
        fused_mod.fused_apply = orig
    aug_unfused = KeypointAugmentation(cfg, train=True, fused=False)
    out_u, c_u = aug_unfused(key, images, coords)

    assert out_f.shape == out_u.shape == (4, 32, 32, 5)
    assert np.isfinite(np.asarray(out_f)).all()
    # the transplant + affine + coord path uses the same keys in both modes
    np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_u), atol=1e-5)
    assert np.asarray(c_f).min() >= -1.0 and np.asarray(c_f).max() <= 1.0


def test_fused_warp_kernel_matches_sequential(tmp_path):
    """fused_warp_apply (warp + chain in one kernel) == warp_affine_bilinear
    (pallas math, interpreted) followed by fused_apply."""
    from perseus_tpu.augment import ops
    from perseus_tpu.augment.fused import fused_warp_apply

    b, h, w, c = 3, 64, 64, 5
    rng = np.random.default_rng(5)
    images = jnp.asarray(rng.uniform(0, 1, (b, h, w, c)).astype(np.float32))
    cfg = AugmentationConfig()
    p = sample_fused_params(jax.random.key(9), cfg, b, h, w, c)

    aff = ops.sample_affine_params(
        jax.random.key(3), b, h, w, degrees=90.0, translate=(0.1, 0.1),
        scale=(0.9, 1.5), shear=0.1,
    )
    mats = ops.affine_matrices(aff, h, w)
    inv = ops._invert_affine(mats)
    images_sw, parts = ops._two_pass_setup(images, inv)

    from perseus_tpu.augment.warp_pallas import warp_affine_pallas

    warped = warp_affine_pallas(images_sw, jnp.stack(parts, axis=-1), interpret=True)
    expected = fused_apply(warped, p, interpret=True)
    combined = fused_warp_apply(images_sw, jnp.stack(parts, axis=-1), p, interpret=True)
    np.testing.assert_allclose(np.asarray(combined), np.asarray(expected), atol=1e-5)


def test_fused_ultra_kernel_matches_sequential():
    """fused_ultra_apply (transplant + swap + warp + chain in one kernel) ==
    transplant_with_depth -> warp_affine_pallas -> fused_apply with shared
    donor indices."""
    from perseus_tpu.augment import ops
    from perseus_tpu.augment.fused import fused_ultra_apply
    from perseus_tpu.augment.warp_pallas import warp_affine_pallas

    b, h, w, c = 4, 64, 64, 5
    rng = np.random.default_rng(6)
    images = rng.uniform(0, 1, (b, h, w, c)).astype(np.float32)
    images[..., 4] = (images[..., 4] > 0.6).astype(np.float32)  # binary seg
    images = jnp.asarray(images)
    cfg = AugmentationConfig()
    p = sample_fused_params(jax.random.key(11), cfg, b, h, w, c)
    donor_idx = ops.sample_donor_indices(jax.random.key(4), b)

    aff = ops.sample_affine_params(
        jax.random.key(3), b, h, w, degrees=90.0, translate=(0.1, 0.1),
        scale=(0.9, 1.5), shear=0.1,
    )
    mats = ops.affine_matrices(aff, h, w)
    inv = ops._invert_affine(mats)
    swap, parts = ops._two_pass_params(inv)

    transplanted = ops.transplant_with_depth(jax.random.key(0), images, donor_idx=donor_idx)
    t_sw = jnp.where(swap[:, None, None, None], jnp.swapaxes(transplanted, 1, 2), transplanted)
    warped = warp_affine_pallas(t_sw, jnp.stack(parts, axis=-1), interpret=True)
    expected = fused_apply(warped, p, interpret=True)

    combined = fused_ultra_apply(
        images, donor_idx, swap, jnp.stack(parts, axis=-1), p, interpret=True
    )
    np.testing.assert_allclose(np.asarray(combined), np.asarray(expected), atol=1e-5)


def test_fused_apply_bf16_matches_f32_oracle():
    """bf16 storage I/O: the kernel upcasts planes to f32 in VMEM and casts
    once at the store, so its output must equal the f32 oracle run on the
    same (bf16-quantized) inputs, quantized to bf16 at the end."""
    rng = np.random.default_rng(11)
    images = jnp.asarray(
        rng.uniform(0, 1, (2, 32, 32, 5)).astype(np.float32)
    ).astype(jnp.bfloat16)
    cfg = AugmentationConfig()
    p = sample_fused_params(jax.random.key(5), cfg, 2, 32, 32, 5)
    out = fused_apply(images, p, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = reference_apply(images, p)
    # 1-ulp tolerance: the two paths upcast at the same points but compile
    # in different fusion contexts, so f32 intermediates may differ by one
    # fma contraction, which the bf16 store cast can surface as one ulp.
    np.testing.assert_allclose(
        np.asarray(out.astype(jnp.float32)),
        np.asarray(ref.astype(jnp.float32)),
        rtol=2**-7,
        atol=2**-9,
    )
