"""The end-to-end augmentation pipeline: config surface + jittable apply.

Mirrors the reference's AugmentationConfig / KeypointAugmentation contract
(reference: perseus/detector/augmentations.py:259-488): same field names and
defaults, same stage ordering —

  transplantation -> global affine (+ keypoints) -> 2x random erasing ->
  RGB-only (planckian, color jiggle, blur, plasma shadow) ->
  depth-only (bias, gaussian noise, near/far planes) ->
  normalize pixel coordinates to [-1, 1] -> flatten coords

but redesigned for TPU: a single pure function of (key, images, coords) with
NHWC layout and static shapes, so the whole stack fuses into the jitted train
step (no host round-trips between stages, unlike the torch/Kornia kernel
chain). Val mode applies only the deterministic near/far depth clamp and the
coordinate normalization, as the reference intends.

Channel convention (matching the reference's): channels 0..2 RGB in [0, 1],
channel 3 metric-scaled depth (if present), channel 4 binary cube
segmentation (if present, used only for transplantation).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from perseus_tpu.augment import ops
from perseus_tpu.camera import normalize_pixel_coordinates

__all__ = ["AugmentationConfig", "KeypointAugmentation"]

NUM_RGB_CHANNELS = 3
DEPTH_CHANNEL_INDEX = 3


@dataclass(frozen=True)
class AugmentationConfig:
    """Configuration for data augmentation (same surface as the reference)."""

    cube_scale: float = 0.035

    # global augmentations
    random_transplantation_with_depth: bool = True

    random_affine: bool = True
    degrees: float = 90
    translate: Tuple[float, float] = (0.1, 0.1)
    scale: Tuple[float, float] = (0.9, 1.5)
    shear: float = 0.1

    random_erasing: bool = True

    # RGB only
    planckian_jitter: bool = True

    color_jiggle: bool = True
    brightness: float = 0.2
    contrast: float = 0.4
    saturation: float = 0.4
    hue: float = 0.025

    blur: bool = True

    random_plasma_shadow: bool = True

    # depth only
    random_bias: bool = True
    dev_bias: float = 0.02
    p_bias: float = 0.5

    depth_gaussian_noise: bool = True
    std_gaussian_noise: float = 0.005

    random_near_plane: bool = True
    scaled_near_plane_mean: float = 0.1
    dev_near_plane: float = 0.05
    p_near_plane: float = 0.5
    near_value: float = 0.0

    random_far_plane: bool = True
    scaled_far_plane_mean: float = 0.5
    dev_far_plane: float = 0.05
    p_far_plane: float = 0.5
    far_value: float = 0.0


class KeypointAugmentation:
    """Jittable augmentation callable.

    Usage::

        aug = KeypointAugmentation(cfg, train=True)
        images, coords = aug(key, images_nhwc, pixel_coordinates)

    `images_nhwc`: (B, H, W, C) with C in {3, 4, 5}; `pixel_coordinates`:
    (B, K, 2) or (B, 2K). Returns augmented images and coords normalized to
    [-1, 1] flattened to (B, 2K), matching the reference's output contract
    (reference: augmentations.py:481-488).
    """

    def __init__(
        self, cfg: AugmentationConfig, train: bool = True, fused: bool | None = None
    ) -> None:
        """`fused` routes the post-warp elementwise chain through the single
        Pallas kernel in augment/fused.py (same distributions, different RNG
        draws — one stream per stage instead of per op).

        Default (None) = auto: fused on TPU, unfused elsewhere. Measured
        device-true at batch 256x256x256x5 on v5e: 14.2 ms (param sampling +
        kernel) vs ~44 ms for the XLA op chain — the chain is HBM-bandwidth
        bound and the kernel reads/writes each image once. (The round-1
        "5 ms per image" verdict was a per-call host-RTT mismeasurement.)
        The kernel stays golden-tested against the jnp oracle either way."""
        self.cfg = cfg
        self.train = train
        if fused is None:
            from perseus_tpu.augment.fused import fused_supported

            fused = train and fused_supported()
        self.fused = bool(fused)

    def __call__(
        self, key: jax.Array, images: jnp.ndarray, pixel_coordinates: jnp.ndarray
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        squeeze = images.ndim == 3
        if squeeze:
            images = images[None]
            pixel_coordinates = pixel_coordinates[None]
        b, h, w, c = images.shape

        # Storage dtype may be bf16 (device-resident dataset). The fused
        # kernels upcast to f32 in VMEM and cast back at the store; mirror
        # that on the unfused/val paths — compute f32, one cast at the end —
        # so both paths quantize at the same two points (input, output).
        in_dtype = images.dtype
        upcast = in_dtype != jnp.float32 and not (self.train and self.fused)
        if upcast:
            images = images.astype(jnp.float32)

        leading = pixel_coordinates.shape[:-1]
        coords = pixel_coordinates.reshape(b, -1, 2)

        if self.train:
            keys = jax.random.split(key, 10)

            # the ultra kernel folds transplantation in too (donor block by
            # prefetch-indexed block spec); otherwise transplant in XLA here
            use_ultra = (
                self.fused
                and cfg.random_transplantation_with_depth
                and c == 5
                and cfg.random_affine
                and h == w
            )
            if cfg.random_transplantation_with_depth and c == 5 and not use_ultra:
                images = ops.transplant_with_depth(keys[0], images)

            mats = None
            if cfg.random_affine:
                params = ops.sample_affine_params(
                    keys[1],
                    b,
                    h,
                    w,
                    degrees=cfg.degrees,
                    translate=cfg.translate,
                    scale=cfg.scale,
                    shear=cfg.shear,
                )
                mats = ops.affine_matrices(params, h, w)

            if self.fused:
                from perseus_tpu.augment import fused as fused_mod

                interpret = jax.default_backend() != "tpu"
                fused_params = fused_mod.sample_fused_params(keys[2], cfg, b, h, w, c)
                if use_ultra:
                    donor_idx = ops.sample_donor_indices(keys[0], b)
                    swap, parts = ops._two_pass_params(ops._invert_affine(mats))
                    images = fused_mod.fused_ultra_apply(
                        images, donor_idx, swap, jnp.stack(parts, axis=-1),
                        fused_params, interpret=interpret,
                    )
                    coords = ops.transform_keypoints(coords, mats)
                elif mats is not None and h == w:
                    # warp + elementwise chain in ONE kernel: each image is
                    # read from HBM once and written once for the whole
                    # warp->erase->color->blur->shadow->depth stack
                    images_sw, parts = ops._two_pass_setup(images, ops._invert_affine(mats))
                    images = fused_mod.fused_warp_apply(
                        images_sw, jnp.stack(parts, axis=-1), fused_params,
                        interpret=interpret,
                    )
                    coords = ops.transform_keypoints(coords, mats)
                else:
                    if mats is not None:
                        images = ops.warp_affine_bilinear(images, mats)
                        coords = ops.transform_keypoints(coords, mats)
                    images = fused_mod.fused_apply(images, fused_params, interpret=interpret)
                coords = normalize_pixel_coordinates(coords, h, w)
                return images, coords.reshape(*leading, -1)

            if mats is not None:
                images = ops.warp_affine_bilinear(images, mats)
                coords = ops.transform_keypoints(coords, mats)

            if cfg.random_erasing:
                images = ops.random_erasing(
                    keys[2], images, p=0.5, scale=(0.02, 0.1), ratio=(2.0, 3.0)
                )
                images = ops.random_erasing(
                    keys[3], images, p=0.5, scale=(0.02, 0.05), ratio=(0.8, 1.2)
                )

            rgb = images[..., :NUM_RGB_CHANNELS]
            if cfg.planckian_jitter:
                rgb = ops.planckian_jitter(keys[4], rgb)
            if cfg.color_jiggle:
                rgb = ops.color_jiggle(
                    keys[5],
                    rgb,
                    brightness=cfg.brightness,
                    contrast=cfg.contrast,
                    saturation=cfg.saturation,
                    hue=cfg.hue,
                )
            if cfg.blur:
                rgb = ops.gaussian_blur_5x5(keys[6], rgb, sigma_range=(3.0, 8.0), p=0.5)
            if cfg.random_plasma_shadow:
                rgb = ops.plasma_shadow(keys[7], rgb)
            images = jnp.concatenate([rgb, images[..., NUM_RGB_CHANNELS:]], axis=-1)

            if c > NUM_RGB_CHANNELS:
                depth = images[..., DEPTH_CHANNEL_INDEX]
                if cfg.random_bias:
                    depth = ops.depth_bias(
                        keys[8], depth, dev=cfg.dev_bias, p=cfg.p_bias, cube_scale=cfg.cube_scale
                    )
                if cfg.depth_gaussian_noise:
                    depth = ops.depth_gaussian_noise(
                        keys[9], depth, std=cfg.std_gaussian_noise, cube_scale=cfg.cube_scale
                    )
                if cfg.random_near_plane or cfg.random_far_plane:
                    k_plane = jax.random.fold_in(key, 1000)
                    depth = ops.depth_plane(
                        k_plane,
                        depth,
                        near_mean=cfg.scaled_near_plane_mean,
                        near_dev=cfg.dev_near_plane,
                        p_near=cfg.p_near_plane if cfg.random_near_plane else 1.0,
                        near_value=cfg.near_value,
                        far_mean=cfg.scaled_far_plane_mean,
                        far_dev=cfg.dev_far_plane,
                        p_far=cfg.p_far_plane if cfg.random_far_plane else 1.0,
                        far_value=cfg.far_value,
                        cube_scale=cfg.cube_scale,
                    )
                images = images.at[..., DEPTH_CHANNEL_INDEX].set(depth)
        else:
            # val mode: deterministic near/far clamp only
            if (cfg.random_near_plane or cfg.random_far_plane) and c > NUM_RGB_CHANNELS:
                depth = ops.depth_plane_clamp(
                    images[..., DEPTH_CHANNEL_INDEX],
                    near_mean=cfg.scaled_near_plane_mean,
                    near_value=cfg.near_value,
                    far_mean=cfg.scaled_far_plane_mean,
                    far_value=cfg.far_value,
                    cube_scale=cfg.cube_scale,
                )
                images = images.at[..., DEPTH_CHANNEL_INDEX].set(depth)

        coords = normalize_pixel_coordinates(coords, h, w)
        if upcast:
            images = images.astype(in_dtype)
        # the reference returns coords in the caller's leading shape (and
        # keeps the batch dim it may have added); (B, K, 2) in -> (B, K, 2)
        # out, (B, 2K) in -> (B, 2K) out (reference: augmentations.py:483-488)
        return images, coords.reshape(*leading, -1)
