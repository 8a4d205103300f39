"""Pure-JAX augmentation primitives (channels-last, keyed PRNG, jit-safe).

Re-implements the behavior of the reference's augmentation stack — the
custom depth/transplantation modules and the Kornia ops it composes
(reference: perseus/detector/augmentations.py) — as stateless functions of
an explicit PRNG key. Keyed PRNG + purity replaces torch's global-RNG
mutation model, giving deterministic, replayable batches (fold_in per step).

All image tensors are NHWC (B, H, W, C) float32 — the layout XLA:TPU wants —
and all shapes are static so everything fuses under jit. Random decisions
use masks/`where`, never dynamic shapes.

Known intentional divergences from the reference (documented per function):
  * RNG streams differ (torch vs. threefry) — distributions match, draws
    don't.
  * ColorJiggle applies its four ops in a fixed order instead of a random
    permutation (negligible distributional effect).
  * Planckian jitter derives gains from a blackbody color-temperature
    approximation instead of Kornia's lookup table.
  * The reference's val-mode depth-plane clamp still samples random plane
    deviations because `p=0` disables torch dropout's zeroing, not the
    deviation draw (reference: augmentations.py:419-431 with :144-148); here
    val mode is a deterministic clamp at the mean, which is the evident
    intent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "depth_bias",
    "depth_gaussian_noise",
    "depth_plane",
    "depth_plane_clamp",
    "transplant_with_depth",
    "sample_affine_params",
    "affine_matrices",
    "warp_affine_bilinear",
    "transform_keypoints",
    "random_erasing",
    "planckian_jitter",
    "color_jiggle",
    "gaussian_blur_5x5",
    "plasma_shadow",
]


# --------------------------------------------------------------------------
# Depth augmentations (reference: augmentations.py:17-169)
# --------------------------------------------------------------------------


def depth_bias(
    key: jax.Array,
    depth: jnp.ndarray,
    dev: float = 0.02,
    p: float = 0.5,
    cube_scale: float = 0.035,
) -> jnp.ndarray:
    """Per-pixel uniform bias on metric-scaled depth.

    Matches the reference's dropout-mask formulation: each pixel receives a
    bias with probability (1 - p), and surviving biases are scaled by
    1/(1 - p) (torch F.dropout semantics; reference: augmentations.py:45-50).
    """
    k_keep, k_u = jax.random.split(key)
    keep = jax.random.bernoulli(k_keep, 1.0 - p, depth.shape)
    u = jax.random.uniform(k_u, depth.shape, dtype=depth.dtype, minval=-1.0, maxval=1.0)
    bias = dev * (keep / (1.0 - p)) * u
    return (cube_scale * depth + bias) / cube_scale


def depth_gaussian_noise(
    key: jax.Array, depth: jnp.ndarray, std: float = 0.005, cube_scale: float = 0.035
) -> jnp.ndarray:
    """Gaussian noise on metric-scaled depth (reference: augmentations.py:67-78)."""
    noise = std * jax.random.normal(key, depth.shape, dtype=depth.dtype)
    return (cube_scale * depth + noise) / cube_scale


def depth_plane(
    key: jax.Array,
    depth: jnp.ndarray,
    near_mean: float = 0.1,
    near_dev: float = 0.05,
    p_near: float = 0.5,
    near_value: float = 0.0,
    far_mean: float = 0.5,
    far_dev: float = 0.05,
    p_far: float = 0.5,
    far_value: float = 0.0,
    cube_scale: float = 0.035,
) -> jnp.ndarray:
    """Randomized near/far cutoff planes on metric-scaled depth
    (reference: augmentations.py:128-169). Per-pixel plane deviations with
    dropout-style masking, as in the reference."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    scaled = cube_scale * depth

    keep_n = jax.random.bernoulli(k1, 1.0 - p_near, depth.shape)
    dev_n = near_dev * (keep_n / (1.0 - p_near)) * jax.random.uniform(
        k2, depth.shape, dtype=depth.dtype, minval=-1.0, maxval=1.0
    )
    scaled = jnp.where(scaled < near_mean + dev_n, near_value, scaled)

    keep_f = jax.random.bernoulli(k3, 1.0 - p_far, depth.shape)
    dev_f = far_dev * (keep_f / (1.0 - p_far)) * jax.random.uniform(
        k4, depth.shape, dtype=depth.dtype, minval=-1.0, maxval=1.0
    )
    scaled = jnp.where(scaled > far_mean + dev_f, far_value, scaled)
    return scaled / cube_scale


def depth_plane_clamp(
    depth: jnp.ndarray,
    near_mean: float = 0.1,
    near_value: float = 0.0,
    far_mean: float = 0.5,
    far_value: float = 0.0,
    cube_scale: float = 0.035,
) -> jnp.ndarray:
    """Deterministic near/far clamp for the val/streaming path."""
    scaled = cube_scale * depth
    scaled = jnp.where(scaled < near_mean, near_value, scaled)
    scaled = jnp.where(scaled > far_mean, far_value, scaled)
    return scaled / cube_scale


# --------------------------------------------------------------------------
# Transplantation (reference: augmentations.py:172-251)
# --------------------------------------------------------------------------


def sample_donor_indices(key: jax.Array, b: int) -> jnp.ndarray:
    """A random *different* donor element for each batch element."""
    offsets = jax.random.randint(key, (b,), 1, b)
    return (jnp.arange(b) + offsets) % b


def transplant_with_depth(
    key: jax.Array,
    images: jnp.ndarray,
    lb_seg_ratio: float = 0.02,
    ub_seg_ratio: float = 0.7,
    donor_idx: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Depth-layered donor transplantation on 5-channel (RGB+D+seg) batches.

    For each batch element, picks a random *different* donor element and
    composites donor pixels wherever the acceptor has no cube OR the donor's
    depth is closer within the acceptor's cube mask, excluding donor-cube
    pixels; results whose new seg-ratio falls outside [lb, ub] are rejected
    (original kept). Exactly the mask algebra of the reference, in NHWC.
    Like the reference, this always applies (its `p` is unused there too).
    """
    b = images.shape[0]
    rgb = images[..., :3]
    depth = images[..., 3]
    seg = images[..., 4]

    if donor_idx is None:
        donor_idx = sample_donor_indices(key, b)
    donor = images[donor_idx]
    donor_rgb = donor[..., :3]
    donor_depth = donor[..., 3]
    donor_seg = donor[..., 4]

    acceptor_cube = seg == 1.0
    donor_mask = ~acceptor_cube
    # donor pixels closer than the acceptor's cube surface get transplanted
    depth_cube_acceptor = depth * acceptor_cube
    depth_cube_donor = donor_depth * acceptor_cube
    donor_mask = donor_mask | (depth_cube_donor < depth_cube_acceptor)
    # never transplant the donor's own cube pixels
    donor_cube = donor_seg == 1.0
    donor_mask = donor_mask & ~donor_cube

    new_rgb = jnp.where(donor_mask[..., None], donor_rgb, rgb)
    new_depth = jnp.where(donor_mask, donor_depth, depth)
    new_seg = 1.0 - donor_mask.astype(images.dtype)
    # remove donor-cube pixels from the new seg unless they were acceptor cube
    new_seg = jnp.where(donor_cube & ~acceptor_cube, 0.0, new_seg)

    candidate = jnp.concatenate(
        [new_rgb, new_depth[..., None], new_seg[..., None]], axis=-1
    )
    seg_ratio = jnp.mean(new_seg, axis=(1, 2))
    ok = (seg_ratio >= lb_seg_ratio) & (seg_ratio <= ub_seg_ratio)
    return jnp.where(ok[:, None, None, None], candidate, images)


# --------------------------------------------------------------------------
# Random affine + keypoints (reference uses kornia RandomAffine with
# data_keys=["image", "keypoints"]; augmentations.py:352-359, 435-437, 470)
# --------------------------------------------------------------------------


def sample_affine_params(
    key: jax.Array,
    batch: int,
    height: int,
    width: int,
    degrees: float = 90.0,
    translate: tuple[float, float] = (0.1, 0.1),
    scale: tuple[float, float] = (0.9, 1.5),
    shear: float = 0.1,
    p: float = 0.5,
):
    """Samples per-element kornia-style affine parameters.

    Returns a dict of (B,) arrays: angle (deg), tx/ty (pixels), scale,
    shear_x/shear_y (deg), applied (bool). Kornia's RandomAffine defaults to
    p=0.5 with per-element params (same_on_batch=False).
    """
    ks = jax.random.split(key, 6)
    angle = jax.random.uniform(ks[0], (batch,), minval=-degrees, maxval=degrees)
    tx = jax.random.uniform(ks[1], (batch,), minval=-translate[0], maxval=translate[0]) * width
    ty = jax.random.uniform(ks[2], (batch,), minval=-translate[1], maxval=translate[1]) * height
    sc = jax.random.uniform(ks[3], (batch,), minval=scale[0], maxval=scale[1])
    sh = jax.random.uniform(ks[4], (batch, 2), minval=-shear, maxval=shear)
    applied = jax.random.bernoulli(ks[5], p, (batch,))
    return {
        "angle": angle,
        "tx": tx,
        "ty": ty,
        "scale": sc,
        "shear_x": sh[:, 0],
        "shear_y": sh[:, 1],
        "applied": applied,
    }


def affine_matrices(params: dict, height: int, width: int) -> jnp.ndarray:
    """Builds (B, 3, 3) forward affine matrices about the image center:

    A = T(t) . T(c) . R(angle) S(scale) . Shear . T(-c)

    matching kornia's get_affine_matrix2d composition. Elements with
    ``applied == False`` get the identity.
    """
    angle = jnp.deg2rad(params["angle"])
    sx = jnp.deg2rad(params["shear_x"])
    sy = jnp.deg2rad(params["shear_y"])
    s = params["scale"]
    cx = (width - 1) / 2.0
    cy = (height - 1) / 2.0

    cos_a, sin_a = jnp.cos(angle) * s, jnp.sin(angle) * s
    # rotation-scale times shear matrix [[1, tan(sx)], [tan(sy), 1]]
    tan_sx, tan_sy = jnp.tan(sx), jnp.tan(sy)
    m00 = cos_a + (-sin_a) * tan_sy
    m01 = cos_a * tan_sx + (-sin_a)
    m10 = sin_a + cos_a * tan_sy
    m11 = sin_a * tan_sx + cos_a

    # conjugate by the center, then translate
    t0 = params["tx"] + cx - (m00 * cx + m01 * cy)
    t1 = params["ty"] + cy - (m10 * cx + m11 * cy)

    zeros = jnp.zeros_like(m00)
    ones = jnp.ones_like(m00)
    mats = jnp.stack(
        [
            jnp.stack([m00, m01, t0], axis=-1),
            jnp.stack([m10, m11, t1], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=mats.dtype), mats.shape)
    return jnp.where(params["applied"][:, None, None], mats, eye)


def _invert_affine(mats: jnp.ndarray) -> jnp.ndarray:
    """(B, 3, 3) forward affines -> (B, 2, 3) inverse maps [dst -> src]."""
    a00, a01, t0 = mats[:, 0, 0], mats[:, 0, 1], mats[:, 0, 2]
    a10, a11, t1 = mats[:, 1, 0], mats[:, 1, 1], mats[:, 1, 2]
    det = a00 * a11 - a01 * a10
    i00, i01 = a11 / det, -a01 / det
    i10, i11 = -a10 / det, a00 / det
    return jnp.stack(
        [
            jnp.stack([i00, i01, -(i00 * t0 + i01 * t1)], axis=-1),
            jnp.stack([i10, i11, -(i10 * t0 + i11 * t1)], axis=-1),
        ],
        axis=-2,
    )


def warp_affine_bilinear(
    images: jnp.ndarray, mats: jnp.ndarray, method: str = "auto"
) -> jnp.ndarray:
    """Warps NHWC images by forward affine matrices (B, 3, 3) with bilinear
    sampling and zero padding: out(x) = in(A^-1 x).

    method:
      * "gather" — per-pixel 4-tap gather. Fine on CPU; on TPU XLA lowers
        arbitrary point gathers to ~scalar rate (measured 1.26 s for a
        256x256x5 batch of 256 — the single largest cost in the train step).
      * "mxu" — exact Catmull-Smith two-pass resampling where each 1-D pass
        is a one-hot matmul on the MXU (see :func:`_warp_affine_mxu`);
        ~40x faster on TPU. Requires square images.
      * "pallas" — the same two-pass resampling as a Pallas kernel whose 1-D
        passes are hardware gathers (tpu.dynamic_gather) in f32 — no one-hot
        selector traffic, exact for identity affines. Requires square images.
      * "auto" — "pallas" on TPU backends for square images, else "gather".
    """
    b, h, w, _ = images.shape
    if method == "auto":
        method = "pallas" if (jax.default_backend() == "tpu" and h == w) else "gather"
    inv = _invert_affine(mats)
    if method == "pallas":
        from perseus_tpu.augment.warp_pallas import warp_affine_pallas

        images_sw, parts = _two_pass_setup(images, inv)
        return warp_affine_pallas(
            images_sw,
            jnp.stack(parts, axis=-1),
            interpret=jax.default_backend() != "tpu",
        )
    if method == "mxu":
        return _warp_affine_mxu(images, inv)

    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)

    # source coords: (B, H, W)
    src_x = inv[:, 0, 0, None, None] * xs + inv[:, 0, 1, None, None] * ys + inv[:, 0, 2, None, None]
    src_y = inv[:, 1, 0, None, None] * xs + inv[:, 1, 1, None, None] * ys + inv[:, 1, 2, None, None]

    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    wx = src_x - x0
    wy = src_y - y0

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        vals = jax.vmap(lambda img, yy, xx: img[yy, xx])(images, yi_c, xi_c)  # (B, H, W, C)
        return vals * valid[..., None]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def _axis_resample(
    images: jnp.ndarray,  # (B, S, W, C) resampling along axis 1
    coord: jnp.ndarray,  # (B, H_out, W) fractional source index along axis 1
    pick_dtype,
    chunk: int = 16,
) -> jnp.ndarray:
    """1-D bilinear resample along axis 1 via one-hot matmuls.

    A one-hot matmul is an exact row selection in ANY dtype (each output
    element is a single product), so the picks run on the MXU in bf16 with
    no interpolation error beyond the image's own bf16 rounding; the 2-tap
    blend happens in f32. Out-of-range taps contribute zero (the reference
    gather's zero-padding semantics). The one-hot selector for a full
    256-image batch is ~8.6 GB, so the output axis is processed in chunks
    under lax.map to bound transient memory.
    """
    b, s, w, c = images.shape
    hout = coord.shape[1]
    src = images.astype(pick_dtype)

    def resample_chunk(coord_c: jnp.ndarray) -> jnp.ndarray:
        r0 = jnp.floor(coord_c)
        f = (coord_c - r0)[..., None]
        # one_hot of an out-of-range index is the zero vector, which IS the
        # zero-padding semantics — no separate validity masks needed.
        # (A single pre-blended selector tensor was measured slower: the f32
        # blend before the einsum costs more than the traffic it saves.)
        i0 = r0.astype(jnp.int32)
        pick0 = jnp.einsum("byxs,bsxc->byxc", jax.nn.one_hot(i0, s, dtype=pick_dtype), src)
        pick1 = jnp.einsum("byxs,bsxc->byxc", jax.nn.one_hot(i0 + 1, s, dtype=pick_dtype), src)
        return (1 - f) * pick0.astype(jnp.float32) + f * pick1.astype(jnp.float32)

    if hout % chunk or hout <= chunk:
        return resample_chunk(coord)
    n = hout // chunk
    coord_chunks = coord.reshape(b, n, chunk, w).transpose(1, 0, 2, 3)
    out = jax.lax.map(resample_chunk, coord_chunks)  # (n, B, chunk, W, C)
    return out.transpose(1, 0, 2, 3, 4).reshape(b, hout, w, c)


def _two_pass_params(inv: jnp.ndarray):
    """Per-image parameters of the Catmull-Smith two-pass affine
    decomposition: returns (swap (B,) bool, (i00, i01, t0, p, q, r)).

    The decomposition's first pass needs |i00| >= |i10| (it divides by i00,
    and i00 -> 0 at +-90 deg rotations); images failing that are transposed
    (`swap`) and their inverse-map rows/columns swapped, which is the same
    warp relabeled — no second pass order needed.
    """
    i00, i01, t0 = inv[:, 0, 0], inv[:, 0, 1], inv[:, 0, 2]
    i10, i11, t1 = inv[:, 1, 0], inv[:, 1, 1], inv[:, 1, 2]
    swap = jnp.abs(i00) < jnp.abs(i10)
    i00, i10 = jnp.where(swap, i10, i00), jnp.where(swap, i00, i10)
    i01, i11 = jnp.where(swap, i11, i01), jnp.where(swap, i01, i11)
    t0, t1 = jnp.where(swap, t1, t0), jnp.where(swap, t0, t1)

    # pass 1 (vertical): I(y, x_in) = in(p*x_in + q*y + r, x_in), chosen so
    # that composing with pass 2's column map reproduces the full affine
    p = i10 / i00
    q = i11 - p * i01
    r = t1 - p * t0
    return swap, (i00, i01, t0, p, q, r)


def _two_pass_setup(images: jnp.ndarray, inv: jnp.ndarray):
    """Swap prologue applied in XLA + the two-pass parameters (shared by the
    MXU and Pallas warp backends); see :func:`_two_pass_params`."""
    b, h, w, c = images.shape
    assert h == w, "two-pass warp requires square images"
    swap, parts = _two_pass_params(inv)
    images = jnp.where(swap[:, None, None, None], jnp.swapaxes(images, 1, 2), images)
    return images, parts


def _warp_affine_mxu(
    images: jnp.ndarray, inv: jnp.ndarray, pick_dtype=jnp.bfloat16
) -> jnp.ndarray:
    """Exact two-pass affine warp as MXU one-hot matmuls (square images).

    Catmull-Smith decomposition: a vertical resample with per-column affine
    row maps, then a horizontal resample — each pass contracts over one
    image axis on the MXU instead of issuing per-pixel gathers. See
    :func:`_two_pass_setup` for the swap prologue.
    """
    b, h, w, c = images.shape
    f32 = jnp.float32
    images, (i00, i01, t0, p, q, r) = _two_pass_setup(images, inv)
    ys = jnp.arange(h, dtype=f32)
    xs = jnp.arange(w, dtype=f32)
    rho = (
        q[:, None, None] * ys[None, :, None]
        + p[:, None, None] * xs[None, None, :]
        + r[:, None, None]
    )  # (B, H_out, W_in)
    inter = _axis_resample(images, rho, pick_dtype)

    # pass 2 (horizontal): out(y, x) = I(y, i00*x + i01*y + t0)
    gam = (
        i01[:, None, None] * ys[None, :, None]
        + i00[:, None, None] * xs[None, None, :]
        + t0[:, None, None]
    )  # (B, H_out, W_out)
    inter_t = jnp.swapaxes(inter, 1, 2)  # (B, W_in, H, C): resample axis 1
    out_t = _axis_resample(inter_t, jnp.swapaxes(gam, 1, 2), pick_dtype)
    return jnp.swapaxes(out_t, 1, 2)


def transform_keypoints(coords: jnp.ndarray, mats: jnp.ndarray) -> jnp.ndarray:
    """Applies (B, 3, 3) affines to pixel keypoints (B, K, 2)."""
    return jnp.einsum("bij,bkj->bki", mats[:, :2, :2], coords) + mats[:, None, :2, 2]


# --------------------------------------------------------------------------
# Random erasing (kornia RandomErasing; reference: augmentations.py:361-372)
# --------------------------------------------------------------------------


def random_erasing(
    key: jax.Array,
    images: jnp.ndarray,
    p: float = 0.5,
    scale: tuple[float, float] = (0.02, 0.1),
    ratio: tuple[float, float] = (0.8, 1.2),
    value: float = 0.0,
) -> jnp.ndarray:
    """Erases one random rectangle per element with probability p.

    Rectangle area fraction in `scale`, aspect (w/h) in `ratio`; erased
    pixels set to `value` (0.0, which the depth channel reads as
    "too close to the camera", as the reference notes).
    """
    b, h, w, _ = images.shape
    ks = jax.random.split(key, 5)
    applied = jax.random.bernoulli(ks[0], p, (b,))
    area = jax.random.uniform(ks[1], (b,), minval=scale[0], maxval=scale[1]) * (h * w)
    aspect = jax.random.uniform(ks[2], (b,), minval=ratio[0], maxval=ratio[1])
    rect_h = jnp.clip(jnp.round(jnp.sqrt(area / aspect)), 1, h)
    rect_w = jnp.clip(jnp.round(jnp.sqrt(area * aspect)), 1, w)
    top = jnp.floor(jax.random.uniform(ks[3], (b,)) * (h - rect_h + 1))
    left = jnp.floor(jax.random.uniform(ks[4], (b,)) * (w - rect_w + 1))

    ys = jax.lax.broadcasted_iota(jnp.float32, (1, h, 1), 1)
    xs = jax.lax.broadcasted_iota(jnp.float32, (1, 1, w), 2)
    in_rect = (
        (ys >= top[:, None, None])
        & (ys < (top + rect_h)[:, None, None])
        & (xs >= left[:, None, None])
        & (xs < (left + rect_w)[:, None, None])
    )
    erase = in_rect & applied[:, None, None]
    return jnp.where(erase[..., None], value, images)


# --------------------------------------------------------------------------
# RGB-only ops (kornia PlanckianJitter / ColorJiggle / GaussianBlur /
# PlasmaShadow; reference: augmentations.py:374-392)
# --------------------------------------------------------------------------


def _blackbody_gains(temp_k: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Approximate (r_gain, b_gain), green-normalized, for a blackbody
    illuminant at temperature `temp_k` (Kelvin). Uses the standard
    color-temperature-to-RGB curve fit (Tanner Helland's public formulation),
    smooth-clamped to keep gains finite and jit-friendly."""
    t = temp_k / 100.0
    # red channel
    r = jnp.where(t <= 66.0, 255.0, 329.698727446 * jnp.maximum(t - 60.0, 1e-3) ** -0.1332047592)
    # green channel
    g = jnp.where(
        t <= 66.0,
        99.4708025861 * jnp.log(jnp.maximum(t, 1e-3)) - 161.1195681661,
        288.1221695283 * jnp.maximum(t - 60.0, 1e-3) ** -0.0755148492,
    )
    # blue channel
    b = jnp.where(
        t >= 66.0,
        255.0,
        jnp.where(
            t <= 19.0,
            0.0,
            138.5177312231 * jnp.log(jnp.maximum(t - 10.0, 1e-3)) - 305.0447927307,
        ),
    )
    r = jnp.clip(r, 0.0, 255.0)
    g = jnp.clip(g, 1e-3, 255.0)
    b = jnp.clip(b, 0.0, 255.0)
    return r / g, b / g


def planckian_jitter(
    key: jax.Array,
    rgb: jnp.ndarray,
    temp_range: tuple[float, float] = (3000.0, 15000.0),
    p: float = 0.5,
) -> jnp.ndarray:
    """Scales R/B channels by blackbody illuminant gains at a random color
    temperature (kornia RandomPlanckianJitter mode="blackbody" covers
    3000K-15000K; gains here come from the physical curve instead of a
    lookup table)."""
    b = rgb.shape[0]
    k1, k2 = jax.random.split(key)
    temps = jax.random.uniform(k1, (b,), minval=temp_range[0], maxval=temp_range[1])
    r_gain, b_gain = _blackbody_gains(temps)
    applied = jax.random.bernoulli(k2, p, (b,))
    r_gain = jnp.where(applied, r_gain, 1.0)
    b_gain = jnp.where(applied, b_gain, 1.0)
    gains = jnp.stack([r_gain, jnp.ones_like(r_gain), b_gain], axis=-1)
    return jnp.clip(rgb * gains[:, None, None, :], 0.0, 1.0)


_GRAY_WEIGHTS = np.array([0.299, 0.587, 0.114], dtype=np.float32)


def _rgb_to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("...c,c->...", rgb, jnp.asarray(_GRAY_WEIGHTS, dtype=rgb.dtype))


def _adjust_hue(rgb: jnp.ndarray, shift_turns: jnp.ndarray) -> jnp.ndarray:
    """Hue rotation by `shift_turns` (fraction of a full turn, per element)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    safe_delta = jnp.where(delta == 0, 1.0, delta)
    s = jnp.where(maxc == 0, 0.0, delta / jnp.where(maxc == 0, 1.0, maxc))
    hr = jnp.where(maxc == r, ((g - b) / safe_delta) % 6.0, 0.0)
    hg = jnp.where(maxc == g, (b - r) / safe_delta + 2.0, 0.0)
    hb = jnp.where(maxc == b, (r - g) / safe_delta + 4.0, 0.0)
    h = jnp.where(delta == 0, 0.0, (hr + hg + hb) / 6.0)

    h = (h + shift_turns[:, None, None]) % 1.0

    # HSV -> RGB
    h6 = h * 6.0
    i = jnp.floor(h6)
    f = h6 - i
    pp = v * (1 - s)
    qq = v * (1 - s * f)
    tt = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    r_out = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, qq, pp, pp, tt, v])
    g_out = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [tt, v, v, qq, pp, pp])
    b_out = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [pp, pp, tt, v, v, qq])
    return jnp.stack([r_out, g_out, b_out], axis=-1)


def color_jiggle(
    key: jax.Array,
    rgb: jnp.ndarray,
    brightness: float = 0.2,
    contrast: float = 0.4,
    saturation: float = 0.4,
    hue: float = 0.025,
) -> jnp.ndarray:
    """Brightness/contrast/saturation/hue jitter with per-element factors
    (kornia ColorJiggle semantics; fixed op order — see module docstring)."""
    b = rgb.shape[0]
    ks = jax.random.split(key, 4)
    f_b = jax.random.uniform(ks[0], (b, 1, 1, 1), minval=1 - brightness, maxval=1 + brightness)
    f_c = jax.random.uniform(ks[1], (b, 1, 1, 1), minval=1 - contrast, maxval=1 + contrast)
    f_s = jax.random.uniform(ks[2], (b, 1, 1, 1), minval=1 - saturation, maxval=1 + saturation)
    f_h = jax.random.uniform(ks[3], (b,), minval=-hue, maxval=hue)

    out = jnp.clip(rgb * f_b, 0.0, 1.0)
    mean_gray = jnp.mean(_rgb_to_gray(out), axis=(1, 2), keepdims=True)[..., None]
    out = jnp.clip(f_c * out + (1 - f_c) * mean_gray, 0.0, 1.0)
    gray = _rgb_to_gray(out)[..., None]
    out = jnp.clip(f_s * out + (1 - f_s) * gray, 0.0, 1.0)
    out = jnp.clip(_adjust_hue(out, f_h), 0.0, 1.0)
    return out


def gaussian_blur_5x5(
    key: jax.Array,
    rgb: jnp.ndarray,
    sigma_range: tuple[float, float] = (3.0, 8.0),
    p: float = 0.5,
) -> jnp.ndarray:
    """5x5 Gaussian blur with per-element sigma, applied with probability p
    (kornia RandomGaussianBlur((5,5),(3,8),p=0.5); reflect padding).

    Implemented as two separable 5-tap passes of shifted adds with
    per-element weights — fully fusable elementwise work instead of a
    grouped conv with per-sample kernels.
    """
    b = rgb.shape[0]
    k1, k2 = jax.random.split(key)
    sigma = jax.random.uniform(k1, (b,), minval=sigma_range[0], maxval=sigma_range[1])
    applied = jax.random.bernoulli(k2, p, (b,))

    offsets = jnp.arange(-2, 3, dtype=rgb.dtype)
    logits = -0.5 * (offsets[None, :] / sigma[:, None]) ** 2
    taps = jnp.exp(logits)
    taps = taps / jnp.sum(taps, axis=-1, keepdims=True)  # (B, 5)

    padded = jnp.pad(rgb, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
    h, w = rgb.shape[1], rgb.shape[2]

    out_h = sum(
        taps[:, i, None, None, None] * padded[:, i : i + h, 2 : 2 + w, :] for i in range(5)
    )
    padded_h = jnp.pad(out_h, ((0, 0), (0, 0), (2, 2), (0, 0)), mode="reflect")
    # out_h already excludes horizontal pad; re-pad horizontally for pass 2
    out = sum(taps[:, i, None, None, None] * padded_h[:, :, i : i + w, :] for i in range(5))
    return jnp.where(applied[:, None, None, None], out, rgb)


def _plasma_fractal(key: jax.Array, batch: int, size: int, roughness: jnp.ndarray) -> jnp.ndarray:
    """Fractal plasma noise in [0, 1], (B, size, size); octave-upsampled
    random detail with per-element roughness controlling amplitude decay."""
    levels = int(np.log2(size))
    keys = jax.random.split(key, levels + 1)
    field = jax.random.uniform(keys[0], (batch, 2, 2))
    amp = jnp.ones((batch,))
    cur = 2
    for lvl in range(levels):
        cur = min(cur * 2, size)
        field = jax.image.resize(field, (batch, cur, cur), method="bilinear")
        amp = amp * roughness
        noise = jax.random.uniform(keys[lvl + 1], (batch, cur, cur), minval=-0.5, maxval=0.5)
        field = field + amp[:, None, None] * noise
        if cur == size:
            break
    lo = jnp.min(field, axis=(1, 2), keepdims=True)
    hi = jnp.max(field, axis=(1, 2), keepdims=True)
    return (field - lo) / jnp.maximum(hi - lo, 1e-6)


def plasma_shadow(
    key: jax.Array,
    rgb: jnp.ndarray,
    roughness: tuple[float, float] = (0.1, 0.7),
    shade_intensity: tuple[float, float] = (-1.0, 0.0),
    shade_quantity: tuple[float, float] = (0.0, 1.0),
    p: float = 0.5,
) -> jnp.ndarray:
    """Darkens the image under a fractal plasma mask (kornia
    RandomPlasmaShadow-style). Shadow pixels are where plasma < quantity;
    they are darkened additively by `intensity` (negative)."""
    b, h, w, _ = rgb.shape
    size = 1 << int(np.ceil(np.log2(max(h, w))))
    ks = jax.random.split(key, 5)
    rough = jax.random.uniform(ks[0], (b,), minval=roughness[0], maxval=roughness[1])
    intensity = jax.random.uniform(
        ks[1], (b,), minval=shade_intensity[0], maxval=shade_intensity[1]
    )
    quantity = jax.random.uniform(ks[2], (b,), minval=shade_quantity[0], maxval=shade_quantity[1])
    applied = jax.random.bernoulli(ks[3], p, (b,))

    plasma = _plasma_fractal(ks[4], b, size, rough)[:, :h, :w]
    shadow = (plasma < quantity[:, None, None]).astype(rgb.dtype)
    delta = intensity[:, None, None] * shadow * applied[:, None, None]
    return jnp.clip(rgb + delta[..., None], 0.0, 1.0)
