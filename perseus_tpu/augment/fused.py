"""Pallas-fused augmentation: the post-warp elementwise chain in one kernel.

The train-time augmentation applies, per batch element: 2x random erasing,
Planckian channel gains, brightness/contrast/saturation/hue, a 5-tap
separable blur, a plasma shadow, and the depth bias/noise/near-far-plane
chain (reference: perseus/detector/augmentations.py:361-392 + 17-169, via
the jnp ops in augment/ops.py). Composed as separate jnp ops that is ~10
read-modify-write passes over the (B, H, W, C) batch; HBM bandwidth is the
TPU's usual bottleneck, so this module fuses the whole chain into ONE
Pallas kernel that reads each image once into VMEM and writes once.

TPU layout: the kernel works on channel PLANES — each grid step processes
one image as C separate (H, W) arrays (256x256 tiles exactly onto the
8x128 VPU; an NHWC block would put C=5 in the 128-lane dimension and waste
96% of each vector op). Per-image random scalars travel as one (B, 29)
array in SMEM; the per-pixel random fields (depth noise, plane deviations)
and the plasma fractal are precomputed inputs.

Random *decisions* stay outside the kernel: every scalar and field is
sampled with the same jax.random discipline as the unfused ops, so the
fused chain is testable bit-for-bit against the pure-jnp oracle
(`reference_apply`, the golden-test pattern of SURVEY.md section 4) on the
CPU interpreter. The keypoint path is unaffected (these stages never move
pixels).

Scalar layout (per image, float32):
  0-4   erase rect 1: applied, top, left, height, width
  5-9   erase rect 2
  10,11 planckian gains: red, blue (green-normalized)
  12-15 color jiggle: brightness, contrast, saturation, hue shift (turns)
  16    blur applied
  17-21 blur taps (5)
  22    shadow intensity (pre-multiplied by applied)
  23    shadow quantity
  24-28 depth: cube_scale, near_mean, near_value, far_mean, far_value
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from perseus_tpu.augment import ops

__all__ = [
    "sample_fused_params",
    "fused_apply",
    "fused_warp_apply",
    "fused_ultra_apply",
    "reference_apply",
    "fused_supported",
]

N_SCALARS = 29


def fused_supported() -> bool:
    return jax.default_backend() == "tpu"


def sample_fused_params(key: jax.Array, cfg, b: int, h: int, w: int, c: int) -> dict:
    """Samples every random input of the fused chain: a (B, 29) scalar
    array (layout in the module docstring), the (B, 2, H, W) plane-deviation
    + additive-noise fields packed as (B, 3, H, W), and the (B, H, W)
    plasma fractal."""
    keys = jax.random.split(key, 12)
    f32 = jnp.float32

    def erase_rect(k, scale, ratio, p=0.5):
        ks = jax.random.split(k, 5)
        applied = jax.random.bernoulli(ks[0], p, (b,))
        area = jax.random.uniform(ks[1], (b,), minval=scale[0], maxval=scale[1]) * (h * w)
        aspect = jax.random.uniform(ks[2], (b,), minval=ratio[0], maxval=ratio[1])
        rect_h = jnp.clip(jnp.round(jnp.sqrt(area / aspect)), 1, h)
        rect_w = jnp.clip(jnp.round(jnp.sqrt(area * aspect)), 1, w)
        top = jnp.floor(jax.random.uniform(ks[3], (b,)) * (h - rect_h + 1))
        left = jnp.floor(jax.random.uniform(ks[4], (b,)) * (w - rect_w + 1))
        return jnp.stack([applied.astype(f32), top, left, rect_h, rect_w], axis=-1)

    if cfg.random_erasing:
        erase1 = erase_rect(keys[0], (0.02, 0.1), (2.0, 3.0))
        erase2 = erase_rect(keys[1], (0.02, 0.05), (0.8, 1.2))
    else:
        erase1 = jnp.zeros((b, 5), f32)
        erase2 = jnp.zeros((b, 5), f32)

    if cfg.planckian_jitter:
        k1, k2 = jax.random.split(keys[2])
        temps = jax.random.uniform(k1, (b,), minval=3000.0, maxval=15000.0)
        r_gain, b_gain = ops._blackbody_gains(temps)
        applied = jax.random.bernoulli(k2, 0.5, (b,))
        r_gain = jnp.where(applied, r_gain, 1.0)
        b_gain = jnp.where(applied, b_gain, 1.0)
    else:
        r_gain = jnp.ones((b,), f32)
        b_gain = jnp.ones((b,), f32)

    if cfg.color_jiggle:
        ks = jax.random.split(keys[3], 4)
        f_b = jax.random.uniform(ks[0], (b,), minval=1 - cfg.brightness, maxval=1 + cfg.brightness)
        f_c = jax.random.uniform(ks[1], (b,), minval=1 - cfg.contrast, maxval=1 + cfg.contrast)
        f_s = jax.random.uniform(ks[2], (b,), minval=1 - cfg.saturation, maxval=1 + cfg.saturation)
        f_h = jax.random.uniform(ks[3], (b,), minval=-cfg.hue, maxval=cfg.hue)
    else:
        f_b = jnp.ones((b,), f32)
        f_c = jnp.ones((b,), f32)
        f_s = jnp.ones((b,), f32)
        f_h = jnp.zeros((b,), f32)

    if cfg.blur:
        k1, k2 = jax.random.split(keys[4])
        sigma = jax.random.uniform(k1, (b,), minval=3.0, maxval=8.0)
        blur_applied = jax.random.bernoulli(k2, 0.5, (b,)).astype(f32)
        offsets = jnp.arange(-2, 3, dtype=f32)
        taps = jnp.exp(-0.5 * (offsets[None, :] / sigma[:, None]) ** 2)
        taps = taps / jnp.sum(taps, axis=-1, keepdims=True)
    else:
        blur_applied = jnp.zeros((b,), f32)
        taps = jnp.zeros((b, 5), f32)

    if cfg.random_plasma_shadow:
        size = 1 << int(np.ceil(np.log2(max(h, w))))
        ks = jax.random.split(keys[5], 5)
        rough = jax.random.uniform(ks[0], (b,), minval=0.1, maxval=0.7)
        intensity = jax.random.uniform(ks[1], (b,), minval=-1.0, maxval=0.0)
        quantity = jax.random.uniform(ks[2], (b,), minval=0.0, maxval=1.0)
        applied = jax.random.bernoulli(ks[3], 0.5, (b,))
        plasma = ops._plasma_fractal(ks[4], b, size, rough)[:, :h, :w]
        intensity = intensity * applied
    else:
        plasma = jnp.zeros((b, h, w), f32)
        intensity = jnp.zeros((b,), f32)
        quantity = jnp.zeros((b,), f32)

    has_depth = c > 3
    add_field = jnp.zeros((b, h, w), f32)
    near_field = jnp.zeros((b, h, w), f32)
    far_field = jnp.zeros((b, h, w), f32)
    near_mean_v, far_mean_v = -np.inf, np.inf
    if has_depth:
        if cfg.random_bias:
            k_keep, k_u = jax.random.split(keys[6])
            keep = jax.random.bernoulli(k_keep, 1.0 - cfg.p_bias, (b, h, w))
            u = jax.random.uniform(k_u, (b, h, w), minval=-1.0, maxval=1.0)
            add_field = add_field + cfg.dev_bias * (keep / (1.0 - cfg.p_bias)) * u
        if cfg.depth_gaussian_noise:
            add_field = add_field + cfg.std_gaussian_noise * jax.random.normal(keys[7], (b, h, w))
        if cfg.random_near_plane or cfg.random_far_plane:
            k1, k2, k3, k4 = jax.random.split(keys[8], 4)
            p_near = cfg.p_near_plane if cfg.random_near_plane else 1.0
            p_far = cfg.p_far_plane if cfg.random_far_plane else 1.0
            keep_n = jax.random.bernoulli(k1, 1.0 - p_near, (b, h, w))
            near_field = cfg.dev_near_plane * (keep_n / max(1.0 - p_near, 1e-6)) * (
                jax.random.uniform(k2, (b, h, w), minval=-1.0, maxval=1.0)
            )
            keep_f = jax.random.bernoulli(k3, 1.0 - p_far, (b, h, w))
            far_field = cfg.dev_far_plane * (keep_f / max(1.0 - p_far, 1e-6)) * (
                jax.random.uniform(k4, (b, h, w), minval=-1.0, maxval=1.0)
            )
            near_mean_v = cfg.scaled_near_plane_mean
            far_mean_v = cfg.scaled_far_plane_mean

    depth_scalars = jnp.tile(
        jnp.asarray([cfg.cube_scale, near_mean_v, cfg.near_value, far_mean_v, cfg.far_value], f32),
        (b, 1),
    )
    # Per-pixel noise fields travel as bf16: augmentation noise quantized to
    # 8 mantissa bits is statistically indistinguishable downstream (the
    # model consumes bf16 anyway), and fields+plasma are 7/12 of the fused
    # kernel's input bytes. The convert fuses into the generating ops, and
    # the kernels/oracle upcast to f32 at load so the math is unchanged.
    store = jnp.bfloat16
    scalars = jnp.concatenate(
        [
            erase1,
            erase2,
            r_gain[:, None],
            b_gain[:, None],
            f_b[:, None],
            f_c[:, None],
            f_s[:, None],
            f_h[:, None],
            blur_applied[:, None],
            taps,
            intensity[:, None],
            quantity[:, None],
            depth_scalars,
        ],
        axis=-1,
    )
    assert scalars.shape == (b, N_SCALARS)
    fields = jnp.stack([add_field, near_field, far_field], axis=1)  # (B, 3, H, W)
    return {
        "scalars": scalars,
        "fields": fields.astype(store),
        "plasma": plasma.astype(store),
    }


def _reflect_pad(x, axis):
    """Reflect-pad by 2 on one axis of an (H, W) plane via static single-row
    slices (no jnp.flip: Mosaic has no `rev` lowering)."""
    n = x.shape[axis]
    s = lambda a, b: jax.lax.slice_in_dim(x, a, b, axis=axis)
    return jnp.concatenate([s(2, 3), s(1, 2), x, s(n - 2, n - 1), s(n - 3, n - 2)], axis=axis)


def _blur_plane(x, taps):
    """5-tap separable blur with reflect padding on one (H, W) plane."""
    h, w = x.shape
    p = _reflect_pad(x, 0)
    x = sum(taps[i] * jax.lax.slice_in_dim(p, i, i + h, axis=0) for i in range(5))
    p = _reflect_pad(x, 1)
    return sum(taps[i] * jax.lax.slice_in_dim(p, i, i + w, axis=1) for i in range(5))


def _hue_planes(r, g, b, shift):
    """Hue rotation on channel planes. Uses *ordering* comparisons
    (r >= g, ...) instead of equality against the computed max — equality
    breaks under the fp contraction differences of the Pallas lowering."""
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    safe_delta = jnp.where(delta == 0, 1.0, delta)
    s = jnp.where(v > 0, delta / jnp.where(v > 0, v, 1.0), 0.0)
    r_max = (r >= g) & (r >= b)
    g_max = (g > r) & (g >= b)
    hr = ((g - b) / safe_delta) % 6.0
    hg = (b - r) / safe_delta + 2.0
    hb = (r - g) / safe_delta + 4.0
    hh = jnp.where(r_max, hr, jnp.where(g_max, hg, hb)) / 6.0
    hh = jnp.where(delta == 0, 0.0, hh)
    hh = (hh + shift) % 1.0
    h6 = hh * 6.0
    i = jnp.floor(h6)
    f = h6 - i
    pp = v * (1 - s)
    qq = v * (1 - s * f)
    tt = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6

    def sel(vals):
        # where-chain instead of jnp.select: select lowers through a bool
        # argmax that the Mosaic TPU backend does not implement
        out = vals[5]
        for k in range(4, -1, -1):
            out = jnp.where(i == k, vals[k], out)
        return out

    return (
        sel([v, qq, pp, pp, tt, v]),
        sel([tt, v, v, qq, pp, pp]),
        sel([pp, pp, tt, v, v, qq]),
    )


def _chain_planes(planes: list[jnp.ndarray], plasma, fields, sv):
    """The fused math on one image as C channel (H, W) planes. `sv` is the
    29-scalar vector (module docstring layout) as traced scalars. Shared
    verbatim by the Pallas kernel body and the jnp oracle."""
    c = len(planes)
    h, w = planes[0].shape
    f32 = planes[0].dtype

    # int32 iota + cast: Mosaic's tpu.iota only produces integer vectors
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(f32)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(f32)

    def erase_mask(o):
        applied, top, left, rh, rw = sv[o], sv[o + 1], sv[o + 2], sv[o + 3], sv[o + 4]
        inside = (ys >= top) & (ys < top + rh) & (xs >= left) & (xs < left + rw)
        return inside & (applied > 0.5)

    mask = erase_mask(0) | erase_mask(5)
    planes = [jnp.where(mask, 0.0, p) for p in planes]

    clip = lambda x: jnp.clip(x, 0.0, 1.0)
    r, g, b = planes[0], planes[1], planes[2]
    # planckian gains + brightness
    f_b = sv[12]
    r = clip(clip(r * sv[10]) * f_b)
    g = clip(g * f_b)
    b = clip(clip(b * sv[11]) * f_b)
    # contrast about the global gray mean (free: the image is VMEM-resident)
    f_c = sv[13]
    gray = r * 0.299 + g * 0.587 + b * 0.114
    mean_gray = jnp.mean(gray)
    r = clip(f_c * r + (1 - f_c) * mean_gray)
    g = clip(f_c * g + (1 - f_c) * mean_gray)
    b = clip(f_c * b + (1 - f_c) * mean_gray)
    # saturation
    f_s = sv[14]
    gray = r * 0.299 + g * 0.587 + b * 0.114
    r = clip(f_s * r + (1 - f_s) * gray)
    g = clip(f_s * g + (1 - f_s) * gray)
    b = clip(f_s * b + (1 - f_s) * gray)
    # hue (HSV roundtrip is not bit-exact at shift 0, so keep the input then)
    f_h = sv[15]
    hr, hg, hb = _hue_planes(r, g, b, f_h)
    r = jnp.where(f_h == 0.0, r, clip(hr))
    g = jnp.where(f_h == 0.0, g, clip(hg))
    b = jnp.where(f_h == 0.0, b, clip(hb))
    # separable 5-tap blur
    taps = [sv[17], sv[18], sv[19], sv[20], sv[21]]
    blur_on = sv[16] > 0.5
    r = jnp.where(blur_on, _blur_plane(r, taps), r)
    g = jnp.where(blur_on, _blur_plane(g, taps), g)
    b = jnp.where(blur_on, _blur_plane(b, taps), b)
    # plasma shadow
    delta_sh = sv[22] * (plasma < sv[23]).astype(f32)
    r = clip(r + delta_sh)
    g = clip(g + delta_sh)
    b = clip(b + delta_sh)

    out = [r, g, b]
    if c > 3:
        cs, near_mean, near_value, far_mean, far_value = sv[24], sv[25], sv[26], sv[27], sv[28]
        scaled = cs * planes[3] + fields[0]
        scaled = jnp.where(scaled < near_mean + fields[1], near_value, scaled)
        scaled = jnp.where(scaled > far_mean + fields[2], far_value, scaled)
        out.append(scaled / cs)
    if c > 4:
        out.extend(planes[4:])
    return out


def _kernel(scalars_ref, img_ref, plasma_ref, fields_ref, out_ref):
    i = pl.program_id(0)
    c = img_ref.shape[1]
    # storage dtype may be bf16 (halves the HBM traffic, which is what this
    # kernel is bound by); all math runs in f32 in VMEM, cast at load/store
    planes = [img_ref[0, k].astype(jnp.float32) for k in range(c)]
    sv = [scalars_ref[i, k] for k in range(N_SCALARS)]
    fields = [fields_ref[0, k].astype(jnp.float32) for k in range(3)]
    out = _chain_planes(planes, plasma_ref[0].astype(jnp.float32), fields, sv)
    for k in range(c):
        out_ref[0, k] = out[k].astype(out_ref.dtype)


def _warp_planes(planes, rho_t, gam, s, w):
    """Two-pass affine warp of channel planes via lane gathers (the
    warp_pallas math, shared by the fused kernels)."""
    from perseus_tpu.augment.warp_pallas import _gather_cols

    f32 = jnp.float32
    r0 = jnp.floor(rho_t)
    fv = rho_t - r0
    i0 = r0.astype(jnp.int32)
    v_idx0 = jnp.clip(i0, 0, s - 1)
    v_idx1 = jnp.clip(i0 + 1, 0, s - 1)
    v_w0 = ((i0 >= 0) & (i0 < s)).astype(f32) * (1.0 - fv)
    v_w1 = ((i0 + 1 >= 0) & (i0 + 1 < s)).astype(f32) * fv

    g0 = jnp.floor(gam)
    fh = gam - g0
    j0 = g0.astype(jnp.int32)
    h_idx0 = jnp.clip(j0, 0, w - 1)
    h_idx1 = jnp.clip(j0 + 1, 0, w - 1)
    h_w0 = ((j0 >= 0) & (j0 < w)).astype(f32) * (1.0 - fh)
    h_w1 = ((j0 + 1 >= 0) & (j0 + 1 < w)).astype(f32) * fh

    out = []
    for p in planes:
        inter_t = _gather_cols(p.T, v_idx0) * v_w0 + _gather_cols(p.T, v_idx1) * v_w1
        inter = inter_t.T
        out.append(_gather_cols(inter, h_idx0) * h_w0 + _gather_cols(inter, h_idx1) * h_w1)
    return out


def _transplant_planes(planes, donor, lb: float, ub: float):
    """Depth-layered donor transplantation on channel planes — the kernel
    form of ops.transplant_with_depth (same mask algebra)."""
    f32 = planes[0].dtype
    depth, seg = planes[3], planes[4]
    d_depth, d_seg = donor[3], donor[4]
    acc_cube = seg == 1.0
    donor_cube = d_seg == 1.0
    donor_mask = (~acc_cube) | ((d_depth * acc_cube) < (depth * acc_cube))
    donor_mask = donor_mask & ~donor_cube
    new_planes = [jnp.where(donor_mask, donor[k], planes[k]) for k in range(4)]
    new_seg = 1.0 - donor_mask.astype(f32)
    new_seg = jnp.where(donor_cube & ~acc_cube, 0.0, new_seg)
    new_planes.append(new_seg)
    ratio = jnp.mean(new_seg)
    ok = (ratio >= lb) & (ratio <= ub)
    return [jnp.where(ok, n, o) for n, o in zip(new_planes, planes)]


def _kernel_warp(scalars_ref, img_ref, rho_ref, gam_ref, plasma_ref, fields_ref, out_ref):
    """Affine warp (two-pass lane gathers, as in warp_pallas) + the fused
    elementwise chain, in ONE kernel: each image is read from HBM once,
    warped and augmented entirely in VMEM, and written once."""
    i = pl.program_id(0)
    c = img_ref.shape[1]
    _, _, h, w = out_ref.shape
    s = img_ref.shape[2]

    planes = [img_ref[0, ci].astype(jnp.float32) for ci in range(c)]
    planes = _warp_planes(planes, rho_ref[0], gam_ref[0], s, w)
    sv = [scalars_ref[i, k] for k in range(N_SCALARS)]
    fields = [fields_ref[0, k].astype(jnp.float32) for k in range(3)]
    out = _chain_planes(planes, plasma_ref[0].astype(jnp.float32), fields, sv)
    for k in range(c):
        out_ref[0, k] = out[k].astype(out_ref.dtype)


def _make_ultra_kernel(lb: float, ub: float):
    """Kernel factory: transplantation (prefetch-indexed donor block) ->
    conditional swap transpose -> two-pass warp -> fused elementwise chain.
    The ENTIRE train-time augmentation pipeline in one VMEM-resident pass."""

    def kernel(
        scalars_ref, donor_ref, img_ref, donor_img_ref, rho_ref, gam_ref,
        plasma_ref, fields_ref, out_ref,
    ):
        i = pl.program_id(0)
        c = img_ref.shape[1]
        _, _, h, w = out_ref.shape
        s = img_ref.shape[2]

        # bf16 storage halves this kernel's HBM traffic (its bound); all
        # VMEM math stays f32 via load casts, with one cast at store
        planes = [img_ref[0, ci].astype(jnp.float32) for ci in range(c)]
        donor = [donor_img_ref[0, ci].astype(jnp.float32) for ci in range(c)]
        planes = _transplant_planes(planes, donor, lb, ub)
        # the Catmull-Smith swap prologue, applied in VMEM after the
        # transplant (acceptor and donor must composite in the ORIGINAL
        # orientation; their swap flags can differ)
        swap = scalars_ref[i, N_SCALARS] > 0.5
        planes = [jnp.where(swap, p.T, p) for p in planes]
        planes = _warp_planes(planes, rho_ref[0], gam_ref[0], s, w)
        sv = [scalars_ref[i, k] for k in range(N_SCALARS)]
        fields = [fields_ref[0, k].astype(jnp.float32) for k in range(3)]
        out = _chain_planes(planes, plasma_ref[0].astype(jnp.float32), fields, sv)
        for k in range(c):
            out_ref[0, k] = out[k].astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_apply(images: jnp.ndarray, params: dict, interpret: bool = False) -> jnp.ndarray:
    """Applies the fused chain to an NHWC batch with one Pallas kernel.

    Grid = (B,); each step processes one image as C channel planes in VMEM.
    The 29 per-image scalars arrive via scalar prefetch (SMEM, whole array,
    indexed by program id). `params` is the dict from
    :func:`sample_fused_params`.
    """
    b, h, w, c = images.shape
    # only the scalars are upcast here; fields/plasma keep their (bf16)
    # storage dtype and the kernel upcasts them at load
    params = dict(params, scalars=params["scalars"].astype(jnp.float32))
    planes = jnp.moveaxis(images, -1, 1)  # (B, C, H, W)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, w), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 3, h, w), lambda i, *_: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, c, h, w), lambda i, *_: (i, 0, 0, 0)),
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), images.dtype),
        interpret=interpret,
    )(params["scalars"], planes, params["plasma"], params["fields"])
    return jnp.moveaxis(out, 1, -1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_warp_apply(
    images_sw: jnp.ndarray,  # (B, H, W, C) float32, swap-adjusted (ops._two_pass_setup)
    warp_params: jnp.ndarray,  # (B, 6): i00, i01, t0, p, q, r
    params: dict,
    interpret: bool = False,
) -> jnp.ndarray:
    """Affine warp + the fused elementwise chain in one Pallas kernel.

    Combines warp_pallas (the kornia RandomAffine role) and fused_apply:
    one HBM read and one write per image for the entire
    warp -> erase -> color -> blur -> shadow -> depth pipeline stage stack.
    Callers prepare `images_sw`/`warp_params` exactly as for
    ops.warp_affine_bilinear(method="pallas")."""
    b, h, w, c = images_sw.shape
    f32 = jnp.float32
    i00, i01, t0, p, q, r = (warp_params[:, k].astype(f32) for k in range(6))
    ys = jnp.arange(h, dtype=f32)
    xs = jnp.arange(w, dtype=f32)
    rho_t = (
        q[:, None, None] * ys[None, None, :]
        + p[:, None, None] * xs[None, :, None]
        + r[:, None, None]
    )
    gam = (
        i01[:, None, None] * ys[None, :, None]
        + i00[:, None, None] * xs[None, None, :]
        + t0[:, None, None]
    )
    # single materialized evaluation (see warp_pallas module docstring: an
    # index plane recomputed per consumer can fma-contract differently and
    # desynchronize the gather index from its blend weight)
    rho_t, gam = jax.lax.optimization_barrier((rho_t, gam))

    params = dict(params, scalars=params["scalars"].astype(f32))
    planes = jnp.moveaxis(images_sw, -1, 1)  # (B, C, H, W)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, w, h), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, h, w), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, h, w), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 3, h, w), lambda i, *_: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, c, h, w), lambda i, *_: (i, 0, 0, 0)),
    )
    out = pl.pallas_call(
        _kernel_warp,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), images_sw.dtype),
        # warp index/weight planes + C channel intermediates exceed the
        # default 16 MB scoped-vmem stack at 256x256x5; v5e has 128 MB VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(params["scalars"], planes, rho_t, gam, params["plasma"], params["fields"])
    return jnp.moveaxis(out, 1, -1)


@functools.partial(jax.jit, static_argnames=("lb", "ub", "interpret"))
def fused_ultra_apply(
    images: jnp.ndarray,  # (B, H, W, C=5) f32 or bf16, ORIGINAL orientation
    donor_idx: jnp.ndarray,  # (B,) int32 donor element per image
    swap: jnp.ndarray,  # (B,) bool two-pass swap flags (ops._two_pass_params)
    warp_params: jnp.ndarray,  # (B, 6): i00, i01, t0, p, q, r (swap-adjusted)
    params: dict,
    lb: float = 0.02,
    ub: float = 0.7,
    interpret: bool = False,
) -> jnp.ndarray:
    """Transplantation + affine warp + the fused elementwise chain in ONE
    Pallas kernel. The donor image block arrives by indexing the SAME input
    array with a prefetch-scalar index map (no materialized gathered copy),
    so the whole train-time augmentation is one HBM read (+ one donor-block
    read) and one write per image."""
    b, h, w, c = images.shape
    f32 = jnp.float32
    i00, i01, t0, p, q, r = (warp_params[:, k].astype(f32) for k in range(6))
    ys = jnp.arange(h, dtype=f32)
    xs = jnp.arange(w, dtype=f32)
    rho_t = (
        q[:, None, None] * ys[None, None, :]
        + p[:, None, None] * xs[None, :, None]
        + r[:, None, None]
    )
    gam = (
        i01[:, None, None] * ys[None, :, None]
        + i00[:, None, None] * xs[None, None, :]
        + t0[:, None, None]
    )
    rho_t, gam = jax.lax.optimization_barrier((rho_t, gam))

    params = dict(params, scalars=params["scalars"].astype(f32))
    scalars = jnp.concatenate(
        [params["scalars"], swap.astype(f32)[:, None]], axis=-1
    )  # (B, N_SCALARS + 1)
    # images may be bf16 (the device-resident dataset's storage dtype):
    # the kernel loads/stores in the storage dtype and computes f32 in VMEM
    planes = jnp.moveaxis(images, -1, 1)  # (B, C, H, W)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # scalars + donor_idx
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda i, s_, d_: (i, 0, 0, 0)),
            pl.BlockSpec((1, c, h, w), lambda i, s_, d_: (d_[i], 0, 0, 0)),
            pl.BlockSpec((1, w, h), lambda i, s_, d_: (i, 0, 0)),
            pl.BlockSpec((1, h, w), lambda i, s_, d_: (i, 0, 0)),
            pl.BlockSpec((1, h, w), lambda i, s_, d_: (i, 0, 0)),
            pl.BlockSpec((1, 3, h, w), lambda i, s_, d_: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, c, h, w), lambda i, s_, d_: (i, 0, 0, 0)),
    )
    out = pl.pallas_call(
        _make_ultra_kernel(lb, ub),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), images.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(
        scalars,
        donor_idx.astype(jnp.int32),
        planes,
        planes,
        rho_t,
        gam,
        params["plasma"],
        params["fields"],
    )
    return jnp.moveaxis(out, 1, -1)


def reference_apply(images: jnp.ndarray, params: dict) -> jnp.ndarray:
    """Pure-jnp oracle: vmapped `_chain_planes`, bit-comparable with the
    kernel (which, like this oracle, upcasts storage-dtype planes to f32,
    computes in f32, and casts back at the output)."""
    params = jax.tree.map(lambda x: x.astype(jnp.float32), params)
    c = images.shape[-1]

    def one(img, plasma, fields, scalars):
        planes = [img[..., k].astype(jnp.float32) for k in range(c)]
        sv = [scalars[k] for k in range(N_SCALARS)]
        out = _chain_planes(planes, plasma, [fields[k] for k in range(3)], sv)
        return jnp.stack(out, axis=-1).astype(images.dtype)

    return jax.vmap(one)(images, params["plasma"], params["fields"], params["scalars"])
