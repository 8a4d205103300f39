"""Pallas TPU affine-warp kernel: two-pass bilinear resampling via
``tpu.dynamic_gather``.

Replaces the one-hot-matmul MXU warp (ops._warp_affine_mxu) on TPU. The
math is identical — the Catmull-Smith two-pass decomposition of a per-image
affine (the role of kornia RandomAffine in the reference,
perseus/detector/augmentations.py:352-359) — but each 1-D resample is a
hardware gather (``jnp.take_along_axis`` lowers to ``tpu.dynamic_gather``)
instead of a one-hot einsum. The one-hot selectors were the train step's
dominant cost: ~4 bytes of HBM selector traffic per source row per output
pixel; the gather kernel touches each image a handful of times and runs in
f32 (so identity affines are bit-exact, unlike the bf16 one-hot picks).

Two hardware constraints shape the kernel:
  * ``dynamic_gather`` requires the source to span a single vreg along the
    gather dimension, so gathers run along the LANE axis in 128-wide blocks
    (pass 1 operates on the transposed plane).
  * The fractional source-index planes (rhoT, gam) are computed OUTSIDE the
    kernel behind ``lax.optimization_barrier`` and passed in as arrays: if
    their mul-add chains were inlined into multiple consumers, the backend
    may contract them into fma differently per use site, making the gather
    index and the blend weight disagree by a whole tap at exact-integer
    indices (observed on XLA:CPU). A materialized array is read-only, so
    every consumer sees the same bits.

Layout: planar (B, C, H, W) float32 blocks — NHWC's C-minor layout would
waste 128/C of VMEM per tile. The NHWC<->planar transposes happen in XLA
around the kernel and are bandwidth-cheap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["warp_affine_pallas"]

_LANE = 128  # tpu.dynamic_gather is limited to one vreg along the gather dim


def _gather_cols(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """out[i, j] = x[i, idx[i, j]] for 2D x with idx pre-clipped in range.

    Mosaic's dynamic_gather requires the source to span a single vreg along
    the gather dimension, so sources wider than 128 lanes are processed as
    128-lane blocks: each output block selects among per-block gathers.
    """
    take = functools.partial(jnp.take_along_axis, mode="promise_in_bounds")
    h, w = x.shape
    if w <= _LANE:
        return take(x, idx, axis=1)
    nb = w // _LANE
    assert w % _LANE == 0, "width must be a multiple of 128 lanes"
    xb = [x[:, k * _LANE : (k + 1) * _LANE] for k in range(nb)]
    out_blocks = []
    for lb in range(nb):
        il = idx[:, lb * _LANE : (lb + 1) * _LANE]
        acc = jnp.zeros_like(il, dtype=x.dtype)
        for k in range(nb):
            g = take(xb[k], jnp.clip(il - k * _LANE, 0, _LANE - 1), axis=1)
            acc = jnp.where((il >= k * _LANE) & (il < (k + 1) * _LANE), g, acc)
        out_blocks.append(acc)
    return jnp.concatenate(out_blocks, axis=1)


def _warp_kernel(img_ref, rho_ref, gam_ref, out_ref):
    _, c, h, w = out_ref.shape
    s = img_ref.shape[2]  # source rows
    f32 = jnp.float32

    # pass 1 (transposed): interT(x_in, y) = imgT(x_in, rhoT[x_in, y])
    rhoT = rho_ref[0]
    r0 = jnp.floor(rhoT)
    fv = rhoT - r0
    i0 = r0.astype(jnp.int32)
    v_idx0 = jnp.clip(i0, 0, s - 1)
    v_idx1 = jnp.clip(i0 + 1, 0, s - 1)
    # out-of-range taps contribute zero (the reference gather's zero padding)
    v_w0 = ((i0 >= 0) & (i0 < s)).astype(f32) * (1.0 - fv)
    v_w1 = ((i0 + 1 >= 0) & (i0 + 1 < s)).astype(f32) * fv

    # pass 2: out(y, x) = inter(y, gam[y, x])
    gam = gam_ref[0]
    g0 = jnp.floor(gam)
    fh = gam - g0
    j0 = g0.astype(jnp.int32)
    h_idx0 = jnp.clip(j0, 0, w - 1)
    h_idx1 = jnp.clip(j0 + 1, 0, w - 1)
    h_w0 = ((j0 >= 0) & (j0 < w)).astype(f32) * (1.0 - fh)
    h_w1 = ((j0 + 1 >= 0) & (j0 + 1 < w)).astype(f32) * fh

    for ci in range(c):
        plane_t = img_ref[0, ci].T  # (W_in, S)
        inter_t = _gather_cols(plane_t, v_idx0) * v_w0 + _gather_cols(plane_t, v_idx1) * v_w1
        inter = inter_t.T  # (H, W_in)
        out_ref[0, ci] = (
            _gather_cols(inter, h_idx0) * h_w0 + _gather_cols(inter, h_idx1) * h_w1
        )


def warp_affine_pallas(
    images: jnp.ndarray,  # (B, H, W, C) float32, already swap-adjusted
    params: jnp.ndarray,  # (B, 6) float32: i00, i01, t0, p, q, r
    interpret: bool = False,
) -> jnp.ndarray:
    """Runs the two-pass warp kernel. Callers use ops.warp_affine_bilinear
    (method="pallas"), which handles the swap prologue and parameter setup."""
    b, h, w, c = images.shape
    f32 = jnp.float32
    i00, i01, t0, p, q, r = (params[:, k].astype(f32) for k in range(6))
    ys = jnp.arange(h, dtype=f32)
    xs = jnp.arange(w, dtype=f32)
    # pass-1 vertical map, transposed orientation: rhoT[b, x_in, y]
    rho_t = (
        q[:, None, None] * ys[None, None, :]
        + p[:, None, None] * xs[None, :, None]
        + r[:, None, None]
    )
    # pass-2 horizontal map: gam[b, y, x]
    gam = (
        i01[:, None, None] * ys[None, :, None]
        + i00[:, None, None] * xs[None, None, :]
        + t0[:, None, None]
    )
    # Single materialized evaluation — see the module docstring.
    rho_t, gam = jax.lax.optimization_barrier((rho_t, gam))

    imgs_p = jnp.transpose(images.astype(f32), (0, 3, 1, 2))
    out = pl.pallas_call(
        _warp_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, w, h), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), f32),
        interpret=interpret,
    )(imgs_p, rho_t, gam)
    return jnp.transpose(out, (0, 2, 3, 1))
