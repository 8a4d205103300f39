"""Pallas fused maxpool (3x3, stride 2, pad 1) forward + gradient.

Replaces the stem maxpool's XLA lowering in the train step (reference role:
torch ``MaxPool2d(3, 2, 1)`` inside ResNet-18, perseus/detector/models.py:9
via torchvision). The round-4 on-chip profile measured XLA's pair at ~3x
its HBM roofline on the (B, 128, 128, 64) stem activation:

  * forward ``reduce_window``-max: 1.63 ms/step (``pad_maximum_fusion`` —
    XLA materializes the -inf padded plane),
  * backward ``select-and-scatter``: 2.15 ms/step.

Round 5's first attempt re-expressed the gradient as parity-split
comparisons at the XLA level and REGRESSED to ~6.3 ms (the shifted compare
planes got materialized to HBM; see models/resnet.py::MAXPOOL_CMP_VJP).
The conclusion recorded there — "the decomposition is only a win inside a
single VMEM-resident kernel" — is this module: each image's pooling
forward/backward runs entirely in VMEM, so HBM sees exactly one read of
the operands and one write of the result.

Layout: stride-2 vector slicing does not lower on TPU (Mosaic rejects
strided `lax.slice` and >2D gathers), so the W parity split is packed into
LANES instead: callers reshape NHWC to (B, H, W/2, 2C) — a minor-dims
merge that XLA fuses into the producing/consuming elementwise ops — where
lanes [0:C) are the even column and [C:2C) the odd column of each pair.
For the stem's C=64 that makes 128 lanes, exactly one vector tile. The H
parity split stays an outer-dim reshape (layout-free), and the remaining
shifts are static-slice concatenations on the outer/sublane dims, all of
which Mosaic lowers natively.

Math (identical to the XLA ops): with even H/W and the 3x3/s2/p1
geometry, output row p's window covers input rows {2p-1, 2p, 2p+1}; so
input row 2p is covered only by window p, and row 2p+1 by windows
{p, p+1} (same for columns). Forward reduces the pair-max of rows
(2p, 2p+1) with the shifted odd row 2p-1; backward routes g[p, q] to
every input position equal to y[p, q] (exact compare — reduce-window max
returns one of its inputs bit-identically). Tie semantics match
MAXPOOL_CMP_VJP, not select-and-scatter (which picks ONE argmax):
positive-value ties are measure-zero for float activations, and the tie
class that does occur — exact zeros after the preceding ReLU — is
annihilated by ReLU's VJP anyway.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["max_pool_3x3_s2_pallas"]


def _fwd_kernel(xp_ref, y_ref):
    """One image: packed (1, H, W/2, 2C) -> (1, H/2, W/2, C) windowed max.

    Mosaic layout discipline: concatenations only ever see offset-0
    operands (concat FIRST on the full packed array, lane-slice AFTER) —
    Mosaic v5e rejects tpu.concatenate with a lane-offset operand
    ("result/input offset mismatch on non-concat dimension").
    """
    xp = xp_ref[0]  # (H, W2, 2C)
    h, w2, c2 = xp.shape
    c = c2 // 2
    ninf = jnp.asarray(-jnp.inf, xp.dtype)
    # rows: pair-max of (2p, 2p+1), then fold in the shifted odd row 2p-1
    xs = xp.reshape(h // 2, 2, w2, c2)
    xe, xo = xs[:, 0], xs[:, 1]
    prev = jnp.concatenate([jnp.full((1, w2, c2), ninf, xp.dtype), xo[:-1]], axis=0)
    rm = jnp.maximum(jnp.maximum(xe, xo), prev)  # (H/2, W2, 2C)
    # columns: even lane group vs odd lane group vs previous pair's odd
    prev_full = jnp.concatenate(
        [jnp.full((h // 2, 1, c2), ninf, xp.dtype), rm[:, :-1]], axis=1
    )
    y_ref[0] = jnp.maximum(jnp.maximum(rm[..., :c], rm[..., c:]), prev_full[..., c:])


def _bwd_kernel(xp_ref, y_ref, g_ref, dxp_ref):
    """One image: route g[p, q] to every x position equal to its window max.

    Parity split: input (2p+dr, 2q+dc) is covered by windows
    {p..p+dr} x {q..q+dc}, so the four parity sub-grids need 1/2/2/4
    compare-accumulate terms. All shifted planes live in VMEM only.
    """
    # compares run in f32: v5e's VPU has no bf16 cmpf ("Target does not
    # support this comparison"), and bf16->f32 is exact so equality is
    # preserved bit-for-bit
    xp = xp_ref[0].astype(jnp.float32)  # (H, W2, 2C)
    y = y_ref[0].astype(jnp.float32)  # (H/2, W2, C)
    g = g_ref[0].astype(jnp.float32)
    h, w2, c2 = xp.shape
    c = c2 // 2
    h2 = h // 2
    ninf = jnp.asarray(-jnp.inf, xp.dtype)
    zero = jnp.zeros((), xp.dtype)

    xs = xp.reshape(h2, 2, w2, c2)
    x_ee, x_eo = xs[:, 0, :, :c], xs[:, 0, :, c:]
    x_oe, x_oo = xs[:, 1, :, :c], xs[:, 1, :, c:]

    # "next window" shifts; -inf / 0 fills make the last odd row/col take
    # gradient only from its single covering window. Sublane shifts are
    # pad-THEN-slice so every concat operand is offset-0 (see _fwd_kernel).
    ninf_col = jnp.full((h2, 1, c), ninf, xp.dtype)
    zero_col = jnp.zeros((h2, 1, c), xp.dtype)

    def shift_left(a, pad):
        return jnp.concatenate([a, pad], axis=1)[:, 1:]

    y_d = jnp.concatenate([y[1:], jnp.full((1, w2, c), ninf, xp.dtype)], axis=0)
    g_d = jnp.concatenate([g[1:], jnp.zeros((1, w2, c), xp.dtype)], axis=0)
    y_r = shift_left(y, ninf_col)
    g_r = shift_left(g, zero_col)
    y_dr = shift_left(y_d, ninf_col)
    g_dr = shift_left(g_d, zero_col)

    dx_ee = jnp.where(x_ee == y, g, zero)
    dx_oe = jnp.where(x_oe == y, g, zero) + jnp.where(x_oe == y_d, g_d, zero)
    dx_eo = jnp.where(x_eo == y, g, zero) + jnp.where(x_eo == y_r, g_r, zero)
    dx_oo = (
        jnp.where(x_oo == y, g, zero)
        + jnp.where(x_oo == y_d, g_d, zero)
        + jnp.where(x_oo == y_r, g_r, zero)
        + jnp.where(x_oo == y_dr, g_dr, zero)
    )
    even_rows = jnp.concatenate([dx_ee, dx_eo], axis=-1)  # (H/2, W2, 2C)
    odd_rows = jnp.concatenate([dx_oe, dx_oo], axis=-1)
    dxp = jnp.stack([even_rows, odd_rows], axis=1).reshape(h, w2, c2)
    dxp_ref[0] = dxp.astype(dxp_ref.dtype)


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pool_fwd_call(x: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    b, h, w, c = x.shape
    w2 = w // 2
    xp = x.reshape(b, h, w2, 2 * c)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w2, 2 * c), lambda i: (i, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, h // 2, w2, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, w2, c), x.dtype),
        # f32 VMEM intermediates exceed the 16 MB scoped-vmem default;
        # v5e has 128 MB (same setting as augment/fused.py)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xp)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pool_bwd_call(
    x: jnp.ndarray, y: jnp.ndarray, g: jnp.ndarray, interpret: bool
) -> jnp.ndarray:
    b, h, w, c = x.shape
    w2 = w // 2
    xp = x.reshape(b, h, w2, 2 * c)
    dxp = pl.pallas_call(
        _bwd_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w2, 2 * c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, h // 2, w2, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, h // 2, w2, c), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, w2, 2 * c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w2, 2 * c), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xp, y, g)
    return dxp.reshape(b, h, w, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def max_pool_3x3_s2_pallas(x: jnp.ndarray, interpret: bool | None = None):
    """torch ``MaxPool2d(3, 2, 1)`` on an NHWC batch with even H and W,
    forward and VJP each one VMEM-resident Pallas kernel. ``interpret``
    defaults to True off-TPU (CPU tests / mesh dryruns)."""
    if interpret is None:
        interpret = _interpret_default()
    return _pool_fwd_call(x, interpret)


def _vjp_fwd(x, interpret):
    if interpret is None:
        interpret = _interpret_default()
    y = _pool_fwd_call(x, interpret)
    return y, (x, y)


def _vjp_bwd(interpret, res, g):
    if interpret is None:
        interpret = _interpret_default()
    x, y = res
    return (_pool_bwd_call(x, y, g, interpret),)


max_pool_3x3_s2_pallas.defvjp(_vjp_fwd, _vjp_bwd)
