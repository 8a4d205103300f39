"""ResNet-18 keypoint regressor, TPU-first functional JAX implementation.

Re-implements the capability of the reference's KeypointCNN (reference:
perseus/detector/models.py:6-40): a torchvision-semantics ResNet-18 with
  * the first conv swapped for ``num_channels != 3`` inputs (RGBD uses 4),
  * the classifier head replaced by a ``2 * n_keypoints`` regression layer,
  * global average pooling.

Design (TPU-first, not a port):
  * Functional: parameters and BatchNorm statistics are plain flat dicts
    keyed by torchvision state_dict names (``conv1.weight`` etc.), so the
    torch checkpoint converter (models/convert.py) is a pure relabeling and
    the pytrees shard/replicate trivially under pjit.
  * NHWC activations and HWIO conv kernels — the layouts XLA:TPU tiles onto
    the MXU without transposes.
  * A separate folded-inference path: BatchNorm is algebraically folded into
    conv scale/bias once, then the whole forward is conv->bias->relu chains
    that XLA fuses; used by the streaming/eval paths and the benchmark.
  * Matmul/conv compute dtype is configurable (bf16 on TPU); parameters stay
    f32.

BatchNorm follows torch semantics exactly (eps=1e-5, momentum=0.1, biased
batch variance for normalization, unbiased for the running-stat update) so a
converted torch checkpoint reproduces the reference logits (differential test
vs. a torch oracle in tests/test_resnet_parity.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "RESNET18_STAGES",
    "init_keypoint_cnn",
    "keypoint_cnn_apply",
    "fold_batchnorm",
    "keypoint_cnn_apply_folded",
    "param_shapes",
]

# (num_blocks, channels) per stage; first block of stages 2-4 has stride 2.
RESNET18_STAGES = ((2, 64), (2, 128), (2, 256), (2, 512))

BN_EPS = 1e-5
BN_MOMENTUM = 0.1


# --------------------------------------------------------------------------
# Initialization (matches torch's kaiming fan-out init for convs, which is
# what torchvision uses; the head matches torch.nn.Linear default init).
# --------------------------------------------------------------------------


def _conv_init(key: jax.Array, h: int, w: int, c_in: int, c_out: int, dtype) -> jnp.ndarray:
    fan_out = h * w * c_out
    std = float(np.sqrt(2.0 / fan_out))
    return std * jax.random.normal(key, (h, w, c_in, c_out), dtype=dtype)


def _linear_init(key: jax.Array, c_in: int, c_out: int, dtype):
    bound = float(1.0 / np.sqrt(c_in))
    kw, kb = jax.random.split(key)
    w = jax.random.uniform(kw, (c_in, c_out), dtype=dtype, minval=-bound, maxval=bound)
    b = jax.random.uniform(kb, (c_out,), dtype=dtype, minval=-bound, maxval=bound)
    return w, b


def _bn_init(c: int, dtype):
    return {
        "weight": jnp.ones((c,), dtype=dtype),
        "bias": jnp.zeros((c,), dtype=dtype),
    }, {
        "running_mean": jnp.zeros((c,), dtype=dtype),
        "running_var": jnp.ones((c,), dtype=dtype),
    }


def init_keypoint_cnn(
    key: jax.Array,
    n_keypoints: int = 8,
    num_channels: int = 3,
    dtype=jnp.float32,
    head: str = "avgpool",
    feat_hw: int = 8,
) -> tuple[dict[str, jnp.ndarray], dict[str, jnp.ndarray]]:
    """Returns (params, batch_stats) flat dicts keyed by torch names.

    ``head``:
      * "avgpool" (default, reference parity): global average pool -> fc,
        exactly the reference KeypointCNN (models.py:31-32).
      * "spatial": fc over the FLATTENED final feature map
        (feat_hw*feat_hw*512 -> 2K). Global average pooling throws away
        WHERE features fire — for coordinate regression that is precision
        lost by construction; a linear readout of the spatial map keeps it
        (the DeepPose-style head) at +0.5M params. ``feat_hw`` must equal
        input_resolution / 32 (8 for 256x256). The apply paths dispatch on
        the stored fc.weight shape, so converted reference checkpoints and
        spatial-head checkpoints both load with no flags.
    """
    params: dict[str, jnp.ndarray] = {}
    stats: dict[str, jnp.ndarray] = {}
    keys = iter(jax.random.split(key, 64))

    params["conv1.weight"] = _conv_init(next(keys), 7, 7, num_channels, 64, dtype)
    bn_p, bn_s = _bn_init(64, dtype)
    params.update({f"bn1.{k}": v for k, v in bn_p.items()})
    stats.update({f"bn1.{k}": v for k, v in bn_s.items()})

    c_in = 64
    for stage_idx, (num_blocks, c_out) in enumerate(RESNET18_STAGES):
        for block_idx in range(num_blocks):
            prefix = f"layer{stage_idx + 1}.{block_idx}"
            downsample = block_idx == 0 and (stage_idx > 0)
            params[f"{prefix}.conv1.weight"] = _conv_init(next(keys), 3, 3, c_in, c_out, dtype)
            bn_p, bn_s = _bn_init(c_out, dtype)
            params.update({f"{prefix}.bn1.{k}": v for k, v in bn_p.items()})
            stats.update({f"{prefix}.bn1.{k}": v for k, v in bn_s.items()})
            params[f"{prefix}.conv2.weight"] = _conv_init(next(keys), 3, 3, c_out, c_out, dtype)
            bn_p, bn_s = _bn_init(c_out, dtype)
            params.update({f"{prefix}.bn2.{k}": v for k, v in bn_p.items()})
            stats.update({f"{prefix}.bn2.{k}": v for k, v in bn_s.items()})
            if downsample:
                params[f"{prefix}.downsample.0.weight"] = _conv_init(
                    next(keys), 1, 1, c_in, c_out, dtype
                )
                bn_p, bn_s = _bn_init(c_out, dtype)
                params.update({f"{prefix}.downsample.1.{k}": v for k, v in bn_p.items()})
                stats.update({f"{prefix}.downsample.1.{k}": v for k, v in bn_s.items()})
            c_in = c_out

    if head == "avgpool":
        fc_in = 512
    elif head == "spatial":
        fc_in = feat_hw * feat_hw * 512
    else:
        raise ValueError(f"unknown head {head!r}")
    w, b = _linear_init(next(keys), fc_in, 2 * n_keypoints, dtype)
    params["fc.weight"] = w  # stored (in, out); converter transposes torch's (out, in)
    params["fc.bias"] = b
    return params, stats


# --------------------------------------------------------------------------
# Forward pass
# --------------------------------------------------------------------------


def _conv(x: jnp.ndarray, w: jnp.ndarray, stride: int, padding: int, compute_dtype) -> jnp.ndarray:
    # DEFAULT precision lowers f32 conv operands to bf16 on TPU; when the
    # caller asks for f32 compute (parity/eval paths) force true f32 math.
    precision = None if compute_dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    return jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        w.astype(compute_dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )


def _batchnorm(
    x: jnp.ndarray,
    params: dict,
    stats: dict,
    prefix: str,
    train: bool,
    new_stats: dict | None,
):
    gamma = params[f"{prefix}.weight"]
    beta = params[f"{prefix}.bias"]
    acc_dtype = jnp.promote_types(x.dtype, jnp.float32)
    if train:
        # torch: normalize with biased batch stats; update running stats with
        # the unbiased variance. Var as E[x^2] - E[x]^2: both moments reduce
        # in ONE multi-output pass over the activations (jnp.var's centered
        # form re-reads x after computing the mean — a second full HBM
        # traversal per BN, forward and backward). f32 accumulation keeps
        # the cancellation error ~1e-7 relative for post-conv activations.
        # Centering on the (free) running mean first bounds the E[y^2]-E[y]^2
        # cancellation: y = x - rm has E[y] ~ 0 during steady training, so
        # mean^2/var stays O(1) even for high-mean low-variance channels.
        # Variance is shift-invariant; the subtract fuses into the same pass.
        rm = stats[f"{prefix}.running_mean"].astype(acc_dtype)
        yf = x.astype(acc_dtype) - rm
        mean_y = jnp.mean(yf, axis=(0, 1, 2))
        var = jnp.maximum(jnp.mean(yf * yf, axis=(0, 1, 2)) - mean_y * mean_y, 0.0)
        mean = mean_y + rm
        if new_stats is not None:
            n = x.shape[0] * x.shape[1] * x.shape[2]
            unbiased = var * (n / max(n - 1, 1))
            m = BN_MOMENTUM
            new_stats[f"{prefix}.running_mean"] = (
                (1 - m) * stats[f"{prefix}.running_mean"] + m * mean
            )
            new_stats[f"{prefix}.running_var"] = (
                (1 - m) * stats[f"{prefix}.running_var"] + m * unbiased
            )
    else:
        mean = stats[f"{prefix}.running_mean"]
        var = stats[f"{prefix}.running_var"]
    scale = gamma.astype(acc_dtype) * jax.lax.rsqrt(var.astype(acc_dtype) + BN_EPS)
    shift = beta.astype(acc_dtype) - mean.astype(acc_dtype) * scale
    return (x.astype(acc_dtype) * scale + shift).astype(x.dtype)


def _basic_block(
    x: jnp.ndarray,
    params: dict,
    stats: dict,
    prefix: str,
    stride: int,
    train: bool,
    new_stats: dict | None,
    compute_dtype,
) -> jnp.ndarray:
    identity = x
    out = _conv(x, params[f"{prefix}.conv1.weight"], stride, 1, compute_dtype)
    out = _batchnorm(out, params, stats, f"{prefix}.bn1", train, new_stats)
    out = jax.nn.relu(out)
    out = _conv(out, params[f"{prefix}.conv2.weight"], 1, 1, compute_dtype)
    out = _batchnorm(out, params, stats, f"{prefix}.bn2", train, new_stats)
    if f"{prefix}.downsample.0.weight" in params:
        identity = _conv(x, params[f"{prefix}.downsample.0.weight"], stride, 0, compute_dtype)
        identity = _batchnorm(identity, params, stats, f"{prefix}.downsample.1", train, new_stats)
    return jax.nn.relu(out + identity)


def _reduce_window_max_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """torch MaxPool2d(kernel=3, stride=2, padding=1): pads with -inf.

    The init value must be the true -inf identity (finite dtype-min breaks
    jax's reduce_window-max VJP for bf16: "Linearization failed...")."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


@jax.custom_vjp
def _max_pool_3x3_s2_cmp(x: jnp.ndarray) -> jnp.ndarray:
    return _reduce_window_max_3x3_s2(x)


def _mp_fwd(x):
    y = _reduce_window_max_3x3_s2(x)
    return y, (x, y)


def _mp_bwd(res, g):
    """Comparison-based maxpool gradient (replaces XLA's select-and-scatter,
    which the round-4 profile measured at 2.15 ms/step — ~3x its HBM
    roofline on TPU).

    With even H/W the 3x3 stride-2 pad-1 windows have a fixed parity
    structure: input row 2p is covered only by window row p; input row 2p+1
    by window rows p and p+1 (same for columns). So the gradient splits
    into four parity sub-grids with 1/2/2/4 window terms each, all plain
    elementwise compares + shifts that XLA fuses into one memory-bound pass:

        dx[i, j] = sum over covering windows (p, q) of
                   g[p, q] * (x[i, j] == y[p, q])

    The equality is exact: reduce_window-max returns one of its inputs
    bit-identically. Tie semantics differ from torch/select-and-scatter
    (which route the gradient to ONE argmax): every position equal to the
    window max receives the gradient. Positive-value ties are measure-zero
    for float activations, and the one tie class that does occur — multiple
    exact zeros after the preceding ReLU — is annihilated anyway because
    ReLU's VJP is 0 at x <= 0."""
    x, y = res
    b, h, w, c = x.shape
    ho, wo = y.shape[1], y.shape[2]
    g = g.astype(x.dtype)
    # "next window" shifts: pad with +inf so the equality can never match
    # (and gradient 0), which handles the last odd row/col cleanly
    inf = jnp.asarray(jnp.inf, x.dtype)
    y_d = jnp.concatenate([y[:, 1:], jnp.full((b, 1, wo, c), inf, x.dtype)], axis=1)
    g_d = jnp.concatenate([g[:, 1:], jnp.zeros((b, 1, wo, c), x.dtype)], axis=1)
    y_r = jnp.concatenate([y[:, :, 1:], jnp.full((b, ho, 1, c), inf, x.dtype)], axis=2)
    g_r = jnp.concatenate([g[:, :, 1:], jnp.zeros((b, ho, 1, c), x.dtype)], axis=2)
    y_dr = jnp.concatenate([y_d[:, :, 1:], jnp.full((b, ho, 1, c), inf, x.dtype)], axis=2)
    g_dr = jnp.concatenate([g_d[:, :, 1:], jnp.zeros((b, ho, 1, c), x.dtype)], axis=2)

    x_ee = x[:, ::2, ::2]
    x_oe = x[:, 1::2, ::2]
    x_eo = x[:, ::2, 1::2]
    x_oo = x[:, 1::2, 1::2]
    dx_ee = jnp.where(x_ee == y, g, 0)
    dx_oe = jnp.where(x_oe == y, g, 0) + jnp.where(x_oe == y_d, g_d, 0)
    dx_eo = jnp.where(x_eo == y, g, 0) + jnp.where(x_eo == y_r, g_r, 0)
    dx_oo = (
        jnp.where(x_oo == y, g, 0)
        + jnp.where(x_oo == y_d, g_d, 0)
        + jnp.where(x_oo == y_r, g_r, 0)
        + jnp.where(x_oo == y_dr, g_dr, 0)
    )
    even_rows = jnp.stack([dx_ee, dx_eo], axis=3).reshape(b, ho, w, c)
    odd_rows = jnp.stack([dx_oe, dx_oo], axis=3).reshape(b, ho, w, c)
    dx = jnp.stack([even_rows, odd_rows], axis=2).reshape(b, h, w, c)
    return (dx,)


_max_pool_3x3_s2_cmp.defvjp(_mp_fwd, _mp_bwd)


# Measured on-chip (outputs/profiles/r5_fwdbwd vs r4_fwdbwd): the
# comparison VJP REGRESSES the train step 41.1 -> 49.7 ms/step. XLA
# materializes the +inf-padded shift planes (pad_maximum_fusion, 1.6 ms),
# spends 3.0 ms in the parity-compare loop fusion, and 1.6 ms in a layout
# copy for the stack/reshape interleave — ~6.3 ms total vs
# select-and-scatter's 2.15 ms. The decomposition is only a win inside a
# single VMEM-resident kernel; as XLA-level ops it loses to the native
# gradient, so it stays opt-in for kernel work and tests.
MAXPOOL_CMP_VJP = False

# The "single VMEM-resident kernel" the note above calls for
# (models/pool_pallas.py): forward and comparison-gradient each as one
# Pallas kernel. ALSO a measured on-chip regression (43.7 -> 76.3 ms/step,
# outputs/profiles/r5_fwdbwd_mpk): Mosaic v5e cannot stride-2-slice or
# minor-dim-reshape vectors, so the kernel needs its input pre-packed as
# (B, H, W/2, 2C), and THAT reshape is a real tiled-layout change XLA
# materializes as ~1.7 ms HBM copies on every operand/result boundary
# (copy.73/.97/.98 in the profile), plus broken fusions around the custom
# calls. The kernels themselves are correct (golden-tested) and stay
# opt-in; select-and-scatter remains the measured-fastest lowering.
MAXPOOL_PALLAS = False


def _max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """Maxpool via one of three lowerings: a fused Pallas kernel on TPU
    (default; see MAXPOOL_PALLAS), XLA reduce_window + select-and-scatter
    (default off-TPU), or the XLA-level comparison VJP (opt-in, a measured
    regression kept for kernel tests). Non-XLA paths need even H/W."""
    even = x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
    if MAXPOOL_PALLAS and even and jax.default_backend() == "tpu":
        from perseus_tpu.models.pool_pallas import max_pool_3x3_s2_pallas

        return max_pool_3x3_s2_pallas(x, False)
    if MAXPOOL_CMP_VJP and even:
        return _max_pool_3x3_s2_cmp(x)
    return _reduce_window_max_3x3_s2(x)


def keypoint_cnn_apply(
    params: dict[str, jnp.ndarray],
    stats: dict[str, jnp.ndarray],
    x: jnp.ndarray,
    train: bool = False,
    compute_dtype: Any = jnp.float32,
    s2d_stem: bool = False,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """Forward pass.

    Args:
        params/stats: flat dicts from :func:`init_keypoint_cnn` or the
            checkpoint converter.
        x: images, NHWC, (B, H, W, C), float.
        train: batch-stats BN + running-stat updates when True.
        compute_dtype: conv/matmul dtype (bf16 on TPU; params remain f32).
        s2d_stem: run the stem as the equivalent 4x4 stride-1 conv over
            space-to-depth(2) input (see :func:`space_to_depth_stem_kernel`).
            Checkpoints are unchanged — the canonical 7x7 kernel stays the
            stored parameter and the rearrangement is traced into the jitted
            step, so its VJP routes the 4x4 filter gradient back onto the
            7x7 weight exactly. The hypothesis was that the TRAINING stem
            would win where the folded-inference one lost: it also pays the
            conv1 filter-gradient conv — the largest single conv op in the
            round-4/5 profiles at 1.81 ms/step — whose contraction is 4x
            deeper in s2d form. MEASURED on v5e (fwdbwd b=256): a NET
            REGRESSION, 37.7 -> 38.8 device ms/step. The filter grad only
            improved 1.81 -> 1.70 ms (it is memory-bound on the 256-image
            input, not MXU-lane-bound) while the packing transpose costs
            +1.15 ms of data formatting. Stays opt-in for chips where the
            narrow stem actually binds.
    """
    new_stats = dict(stats) if train else None
    if s2d_stem and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
        w2 = space_to_depth_stem_kernel(params["conv1.weight"])
        precision = None if compute_dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
        out = jax.lax.conv_general_dilated(
            space_to_depth(x).astype(compute_dtype),
            w2.astype(compute_dtype),
            window_strides=(1, 1),
            padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision,
        )
    else:
        out = _conv(x, params["conv1.weight"], 2, 3, compute_dtype)
    out = _batchnorm(out, params, stats, "bn1", train, new_stats)
    out = jax.nn.relu(out)
    out = _max_pool_3x3_s2(out)

    for stage_idx, (num_blocks, _) in enumerate(RESNET18_STAGES):
        for block_idx in range(num_blocks):
            stride = 2 if (stage_idx > 0 and block_idx == 0) else 1
            out = _basic_block(
                out,
                params,
                stats,
                f"layer{stage_idx + 1}.{block_idx}",
                stride,
                train,
                new_stats,
                compute_dtype,
            )

    acc_dtype = jnp.promote_types(x.dtype, jnp.float32)
    feat = _head_features(out, params["fc.weight"], acc_dtype)
    logits = (
        jnp.dot(feat, params["fc.weight"].astype(acc_dtype), precision=jax.lax.Precision.HIGHEST)
        + params["fc.bias"]
    )
    return logits.astype(acc_dtype), (new_stats if train else stats)


def _head_features(out: jnp.ndarray, fc_w: jnp.ndarray, acc_dtype) -> jnp.ndarray:
    """Head input dispatch on fc.weight's fan-in: 512 -> global average pool
    (reference parity); H*W*512 -> flattened spatial map (head="spatial")."""
    if fc_w.shape[0] == out.shape[-1]:
        return jnp.mean(out.astype(acc_dtype), axis=(1, 2))
    expect = out.shape[1] * out.shape[2] * out.shape[3]
    if fc_w.shape[0] != expect:
        raise ValueError(
            f"fc.weight fan-in {fc_w.shape[0]} matches neither pooled ({out.shape[-1]}) "
            f"nor flattened ({expect}) features — wrong input resolution for this head?"
        )
    return out.astype(acc_dtype).reshape(out.shape[0], expect)


# --------------------------------------------------------------------------
# Folded inference path
# --------------------------------------------------------------------------


def fold_batchnorm(
    params: dict[str, jnp.ndarray], stats: dict[str, jnp.ndarray]
) -> dict[str, jnp.ndarray]:
    """Folds every (conv, bn) pair into (scaled conv kernel, bias).

    Output dict maps ``<conv>.weight`` -> folded HWIO kernel and
    ``<conv>.bias`` -> folded bias, plus the fc head unchanged. Inference
    then runs without any normalization work — the TPU-native equivalent of
    eval-mode BN, with one less elementwise pass over activations.
    """
    folded: dict[str, jnp.ndarray] = {}

    def fold(conv_name: str, bn_name: str):
        w = params[f"{conv_name}.weight"]
        gamma = params[f"{bn_name}.weight"]
        beta = params[f"{bn_name}.bias"]
        mean = stats[f"{bn_name}.running_mean"]
        var = stats[f"{bn_name}.running_var"]
        scale = gamma / jnp.sqrt(var + BN_EPS)
        folded[f"{conv_name}.weight"] = w * scale[None, None, None, :]
        folded[f"{conv_name}.bias"] = beta - mean * scale

    fold("conv1", "bn1")
    for stage_idx, (num_blocks, _) in enumerate(RESNET18_STAGES):
        for block_idx in range(num_blocks):
            prefix = f"layer{stage_idx + 1}.{block_idx}"
            fold(f"{prefix}.conv1", f"{prefix}.bn1")
            fold(f"{prefix}.conv2", f"{prefix}.bn2")
            if f"{prefix}.downsample.0.weight" in params:
                fold(f"{prefix}.downsample.0", f"{prefix}.downsample.1")
    folded["fc.weight"] = params["fc.weight"]
    folded["fc.bias"] = params["fc.bias"]
    return folded


def space_to_depth_stem_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Transforms the 7x7 stride-2 stem kernel (7, 7, C, O) into the
    equivalent 4x4 stride-1 kernel (4, 4, 4C, O) over space-to-depth(2)
    input.

    The stock stem runs a 7x7 conv with C_in = 3 or 4 on the MXU's
    128-wide contraction — ~3% utilization for ~22% of the network's FLOPs.
    Rewriting the stride-2 conv over 2x2-packed input (the MLPerf ResNet
    trick) quadruples the contraction depth and removes the stride.

    Derivation: out(y,x) = sum_k w[ky,kx] in(2y+ky-3, 2x+kx-3); writing
    2y+ky-3 = 2(y+t) + d with d in {0,1} maps each ky to a unique
    (t, d): ky 0..6 -> t in [-2,1] (4 taps), d = (ky-3) mod 2. Packed
    channel order is (dy*2 + dx)*C + c, matching
    ``x.reshape(B,H/2,2,W/2,2,C) -> (B,H/2,W/2,2,2,C) -> (B,H/2,W/2,4C)``.
    The conv then uses asymmetric padding (2, 1) per spatial dim.
    """
    c_in, c_out = w.shape[2], w.shape[3]
    w2 = jnp.zeros((4, 4, 4 * c_in, c_out), dtype=w.dtype)
    for ky in range(7):
        t_y, d_y = (ky - 3 - ((ky - 3) % 2)) // 2, (ky - 3) % 2
        for kx in range(7):
            t_x, d_x = (kx - 3 - ((kx - 3) % 2)) // 2, (kx - 3) % 2
            ch = (d_y * 2 + d_x) * c_in
            w2 = w2.at[t_y + 2, t_x + 2, ch : ch + c_in, :].set(w[ky, kx])
    return w2


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel order (dy, dx, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def keypoint_cnn_apply_folded(
    folded: dict[str, jnp.ndarray],
    x: jnp.ndarray,
    compute_dtype: Any = jnp.bfloat16,
    s2d_stem: bool = False,
) -> jnp.ndarray:
    """Inference with BN pre-folded: pure conv+bias+relu chains. NHWC in,
    (B, 2*n_keypoints) float32 out. ``s2d_stem`` runs the stem as a 4x4
    stride-1 conv over space-to-depth input (numerically equal; see
    :func:`space_to_depth_stem_kernel`). Off by default: on v5e the packing
    transpose costs more than the stride-2 stem saves (13.3 -> 15.0 ms per
    256-batch measured), so it stays an option for chips where the narrow
    stem is the bottleneck."""

    def conv_bias(h, name, stride, padding):
        out = _conv(h, folded[f"{name}.weight"], stride, padding, compute_dtype)
        return out + folded[f"{name}.bias"].astype(out.dtype)

    if s2d_stem:
        w2 = space_to_depth_stem_kernel(folded["conv1.weight"])
        precision = None if compute_dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
        out = jax.lax.conv_general_dilated(
            space_to_depth(x).astype(compute_dtype),
            w2.astype(compute_dtype),
            window_strides=(1, 1),
            padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision,
        )
        out = jax.nn.relu(out + folded["conv1.bias"].astype(out.dtype))
    else:
        out = jax.nn.relu(conv_bias(x, "conv1", 2, 3))
    out = _max_pool_3x3_s2(out)
    for stage_idx, (num_blocks, _) in enumerate(RESNET18_STAGES):
        for block_idx in range(num_blocks):
            prefix = f"layer{stage_idx + 1}.{block_idx}"
            stride = 2 if (stage_idx > 0 and block_idx == 0) else 1
            identity = out
            h = jax.nn.relu(conv_bias(out, f"{prefix}.conv1", stride, 1))
            h = conv_bias(h, f"{prefix}.conv2", 1, 1)
            if f"{prefix}.downsample.0.weight" in folded:
                identity = conv_bias(out, f"{prefix}.downsample.0", stride, 0)
            out = jax.nn.relu(h + identity)
    acc_dtype = jnp.promote_types(x.dtype, jnp.float32)
    feat = _head_features(out, folded["fc.weight"], acc_dtype)
    logits = (
        jnp.dot(feat, folded["fc.weight"].astype(acc_dtype), precision=jax.lax.Precision.HIGHEST)
        + folded["fc.bias"]
    )
    return logits.astype(acc_dtype)


def param_shapes(params: dict[str, jnp.ndarray]) -> dict[str, tuple]:
    return {k: tuple(v.shape) for k, v in params.items()}
