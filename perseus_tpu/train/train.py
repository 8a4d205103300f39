"""Data-parallel detector training: one jitted step over an ICI mesh.

The TPU-native re-design of the reference's DDP loop (reference:
perseus/detector/train.py:87-359). Instead of process-per-GPU + NCCL
all-reduce + host-side Kornia augmentation + AMP GradScaler:

  * ONE jitted train step = augmentation pipeline -> ResNet fwd (bf16
    matmuls) -> SmoothL1 -> grad -> global-norm clip -> AdamW, compiled once
    and sharded with `jax.jit` over a 1-D ``data`` mesh. The gradient
    all-reduce is inserted by XLA from the sharding annotations (replicated
    params, batch-sharded data) and rides ICI.
  * BatchNorm statistics are computed over the GLOBAL batch (XLA collectives)
    rather than per-replica as DDP does — strictly more correct.
  * No GradScaler: bf16 has f32-range exponents, so loss scaling is
    unnecessary (params and the loss stay f32).
  * Deterministic keyed RNG: the per-step augmentation key is
    fold_in(run_key, global_step), so any batch is replayable.
  * Validation loss is all-reduced across the mesh before driving the LR
    plateau schedule (the reference stepped the scheduler on unreduced
    per-rank val loss; SURVEY.md section 2.5 notes this divergence as a fix).
  * Multi-host: `jax.distributed.initialize` + per-host loader shards
    replace the TCP rendezvous / DistributedSampler machinery.
"""

from __future__ import annotations

import os
import time
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from perseus_tpu import ROOT
from perseus_tpu.augment.pipeline import KeypointAugmentation
from perseus_tpu.data.dataset import PrefetchingLoader, PrunedKeypointDataset
from perseus_tpu.models import resnet
from perseus_tpu.train import checkpoint as ckpt
from perseus_tpu.train.config import TrainConfig
from perseus_tpu.utils import logging as ptlog

__all__ = ["TrainState", "PlateauScheduler", "make_train_step", "make_eval_step", "train", "smooth_l1_loss"]


class TrainState(NamedTuple):
    params: dict[str, jnp.ndarray]
    batch_stats: dict[str, jnp.ndarray]
    opt_state: Any


class PlateauScheduler:
    """torch ReduceLROnPlateau(min) semantics: rel threshold 1e-4, reduce by
    `factor` after `patience` bad epochs, floor at `min_lr` (reference:
    train.py:200)."""

    def __init__(self, base_lr: float, patience: int = 5, factor: float = 0.25, min_lr: float = 1e-6):
        self.lr = base_lr
        self.patience = patience
        self.factor = factor
        self.min_lr = min_lr
        self.best = float("inf")
        self.num_bad = 0

    def step(self, value: float) -> float:
        if value < self.best * (1.0 - 1e-4):
            self.best = value
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad = 0
        return self.lr


def smooth_l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """SmoothL1(beta=1.0) == Huber(delta=1.0), mean reduction (reference:
    train.py:119)."""
    return jnp.mean(optax.huber_loss(pred, target, delta=1.0))


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """clip(1.0) -> AdamW, with an injectable learning rate so the plateau
    schedule changes LR without recompiling the step."""
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.inject_hyperparams(optax.adamw)(
            learning_rate=cfg.learning_rate, weight_decay=cfg.weight_decay
        ),
    )


def set_learning_rate(opt_state, lr: float):
    # locate the inject_hyperparams stage instead of hard-indexing the chain
    stages = list(opt_state)
    hits = [
        i
        for i, s in enumerate(stages)
        if hasattr(s, "hyperparams") and "learning_rate" in getattr(s, "hyperparams", {})
    ]
    if len(hits) != 1:
        raise ValueError(f"expected exactly one learning_rate stage, found {len(hits)}")
    inner = stages[hits[0]]
    stages[hits[0]] = inner._replace(
        hyperparams={**inner.hyperparams, "learning_rate": jnp.asarray(lr, dtype=jnp.float32)}
    )
    return tuple(stages)


def _prepare_aug_batch(batch: dict, in_channels: int, use_transplant: bool) -> np.ndarray:
    """Stacks RGB(+depth)(+seg) into the (B, H, W, C) augmentation input on
    the host, mirroring the reference's channel assembly (train.py:262-284).
    (The reference crashes for in_channels=3 + transplantation because its
    depth tensor is undefined on that path; here depth is always available.)
    """
    parts = [batch["image"]]
    if in_channels >= 4:
        parts.append(batch["depth_image"][..., None])
    if use_transplant and in_channels < 5:
        if in_channels == 3:
            parts.append(batch["depth_image"][..., None])
        parts.append(batch["segmentation_image"][..., None])
    return np.concatenate(parts, axis=-1, dtype=np.float32)


def make_sharded_augment(train_augment: KeypointAugmentation, mesh=None):
    """The augmentation stage as run inside the train step.

    With ``mesh``: shard_map over the data axis — every stage is
    batch-elementwise except the transplantation donor gather, which becomes
    shard-local, and each shard folds its mesh position into the step key for
    an independent random stream. ``check_vma=False`` is required because
    pallas_call (the fused augmentation kernel) does not annotate
    varying-mesh-axes metadata on its outputs; the hatch is confined to THIS
    closure (nothing else in the step body runs under it), and the semantics
    it could silently break — per-shard donor locality, per-shard independent
    RNG, shard_map == per-shard-serial equality — are pinned by
    tests/test_round4_features.py::test_sharded_augment_*.
    """

    def apply_augment(key: jax.Array, images_aug: jnp.ndarray, coords: jnp.ndarray):
        if mesh is None:
            return train_augment(key, images_aug, coords)

        def local_aug(k, img, crd):
            k = jax.random.fold_in(k, jax.lax.axis_index("data"))
            return train_augment(k, img, crd)

        return jax.shard_map(
            local_aug,
            mesh=mesh,
            in_specs=(P(), P("data"), P("data")),
            out_specs=(P("data"), P("data")),
            check_vma=False,
        )(key, images_aug, coords)

    return apply_augment


def make_train_step(
    cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    train_augment: KeypointAugmentation,
    mesh=None,
):
    """Builds the jitted train step.

    With `mesh`, the augmentation runs inside `shard_map` over the data axis:
    every stage is batch-elementwise except the transplantation donor gather,
    which becomes shard-local (each shard donates within its own sub-batch —
    statistically equivalent to the reference's global random donor, and it
    keeps the image batch from being all-gathered across chips every step).
    Each shard folds the step key with its mesh position for independent
    random streams.
    """
    compute_dtype = jnp.bfloat16 if cfg.amp else jnp.float32
    apply_augment = make_sharded_augment(train_augment, mesh)

    def step_core(
        state: TrainState,
        images_aug: jnp.ndarray,
        coords: jnp.ndarray,
        key: jax.Array,
        weights: jnp.ndarray | None,
    ):
        images, target = apply_augment(key, images_aug, coords)
        images = images[..., : cfg.in_channels]
        h_img, w_img = images.shape[1], images.shape[2]

        # Out-of-frame corner handling (round-3 val breakdown: frames with
        # any GT corner outside the image score 21.8 px RMSE vs 14.2
        # in-frame — the head is asked to regress corners that are not in
        # the picture; the reference regresses them blindly,
        # reference train.py:119). Post-augmentation coords are the
        # training-time truth — the pipeline has already moved corners and
        # NORMALIZED them to [-1, 1] (augment/pipeline.py:268) — so the test
        # happens HERE, in normalized units: out of frame <=> |coord| > 1.
        corner_w = None
        if cfg.outframe_corner_weight != 1.0:
            out = jnp.any(jnp.abs(target) > 1.0, axis=-1)  # (B, K)
            cw = jnp.where(out, cfg.outframe_corner_weight, 1.0)
            # per-coordinate weights, mean-normalized so the loss scale (and
            # the LR recipe) matches the unweighted path
            corner_w = jnp.repeat(cw, 2, axis=-1)
            corner_w = corner_w / jnp.maximum(jnp.mean(corner_w), 1e-12)
        if cfg.outframe_clamp_px >= 0:
            # pixel margin -> normalized margin (u_norm = 2u/(W-1) - 1)
            mm = jnp.asarray(
                [
                    2.0 * cfg.outframe_clamp_px / (w_img - 1.0),
                    2.0 * cfg.outframe_clamp_px / (h_img - 1.0),
                ],
                target.dtype,
            )
            target = jnp.clip(target, -1.0 - mm, 1.0 + mm)
        target = target.reshape(target.shape[0], -1)

        def spread_loss(pred):
            """Anti-hedging term (cfg.spread_loss_weight): Huber between the
            predicted and true per-corner distances from their respective
            centroids. Centroid collapse shrinks these distances uniformly,
            so this term sees the failure at full strength while the
            coordinate loss spreads it over 16 small residuals."""
            p = pred.reshape(pred.shape[0], -1, 2)
            t = target.reshape(target.shape[0], -1, 2)
            dp = jnp.linalg.norm(p - jnp.mean(p, axis=1, keepdims=True), axis=-1)
            dt = jnp.linalg.norm(t - jnp.mean(t, axis=1, keepdims=True), axis=-1)
            return jnp.mean(optax.huber_loss(dp, dt, delta=1.0))

        def loss_fn(params):
            pred, new_stats = resnet.keypoint_cnn_apply(
                params, state.batch_stats, images, train=True, compute_dtype=compute_dtype,
                s2d_stem=cfg.s2d_stem,
            )
            aux = cfg.spread_loss_weight * spread_loss(pred) if cfg.spread_loss_weight else 0.0
            if weights is None:
                if corner_w is None:
                    return smooth_l1_loss(pred, target) + aux, new_stats
                per_coord = optax.huber_loss(pred, target, delta=1.0)
                return jnp.mean(per_coord * corner_w) + aux, new_stats
            # inverse-frequency example weighting (normalized so the loss
            # scale — and thus the LR recipe — matches the unweighted path)
            per_coord = optax.huber_loss(pred, target, delta=1.0)
            if corner_w is not None:
                per_coord = per_coord * corner_w
            per_example = jnp.mean(per_coord, axis=-1)
            wnorm = weights / jnp.maximum(jnp.mean(weights), 1e-12)
            # cap outlier weights (see TrainConfig.example_weight_clip), then
            # restore E[w]=1 so the loss scale matches the unweighted recipe
            wnorm = jnp.minimum(wnorm, cfg.example_weight_clip)
            wnorm = wnorm / jnp.maximum(jnp.mean(wnorm), 1e-12)
            return jnp.mean(per_example * wnorm) + aux, new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_stats, new_opt_state), loss

    if cfg.use_example_weights:

        def step(state, images_aug, coords, key, weights):
            return step_core(state, images_aug, coords, key, weights)

    else:

        def step(state, images_aug, coords, key):
            return step_core(state, images_aug, coords, key, None)

    return step


def make_device_data_train_step(
    cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    train_augment: KeypointAugmentation,
    mesh=None,
):
    """Train step over a device-resident dataset (cfg.data_on_device).

    The full decoded split lives in HBM sharded over the ``data`` axis;
    each step receives a (B,) index vector sharded the same way whose values
    index each shard LOCALLY, gathers its batch on-device under shard_map
    (no cross-shard traffic), and runs the normal step. Removes the
    per-step host image upload entirely.
    """
    base_step = make_train_step(cfg, optimizer, train_augment, mesh=mesh)

    def gather(ds, idx):
        return jnp.take(ds, idx, axis=0)

    def step(state, ds_images, ds_coords, idx, key, *maybe_w):
        if mesh is None:
            imgs, crds = gather(ds_images, idx), gather(ds_coords, idx)
            w = (gather(maybe_w[0], idx),) if maybe_w else ()
        else:
            spec_i = P("data", *([None] * (ds_images.ndim - 1)))
            spec_c = P("data", *([None] * (ds_coords.ndim - 1)))
            imgs = jax.shard_map(
                gather, mesh=mesh, in_specs=(spec_i, P("data")), out_specs=spec_i
            )(ds_images, idx)
            crds = jax.shard_map(
                gather, mesh=mesh, in_specs=(spec_c, P("data")), out_specs=spec_c
            )(ds_coords, idx)
            w = ()
            if maybe_w:
                w = (
                    jax.shard_map(
                        gather, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P("data")
                    )(maybe_w[0], idx),
                )
        return base_step(state, imgs, crds, key, *w)

    return step


def make_device_data_epoch_fn(
    cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    train_augment: KeypointAugmentation,
    mesh=None,
):
    """Whole-epoch `lax.scan` over the device-resident dataset.

    On a remote-attached chip every dispatch is a host round-trip; even
    locally, per-step Python dispatch costs ~0.1-1 ms. Scanning all of an
    epoch's steps inside ONE jitted call amortizes that to a single
    dispatch: the (steps, B) index tensor is uploaded once and the PRNG key
    for step ``s`` is folded in-graph as ``fold_in(run_key, base_step + s)``
    — the same key stream and data order as the per-step path. (XLA fuses
    the scan body differently than the standalone step, so floats agree to
    reduction-order rounding, ~1e-6 relative, not bitwise; resume stays
    bit-identical because a resumed run re-enters the same compiled scan.)
    Returns per-step losses as one (steps,) array (one readback per epoch).
    """
    dd_step = make_device_data_train_step(cfg, optimizer, train_augment, mesh=mesh)

    def epoch_fn(state, ds_images, ds_coords, idx_epoch, run_key, base_step, *maybe_w):
        steps = idx_epoch.shape[0]

        def body(carry, xs):
            st = carry
            idx, s = xs
            key = jax.random.fold_in(run_key, base_step + s)
            st, loss = dd_step(st, ds_images, ds_coords, idx, key, *maybe_w)
            return st, loss

        state, losses = jax.lax.scan(body, state, (idx_epoch, jnp.arange(steps)))
        return state, losses

    return epoch_fn


def make_device_data_eval_step(cfg: TrainConfig, val_augment: KeypointAugmentation, mesh=None):
    """Eval step over a device-resident val split. ``mask`` (host-computed,
    tiny) zeroes wrap-padding rows and final-partial-batch filler so every
    real row is counted exactly once."""
    base_step = make_eval_step(cfg, val_augment)

    def gather(ds, idx):
        return jnp.take(ds, idx, axis=0)

    def step(state, ds_images, ds_coords, idx, mask):
        if mesh is None:
            imgs, crds = gather(ds_images, idx), gather(ds_coords, idx)
        else:
            spec_i = P("data", *([None] * (ds_images.ndim - 1)))
            spec_c = P("data", *([None] * (ds_coords.ndim - 1)))
            imgs = jax.shard_map(
                gather, mesh=mesh, in_specs=(spec_i, P("data")), out_specs=spec_i
            )(ds_images, idx)
            crds = jax.shard_map(
                gather, mesh=mesh, in_specs=(spec_c, P("data")), out_specs=spec_c
            )(ds_coords, idx)
        return base_step(state, imgs, crds, mask)

    return step


_CHUNK_UPDATERS: dict = {}


def _chunk_updater(dev):
    """Per-device jitted row-chunk writer, cached so periodic subset
    refreshes (device_data_refresh_epochs) reuse the compiled program
    instead of recompiling every refresh."""
    if dev not in _CHUNK_UPDATERS:
        _CHUNK_UPDATERS[dev] = jax.jit(
            lambda buf, ch, st: jax.lax.dynamic_update_slice(buf, ch, (st, 0, 0, 0)),
            donate_argnums=(0,),
            out_shardings=jax.sharding.SingleDeviceSharding(dev),
        )
    return _CHUNK_UPDATERS[dev]


def _device_dataset(
    dataset: PrunedKeypointDataset,
    cfg: TrainConfig,
    mesh,
    use_transplant: bool,
    chunk: int = 512,
    subset: np.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, int]:
    """Decodes a split (or a row ``subset`` of it) and device-puts it
    sharded over ``data``.

    Rows are wrap-padded so every shard holds the same count; returns
    (images, coords, weights, valid, n_local) where ``valid`` (a HOST array)
    flags real vs padding rows and ``n_local`` is the per-shard row count.
    """
    n = len(dataset) if subset is None else len(subset)
    n_dev = len(mesh.devices.reshape(-1))
    n_local = -(-n // n_dev)
    n_pad = n_local * n_dev

    store_dtype = jnp.dtype(cfg.device_data_dtype)
    order = np.arange(n_pad) % n
    if subset is not None:
        order = np.asarray(subset)[order]

    probe = dataset.batch(order[:1])
    c = _prepare_aug_batch(probe, cfg.in_channels, use_transplant).shape[-1]
    h, w = dataset.H, dataset.W
    kdim = probe["pixel_coordinates"].shape[1]
    img_shape = (n_pad, h, w, c)
    sh = lambda spec: NamedSharding(mesh, spec)
    img_sharding = sh(P("data", None, None, None))

    # Per-device assembly (multi-host ready, reference DistributedSampler
    # role): each process decodes ONLY the rows its addressable devices own
    # — derived from the sharding's index map, never assuming a device
    # order — and the global array forms via
    # make_array_from_single_device_arrays. A `device_put` of per-host data
    # here would silently mis-assemble the global batch (round-2 Weak #1).
    idx_map = img_sharding.addressable_devices_indices_map(img_shape)
    upload_chunk = 128  # ~170 MB per transfer at 256x256x5 f32
    img_shards, crd_shards, w_shards = [], [], []
    for dev, index in idx_map.items():
        sl = index[0]
        rows = order[sl.start : sl.stop]
        shard_shape = (len(rows), h, w, c)
        crd_list = []
        if len(rows) * h * w * c * store_dtype.itemsize > (1 << 30):
            # stream decode+upload chunkwise into a preallocated device
            # buffer: multi-GB single transfers can exceed transport request
            # limits, and chunking avoids a second full host-side copy
            upd = _chunk_updater(dev)
            buf = jnp.zeros(shard_shape, store_dtype, device=dev)
            for s in range(0, len(rows), upload_chunk):
                batch = dataset.batch(rows[s : s + upload_chunk])
                imgs = _prepare_aug_batch(batch, cfg.in_channels, use_transplant).astype(
                    store_dtype
                )
                buf = upd(buf, jax.device_put(imgs, dev), jnp.int32(s))
                crd_list.append(np.asarray(batch["pixel_coordinates"], dtype=np.float32))
            img_shards.append(buf)
        else:
            parts = []
            for s in range(0, len(rows), chunk):
                batch = dataset.batch(rows[s : s + chunk])
                parts.append(
                    _prepare_aug_batch(batch, cfg.in_channels, use_transplant).astype(
                        store_dtype
                    )
                )
                crd_list.append(np.asarray(batch["pixel_coordinates"], dtype=np.float32))
            img_shards.append(jax.device_put(np.concatenate(parts), dev))
        crd_shards.append(jax.device_put(np.concatenate(crd_list), dev))
        w_shards.append(
            jax.device_put(np.asarray([dataset.weights[i] for i in rows], np.float32), dev)
        )

    d_images = jax.make_array_from_single_device_arrays(img_shape, img_sharding, img_shards)
    d_coords = jax.make_array_from_single_device_arrays(
        (n_pad, kdim, 2), sh(P("data", None, None)), crd_shards
    )
    d_weights = jax.make_array_from_single_device_arrays((n_pad,), sh(P("data")), w_shards)
    valid = (np.arange(n_pad) < n).astype(np.float32)
    return d_images, d_coords, d_weights, valid, n_local


def make_eval_step(cfg: TrainConfig, val_augment: KeypointAugmentation):
    compute_dtype = jnp.bfloat16 if cfg.amp else jnp.float32

    def step(state: TrainState, images: jnp.ndarray, coords: jnp.ndarray, weights: jnp.ndarray):
        """Returns (loss_sum, count): per-element SmoothL1 means weighted by
        `weights` (0 marks padding rows added so partial final batches stay
        divisible by the mesh)."""
        key = jax.random.key(0)  # val augs are deterministic
        images, target = val_augment(key, images, coords)
        images = images[..., : cfg.in_channels]
        target = target.reshape(target.shape[0], -1)
        pred, _ = resnet.keypoint_cnn_apply(
            state.params, state.batch_stats, images, train=False, compute_dtype=compute_dtype,
            s2d_stem=cfg.s2d_stem,
        )
        per_elem = jnp.mean(optax.huber_loss(pred, target, delta=1.0), axis=-1)
        return jnp.sum(per_elem * weights), jnp.sum(weights)

    return step


def make_mesh(data_parallel: bool = True, n_devices: int | None = None):
    """1-D data-parallel mesh in Auto (GSPMD) mode.

    jax>=0.9 defaults `jax.make_mesh` to Explicit axis types, which rejects
    the cross-shard donor gather in the transplantation augmentation; the
    step is designed for compiler-propagated shardings (global-batch BN,
    implicit grad psum), so Auto is the intended mode.
    """
    n = n_devices if n_devices is not None else (len(jax.devices()) if data_parallel else 1)
    return jax.make_mesh((n,), ("data",), axis_types=(jax.sharding.AxisType.Auto,))


def shard_batch(batch: dict, mesh, expected_global: int | None = None) -> dict:
    """Builds batch-axis-sharded global arrays from host data.

    Single-process: the input IS the global batch — a plain `device_put`.
    Multi-process: every process passes its own LOCAL shard (different data
    per host), so the global array must be assembled with
    `jax.make_array_from_process_local_data` — `device_put` would treat each
    host's shard as the full global array and silently mis-assemble the
    batch (each host contributing only the 1/Nth of its rows its devices
    own). ``expected_global`` asserts the assembled global batch size.
    """
    out = {}
    multi = jax.process_count() > 1
    for k, v in batch.items():
        spec = P("data", *([None] * (v.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        if multi:
            arr = jax.make_array_from_process_local_data(sharding, np.asarray(v))
        else:
            arr = jax.device_put(v, sharding)
        if expected_global is not None and arr.shape[0] != expected_global:
            raise ValueError(
                f"assembled global batch for {k!r} has {arr.shape[0]} rows, "
                f"expected {expected_global}"
            )
        out[k] = arr
    return out


def put_global(arr: np.ndarray, sharding: NamedSharding) -> jax.Array:
    """Device-puts a host array that is IDENTICAL on every process (e.g. a
    deterministic index vector) onto a possibly-multi-host sharding: each
    process uploads only the shards its devices own."""
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    arr = np.asarray(arr)
    idx_map = sharding.addressable_devices_indices_map(arr.shape)
    shards = [jax.device_put(arr[idx], d) for d, idx in idx_map.items()]
    return jax.make_array_from_single_device_arrays(arr.shape, sharding, shards)


def init_state(cfg: TrainConfig, optimizer: optax.GradientTransformation, mesh) -> TrainState:
    if cfg.init_checkpoint:
        params, stats = ckpt.load_model(cfg.init_checkpoint)
        params = jax.tree.map(jnp.asarray, params)
        stats = jax.tree.map(jnp.asarray, stats)
    else:
        params, stats = resnet.init_keypoint_cnn(
            jax.random.key(cfg.random_seed),
            cfg.n_keypoints,
            cfg.in_channels,
            head=cfg.head,
            feat_hw=cfg.input_resolution // 32,
        )
        if cfg.init_backbone:
            # backbone-only init (proxy-pretrained weights; the head stays
            # fresh — its fan-in may differ from the pretrain task's head)
            pre_params, pre_stats = ckpt.load_model(cfg.init_backbone)
            for k, v in pre_params.items():
                if (cfg.init_head or not k.startswith("fc.")) and k in params:
                    if params[k].shape != jnp.asarray(v).shape:
                        raise ValueError(
                            f"init_backbone shape mismatch at {k}: "
                            f"{jnp.asarray(v).shape} vs {params[k].shape}"
                        )
                    params[k] = jnp.asarray(v)
            for k, v in pre_stats.items():
                if k in stats:
                    stats[k] = jnp.asarray(v)
    opt_state = optimizer.init(params)
    replicated = NamedSharding(mesh, P())
    return TrainState(
        params=jax.device_put(params, replicated),
        batch_stats=jax.device_put(stats, replicated),
        opt_state=jax.device_put(opt_state, replicated),
    )


@jax.jit
def _ema_apply(ema, snap, decay):
    return jax.tree.map(lambda a, b: decay * a + (1.0 - decay) * b, ema, snap)


def make_sample_weights(dataset: PrunedKeypointDataset, cfg: TrainConfig) -> np.ndarray | None:
    """Per-row epoch-sampling weights targeting the measured failure regimes
    (TrainConfig.oversample_close / oversample_outframe) and/or the
    checkpoint-measured per-row difficulty (cfg.sample_weights_path, from
    scripts/compute_difficulty_weights.py); None = uniform."""
    if not (cfg.oversample_close or cfg.oversample_outframe or cfg.sample_weights_path):
        return None
    seg = np.asarray(dataset.split.segmentation_ratios, np.float64)
    pc = np.asarray(dataset.pixel_coordinates)
    any_out = (
        (pc[..., 0] < 0)
        | (pc[..., 0] > dataset.W - 1)
        | (pc[..., 1] < 0)
        | (pc[..., 1] > dataset.H - 1)
    ).any(axis=-1)
    w = (
        1.0
        + cfg.oversample_close * (seg > cfg.close_seg_threshold)
        + cfg.oversample_outframe * any_out
    )
    w = np.asarray(w, np.float64)
    if cfg.sample_weights_path:
        dw = np.load(cfg.sample_weights_path).astype(np.float64)
        if dw.shape != (len(dataset),):
            raise ValueError(
                f"sample_weights_path rows {dw.shape} != dataset rows {len(dataset)} "
                "— weights were computed against a different train split"
            )
        if dw.min() <= 0:
            raise ValueError("difficulty weights must be positive")
        w = w * dw
    return w


def _device_local_rows(
    n_dev: int, n_local: int, n_dataset: int, subset: np.ndarray | None
) -> np.ndarray:
    """Dataset row held at shard-local position (d, i) of a device-resident
    split: _device_dataset lays rows out as order[(d*n_local + i)] with
    order = arange(n_dev*n_local) % n_resident (wrap-pad), optionally mapped
    through ``subset``. The weighted epoch draw needs this to look up each
    shard's sampling probabilities; pinned against _device_dataset's actual
    layout in tests/test_round4_features.py::test_device_local_rows_layout."""
    n_res = len(subset) if subset is not None else n_dataset
    rows = (np.arange(n_dev)[:, None] * n_local + np.arange(n_local)[None, :]) % n_res
    if subset is not None:
        rows = np.asarray(subset)[rows]
    return rows


def maybe_initialize_distributed(cfg: TrainConfig) -> None:
    """Multi-host bring-up (the reference's TCP rendezvous / DDP init role,
    reference: train.py:122-152). Call before any device access. With
    ``coordinator_address`` set, passes the explicit 3-tuple; with bare
    ``distributed=True``, defers to jax.distributed auto-detection (TPU pod
    metadata). No-ops when already initialized so train() stays re-entrant
    in tests."""
    if not (cfg.distributed or cfg.coordinator_address):
        return
    # harmless on TPU (only the CPU client factory reads it); required for
    # multi-process CPU runs to get a cross-host collectives implementation
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    kwargs = {}
    if cfg.coordinator_address:
        kwargs = dict(
            coordinator_address=cfg.coordinator_address,
            num_processes=cfg.num_processes,
            process_id=cfg.process_id,
        )
    # State check first: jax >= 0.9 raises "distributed.initialize should
    # only be called once." (no "already initialized" substring), so message
    # matching alone is a dead guard against newer jax.
    is_init = getattr(jax.distributed, "is_initialized", None)
    if is_init is not None and is_init():
        return
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as exc:  # already initialized — stay re-entrant
        msg = str(exc).lower()
        if "already initialized" not in msg and "only be called once" not in msg:
            raise


def train(cfg: TrainConfig) -> dict:
    """Runs the full training loop; returns summary metrics."""
    maybe_initialize_distributed(cfg)
    np.random.seed(cfg.random_seed)

    train_dataset = PrunedKeypointDataset(cfg.dataset_config, train=True, cache=cfg.cache_dataset)
    val_dataset = PrunedKeypointDataset(cfg.dataset_config, train=False, cache=cfg.cache_dataset)

    # multi-host: each process loads its shard of the global permutation
    shard_index, num_shards = jax.process_index(), jax.process_count()
    per_host_batch = cfg.batch_size // num_shards
    sample_w = make_sample_weights(train_dataset, cfg)
    train_loader = PrefetchingLoader(
        train_dataset, per_host_batch, shuffle=True, seed=cfg.random_seed,
        shard_index=shard_index, num_shards=num_shards, sample_weights=sample_w,
    )
    val_loader = PrefetchingLoader(
        val_dataset, per_host_batch, shuffle=False, drop_last=False,
        shard_index=shard_index, num_shards=num_shards,
    )

    mesh = make_mesh(cfg.multigpu)
    optimizer = make_optimizer(cfg)
    state = init_state(cfg, optimizer, mesh)
    # normalize the LR leaf to the exact aval set_learning_rate produces, so
    # the first post-val scheduler update doesn't change the opt_state pytree
    # signature and force a needless train-step retrace at epoch 1
    state = state._replace(opt_state=set_learning_rate(state.opt_state, cfg.learning_rate))

    train_augment = KeypointAugmentation(cfg.augmentation_config, train=True)
    val_augment = KeypointAugmentation(cfg.augmentation_config, train=False)
    use_transplant = cfg.augmentation_config.random_transplantation_with_depth

    replicated = NamedSharding(mesh, P())
    data_sharded = NamedSharding(mesh, P("data"))
    step_in_shardings = (replicated, data_sharded, data_sharded, None) + (
        (data_sharded,) if cfg.use_example_weights else ()
    )
    from perseus_tpu.utils.xla_opts import tpu_compiler_options

    xla_opts = tpu_compiler_options()
    train_step = jax.jit(
        make_train_step(cfg, optimizer, train_augment, mesh=mesh),
        in_shardings=step_in_shardings,
        out_shardings=(replicated, replicated),
        donate_argnums=(0,),
        compiler_options=xla_opts,
    )
    eval_step = jax.jit(
        make_eval_step(cfg, val_augment),
        in_shardings=(replicated, data_sharded, data_sharded, data_sharded),
        out_shardings=(replicated, replicated),
    )

    n_dev = len(mesh.devices.reshape(-1))
    dd_train = dd_val = None
    if cfg.data_on_device:
        if cfg.batch_size % n_dev:
            raise ValueError(
                f"data_on_device requires batch_size ({cfg.batch_size}) divisible "
                f"by the device count ({n_dev})"
            )
        local_bs = cfg.batch_size // n_dev
        dd_step_shardings = (replicated, data_sharded, data_sharded, data_sharded, None) + (
            (data_sharded,) if cfg.use_example_weights else ()
        )
        dd_train_step = jax.jit(
            make_device_data_train_step(cfg, optimizer, train_augment, mesh=mesh),
            in_shardings=dd_step_shardings,
            out_shardings=(replicated, replicated),
            donate_argnums=(0,),
            compiler_options=xla_opts,
        )
        dd_eval_step = jax.jit(
            make_device_data_eval_step(cfg, val_augment, mesh=mesh),
            in_shardings=(replicated, data_sharded, data_sharded, data_sharded, data_sharded),
            out_shardings=(replicated, replicated),
        )
        idx_epoch_sharded = NamedSharding(mesh, P(None, "data"))
        dd_epoch_fn = jax.jit(
            make_device_data_epoch_fn(cfg, optimizer, train_augment, mesh=mesh),
            in_shardings=(replicated, data_sharded, data_sharded, idx_epoch_sharded, None, None)
            + ((data_sharded,) if cfg.use_example_weights else ()),
            out_shardings=(replicated, replicated),
            donate_argnums=(0,),
            compiler_options=xla_opts,
        )

    scheduler = PlateauScheduler(
        cfg.learning_rate, cfg.plateau_patience, cfg.plateau_factor, cfg.min_learning_rate
    )
    ema = None  # epoch-scale Polyak average (cfg.ema_decay); eval artifact
    start_epoch = 0
    if cfg.resume:
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "epoch": 0,
            "lr": 0.0,
            "sched_best": 0.0,
            "sched_num_bad": 0,
        }
        if cfg.ema_decay > 0:
            template["ema_params"] = state.params
            template["ema_batch_stats"] = state.batch_stats
        saved = None
        while saved is None:
            try:
                saved = ckpt.restore_train_state(cfg.resume, target=template)
            except (KeyError, ValueError):
                # older checkpoint layouts: first drop the EMA keys, then the
                # scheduler-state keys
                if "ema_params" in template:
                    template.pop("ema_params")
                    template.pop("ema_batch_stats")
                elif "sched_best" in template:
                    template.pop("sched_best")
                    template.pop("sched_num_bad")
                else:
                    raise
        replicated = NamedSharding(mesh, P())
        state = TrainState(
            params=jax.device_put(saved["params"], replicated),
            batch_stats=jax.device_put(saved["batch_stats"], replicated),
            opt_state=jax.device_put(saved["opt_state"], replicated),
        )
        start_epoch = int(saved.get("epoch", -1)) + 1
        scheduler.lr = float(saved.get("lr", cfg.learning_rate))
        # plateau memory must survive the restart or LR trajectories diverge
        # from an uninterrupted run whenever a plateau spans it
        scheduler.best = float(saved.get("sched_best", float("inf")))
        scheduler.num_bad = int(saved.get("sched_num_bad", 0))
        if "ema_params" in saved:
            ema = {
                "params": jax.device_put(saved["ema_params"], replicated),
                "batch_stats": jax.device_put(saved["ema_batch_stats"], replicated),
            }
        state = state._replace(opt_state=set_learning_rate(state.opt_state, scheduler.lr))
        run_id = os.path.basename(os.path.normpath(cfg.resume))
    else:
        run_id = ptlog.generate_id()
    if jax.process_count() > 1 and not cfg.resume:
        # every process must agree on the run directory — the checkpoint
        # save is a collective — so broadcast process 0's random draw
        from jax.experimental import multihost_utils

        buf = np.frombuffer(run_id.encode().ljust(16), dtype=np.uint8).copy()
        run_id = bytes(np.asarray(multihost_utils.broadcast_one_to_all(buf))).decode().strip()
    run = ptlog.init(cfg.wandb_project, config=cfg, run_id=run_id) if jax.process_index() == 0 else None
    run_key = jax.random.key(cfg.random_seed, impl=cfg.rng_impl)

    def _dd_subset_for(epoch: int) -> np.ndarray | None:
        """Deterministic device-resident row subset for this epoch (None =
        whole split fits). Keyed by the refresh window so a resumed run
        rebuilds the same subset an uninterrupted run would hold."""
        if not (cfg.device_data_rows and cfg.device_data_rows < len(train_dataset)):
            return None
        r = cfg.device_data_refresh_epochs
        window = (epoch // r) * r if r else 0
        rng = np.random.default_rng((cfg.random_seed, 7771, window))
        return np.sort(rng.choice(len(train_dataset), cfg.device_data_rows, replace=False))

    dd_sub_window = None
    dd_cur_sub = None
    if cfg.data_on_device:
        dd_cur_sub = _dd_subset_for(start_epoch)
        r = cfg.device_data_refresh_epochs
        dd_sub_window = (start_epoch // r) * r if (r and dd_cur_sub is not None) else 0
        dd_train = _device_dataset(train_dataset, cfg, mesh, use_transplant, subset=dd_cur_sub)
        dd_val = _device_dataset(val_dataset, cfg, mesh, use_transplant=False)

    if cfg.data_on_device:
        steps_per_epoch = dd_train[4] // local_bs  # n_local // local batch
    else:
        steps_per_epoch = train_loader.num_batches()
    if steps_per_epoch == 0:
        raise ValueError(
            f"zero train steps per epoch: dataset ({len(train_dataset)} rows, "
            f"{'device-resident, ' + str(dd_train[4]) + ' rows/shard' if cfg.data_on_device else 'host loader'}) "
            f"is smaller than the batch ({cfg.batch_size} global)"
        )
    global_step = start_epoch * steps_per_epoch
    last_val_loss = float("nan")
    loss_history: list = []  # per-epoch mean train loss
    profiling = False
    profile_done = False
    profile_stop = 0
    steps_this_run = 0
    for epoch in range(start_epoch, cfg.n_epochs):
        epoch_losses = []
        n_images = 0
        t0 = time.time()
        def maybe_profile(loss):
            nonlocal profiling, profile_stop, profile_done
            if (
                cfg.profile_dir
                and not profiling
                and not profile_done
                and steps_this_run >= 1  # skip the compile step; resume-safe
                and jax.process_index() == 0
            ):
                jax.profiler.start_trace(cfg.profile_dir)
                profiling = True
                profile_stop = steps_this_run + cfg.profile_steps
            if profiling and loss is not None and steps_this_run >= profile_stop:
                jax.block_until_ready(loss)
                jax.profiler.stop_trace()
                profiling = False
                profile_done = True

        if cfg.data_on_device:
            r = cfg.device_data_refresh_epochs
            if (
                r
                and cfg.device_data_rows
                and cfg.device_data_rows < len(train_dataset)
                and (epoch // r) * r != dd_sub_window
            ):
                # re-draw the resident subset: free the old buffers FIRST so
                # peak HBM stays one dataset, then decode+upload the new draw
                for a in dd_train[:3]:
                    a.delete()
                dd_sub_window = (epoch // r) * r
                dd_cur_sub = _dd_subset_for(epoch)
                dd_train = _device_dataset(
                    train_dataset, cfg, mesh, use_transplant, subset=dd_cur_sub
                )
                # each refresh stages ~10 GB of decode temporaries; glibc
                # keeps the freed arenas (measured ~4 GB RSS creep per
                # refresh on a 50k-row cached split — enough to OOM a long
                # run), so hand the pages back to the OS
                try:
                    import ctypes

                    ctypes.CDLL("libc.so.6").malloc_trim(0)
                except OSError:  # non-glibc platform
                    pass
                # RSS breadcrumb: the remote-transfer client retains ~26% of
                # uploaded bytes (neither delete() nor malloc_trim reclaims
                # it), so long runs creep ~4 GB per refresh — surface the
                # trend so an impending host OOM is visible in the log
                # (a silent OOM kill cost round 4 a 300-epoch run).
                try:
                    with open("/proc/self/status") as f:
                        rss = next(
                            ln for ln in f if ln.startswith("VmRSS")
                        ).split()[1]
                    print(f"[refresh epoch {epoch}] host RSS {int(rss)>>20} GB", flush=True)
                except (OSError, StopIteration):
                    pass
            d_imgs, d_crds, d_w, _, n_local = dd_train
            # shard-local per-epoch permutations (the DistributedSampler
            # reshuffle, one independent stream per shard)
            if sample_w is not None:
                rows = _device_local_rows(n_dev, n_local, len(train_dataset), dd_cur_sub)
                probs = sample_w[rows]
                probs /= probs.sum(axis=1, keepdims=True)
                perms = np.stack(
                    [
                        np.random.default_rng((cfg.random_seed, epoch, d)).choice(
                            n_local, size=n_local, replace=True, p=probs[d]
                        )
                        for d in range(n_dev)
                    ]
                )
            else:
                perms = np.stack(
                    [
                        np.random.default_rng((cfg.random_seed, epoch, d)).permutation(n_local)
                        for d in range(n_dev)
                    ]
                )
            if cfg.device_data_epoch_scan and not cfg.profile_dir:
                # one dispatch for the whole epoch: (steps, B) index tensor,
                # keys folded in-graph (bit-identical to the per-step fold)
                idx_ep = np.stack(
                    [
                        np.ascontiguousarray(
                            perms[:, s * local_bs : (s + 1) * local_bs]
                        ).reshape(-1)
                        for s in range(steps_per_epoch)
                    ]
                ).astype(np.int32)
                ep_args = (
                    state,
                    d_imgs,
                    d_crds,
                    put_global(idx_ep, idx_epoch_sharded),
                    run_key,
                    np.int32(global_step),
                ) + ((d_w,) if cfg.use_example_weights else ())
                state, losses = dd_epoch_fn(*ep_args)
                if run is not None:
                    for loss_val in np.asarray(losses).tolist():
                        run.log({"loss": loss_val})
                        epoch_losses.append(loss_val)
                else:
                    epoch_losses.append(jnp.mean(losses))
                n_images += cfg.batch_size * steps_per_epoch
                global_step += steps_per_epoch
                steps_this_run += steps_per_epoch
            else:
                for s in range(steps_per_epoch):
                    maybe_profile(None)
                    idx = np.ascontiguousarray(
                        perms[:, s * local_bs : (s + 1) * local_bs]
                    ).reshape(-1).astype(np.int32)
                    idx_dev = put_global(idx, data_sharded)
                    key = jax.random.fold_in(run_key, global_step)
                    step_args = (state, d_imgs, d_crds, idx_dev, key) + (
                        (d_w,) if cfg.use_example_weights else ()
                    )
                    state, loss = dd_train_step(*step_args)
                    if run is not None:
                        loss_val = float(loss)
                        run.log({"loss": loss_val})
                        epoch_losses.append(loss_val)
                    else:
                        # no logger attached: keep the loss as a device
                        # scalar — a float() here would force a host sync
                        # every step (a full round-trip on remote-attached
                        # chips) and serialize the step pipeline
                        epoch_losses.append(loss)
                    n_images += cfg.batch_size
                    global_step += 1
                    steps_this_run += 1
                    maybe_profile(loss)
        else:
            for batch in train_loader.epoch(epoch):
                maybe_profile(None)
                images_aug = _prepare_aug_batch(batch, cfg.in_channels, use_transplant)
                host_batch = {
                    "images": np.asarray(images_aug),
                    "coords": batch["pixel_coordinates"],
                }
                if cfg.use_example_weights:
                    host_batch["weight"] = np.asarray(batch["weight"], dtype=np.float32)
                sharded = shard_batch(host_batch, mesh, expected_global=cfg.batch_size)
                key = jax.random.fold_in(run_key, global_step)
                step_args = (state, sharded["images"], sharded["coords"], key) + (
                    (sharded["weight"],) if cfg.use_example_weights else ()
                )
                state, loss = train_step(*step_args)
                if run is not None:
                    loss_val = float(loss)
                    run.log({"loss": loss_val})
                    epoch_losses.append(loss_val)
                else:
                    epoch_losses.append(loss)  # see the device-data branch
                n_images += images_aug.shape[0]
                global_step += 1
                steps_this_run += 1
                maybe_profile(loss)
        if epoch_losses:
            jax.block_until_ready(epoch_losses[-1])  # close the async pipeline
        if cfg.ema_decay > 0:
            snap = {"params": state.params, "batch_stats": state.batch_stats}
            # First snapshot runs through _ema_apply too (decay*x+(1-decay)*x
            # == x) so it comes back as FRESH buffers with the input sharding:
            # the train step donates its state, and an aliased snapshot would
            # be deleted by next epoch's first step ("Array has been deleted").
            ema = _ema_apply(ema if ema is not None else snap, snap, cfg.ema_decay)
        epoch_time = time.time() - t0
        throughput = n_images * jax.process_count() / max(epoch_time, 1e-9)
        epoch_losses = [float(l) for l in epoch_losses]
        if epoch_losses:
            loss_history.append(float(np.mean(epoch_losses)))

        if epoch % cfg.print_epochs == 0 and jax.process_index() == 0:
            print(
                f"[epoch {epoch}] avg loss {np.mean(epoch_losses):.5f}"
                f" ({epoch_time:.1f}s, {throughput:,.0f} img/s)",
                flush=True,
            )
        if run is not None:
            run.log({"epoch_time_s": epoch_time, "train_images_per_sec": throughput})

        if epoch % cfg.val_epochs == 0 and cfg.data_on_device:
            v_imgs, v_crds, _, v_valid, v_n_local = dd_val
            valid2d = v_valid.reshape(n_dev, v_n_local)
            loss_sum, count = 0.0, 0.0
            for s in range(-(-v_n_local // local_bs)):
                length = min(local_bs, v_n_local - s * local_bs)
                idx2 = np.zeros((n_dev, local_bs), np.int32)
                mask2 = np.zeros((n_dev, local_bs), np.float32)
                idx2[:, :length] = np.arange(s * local_bs, s * local_bs + length)
                mask2[:, :length] = valid2d[:, s * local_bs : s * local_bs + length]
                s_, n_ = dd_eval_step(
                    state,
                    v_imgs,
                    v_crds,
                    put_global(idx2.reshape(-1), data_sharded),
                    put_global(mask2.reshape(-1), data_sharded),
                )
                loss_sum += float(s_)
                count += float(n_)
            last_val_loss = loss_sum / count if count else float("nan")
            if run is not None:
                run.log({"val_loss": last_val_loss, "lr": scheduler.lr})
                print(f"[epoch {epoch}] val loss {last_val_loss:.5f} (lr {scheduler.lr:.2e})", flush=True)
            new_lr = scheduler.step(last_val_loss)
            state = state._replace(opt_state=set_learning_rate(state.opt_state, new_lr))
        elif epoch % cfg.val_epochs == 0:
            loss_sum, count = 0.0, 0.0
            for batch in val_loader.epoch(0):
                images = np.asarray(_prepare_aug_batch(batch, cfg.in_channels, use_transplant=False))
                coords_np = np.asarray(batch["pixel_coordinates"], dtype=np.float32)
                n_real = images.shape[0]
                pad = (-n_real) % n_dev  # keep partial batches mesh-divisible
                weights = np.concatenate([np.ones(n_real, np.float32), np.zeros(pad, np.float32)])
                if pad:
                    images = np.concatenate([images, np.tile(images[:1], (pad, 1, 1, 1))])
                    coords_np = np.concatenate([coords_np, np.tile(coords_np[:1], (pad, 1, 1))])
                sharded = shard_batch(
                    {"images": images, "coords": coords_np, "weights": weights}, mesh
                )
                s, n = eval_step(state, sharded["images"], sharded["coords"], sharded["weights"])
                loss_sum += float(s)
                count += float(n)
            last_val_loss = loss_sum / count if count else float("nan")
            if run is not None:
                run.log({"val_loss": last_val_loss, "lr": scheduler.lr})
                print(f"[epoch {epoch}] val loss {last_val_loss:.5f} (lr {scheduler.lr:.2e})", flush=True)
            new_lr = scheduler.step(last_val_loss)
            state = state._replace(opt_state=set_learning_rate(state.opt_state, new_lr))

        # EVERY process calls save: orbax's save contains a global barrier
        # (sync_global_processes) — a process-0-only call deadlocks the other
        # hosts at their next collective. Orbax itself coordinates so only
        # the primary host writes the (replicated) state.
        if epoch % cfg.save_epochs == 0:
            to_save = {
                "params": state.params,
                "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
                "epoch": epoch,
                "lr": scheduler.lr,
                "sched_best": scheduler.best,
                "sched_num_bad": scheduler.num_bad,
            }
            if ema is not None:
                to_save["ema_params"] = ema["params"]
                to_save["ema_batch_stats"] = ema["batch_stats"]
            ckpt.save_train_state(f"{ROOT}/outputs/models/{run_id}", to_save)

    if profiling:  # runs shorter than profile_steps: flush the trace anyway
        jax.profiler.stop_trace()
        profiling = False
    if run is not None:
        run.finish()
    return {
        "run_id": run_id,
        "final_train_loss": float(np.mean(epoch_losses)) if epoch_losses else float("nan"),
        "train_loss_history": loss_history,
        "final_val_loss": last_val_loss,
        "state": state,
        "ema": ema,  # {"params", "batch_stats"} or None (cfg.ema_decay == 0)
    }


def main() -> None:
    from perseus_tpu.configs.cli import cli

    train(cli(TrainConfig))


if __name__ == "__main__":
    main()
