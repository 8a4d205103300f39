"""Pruned keypoint dataset: lazy per-image loading + batched host pipeline.

The capability equivalent of the reference's PrunedKeypointDataset
(reference: perseus/detector/data.py:22-100): metadata (pixel coordinates,
asset ids, weights, filenames) lives in RAM; images decode lazily from PNG /
float-TIFF / segmentation-PNG files, with the segmentation binarized as
``seg == asset_id + 1``.

TPU-first differences from the torch DataLoader design:
  * channels-last (H, W, C) numpy outputs, ready for NHWC device puts;
  * a double-buffered background-thread batch iterator
    (:class:`PrefetchingLoader`) replaces torch's worker processes — decoded
    batches stage into contiguous pinned-style numpy buffers and overlap
    with device compute;
  * optional in-RAM compact cache (``cache=True``): RGB as uint8,
    segmentation as bool, depth as f32 (~0.46 MB/row at 256x256 — the whole
    2,500-video reference-scale dataset caches in ~23 GB, vs ~65 GB decoded
    f32), materialized to the exact decoded f32 rows on access. This is the
    path that keeps a TPU chip fed at training batch sizes (the reference's
    known bottleneck, SURVEY.md section 7 "host data path").
"""

from __future__ import annotations

import os
import queue
import threading
from dataclasses import dataclass

import numpy as np

from perseus_tpu import ROOT
from perseus_tpu.data import schema

__all__ = ["KeypointDatasetConfig", "PrunedKeypointDataset", "PrefetchingLoader"]


@dataclass(frozen=True)
class KeypointDatasetConfig:
    """Configuration for the keypoint dataset (same surface as the
    reference's KeypointDatasetConfig; perseus/detector/data.py:14-19)."""

    dataset_path: str = "data/pruned_dataset/pruned.hdf5"
    lazy: bool = True
    # Decode batches with the C++ thread-pool decoder (perseus_tpu.native.io)
    # when it is available; falls back to the PIL path automatically.
    native_decode: bool = True
    decode_threads: int = 0  # 0 = one per CPU


class PrunedKeypointDataset:
    """Flat per-image dataset over the pruned HDF5 layout."""

    def __init__(self, cfg: KeypointDatasetConfig, train: bool = True, cache: bool = False):
        self.cfg = cfg
        self.train = train

        dataset_path = cfg.dataset_path
        if not dataset_path.startswith("/"):
            dataset_path = os.path.join(ROOT, dataset_path)
        self.dataset_path = dataset_path
        self.data_root = os.path.join(os.path.dirname(os.path.dirname(dataset_path)))

        self.split, attrs = schema.read_pruned_split(dataset_path, train=train)
        self.H = int(attrs["H"])
        self.W = int(attrs["W"])
        self.num_keypoints = int(attrs.get("num_keypoints", 8))
        self.pixel_coordinates = self.split.pixel_coordinates
        self.asset_ids = self.split.asset_ids
        self.weights = self.split.weights

        self._native = False
        if cfg.native_decode:
            from perseus_tpu.native import io as native_io

            self._native = native_io.available()

        # Compact columnar cache: RGB as uint8 (u8 -> f32/255 is the exact
        # decode conversion, so materialized rows are bit-identical to a
        # fresh decode), segmentation as bool, depth as f32. ~0.46 MB/row
        # at 256x256 instead of ~1.3 MB decoded — a 50k-row split caches in
        # ~23 GB instead of ~65 GB. Filled chunkwise so the peak never holds
        # a second full-split f32 copy.
        self._cache: dict | None = None
        if cache and len(self):
            n, h, w = len(self), self.H, self.W
            cc = {
                "image_u8": np.empty((n, h, w, 3), np.uint8),
                "depth_image": np.empty((n, h, w), np.float32),
                "seg_b": np.empty((n, h, w), np.bool_),
            }
            step = 2048
            for s in range(0, n, step):
                idx = np.arange(s, min(s + step, n))
                if self._native:
                    b = self.batch(idx)
                else:
                    items = [self._load(int(i)) for i in idx]
                    b = {k: np.stack([it[k] for it in items]) for k in items[0]}
                cc["image_u8"][s : s + step] = np.round(b["image"] * 255.0).astype(np.uint8)
                cc["depth_image"][s : s + step] = b["depth_image"]
                cc["seg_b"][s : s + step] = b["segmentation_image"] > 0.5
            self._cache = cc

    def __len__(self) -> int:
        return len(self.split)

    def _resolve(self, local_name: str) -> str:
        # stored filenames are relative to <repo>/data (reference:
        # perseus/detector/data.py:74-76)
        return os.path.join(self.data_root, local_name)

    def _load(self, idx: int) -> dict:
        image = schema.load_rgb_png(self._resolve(self.split.image_filenames[idx]))
        depth = schema.load_depth_tiff(self._resolve(self.split.depth_filenames[idx]))
        seg_raw = schema.load_segmentation_png(
            self._resolve(self.split.segmentation_filenames[idx])
        )
        asset_id = self.asset_ids[idx]
        segmentation = (seg_raw == asset_id + 1).astype(np.float32)
        return {
            "image": image,  # (H, W, 3) float32 [0, 1]
            "depth_image": depth.astype(np.float32),  # (H, W)
            "segmentation_image": segmentation,  # (H, W) {0, 1}
            "pixel_coordinates": self.pixel_coordinates[idx],  # (K, 2)
            # inverse-frequency example weight from merge (consumed by
            # TrainConfig.use_example_weights; dead data in the reference)
            "weight": np.float32(self.weights[idx]),
        }

    def _materialize(self, idx) -> dict:
        """Rows from the compact cache, restored to the decoded layout.
        `idx` may be an int or an index array (vectorized gather)."""
        cc = self._cache
        return {
            "image": cc["image_u8"][idx].astype(np.float32) / 255.0,
            "depth_image": cc["depth_image"][idx],
            "segmentation_image": cc["seg_b"][idx].astype(np.float32),
            "pixel_coordinates": self.pixel_coordinates[idx],
            "weight": np.float32(self.weights[idx])
            if np.isscalar(idx) or np.ndim(idx) == 0
            else np.asarray(self.weights[idx], np.float32),
        }

    def __getitem__(self, idx: int) -> dict:
        if self._cache is not None:
            return self._materialize(int(idx))
        return self._load(idx)

    def batch(self, indices: np.ndarray) -> dict:
        """Stacks examples into contiguous (B, ...) arrays.

        With the native decoder, the whole batch decodes in one GIL-free
        C++ thread-pool call straight into the output buffers."""
        if self._cache is not None:
            return self._materialize(np.asarray(indices, dtype=np.int64))
        if self._native:
            from perseus_tpu.native import io as native_io

            idx = [int(i) for i in indices]
            rgb, depth, seg, failures = native_io.decode_batch(
                [self._resolve(self.split.image_filenames[i]) for i in idx],
                [self._resolve(self.split.depth_filenames[i]) for i in idx],
                [self._resolve(self.split.segmentation_filenames[i]) for i in idx],
                np.asarray([self.asset_ids[i] for i in idx]),
                self.H,
                self.W,
                threads=self.cfg.decode_threads,
            )
            if failures:  # fall back item-by-item for exact error surfaces
                items = [self._load(i) for i in idx]
                return {k: np.stack([it[k] for it in items]) for k in items[0]}
            return {
                "image": rgb,
                "depth_image": depth,
                "segmentation_image": seg,
                "pixel_coordinates": np.stack([self.pixel_coordinates[i] for i in idx]),
                "weight": np.asarray([self.weights[i] for i in idx], dtype=np.float32),
            }
        items = [self[int(i)] for i in indices]
        return {k: np.stack([it[k] for it in items]) for k in items[0]}


class PrefetchingLoader:
    """Background-thread batch loader with a bounded prefetch queue.

    Epoch order is a deterministic permutation of (seed, epoch) — the
    functional replacement for torch's DistributedSampler.set_epoch
    reshuffle (reference: perseus/detector/train.py:246-247). For
    multi-host training, pass (shard_index, num_shards) to iterate this
    host's contiguous shard of the global permutation.
    """

    def __init__(
        self,
        dataset: PrunedKeypointDataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        prefetch: int = 2,
        shard_index: int = 0,
        num_shards: int = 1,
        sample_weights: np.ndarray | None = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.shard_index = shard_index
        self.num_shards = num_shards
        # Optional per-row sampling weights (train.make_sample_weights):
        # epochs draw WITH replacement proportional to these instead of a
        # uniform permutation. Identical on every host (the draw is keyed by
        # (seed, epoch) only), so multi-host shards stay consistent.
        self.sample_weights = None
        if sample_weights is not None and shuffle:
            w = np.asarray(sample_weights, np.float64)
            self.sample_weights = w / w.sum()

    def epoch_indices(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        if self.sample_weights is not None:
            order = np.random.default_rng((self.seed, epoch)).choice(
                n, size=n, replace=True, p=self.sample_weights
            )
        elif self.shuffle:
            order = np.random.default_rng((self.seed, epoch)).permutation(n)
        else:
            order = np.arange(n)
        if self.num_shards == 1 and not self.drop_last:
            return order
        # Batch-blocked sharding (wrap-padded to whole global batches, like
        # DistributedSampler): global batch b is order[b*gB:(b+1)*gB] and
        # host p takes the p-th contiguous block WITHIN each global batch.
        # The global arrays train() assembles from the per-host shards are
        # then identical to what a single process would build from `order` —
        # which is what makes the 2-process-vs-1-process equivalence test
        # possible (tests/test_distributed.py). The num_shards==1 training
        # path wrap-pads the SAME way (not drop-last-truncates) so single-
        # and multi-process runs iterate identical global batches — and the
        # same step count — for any dataset size, not just divisible ones.
        global_bs = self.batch_size * self.num_shards
        n_pad = -(-n // global_bs) * global_bs
        padded = np.resize(order, n_pad)
        blocks = padded.reshape(-1, self.num_shards, self.batch_size)
        return blocks[:, self.shard_index].reshape(-1)

    def num_batches(self) -> int:
        n = len(self.epoch_indices(0))
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def epoch(self, epoch: int = 0):
        """Yields prefetched batches for one epoch."""
        order = self.epoch_indices(epoch)
        nb = self.num_batches()
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            # bounded put that stays responsive to consumer shutdown
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for b in range(nb):
                    if stop.is_set():
                        return
                    idx = order[b * self.batch_size : (b + 1) * self.batch_size]
                    if not put(self.dataset.batch(idx)):
                        return
                put(None)
            except BaseException as exc:  # surface decode errors in the consumer
                put(exc)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
