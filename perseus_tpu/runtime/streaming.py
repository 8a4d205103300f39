"""Streaming runtime: camera frame -> keypoints -> pose, one XLA program.

The TPU-native replacement for the reference's live loop (reference:
scripts/streaming.py:89-158), which ran preprocess in numpy, the detector on
CPU torch, and no pose smoothing. Here a single jitted function fuses:

  preprocess (NaN/Inf cleanup, depth /cube_scale, center-crop,
  deterministic near/far clamp)
  -> folded-BN ResNet forward (bf16)
  -> keypoint denormalization
  -> fixed-lag LM smoother update

so one device dispatch per frame produces both the pixel keypoints and the
smoothed SE(3) pose — the BASELINE.json "streaming loop as one jitted XLA
program" configuration. The host only grabs frames and (optionally) draws
the overlay.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from perseus_tpu import ROOT
from perseus_tpu.augment.ops import depth_plane_clamp
from perseus_tpu.camera import center_crop_hw, denormalize_pixel_coordinates
from perseus_tpu.datagen.labeling import cube_corners
from perseus_tpu.lie import SE3
from perseus_tpu.models import resnet
from perseus_tpu.smoother.fixed_lag import FixedLagSmoother, SmootherCarry
from perseus_tpu.smoother.lm import SmootherConfig
from perseus_tpu.train import checkpoint as ckpt

__all__ = ["StreamingConfig", "StreamingPipeline", "main"]


@dataclass(frozen=True)
class StreamingConfig:
    """Streaming pipeline configuration."""

    model_path: str = f"{ROOT}/outputs/models/latest"
    num_channels: int = 3  # 3 -> RGB ckpt, 4 -> RGBD ckpt (reference: streaming.py:104)
    model_h: int = 256
    model_w: int = 256
    cube_scale: float = 0.035
    apply_depth_clamp: bool = True
    amp: bool = True
    # smoother
    smooth: bool = True
    smoother: SmootherConfig = field(default_factory=lambda: SmootherConfig(window=24))
    camera_fov: float = 1.0  # rad; used to build intrinsics for the smoother
    # Simulation-replay support (eval/pose_eval.py): rendered depth is
    # already in cube units (the sim's unit convention), so skip the
    # metric -> cube-unit division a real camera needs; and the smoother's
    # cube-corner geometry scale can differ from cube_scale (a sim cube of
    # abs_scale units vs the 0.035 m real cube).
    depth_in_cube_units: bool = False
    corner_scale: float = 0.0  # 0 -> use cube_scale


class StreamingPipeline:
    """Builds the jitted frame->keypoints(->pose) function."""

    def __init__(self, cfg: StreamingConfig, params: dict | None = None, batch_stats: dict | None = None):
        self.cfg = cfg
        if params is None:
            params, batch_stats = ckpt.load_model(cfg.model_path)
        self.folded = resnet.fold_batchnorm(
            jax.tree.map(jnp.asarray, params), jax.tree.map(jnp.asarray, batch_stats)
        )
        self.compute_dtype = jnp.bfloat16 if cfg.amp else jnp.float32

        self.smoother = None
        if cfg.smooth:
            from perseus_tpu.camera import intrinsics_from_fov

            intr = intrinsics_from_fov(jnp.asarray(cfg.camera_fov), cfg.model_h, cfg.model_w)
            corner_scale = cfg.corner_scale or cfg.cube_scale
            self.smoother = FixedLagSmoother(
                cfg.smoother, intr, cube_corners(corner_scale).astype(jnp.float32)
            )

        self._step = jax.jit(self._build_step())

    def init_carry(self, initial_pose: SE3 | None = None) -> SmootherCarry | None:
        """Fresh smoother carry; pass `initial_pose` (e.g. from
        FixedLagSmoother.coarse_pose_from_keypoints on the first detection)
        to cold-start near the true pose."""
        return self.smoother.init(initial_pose) if self.smoother is not None else None

    def _build_step(self):
        cfg = self.cfg

        def preprocess(frame: jnp.ndarray) -> jnp.ndarray:
            """(H, W, 3|4) float32 -> (h, w, C) model input: NaN/Inf depth
            -> 0, depth / cube_scale, center-crop (reference:
            streaming.py:68-80), optional val-mode near/far clamp."""
            rgb = frame[..., :3]
            if cfg.num_channels >= 4:
                depth = frame[..., 3]
                depth = jnp.where(jnp.isfinite(depth), depth, 0.0)
                if not cfg.depth_in_cube_units:  # metric camera depth
                    depth = depth / cfg.cube_scale
                if cfg.apply_depth_clamp:
                    depth = depth_plane_clamp(depth, cube_scale=cfg.cube_scale)
                frame = jnp.concatenate([rgb, depth[..., None]], axis=-1)
            else:
                frame = rgb
            return center_crop_hw(frame, cfg.model_h, cfg.model_w)

        def step(frame: jnp.ndarray, carry: Any):
            image = preprocess(frame)
            pred = resnet.keypoint_cnn_apply_folded(
                self.folded, image[None], compute_dtype=self.compute_dtype
            )
            keypoints = denormalize_pixel_coordinates(
                pred.reshape(-1, 2), cfg.model_h, cfg.model_w
            )
            if self.smoother is not None:
                carry, pose = self.smoother.update(carry, keypoints)
                return keypoints, image, carry, pose
            identity = SE3(jnp.eye(3), jnp.zeros(3))
            return keypoints, image, carry, identity

        return step

    def __call__(self, frame: np.ndarray, carry: Any):
        """One frame in; (keypoints_px (K, 2), model_image, carry, pose) out."""
        return self._step(jnp.asarray(frame), carry)


def run_display_loop(cfg: StreamingConfig, source, window_name: str = "perseus-tpu stream") -> None:
    """Live overlay display (requires cv2 + a display), mirroring the
    reference's visualization (streaming.py:121-155)."""
    import cv2

    pipeline = StreamingPipeline(cfg)
    carry = pipeline.init_carry()
    cv2.namedWindow(window_name, cv2.WINDOW_NORMAL)
    try:
        while True:
            frame = source.get_frame()
            if frame is None:
                continue
            keypoints, image, carry, pose = pipeline(frame, carry)
            keypoints = np.asarray(keypoints)
            image = np.asarray(image)

            rgb = (np.clip(image[..., :3], 0, 1) * 255).astype(np.uint8)
            panes = [rgb[..., ::-1].copy()]
            if image.shape[-1] > 3:
                depth_norm = cv2.normalize(image[..., 3], None, 0, 255, cv2.NORM_MINMAX)
                panes.append(cv2.applyColorMap(depth_norm.astype(np.uint8), cv2.COLORMAP_JET))
            for pane, color in zip(panes, ((255, 0, 0), (0, 255, 0))):
                for kp in keypoints:
                    cv2.circle(pane, (int(kp[0]), int(kp[1])), 5, color, -1)
            cv2.imshow(window_name, np.hstack(panes))
            if cv2.waitKey(1) & 0xFF == ord("q"):
                break
    finally:
        source.close()
        cv2.destroyAllWindows()


def main() -> None:
    from perseus_tpu.configs.cli import cli
    from perseus_tpu.runtime.sources import ZEDSource

    cfg = cli(StreamingConfig)
    source = ZEDSource(serial_number=19798856, depth=True)
    run_display_loop(cfg, source)


if __name__ == "__main__":
    main()
