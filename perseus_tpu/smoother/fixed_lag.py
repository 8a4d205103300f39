"""Fixed-lag smoother runtime: sliding window over streaming keypoints.

The component the reference leaves to its (out-of-repo) DROP controller:
assemble per-frame factors into a fixed-lag graph and update the pose
estimate as measurements arrive (SURVEY.md L4: "no smoother
runtime/graph-assembly/fixed-lag loop here, only the factors"). Here it is a
jittable `update` step:

  shift window <- drop the oldest frame into the prior (marginalization by
  rekeying), append the new measurement, initialize the new frame by
  dynamics propagation, run LM, emit the newest pose.

Static window size (a compile-time parameter, per SURVEY.md section 5
long-context note) keeps the whole update a single XLA program; warmup is
handled with a validity mask instead of a growing graph.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from perseus_tpu.camera import Intrinsics
from perseus_tpu.lie import SE3, se3_identity
from perseus_tpu.smoother.lm import SmootherConfig, WindowState, lm_solve, predict_next

__all__ = ["FixedLagSmoother", "SmootherCarry"]


class SmootherCarry(NamedTuple):
    window: WindowState
    measurements: jnp.ndarray  # (T, K, 2)
    valid: jnp.ndarray  # (T,) float 0/1
    prior_rot: jnp.ndarray  # (3, 3)
    prior_trans: jnp.ndarray  # (3,)
    prior_ang_vel: jnp.ndarray  # (3,)
    prior_vel: jnp.ndarray  # (3,)
    frames_seen: jnp.ndarray  # scalar int32


class FixedLagSmoother:
    """Functional fixed-lag smoother. All methods are jit-friendly; `update`
    is designed to be called inside the streaming pipeline's single jitted
    program (runtime/streaming.py)."""

    def __init__(
        self,
        cfg: SmootherConfig,
        intrinsics: Intrinsics,
        points_body: jnp.ndarray,
        camera_pose: SE3 | None = None,
        dtype=jnp.float32,
    ):
        self.cfg = cfg
        self.intrinsics = intrinsics
        self.points_body = points_body
        self.camera_pose = camera_pose
        self.dtype = dtype

    def init(self, initial_pose: SE3 | None = None) -> SmootherCarry:
        t = self.cfg.window
        k = self.cfg.n_keypoints
        pose0 = initial_pose if initial_pose is not None else se3_identity(dtype=self.dtype)
        window = WindowState(
            rot=jnp.broadcast_to(pose0.rot, (t, 3, 3)).astype(self.dtype),
            trans=jnp.broadcast_to(pose0.trans, (t, 3)).astype(self.dtype),
            ang_vel=jnp.zeros((t, 3), dtype=self.dtype),
            vel=jnp.zeros((t, 3), dtype=self.dtype),
        )
        return SmootherCarry(
            window=window,
            measurements=jnp.zeros((t, k, 2), dtype=self.dtype),
            valid=jnp.zeros((t,), dtype=self.dtype),
            prior_rot=pose0.rot.astype(self.dtype),
            prior_trans=pose0.trans.astype(self.dtype),
            prior_ang_vel=jnp.zeros((3,), dtype=self.dtype),
            prior_vel=jnp.zeros((3,), dtype=self.dtype),
            frames_seen=jnp.asarray(0, dtype=jnp.int32),
        )

    def coarse_pose_from_keypoints(self, keypoints_px: jnp.ndarray) -> SE3:
        """Closed-form cold-start pose guess from one frame of detections:
        weak-perspective depth from the pixel span of the known corner
        geometry (z ~ f * span3d / span_px) and translation by backprojecting
        the detection centroid; identity rotation. Good enough to put the
        first LM solve in the convergence basin (the role a PnP init plays
        in a classical pipeline) — the smoother refines from there."""
        kp = keypoints_px.astype(self.dtype)
        d_px = jnp.linalg.norm(kp[:, None, :] - kp[None, :, :], axis=-1)
        span_px = jnp.maximum(jnp.max(d_px), 1.0)
        p = self.points_body
        span_3d = jnp.max(jnp.linalg.norm(p[:, None, :] - p[None, :, :], axis=-1))
        f = 0.5 * (self.intrinsics.fx + self.intrinsics.fy)
        z0 = jnp.clip(f * span_3d / span_px, 0.1, 1e4)
        center = jnp.mean(kp, axis=0)
        t0 = jnp.stack(
            [
                (center[0] - self.intrinsics.cx) / self.intrinsics.fx * z0,
                (center[1] - self.intrinsics.cy) / self.intrinsics.fy * z0,
                z0,
            ]
        )
        return SE3(jnp.eye(3, dtype=self.dtype), t0.astype(self.dtype))

    def update(
        self, carry: SmootherCarry, keypoints_px: jnp.ndarray
    ) -> tuple[SmootherCarry, SE3]:
        """Consumes one frame of detected keypoints (K, 2) in pixels;
        returns the new carry and the smoothed newest pose."""
        cfg = self.cfg
        w = carry.window

        # marginalization by rekeying: after the shift, the new oldest frame
        # (old index 1) is anchored at its current estimate; until that frame
        # has real measurements keep the initial prior
        has_estimate = carry.valid[1] > 0.5
        prior_rot = jnp.where(has_estimate, w.rot[1], carry.prior_rot)
        prior_trans = jnp.where(has_estimate, w.trans[1], carry.prior_trans)
        prior_w = jnp.where(has_estimate, w.ang_vel[1], carry.prior_ang_vel)
        prior_v = jnp.where(has_estimate, w.vel[1], carry.prior_vel)

        # shift the window left; propagate a prediction into the new slot
        pred_pose, pred_w, pred_v = predict_next(w, cfg.dt, cfg.vel_frame)
        window = WindowState(
            rot=jnp.concatenate([w.rot[1:], pred_pose.rot[None]], axis=0),
            trans=jnp.concatenate([w.trans[1:], pred_pose.trans[None]], axis=0),
            ang_vel=jnp.concatenate([w.ang_vel[1:], pred_w[None]], axis=0),
            vel=jnp.concatenate([w.vel[1:], pred_v[None]], axis=0),
        )
        measurements = jnp.concatenate(
            [carry.measurements[1:], keypoints_px[None].astype(self.dtype)], axis=0
        )
        valid = jnp.concatenate([carry.valid[1:], jnp.ones((1,), dtype=self.dtype)])

        window, _ = lm_solve(
            cfg,
            window,
            measurements,
            valid,
            self.intrinsics,
            self.points_body,
            SE3(prior_rot, prior_trans),
            prior_w,
            prior_v,
            self.camera_pose,
        )

        new_carry = SmootherCarry(
            window=window,
            measurements=measurements,
            valid=valid,
            prior_rot=prior_rot,
            prior_trans=prior_trans,
            prior_ang_vel=prior_w,
            prior_vel=prior_v,
            frames_seen=carry.frames_seen + 1,
        )
        return new_carry, SE3(window.rot[-1], window.trans[-1])
