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
from perseus_tpu.smoother.residuals import keypoint_projection_residual

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
    consec_rejects: jnp.ndarray  # scalar int32 — innovation-gate state


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
            consec_rejects=jnp.asarray(0, dtype=jnp.int32),
        )

    def coarse_pose_from_keypoints(self, keypoints_px: jnp.ndarray) -> SE3:
        """Closed-form cold-start pose guess from one frame of detections:
        the weak-perspective POS step (the algebraic half of POSIT).

        Under weak perspective, the focal-normalized centered detections
        satisfy (u_i - u_mean)/f ~ (R p_i)_{xy} / z0, so least-squares rows
        r1, r2 = pinv(P) @ u_{x,y} recover the first two rotation rows scaled
        by 1/z0: depth from their magnitude, rotation by Gram-Schmidt
        orthonormalization (third row = cross product, det +1). Translation
        backprojects the detection centroid at that depth. Replaces the
        round-3 identity-rotation guess, which left cold starts at up to 180
        degrees initial rotation error — outside the LM basin for poses far
        from identity (the gap VERDICT round 3 'smoother cold-start' named).
        The weak-perspective reflection (Necker) ambiguity is not resolved
        here; the window refine + subsequent frames handle it, and either
        solution is within the LM basin (differentially tested in
        tests/test_smoother.py::test_coarse_pose_large_rotation_cold_start).
        """
        kp = keypoints_px.astype(self.dtype)
        p = self.points_body.astype(self.dtype)
        pc = p - jnp.mean(p, axis=0)
        center = jnp.mean(kp, axis=0)
        ux = (kp[:, 0] - center[0]) / self.intrinsics.fx
        uy = (kp[:, 1] - center[1]) / self.intrinsics.fy
        pinv = jnp.linalg.pinv(pc)  # (3, K); corners span 3D, full rank
        r1 = pinv @ ux
        r2 = pinv @ uy
        n1 = jnp.linalg.norm(r1)
        n2 = jnp.linalg.norm(r2)
        s = jnp.maximum(0.5 * (n1 + n2), 1e-8)  # = 1/z0
        z0 = jnp.clip(1.0 / s, 0.1, 1e4)
        a = r1 / jnp.maximum(n1, 1e-8)
        b = r2 - jnp.dot(a, r2) * a
        bn = jnp.linalg.norm(b)
        # degenerate (r1 ~ r2): fall back to any perpendicular direction
        alt = jnp.cross(a, jnp.where(jnp.abs(a[0]) < 0.9, jnp.array([1.0, 0, 0], self.dtype),
                                     jnp.array([0.0, 1.0, 0], self.dtype)))
        b = jnp.where(bn > 1e-6, b / jnp.maximum(bn, 1e-8), alt / jnp.linalg.norm(alt))
        c = jnp.cross(a, b)
        rot = jnp.stack([a, b, c], axis=0)  # rows -> R maps body to camera
        t0 = jnp.stack(
            [
                (center[0] - self.intrinsics.cx) / self.intrinsics.fx * z0,
                (center[1] - self.intrinsics.cy) / self.intrinsics.fy * z0,
                z0,
            ]
        )
        return SE3(rot.astype(self.dtype), t0.astype(self.dtype))

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

        # Innovation gate (SmootherConfig.gate_px): whole-frame detector
        # failures (identity switch to a distractor) move every corner
        # coherently, so the per-corner robust kernel sees no outliers —
        # the MEDIAN innovation is the discriminator. The measurement is
        # tested against BOTH the dynamics prediction and the last smoothed
        # pose and accepted if it agrees with EITHER: a frame consistent
        # with the last fit but not the prediction means the VELOCITY state
        # is wrong, not the detection (the scale_run6 pose_multi limit
        # cycle: contaminated velocities make the coast fly away, the gate
        # then rejects perfect detections 3-at-a-time forever). A gated
        # frame keeps its measurement slot but enters the graph with
        # valid=0: the window coasts on dynamics.
        accept = jnp.ones((), dtype=self.dtype)
        consec = jnp.asarray(0, dtype=jnp.int32)
        do_reset = jnp.asarray(False)
        if cfg.gate_px > 0.0:
            kp = keypoints_px.astype(self.dtype)
            pts = self.points_body.astype(self.dtype)

            def med_innov(pose):
                innov = keypoint_projection_residual(
                    pose, self.intrinsics, kp, pts, self.camera_pose
                )
                return jnp.median(jnp.linalg.norm(innov, axis=-1))

            med = jnp.minimum(med_innov(pred_pose), med_innov(SE3(w.rot[-1], w.trans[-1])))
            warm = carry.frames_seen >= cfg.gate_min_frames
            force = carry.consec_rejects >= cfg.gate_max_consec
            disagree = warm & (med > cfg.gate_px)
            reject = disagree & jnp.logical_not(force)
            # Persistent disagreement (gate_max_consec consecutive rejects
            # and the new frame STILL disagrees): the track is lost — a
            # plain force-accept drops one good measurement into a diverged
            # 12-frame window and LM snaps back to the bad consensus
            # (measured on scale_run6 pose job 00000007: 720 mm off for all
            # 24 frames). Instead RESET: re-seed the whole window from the
            # current frame's closed-form POS pose, exactly the cold-start
            # path, and let the track re-establish.
            do_reset = disagree & force
            accept = jnp.where(reject, 0.0, 1.0).astype(self.dtype)
            consec = jnp.where(reject, carry.consec_rejects + 1, 0)
        valid = jnp.concatenate([carry.valid[1:], accept[None]])

        if cfg.gate_px > 0.0:
            seed = self.coarse_pose_from_keypoints(keypoints_px)
            t = cfg.window
            r = do_reset
            window = WindowState(
                rot=jnp.where(r, jnp.broadcast_to(seed.rot, (t, 3, 3)), window.rot),
                trans=jnp.where(r, jnp.broadcast_to(seed.trans, (t, 3)), window.trans),
                ang_vel=jnp.where(r, 0.0, window.ang_vel),
                vel=jnp.where(r, 0.0, window.vel),
            )
            newest_only = jnp.zeros((t,), self.dtype).at[-1].set(1.0)
            valid = jnp.where(r, newest_only, valid)
            prior_rot = jnp.where(r, seed.rot, prior_rot)
            prior_trans = jnp.where(r, seed.trans, prior_trans)
            prior_w = jnp.where(r, 0.0, prior_w)
            prior_v = jnp.where(r, 0.0, prior_v)

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
            # a reset re-warms the gate: predictions mean nothing until the
            # re-seeded window has gate_min_frames real measurements again
            frames_seen=jnp.where(do_reset, 1, carry.frames_seen + 1).astype(jnp.int32),
            consec_rejects=consec,
        )
        return new_carry, SE3(window.rot[-1], window.trans[-1])
