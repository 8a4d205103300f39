"""Batched fixed-lag Levenberg-Marquardt smoother on SE(3), pure JAX.

Replaces the reference's GTSAM optimizer + CustomFactor callbacks (SURVEY.md
section 3.4): instead of a C++ optimizer calling Python per factor per
iteration, the whole window's residuals evaluate as vmapped JAX functions,
the normal equations assemble densely (the tangent state of a 24-frame
window is only 288-dim), and a damped Cholesky solve iterates inside
`lax.while_loop` — all static shapes, one XLA program, fusible with the
detector forward pass.

State per frame: pose (SE3), body-frame angular velocity (3,), linear
velocity (3, world or body frame) — the reference's X/W/V variables
(factors.py:11-52). Tangent ordering per frame: [pose (6) | ang vel (3) |
lin vel (3)].

Factors over a window of T frames:
  * prior on frame 0 (pose + velocities) — the fixed-lag marginalization
    surrogate,
  * dynamics residual between consecutive frames (6 each),
  * constant-velocity residuals for angular and linear velocity (3+3 each),
  * keypoint projection residuals: K corners x 2 per frame, masked by
    per-frame measurement validity.

Jacobians come from jax.jacfwd of the retraction-perturbed residual stack —
the analytic per-factor Jacobians in residuals.py are differentially tested
against the same math and remain available for a hand-assembled sparse
variant if profiling demands it.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from perseus_tpu.camera import Intrinsics
from perseus_tpu.lie import SE3, se3_exp, se3_compose, se3_log, se3_between
from perseus_tpu.smoother import residuals as res

__all__ = ["SmootherConfig", "WindowState", "window_residuals", "lm_solve", "predict_next"]


@dataclass(frozen=True)
class SmootherConfig:
    """Noise model + solver settings.

    Sigmas play the role of the reference's gtsam.noiseModel.Diagonal.Sigmas;
    residuals are whitened by 1/sigma.
    """

    window: int = 24
    dt: float = 1.0 / 100.0  # camera at 100 fps (reference: streaming.py:36)
    vel_frame: str = "world"
    n_keypoints: int = 8

    sigma_dynamics_rot: float = 0.01
    sigma_dynamics_trans: float = 0.005
    sigma_const_ang_vel: float = 0.1
    sigma_const_vel: float = 0.1
    sigma_keypoint_px: float = 2.0
    sigma_prior_pose: float = 0.1
    sigma_prior_vel: float = 1.0

    max_iterations: int = 8
    lambda_init: float = 1e-4
    lambda_up: float = 10.0
    lambda_down: float = 0.5
    lambda_min: float = 1e-9
    lambda_max: float = 1e6


class WindowState(NamedTuple):
    """Estimation window: leading axis is time (T frames)."""

    rot: jnp.ndarray  # (T, 3, 3)
    trans: jnp.ndarray  # (T, 3)
    ang_vel: jnp.ndarray  # (T, 3)
    vel: jnp.ndarray  # (T, 3)

    @property
    def poses(self) -> SE3:
        return SE3(self.rot, self.trans)


def retract_window(state: WindowState, delta: jnp.ndarray) -> WindowState:
    """Applies a (T, 12) tangent update: pose . Exp(d_pose), vel + d_vel."""
    d_pose = delta[..., :6]
    d_w = delta[..., 6:9]
    d_v = delta[..., 9:12]
    new_pose = se3_compose(SE3(state.rot, state.trans), se3_exp(d_pose))
    return WindowState(new_pose.rot, new_pose.trans, state.ang_vel + d_w, state.vel + d_v)


def window_residuals(
    cfg: SmootherConfig,
    state: WindowState,
    measurements: jnp.ndarray,  # (T, K, 2) pixel measurements
    valid: jnp.ndarray,  # (T,) 0/1 frame validity
    intrinsics: Intrinsics,
    points_body: jnp.ndarray,  # (K, 3) cube corners in the body frame
    prior_pose: SE3,
    prior_ang_vel: jnp.ndarray,
    prior_vel: jnp.ndarray,
    camera_pose: SE3 | None = None,
    anchor: WindowState | None = None,
) -> jnp.ndarray:
    """Whitened residual stack (flat vector), static shape.

    `anchor` (the pre-solve window estimate) pins frames with no
    measurements (warmup) to their initialization so the normal equations
    stay full-rank under the validity mask.
    """
    t = state.rot.shape[0]

    # prior on frame 0 (marginalization surrogate)
    r_prior_pose = se3_log(se3_between(prior_pose, SE3(state.rot[0], state.trans[0])))
    r_prior = jnp.concatenate(
        [
            r_prior_pose / cfg.sigma_prior_pose,
            (state.ang_vel[0] - prior_ang_vel) / cfg.sigma_prior_vel,
            (state.vel[0] - prior_vel) / cfg.sigma_prior_vel,
        ]
    )

    # dynamics between consecutive frames (vmapped over T-1 pairs)
    pose_a = SE3(state.rot[:-1], state.trans[:-1])
    pose_b = SE3(state.rot[1:], state.trans[1:])
    r_dyn = jax.vmap(
        lambda ra, ta, w, v, rb, tb: res.dynamics_residual(
            SE3(ra, ta), w, v, SE3(rb, tb), cfg.dt, cfg.vel_frame
        )
    )(pose_a.rot, pose_a.trans, state.ang_vel[:-1], state.vel[:-1], pose_b.rot, pose_b.trans)
    sigma_dyn = jnp.concatenate(
        [
            jnp.full((3,), cfg.sigma_dynamics_rot),
            jnp.full((3,), cfg.sigma_dynamics_trans),
        ]
    ).astype(r_dyn.dtype)
    # inactive successor frames contribute nothing
    pair_valid = (valid[:-1] * valid[1:])[:, None]
    r_dyn = (r_dyn / sigma_dyn) * pair_valid

    # constant-velocity residuals
    r_cw = (state.ang_vel[1:] - state.ang_vel[:-1]) / cfg.sigma_const_ang_vel * pair_valid
    r_cv = (state.vel[1:] - state.vel[:-1]) / cfg.sigma_const_vel * pair_valid

    # keypoint projections, vmapped over frames and corners
    def frame_proj(rot, trans, meas):
        return jax.vmap(
            lambda p, m: res.keypoint_projection_residual(
                SE3(rot, trans), intrinsics, m, p, camera_pose
            )
        )(points_body, meas)

    r_kp = jax.vmap(frame_proj)(state.rot, state.trans, measurements)  # (T, K, 2)
    r_kp = (r_kp / cfg.sigma_keypoint_px) * valid[:, None, None]

    parts = [r_prior, r_dyn.reshape(-1), r_cw.reshape(-1), r_cv.reshape(-1), r_kp.reshape(-1)]

    if anchor is not None:
        # pin unobserved (warmup) frames to their initialization
        invalid = (1.0 - valid)[:, None]
        r_pin_pose = se3_log(se3_between(SE3(anchor.rot, anchor.trans), SE3(state.rot, state.trans)))
        r_pin = jnp.concatenate(
            [
                r_pin_pose,
                state.ang_vel - anchor.ang_vel,
                state.vel - anchor.vel,
            ],
            axis=-1,
        ) * invalid / 1e-3
        parts.append(r_pin.reshape(-1))

    return jnp.concatenate(parts)


def lm_solve(
    cfg: SmootherConfig,
    state: WindowState,
    measurements: jnp.ndarray,
    valid: jnp.ndarray,
    intrinsics: Intrinsics,
    points_body: jnp.ndarray,
    prior_pose: SE3,
    prior_ang_vel: jnp.ndarray,
    prior_vel: jnp.ndarray,
    camera_pose: SE3 | None = None,
) -> tuple[WindowState, jnp.ndarray]:
    """Runs damped Gauss-Newton (LM) to convergence-or-max-iters.

    Returns (optimized window, final cost). Fully jittable: fixed iteration
    bound with accept/reject via `where`.
    """
    t = state.rot.shape[0]
    tangent_dim = 12 * t

    anchor = state  # pre-solve estimate pins unobserved frames

    def residual_of(delta_flat: jnp.ndarray, st: WindowState) -> jnp.ndarray:
        perturbed = retract_window(st, delta_flat.reshape(t, 12))
        return window_residuals(
            cfg, perturbed, measurements, valid, intrinsics, points_body,
            prior_pose, prior_ang_vel, prior_vel, camera_pose, anchor,
        )

    def cost(st: WindowState) -> jnp.ndarray:
        r = residual_of(jnp.zeros(tangent_dim, dtype=st.trans.dtype), st)
        return 0.5 * jnp.dot(r, r)

    def step(carry):
        st, lam, it, _ = carry
        zero = jnp.zeros(tangent_dim, dtype=st.trans.dtype)
        r = residual_of(zero, st)
        jac = jax.jacfwd(residual_of)(zero, st)  # (R, 12T)
        jtj = jac.T @ jac
        jtr = jac.T @ r
        # damped normal equations; Marquardt scaling on the diagonal
        diag = jnp.diagonal(jtj)
        a = jtj + lam * jnp.diag(jnp.maximum(diag, 1e-6))
        chol, low = jax.scipy.linalg.cho_factor(a)
        delta = jax.scipy.linalg.cho_solve((chol, low), -jtr)

        new_st = retract_window(st, delta.reshape(t, 12))
        old_cost = 0.5 * jnp.dot(r, r)
        new_r = residual_of(zero, new_st)
        new_cost = 0.5 * jnp.dot(new_r, new_r)
        accept = new_cost < old_cost

        st_out = jax.tree.map(lambda a_, b_: jnp.where(accept, a_, b_), new_st, st)
        lam_out = jnp.clip(
            jnp.where(accept, lam * cfg.lambda_down, lam * cfg.lambda_up),
            cfg.lambda_min,
            cfg.lambda_max,
        )
        return st_out, lam_out, it + 1, jnp.where(accept, new_cost, old_cost)

    def cond(carry):
        _, _, it, _ = carry
        return it < cfg.max_iterations

    init = (state, jnp.asarray(cfg.lambda_init, dtype=state.trans.dtype), 0, cost(state))
    final_state, _, _, final_cost = jax.lax.while_loop(cond, step, init)
    return final_state, final_cost


def predict_next(state: WindowState, dt: float, vel_frame: str = "world") -> tuple[SE3, jnp.ndarray, jnp.ndarray]:
    """Euler exp-map propagation of the newest frame (for window extension)."""
    last = SE3(state.rot[-1], state.trans[-1])
    w = state.ang_vel[-1]
    v = state.vel[-1]
    v_body = jnp.einsum("ji,j->i", last.rot, v) if vel_frame == "world" else v
    xi = dt * jnp.concatenate([w, v_body])
    return se3_compose(last, se3_exp(xi)), w, v
