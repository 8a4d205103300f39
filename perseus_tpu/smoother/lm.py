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

Jacobians — two solvers (SmootherConfig.solver; "jacfwd" is the default):
"jacfwd" evaluates a batched-JVP Jacobian of the whole residual stack (288
tangent columns as one wide batch — fastest on TPU, and what production
configs run). The opt-in "block" solver assembles the normal equations
directly from the analytic per-factor Jacobians in residuals.py — the
Jacobian is block-tridiagonal in frames (dynamics/const-vel couple only
neighbors; priors/keypoints/pins are per-frame), so J^T J and J^T r build
from (T, 12, 12) einsums instead of 12*T forward-mode passes through the
whole residual graph. A "jacfwd" solver (dense jax.jacfwd of the
retraction-perturbed residual stack) is kept as the differential-test oracle
and for new residual prototyping.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from perseus_tpu.camera import Intrinsics
from perseus_tpu.lie import SE3, se3_exp, se3_compose, se3_log, se3_between, se3_logmap_derivative
from perseus_tpu.smoother import residuals as res

__all__ = [
    "SmootherConfig",
    "WindowState",
    "window_residuals",
    "assemble_normal_blocks",
    "assemble_normal_equations",
    "solve_block_tridiag",
    "lm_solve",
    "predict_next",
]


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

    # Robust kernel on the keypoint residuals, the role of a gtsam robust
    # noise model wrapping the projection factors (reference:
    # perseus/smoother/factors.py:182-213 uses a plain Diagonal — detector
    # outliers there corrupt the window). Threshold is in whitened units
    # (pixels / sigma_keypoint_px); 0 disables (pure LS).
    #   "huber": IRLS weight min(1, delta/|r|) — convex, safe for cold starts.
    #   "gm" (Geman-McClure): weight 1/(1+(r/delta)^2)^2 — redescending,
    #   effectively rejects gross detector outliers; use with a warm-started
    #   tracking window.
    robust_keypoint_delta: float = 3.0
    robust_kernel: str = "huber"

    # Innovation gate on whole-frame detector failures. Identity switches —
    # the detector locking onto a cube-like distractor — shift ALL corners
    # coherently (~60-100 px measured on the round-5 pose trajectory, frames
    # 4-5/14-16), which per-corner robust kernels cannot reject: the median
    # residual IS the outlier. A frame whose MEDIAN innovation (predicted
    # projection vs measurement, in pixels) exceeds gate_px against BOTH the
    # dynamics prediction AND the last smoothed pose is dropped from the
    # graph (its valid weight is zeroed) and the window coasts on the
    # dynamics factors; agreeing with the last fit alone means the velocity
    # state is bad, not the detection, so the frame is accepted. After
    # gate_max_consec consecutive rejections a still-disagreeing frame
    # triggers a TRACKER RESET — the window re-seeds from that frame's
    # closed-form POS pose (the cold-start path) — so both a genuine track
    # change and a lost track re-acquire instead of force-accepting one
    # measurement into a diverged window. gate_min_frames suppresses the
    # gate until the (re-)seeded window has enough real measurements for
    # the prediction to mean anything. gate_px=0 disables.
    gate_px: float = 30.0
    gate_max_consec: int = 3
    gate_min_frames: int = 4

    max_iterations: int = 8
    lambda_init: float = 1e-4
    lambda_up: float = 10.0
    lambda_down: float = 0.5
    lambda_min: float = 1e-9
    lambda_max: float = 1e6
    # "jacfwd": batched-JVP Jacobian of the whole residual stack — fastest on
    # TPU (288 tangent columns evaluate as one wide batch). "block": analytic
    # per-factor assembly — fewer FLOPs, more small kernels; differential
    # oracle and the better choice on hosts where tiny-op latency is cheap.
    solver: str = "jacfwd"
    # False = incremental Gauss-Newton (constant damping, no trial-cost
    # eval/reject) — the warm-started tracking mode, ~2x cheaper per
    # iteration; True = full LM accept/reject for cold starts.
    accept_reject: bool = True


def _robust_keypoint_weights(cfg: SmootherConfig, r_kp_whitened: jnp.ndarray) -> jnp.ndarray:
    """IRLS sqrt-weights (..., K, 1) for whitened keypoint residual 2-vectors.

    Huber: weight w = min(1, delta/|r|) on the squared cost; residuals and
    Jacobians scale by sqrt(w). The weight is evaluated at the current
    linearization point and held constant through differentiation
    (stop_gradient), the standard IRLS treatment — this keeps the "jacfwd"
    and "block" solvers in exact agreement.
    """
    if cfg.robust_keypoint_delta <= 0.0:
        return jnp.ones(r_kp_whitened.shape[:-1] + (1,), dtype=r_kp_whitened.dtype)
    norm = jnp.sqrt(jnp.sum(r_kp_whitened**2, axis=-1, keepdims=True) + 1e-12)
    if cfg.robust_kernel == "gm":
        w = 1.0 / (1.0 + (norm / cfg.robust_keypoint_delta) ** 2) ** 2
    elif cfg.robust_kernel == "huber":
        w = jnp.minimum(1.0, cfg.robust_keypoint_delta / norm)
    else:
        raise ValueError(f"unknown robust_kernel {cfg.robust_kernel!r}")
    return jax.lax.stop_gradient(jnp.sqrt(w))


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
    r_kp = r_kp * _robust_keypoint_weights(cfg, r_kp)

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


def assemble_normal_blocks(
    cfg: SmootherConfig,
    state: WindowState,
    measurements: jnp.ndarray,
    valid: jnp.ndarray,
    intrinsics: Intrinsics,
    points_body: jnp.ndarray,
    prior_pose: SE3,
    prior_ang_vel: jnp.ndarray,
    prior_vel: jnp.ndarray,
    camera_pose: SE3 | None,
    anchor: WindowState,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Builds the block-tridiagonal normal equations
    (d_blocks (T,12,12), u_blocks (T-1,12,12), b_blocks (T,12), cost)
    from analytic per-factor Jacobians.

    The whitened residual stack matches :func:`window_residuals` exactly
    (differentially tested); the Jacobian structure is block-tridiagonal in
    frames, so the dense (12T, 12T) system assembles from batched 12x12
    blocks. Right-perturbation tangent ordering per frame:
    [pose (6) | ang vel (3) | lin vel (3)].
    """
    t = state.rot.shape[0]
    dtype = state.trans.dtype
    eye3 = jnp.eye(3, dtype=dtype)

    d_blocks = jnp.zeros((t, 12, 12), dtype=dtype)  # diagonal blocks of JTJ
    b_blocks = jnp.zeros((t, 12), dtype=dtype)  # JTr
    cost = jnp.zeros((), dtype=dtype)

    # ---- prior on frame 0 ----------------------------------------------
    rel0 = se3_between(prior_pose, SE3(state.rot[0], state.trans[0]))
    r0p = se3_log(rel0) / cfg.sigma_prior_pose
    j0p = se3_logmap_derivative(rel0) / cfg.sigma_prior_pose  # (6, 6)
    r0w = (state.ang_vel[0] - prior_ang_vel) / cfg.sigma_prior_vel
    r0v = (state.vel[0] - prior_vel) / cfg.sigma_prior_vel
    d0 = jnp.zeros((12, 12), dtype=dtype)
    d0 = d0.at[:6, :6].set(j0p.T @ j0p)
    d0 = d0.at[6:9, 6:9].set(eye3 / cfg.sigma_prior_vel**2)
    d0 = d0.at[9:12, 9:12].set(eye3 / cfg.sigma_prior_vel**2)
    b0 = jnp.concatenate([j0p.T @ r0p, r0w / cfg.sigma_prior_vel, r0v / cfg.sigma_prior_vel])
    d_blocks = d_blocks.at[0].add(d0)
    b_blocks = b_blocks.at[0].add(b0)
    cost += jnp.dot(r0p, r0p) + jnp.dot(r0w, r0w) + jnp.dot(r0v, r0v)

    # ---- dynamics + constant-velocity pairs (i, i+1) -------------------
    sigma_dyn = jnp.concatenate(
        [jnp.full((3,), cfg.sigma_dynamics_rot), jnp.full((3,), cfg.sigma_dynamics_trans)]
    ).astype(dtype)
    pair_valid = valid[:-1] * valid[1:]  # (T-1,)

    r_dyn, h_p1, h_w, h_v, h_p2 = jax.vmap(
        lambda ra, ta, w, v, rb, tb: res.dynamics_residual_and_jacobians(
            SE3(ra, ta), w, v, SE3(rb, tb), cfg.dt, cfg.vel_frame
        )
    )(
        state.rot[:-1], state.trans[:-1], state.ang_vel[:-1], state.vel[:-1],
        state.rot[1:], state.trans[1:],
    )
    pv = pair_valid[:, None]
    pv2 = pair_valid[:, None, None]
    # whitened pair residual: [dynamics (6) | const-w (3) | const-v (3)]
    r_pair = jnp.concatenate(
        [
            r_dyn / sigma_dyn,
            (state.ang_vel[1:] - state.ang_vel[:-1]) / cfg.sigma_const_ang_vel,
            (state.vel[1:] - state.vel[:-1]) / cfg.sigma_const_vel,
        ],
        axis=-1,
    ) * pv  # (T-1, 12)
    # A: d r_pair / d frame_i ; B: d r_pair / d frame_{i+1}   (T-1, 12, 12)
    a = jnp.zeros((t - 1, 12, 12), dtype=dtype)
    a = a.at[:, :6, :6].set(h_p1 / sigma_dyn[:, None])
    a = a.at[:, :6, 6:9].set(h_w / sigma_dyn[:, None])
    a = a.at[:, :6, 9:12].set(h_v / sigma_dyn[:, None])
    a = a.at[:, 6:9, 6:9].set(-eye3 / cfg.sigma_const_ang_vel)
    a = a.at[:, 9:12, 9:12].set(-eye3 / cfg.sigma_const_vel)
    a = a * pv2
    b = jnp.zeros((t - 1, 12, 12), dtype=dtype)
    b = b.at[:, :6, :6].set(h_p2 / sigma_dyn[:, None])
    b = b.at[:, 6:9, 6:9].set(eye3 / cfg.sigma_const_ang_vel)
    b = b.at[:, 9:12, 9:12].set(eye3 / cfg.sigma_const_vel)
    b = b * pv2

    d_blocks = d_blocks.at[:-1].add(jnp.einsum("tai,taj->tij", a, a))
    d_blocks = d_blocks.at[1:].add(jnp.einsum("tai,taj->tij", b, b))
    u_blocks = jnp.einsum("tai,taj->tij", a, b)  # (T-1, 12, 12) coupling i,i+1
    b_blocks = b_blocks.at[:-1].add(jnp.einsum("tai,ta->ti", a, r_pair))
    b_blocks = b_blocks.at[1:].add(jnp.einsum("tai,ta->ti", b, r_pair))
    cost += jnp.sum(r_pair * r_pair)

    # ---- keypoint projections (per frame, pose block only) -------------
    def frame_proj(rot, trans, meas):
        return jax.vmap(
            lambda p, m: res.keypoint_projection_residual_and_jacobian(
                SE3(rot, trans), intrinsics, m, p, camera_pose
            )
        )(points_body, meas)

    r_kp, h_kp = jax.vmap(frame_proj)(state.rot, state.trans, measurements)
    vmask = valid[:, None, None]
    r_kp = (r_kp / cfg.sigma_keypoint_px) * vmask  # (T, K, 2)
    h_kp = (h_kp / cfg.sigma_keypoint_px) * valid[:, None, None, None]  # (T, K, 2, 6)
    rw = _robust_keypoint_weights(cfg, r_kp)  # (T, K, 1)
    r_kp = r_kp * rw
    h_kp = h_kp * rw[..., None]
    jk = h_kp.reshape(t, -1, 6)
    rk = r_kp.reshape(t, -1)
    d_blocks = d_blocks.at[:, :6, :6].add(jnp.einsum("tai,taj->tij", jk, jk))
    b_blocks = b_blocks.at[:, :6].add(jnp.einsum("tai,ta->ti", jk, rk))
    cost += jnp.sum(rk * rk)

    # ---- pin unobserved (warmup) frames to the anchor ------------------
    w_pin = (1.0 - valid) / 1e-3  # (T,)
    rel_pin = se3_between(SE3(anchor.rot, anchor.trans), SE3(state.rot, state.trans))
    r_pin_pose = se3_log(rel_pin) * w_pin[:, None]
    j_pin = jax.vmap(se3_logmap_derivative)(rel_pin) * w_pin[:, None, None]
    r_pin_w = (state.ang_vel - anchor.ang_vel) * w_pin[:, None]
    r_pin_v = (state.vel - anchor.vel) * w_pin[:, None]
    d_blocks = d_blocks.at[:, :6, :6].add(jnp.einsum("tai,taj->tij", j_pin, j_pin))
    pin_eye = w_pin[:, None, None] ** 2 * eye3
    d_blocks = d_blocks.at[:, 6:9, 6:9].add(pin_eye)
    d_blocks = d_blocks.at[:, 9:12, 9:12].add(pin_eye)
    b_blocks = b_blocks.at[:, :6].add(jnp.einsum("tai,ta->ti", j_pin, r_pin_pose))
    b_blocks = b_blocks.at[:, 6:9].add(w_pin[:, None] * r_pin_w)
    b_blocks = b_blocks.at[:, 9:12].add(w_pin[:, None] * r_pin_v)
    cost += jnp.sum(r_pin_pose**2) + jnp.sum(r_pin_w**2) + jnp.sum(r_pin_v**2)

    return d_blocks, u_blocks, b_blocks, 0.5 * cost


def assemble_normal_equations(
    cfg: SmootherConfig,
    state: WindowState,
    measurements: jnp.ndarray,
    valid: jnp.ndarray,
    intrinsics: Intrinsics,
    points_body: jnp.ndarray,
    prior_pose: SE3,
    prior_ang_vel: jnp.ndarray,
    prior_vel: jnp.ndarray,
    camera_pose: SE3 | None,
    anchor: WindowState,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dense (J^T J, J^T r, cost) — densifying wrapper over
    :func:`assemble_normal_blocks` (differential-test surface)."""
    t = state.rot.shape[0]
    d_blocks, u_blocks, b_blocks, half_cost = assemble_normal_blocks(
        cfg, state, measurements, valid, intrinsics, points_body,
        prior_pose, prior_ang_vel, prior_vel, camera_pose, anchor,
    )
    h4 = jnp.zeros((t, 12, t, 12), dtype=d_blocks.dtype)
    idx = jnp.arange(t)
    h4 = h4.at[idx, :, idx, :].set(d_blocks)
    h4 = h4.at[idx[:-1], :, idx[1:], :].set(u_blocks)
    h4 = h4.at[idx[1:], :, idx[:-1], :].set(jnp.swapaxes(u_blocks, -1, -2))
    return h4.reshape(t * 12, t * 12), b_blocks.reshape(t * 12), half_cost


def solve_block_tridiag(
    d_blocks: jnp.ndarray,  # (T, B, B) diagonal blocks (SPD system)
    u_blocks: jnp.ndarray,  # (T-1, B, B) super-diagonal blocks (i, i+1)
    rhs: jnp.ndarray,  # (T, B)
) -> jnp.ndarray:
    """Solves the SPD block-tridiagonal system H x = rhs by block-Thomas
    Cholesky (sequential in T, O(T B^3)): the structure-exploiting
    alternative to factoring the dense (T*B, T*B) matrix, whose serial
    panel recursion dominates the smoother update latency on TPU.

      S_0 = D_0,  S_i = D_i - W_{i-1}^T W_{i-1},  W_i = L_i^{-1} U_i,
      L_i = chol(S_i);  forward: y_i = L_i^{-1}(b_i - W_{i-1}^T y_{i-1});
      backward: x_i = L_i^{-T}(y_i - W_i x_{i+1}).
    """
    from jax.scipy.linalg import solve_triangular

    t, bdim, _ = d_blocks.shape
    zeros_u = jnp.zeros((1, bdim, bdim), dtype=d_blocks.dtype)
    u_ext = jnp.concatenate([u_blocks, zeros_u], axis=0)  # U_i for i in [0, T)

    def fwd(carry, inp):
        w_prev, y_prev = carry  # W_{i-1}, y_{i-1}
        d_i, u_i, b_i = inp
        s_i = d_i - w_prev.T @ w_prev
        l_i = jnp.linalg.cholesky(s_i)
        y_i = solve_triangular(l_i, b_i - w_prev.T @ y_prev, lower=True)
        w_i = solve_triangular(l_i, u_i, lower=True)
        return (w_i, y_i), (l_i, w_i, y_i)

    init = (jnp.zeros((bdim, bdim), d_blocks.dtype), jnp.zeros((bdim,), d_blocks.dtype))
    _, (l_all, w_all, y_all) = jax.lax.scan(fwd, init, (d_blocks, u_ext, rhs))

    def bwd(x_next, inp):
        l_i, w_i, y_i = inp
        x_i = solve_triangular(l_i.T, y_i - w_i @ x_next, lower=False)
        return x_i, x_i

    _, x_rev = jax.lax.scan(
        bwd, jnp.zeros((bdim,), d_blocks.dtype), (l_all, w_all, y_all), reverse=True
    )
    return x_rev


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

    def normal_equations(st: WindowState):
        if cfg.solver == "block":
            return assemble_normal_equations(
                cfg, st, measurements, valid, intrinsics, points_body,
                prior_pose, prior_ang_vel, prior_vel, camera_pose, anchor,
            )
        zero = jnp.zeros(tangent_dim, dtype=st.trans.dtype)
        # one linearize pass gives the primal; the 12T tangent columns then
        # evaluate as a single wide vmapped-JVP batch (TPU-friendly shapes)
        r, jvp = jax.linearize(lambda d: residual_of(d, st), zero)
        jac_t = jax.vmap(jvp)(jnp.eye(tangent_dim, dtype=zero.dtype))  # (12T, R)
        return jac_t @ jac_t.T, jac_t @ r, 0.5 * jnp.dot(r, r)

    def step(carry):
        st, lam, it, _ = carry
        if cfg.solver == "block":
            # block-tridiagonal path: assemble 12x12 blocks and solve with
            # block-Thomas Cholesky — never materializes the dense system
            d_b, u_b, b_b, old_cost = assemble_normal_blocks(
                cfg, st, measurements, valid, intrinsics, points_body,
                prior_pose, prior_ang_vel, prior_vel, camera_pose, anchor,
            )
            bdiag = jnp.diagonal(d_b, axis1=-2, axis2=-1)  # (T, 12)
            damp = jax.vmap(jnp.diag)(lam * jnp.maximum(bdiag, 1e-6))
            delta = solve_block_tridiag(d_b + damp, u_b, -b_b)  # (T, 12)
        else:
            jtj, jtr, old_cost = normal_equations(st)
            # damped normal equations; Marquardt scaling on the diagonal
            diag = jnp.diagonal(jtj)
            a = jtj + lam * jnp.diag(jnp.maximum(diag, 1e-6))
            chol, low = jax.scipy.linalg.cho_factor(a)
            delta = jax.scipy.linalg.cho_solve((chol, low), -jtr)

        new_st = retract_window(st, delta.reshape(t, 12))
        if not cfg.accept_reject:
            # incremental GN: constant damping, always step
            return new_st, lam, it + 1, old_cost
        new_cost = cost(new_st)
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

    if not cfg.accept_reject:
        # incremental GN runs a FIXED iteration count with no data-dependent
        # control flow: unroll instead of lax.while_loop, letting XLA
        # software-pipeline and fuse across iterations (a while_loop body
        # compiles as an opaque region with full entry/exit barriers)
        # no upfront cost(state) either: each GN step's normal equations
        # already yield the cost at its linearization point as a byproduct
        carry = (
            state,
            jnp.asarray(cfg.lambda_init, dtype=state.trans.dtype),
            0,
            jnp.zeros((), dtype=state.trans.dtype),
        )
        for _ in range(cfg.max_iterations):
            carry = step(carry)
        final_state, _, _, final_cost = carry
        return final_state, final_cost

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
