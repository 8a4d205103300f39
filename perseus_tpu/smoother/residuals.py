"""Smoother residuals with analytic Jacobians, in pure JAX.

The capability equivalent of the reference's three GTSAM CustomFactors
(reference: perseus/smoother/factors.py): rigid-body pose dynamics, constant
velocity, and keypoint pinhole projection. Unlike the reference — where
GTSAM's C++ optimizer calls back into Python per factor per iteration —
these are pure functions designed to be vmapped over a fixed-lag window and
jitted into one XLA program together with the LM solver (smoother/lm.py) and
the detector.

Conventions match GTSAM (and therefore the reference's factor math):
  * twists [omega; v], right-perturbation Jacobians,
  * the dynamics residual is Log((x1 . Exp(dt [w1; v1_body]))^-1 . x2) with
    the linear velocity expressed in the world or body frame
    (reference: factors.py:54-142),
  * the projection residual is project(K, camera_pose^-1 . (body_pose .
    p_body)) - measurement with the body pose as the variable
    (reference: factors.py:216-275).

Every analytic Jacobian is differentially tested against jax.jacfwd of the
same residual under tangent perturbations (tests/test_smoother.py),
mirroring the reference's pypose-oracle tests (tests/test_dynamics_factor.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from perseus_tpu.camera import Intrinsics, project_jacobians
from perseus_tpu.lie import (
    SE3,
    se3_adjoint,
    se3_between,
    se3_compose,
    se3_exp,
    se3_inverse,
    se3_log,
    se3_logmap_derivative,
    se3_right_jacobian,
    skew,
    transform_from_jacobians,
    transform_to_jacobians,
)

__all__ = [
    "dynamics_residual",
    "dynamics_residual_and_jacobians",
    "constant_velocity_residual",
    "constant_velocity_jacobians",
    "keypoint_projection_residual",
    "keypoint_projection_residual_and_jacobian",
]


def _body_velocity(pose1: SE3, vel1: jnp.ndarray, vel_frame: str) -> jnp.ndarray:
    if vel_frame == "world":
        return jnp.einsum("...ji,...j->...i", pose1.rot, vel1)
    return vel1


def dynamics_residual(
    pose1: SE3,
    ang_vel1: jnp.ndarray,
    vel1: jnp.ndarray,
    pose2: SE3,
    dt: float,
    vel_frame: str = "world",
) -> jnp.ndarray:
    """Log of the pose error between an exp-map Euler prediction and pose2."""
    v_body = _body_velocity(pose1, vel1, vel_frame)
    xi = dt * jnp.concatenate([ang_vel1, v_body], axis=-1)
    pred = se3_compose(pose1, se3_exp(xi))
    return se3_log(se3_between(pred, pose2))


def dynamics_residual_and_jacobians(
    pose1: SE3,
    ang_vel1: jnp.ndarray,
    vel1: jnp.ndarray,
    pose2: SE3,
    dt: float,
    vel_frame: str = "world",
):
    """Returns (residual (6,), H_pose1 (6,6), H_ang_vel1 (6,3),
    H_vel1 (6,3), H_pose2 (6,6)) — the same chain rule the reference
    assembles from GTSAM derivative outputs (factors.py:104-130)."""
    v_body = _body_velocity(pose1, vel1, vel_frame)
    xi = dt * jnp.concatenate([ang_vel1, v_body], axis=-1)
    increment = se3_exp(xi)
    pred = se3_compose(pose1, increment)
    rel = se3_between(pred, pose2)
    r = se3_log(rel)

    dlog = se3_logmap_derivative(rel)  # (6, 6)
    drel_dpred = -se3_adjoint(se3_inverse(rel))  # between H1
    dpred_dx1 = se3_adjoint(se3_inverse(increment))  # compose H1
    jr_xi = se3_right_jacobian(xi)  # d Exp(xi)/d xi (right pert)

    derr_dtwist = dt * (dlog @ drel_dpred @ jr_xi)  # (6, 6) wrt [w; v_body]

    h_pose1 = dlog @ drel_dpred @ dpred_dx1
    h_ang = derr_dtwist[..., :, :3]
    if vel_frame == "world":
        # v_body = R1^T v_world: d v_body / d omega = skew(v_body),
        # d v_body / d v_world = R1^T
        h_pose1 = h_pose1.at[..., :, :3].add(derr_dtwist[..., :, 3:] @ skew(v_body))
        h_vel = derr_dtwist[..., :, 3:] @ jnp.swapaxes(pose1.rot, -1, -2)
    else:
        h_vel = derr_dtwist[..., :, 3:]
    h_pose2 = dlog
    return r, h_pose1, h_ang, h_vel, h_pose2


def constant_velocity_residual(vel1: jnp.ndarray, vel2: jnp.ndarray) -> jnp.ndarray:
    """vel2 - vel1 (reference: factors.py:160-171)."""
    return vel2 - vel1


def constant_velocity_jacobians(dim: int = 3, dtype=jnp.float32):
    eye = jnp.eye(dim, dtype=dtype)
    return -eye, eye


def keypoint_projection_residual(
    body_pose: SE3,
    intrinsics: Intrinsics,
    keypoint_measurement: jnp.ndarray,
    point_body_frame: jnp.ndarray,
    camera_pose: SE3 | None = None,
) -> jnp.ndarray:
    """Projection of a body-frame point minus the measured pixel (2,)."""
    p_world = jnp.einsum("...ij,...j->...i", body_pose.rot, point_body_frame) + body_pose.trans
    if camera_pose is not None:
        p_cam = jnp.einsum("...ji,...j->...i", camera_pose.rot, p_world - camera_pose.trans)
    else:
        p_cam = p_world
    z = p_cam[..., 2]
    u = intrinsics.fx * p_cam[..., 0] / z + intrinsics.cx
    v = intrinsics.fy * p_cam[..., 1] / z + intrinsics.cy
    return jnp.stack([u, v], axis=-1) - keypoint_measurement


def keypoint_projection_residual_and_jacobian(
    body_pose: SE3,
    intrinsics: Intrinsics,
    keypoint_measurement: jnp.ndarray,
    point_body_frame: jnp.ndarray,
    camera_pose: SE3 | None = None,
):
    """Returns (residual (2,), H_body_pose (2, 6)): chain of the pinhole
    projection Jacobian through the camera transform and transformFrom
    (reference: factors.py:249-265)."""
    p_world, dpw_dpose, _ = transform_from_jacobians(body_pose, point_body_frame)
    if camera_pose is not None:
        p_cam, _, dpc_dpw = transform_to_jacobians(camera_pose, p_world)
    else:
        p_cam, dpc_dpw = p_world, None
    pixel, dproj_dpc = project_jacobians(intrinsics, p_cam)
    if dpc_dpw is not None:
        h = dproj_dpc @ dpc_dpw @ dpw_dpose
    else:
        h = dproj_dpc @ dpw_dpose
    return pixel - keypoint_measurement, h
