"""SO(3)/SE(3) Lie group operations with analytic Jacobians, in pure JAX.

This module replaces the role GTSAM's C++ Pose3/Rot3 play in the reference
stack (reference: perseus/smoother/factors.py uses gtsam.Pose3
Expmap/Logmap/compose/between plus their derivative outputs). Everything here
is functional, dtype-polymorphic, broadcasts over arbitrary leading batch
dimensions, and is safe under jit/vmap/grad (no data-dependent Python control
flow; small-angle cases are handled with Taylor branches via the
double-`where` trick so gradients stay finite).

Conventions (chosen to match GTSAM, which the reference's factor math and
tests are written against):
  * twists are ordered ``xi = [omega; v]`` (rotation first, translation
    second) — the same ordering as GTSAM Pose3 and the opposite of pypose,
    which is why the reference test flips (reference:
    tests/test_dynamics_factor.py:53-54).
  * all Jacobians are with respect to *right* perturbations:
    ``f(X . Exp(delta))`` differentiated at ``delta = 0``.
  * ``se3_exp`` is the true SE(3) exponential: ``t = Jl_so3(omega) @ v``.

Poses are represented as an ``SE3`` NamedTuple of a rotation matrix
``rot (..., 3, 3)`` and a translation ``trans (..., 3)``; a pytree, so it
passes through jit/vmap/scan transparently. Helpers convert to/from the
7-vector ``[x y z | quat]`` layouts used by the dataset tooling.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

__all__ = [
    "SE3",
    "skew",
    "unskew",
    "so3_exp",
    "so3_log",
    "so3_left_jacobian",
    "so3_right_jacobian",
    "so3_left_jacobian_inverse",
    "so3_right_jacobian_inverse",
    "rot_to_quat_wxyz",
    "quat_wxyz_to_rot",
    "quat_xyzw_to_rot",
    "rot_to_quat_xyzw",
    "euler_xyz_to_rot",
    "se3_identity",
    "se3_exp",
    "se3_log",
    "se3_compose",
    "se3_inverse",
    "se3_between",
    "se3_adjoint",
    "se3_left_jacobian",
    "se3_right_jacobian",
    "se3_right_jacobian_inverse",
    "se3_logmap_derivative",
    "se3_retract",
    "transform_from",
    "transform_from_jacobians",
    "transform_to",
    "transform_to_jacobians",
    "pose7_wxyz_to_se3",
    "se3_to_pose7_wxyz",
    "pose7_xyzw_to_se3",
]

_EPS2 = 1e-8  # threshold on theta^2 below which Taylor branches are used


class SE3(NamedTuple):
    """A rigid transform: ``x_world = rot @ x_body + trans``."""

    rot: jnp.ndarray  # (..., 3, 3)
    trans: jnp.ndarray  # (..., 3)


# --------------------------------------------------------------------------
# so(3) hat / vee
# --------------------------------------------------------------------------


def skew(w: jnp.ndarray) -> jnp.ndarray:
    """Hat operator: (..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    rows = jnp.stack(
        [
            jnp.stack([zero, -wz, wy], axis=-1),
            jnp.stack([wz, zero, -wx], axis=-1),
            jnp.stack([-wy, wx, zero], axis=-1),
        ],
        axis=-2,
    )
    return rows


def unskew(m: jnp.ndarray) -> jnp.ndarray:
    """Vee operator: extracts (..., 3) from a skew-symmetric (..., 3, 3)."""
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


# --------------------------------------------------------------------------
# Small-angle-safe trig coefficient helpers.
#
# Each returns the exact expression for large theta and a Taylor expansion
# for small theta; the operand of the exact branch is computed with a "safe"
# theta so its gradient is finite even where the branch is unselected.
# --------------------------------------------------------------------------


def _coeffs(theta2: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (A, B, C) = (sin t/t, (1-cos t)/t^2, (t - sin t)/t^3)."""
    small = theta2 < _EPS2
    safe_t2 = jnp.where(small, jnp.ones_like(theta2), theta2)
    t = jnp.sqrt(safe_t2)
    a = jnp.where(small, 1.0 - theta2 / 6.0 + theta2 * theta2 / 120.0, jnp.sin(t) / t)
    b = jnp.where(small, 0.5 - theta2 / 24.0 + theta2 * theta2 / 720.0, (1.0 - jnp.cos(t)) / safe_t2)
    c = jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0 + theta2 * theta2 / 5040.0,
        (t - jnp.sin(t)) / (safe_t2 * t),
    )
    return a, b, c


def so3_exp(omega: jnp.ndarray) -> jnp.ndarray:
    """Exponential map so(3) -> SO(3) via Rodrigues' formula. (..., 3) -> (..., 3, 3)."""
    theta2 = jnp.sum(omega * omega, axis=-1)
    a, b, _ = _coeffs(theta2)
    w = skew(omega)
    w2 = w @ w
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), w.shape)
    return eye + a[..., None, None] * w + b[..., None, None] * w2


def rot_to_quat_wxyz(r: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion [w, x, y, z], branchless (Shepperd).

    Robust for all rotations including angles near pi. Returns w >= 0.
    """
    m00, m01, m02 = r[..., 0, 0], r[..., 0, 1], r[..., 0, 2]
    m10, m11, m12 = r[..., 1, 0], r[..., 1, 1], r[..., 1, 2]
    m20, m21, m22 = r[..., 2, 0], r[..., 2, 1], r[..., 2, 2]

    t0 = 1.0 + m00 + m11 + m22
    t1 = 1.0 + m00 - m11 - m22
    t2 = 1.0 - m00 + m11 - m22
    t3 = 1.0 - m00 - m11 + m22

    q0 = jnp.stack([t0, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    q1 = jnp.stack([m21 - m12, t1, m10 + m01, m02 + m20], axis=-1)
    q2 = jnp.stack([m02 - m20, m10 + m01, t2, m21 + m12], axis=-1)
    q3 = jnp.stack([m10 - m01, m02 + m20, m21 + m12, t3], axis=-1)

    ts = jnp.stack([t0, t1, t2, t3], axis=-1)  # (..., 4)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4, 4)
    idx = jnp.argmax(ts, axis=-1)

    onehot = jnp.eye(4, dtype=r.dtype)[idx]  # (..., 4)
    q = jnp.sum(qs * onehot[..., None], axis=-2)  # (..., 4)
    t_sel = jnp.sum(ts * onehot, axis=-1)
    q = q / (2.0 * jnp.sqrt(jnp.maximum(t_sel, 1e-12)))[..., None]
    # canonical sign: w >= 0
    sign = jnp.where(q[..., 0:1] < 0.0, -1.0, 1.0)
    q = q * sign
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_wxyz_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [w, x, y, z] -> rotation matrix (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def quat_xyzw_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [x, y, z, w] (pypose/scipy order) -> rotation matrix."""
    return quat_wxyz_to_rot(jnp.concatenate([q[..., 3:4], q[..., 0:3]], axis=-1))


def rot_to_quat_xyzw(r: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion [x, y, z, w]."""
    q = rot_to_quat_wxyz(r)
    return jnp.concatenate([q[..., 1:4], q[..., 0:1]], axis=-1)


def euler_xyz_to_rot(euler: jnp.ndarray) -> jnp.ndarray:
    """Intrinsic XYZ Euler angles -> rotation matrix: R = Rx @ Ry @ Rz.

    Matches pypose.euler2SO3 semantics used by the reference's labeler for
    the Blender->OpenCV conversion (reference: data_generation/data_utils.py:40).
    """
    rx, ry, rz = euler[..., 0], euler[..., 1], euler[..., 2]
    cx, sx = jnp.cos(rx), jnp.sin(rx)
    cy, sy = jnp.cos(ry), jnp.sin(ry)
    cz, sz = jnp.cos(rz), jnp.sin(rz)
    one = jnp.ones_like(cx)
    zero = jnp.zeros_like(cx)
    mx = jnp.stack(
        [
            jnp.stack([one, zero, zero], -1),
            jnp.stack([zero, cx, -sx], -1),
            jnp.stack([zero, sx, cx], -1),
        ],
        -2,
    )
    my = jnp.stack(
        [
            jnp.stack([cy, zero, sy], -1),
            jnp.stack([zero, one, zero], -1),
            jnp.stack([-sy, zero, cy], -1),
        ],
        -2,
    )
    mz = jnp.stack(
        [
            jnp.stack([cz, -sz, zero], -1),
            jnp.stack([sz, cz, zero], -1),
            jnp.stack([zero, zero, one], -1),
        ],
        -2,
    )
    return mx @ my @ mz


def so3_log(r: jnp.ndarray) -> jnp.ndarray:
    """Logarithm map SO(3) -> so(3) via the quaternion route (robust near pi)."""
    q = rot_to_quat_wxyz(r)
    w = q[..., 0]
    v = q[..., 1:4]
    nv2 = jnp.sum(v * v, axis=-1)
    small = nv2 < _EPS2
    safe_nv = jnp.sqrt(jnp.where(small, jnp.ones_like(nv2), nv2))
    theta = 2.0 * jnp.arctan2(safe_nv, w)
    # scale = theta / |v|; small-angle: theta ~ 2|v|/w * (1 - |v|^2/(3 w^2))
    scale_exact = theta / safe_nv
    safe_w = jnp.where(jnp.abs(w) < 1e-6, jnp.ones_like(w), w)
    scale_taylor = (2.0 / safe_w) * (1.0 - nv2 / (3.0 * safe_w * safe_w))
    scale = jnp.where(small, scale_taylor, scale_exact)
    return scale[..., None] * v


def so3_left_jacobian(omega: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian of SO(3): Jl = I + B*w^ + C*w^2."""
    theta2 = jnp.sum(omega * omega, axis=-1)
    _, b, c = _coeffs(theta2)
    w = skew(omega)
    w2 = w @ w
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), w.shape)
    return eye + b[..., None, None] * w + c[..., None, None] * w2


def so3_right_jacobian(omega: jnp.ndarray) -> jnp.ndarray:
    """Right Jacobian of SO(3): Jr(w) = Jl(-w)."""
    return so3_left_jacobian(-omega)


def so3_left_jacobian_inverse(omega: jnp.ndarray) -> jnp.ndarray:
    """Inverse left Jacobian: Jl^-1 = I - w^/2 + D*w^2."""
    theta2 = jnp.sum(omega * omega, axis=-1)
    small = theta2 < _EPS2
    safe_t2 = jnp.where(small, jnp.ones_like(theta2), theta2)
    t = jnp.sqrt(safe_t2)
    half_t = 0.5 * t
    # D = 1/t^2 - (1 + cos t)/(2 t sin t) == 1/t^2 - cot(t/2)/(2t)
    d_exact = 1.0 / safe_t2 - 0.5 * jnp.cos(half_t) / (t * jnp.sin(half_t))
    d_taylor = 1.0 / 12.0 + theta2 / 720.0 + theta2 * theta2 / 30240.0
    d = jnp.where(small, d_taylor, d_exact)
    w = skew(omega)
    w2 = w @ w
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), w.shape)
    return eye - 0.5 * w + d[..., None, None] * w2


def so3_right_jacobian_inverse(omega: jnp.ndarray) -> jnp.ndarray:
    """Inverse right Jacobian: Jr^-1(w) = Jl^-1(-w)."""
    return so3_left_jacobian_inverse(-omega)


# --------------------------------------------------------------------------
# SE(3)
# --------------------------------------------------------------------------


def se3_identity(dtype=jnp.float32, batch_shape: tuple = ()) -> SE3:
    """Identity transform, optionally batched."""
    rot = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
    trans = jnp.zeros((*batch_shape, 3), dtype=dtype)
    return SE3(rot, trans)


def se3_exp(xi: jnp.ndarray) -> SE3:
    """SE(3) exponential of a twist [omega; v]: R = exp(w^), t = Jl(w) v."""
    omega = xi[..., :3]
    v = xi[..., 3:]
    rot = so3_exp(omega)
    trans = jnp.einsum("...ij,...j->...i", so3_left_jacobian(omega), v)
    return SE3(rot, trans)


def se3_log(t: SE3) -> jnp.ndarray:
    """SE(3) logarithm -> twist [omega; v]."""
    omega = so3_log(t.rot)
    v = jnp.einsum("...ij,...j->...i", so3_left_jacobian_inverse(omega), t.trans)
    return jnp.concatenate([omega, v], axis=-1)


def se3_compose(a: SE3, b: SE3) -> SE3:
    """a . b (apply b first in the body frame of a)."""
    rot = a.rot @ b.rot
    trans = jnp.einsum("...ij,...j->...i", a.rot, b.trans) + a.trans
    return SE3(rot, trans)


def se3_inverse(t: SE3) -> SE3:
    rot_t = jnp.swapaxes(t.rot, -1, -2)
    return SE3(rot_t, -jnp.einsum("...ij,...j->...i", rot_t, t.trans))


def se3_between(a: SE3, b: SE3) -> SE3:
    """a^-1 . b."""
    return se3_compose(se3_inverse(a), b)


def se3_adjoint(t: SE3) -> jnp.ndarray:
    """Adjoint matrix (..., 6, 6) in [omega; v] ordering:

    Ad(T) = [[R, 0], [t^ R, R]].
    """
    r = t.rot
    tr = skew(t.trans) @ r
    zero = jnp.zeros_like(r)
    top = jnp.concatenate([r, zero], axis=-1)
    bot = jnp.concatenate([tr, r], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _se3_q_matrix(xi: jnp.ndarray) -> jnp.ndarray:
    """Barfoot's Q matrix (translation-block coupling of the SE(3) left
    Jacobian), adapted to the [omega; v] ordering.

    Q_l appears in Jl_se3 = [[Jl(w), 0], [Q_l, Jl(w)]]. Verified against
    jax.jacfwd of se3_exp in tests/test_lie.py.
    """
    omega = xi[..., :3]
    v = xi[..., 3:]
    theta2 = jnp.sum(omega * omega, axis=-1)
    small = theta2 < _EPS2
    safe_t2 = jnp.where(small, jnp.ones_like(theta2), theta2)
    t = jnp.sqrt(safe_t2)
    sin_t, cos_t = jnp.sin(t), jnp.cos(t)

    # c1 = (t - sin t)/t^3
    c1 = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (t - sin_t) / (safe_t2 * t))
    # c2 = (1 - t^2/2 - cos t)/t^4  (~ -1/24 + t^2/720)
    c2 = jnp.where(
        small,
        -1.0 / 24.0 + theta2 / 720.0,
        (1.0 - 0.5 * safe_t2 - cos_t) / (safe_t2 * safe_t2),
    )
    # c3 = (t - sin t - t^3/6)/t^5  (~ -1/120 + t^2/5040)
    c3 = jnp.where(
        small,
        -1.0 / 120.0 + theta2 / 5040.0,
        (t - sin_t - t * safe_t2 / 6.0) / (safe_t2 * safe_t2 * t),
    )

    w = skew(omega)
    vv = skew(v)
    wv = w @ vv
    vw = vv @ w
    wvw = wv @ w
    w2 = w @ w

    q = (
        0.5 * vv
        + c1[..., None, None] * (wv + vw + w @ vw)
        - c2[..., None, None] * (w2 @ vv + vv @ w2 - 3.0 * w @ vw)
        - 0.5 * (c2 - 3.0 * c3)[..., None, None] * (wvw @ w + w @ wvw)
    )
    return q


def se3_left_jacobian(xi: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian of SE(3) (..., 6, 6) in [omega; v] ordering."""
    omega = xi[..., :3]
    jl = so3_left_jacobian(omega)
    q = _se3_q_matrix(xi)
    zero = jnp.zeros_like(jl)
    top = jnp.concatenate([jl, zero], axis=-1)
    bot = jnp.concatenate([q, jl], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def se3_right_jacobian(xi: jnp.ndarray) -> jnp.ndarray:
    """Right Jacobian of SE(3): Jr(xi) = Jl(-xi).

    This equals GTSAM's Pose3::ExpmapDerivative(xi) (the Jacobian of
    Expmap w.r.t. right perturbations of xi).
    """
    return se3_left_jacobian(-xi)


def se3_right_jacobian_inverse(xi: jnp.ndarray) -> jnp.ndarray:
    """Analytic inverse of the SE(3) right Jacobian via block inversion:

    Jr^-1 = [[Jr_so3^-1, 0], [-Jr_so3^-1 Q_r Jr_so3^-1, Jr_so3^-1]].
    """
    omega = xi[..., :3]
    jr_inv = so3_right_jacobian_inverse(omega)
    q_r = _se3_q_matrix(-xi)
    bl = -jr_inv @ q_r @ jr_inv
    zero = jnp.zeros_like(jr_inv)
    top = jnp.concatenate([jr_inv, zero], axis=-1)
    bot = jnp.concatenate([bl, jr_inv], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def se3_logmap_derivative(t: SE3) -> jnp.ndarray:
    """d Log(T . Exp(delta)) / d delta at delta=0, i.e. Jr^-1(Log(T)).

    Mirrors GTSAM's Pose3::LogmapDerivative used in the reference's dynamics
    factor chain rule (reference: perseus/smoother/factors.py:112).
    """
    return se3_right_jacobian_inverse(se3_log(t))


def se3_retract(t: SE3, delta: jnp.ndarray) -> SE3:
    """Right-retract a tangent perturbation: T . Exp(delta)."""
    return se3_compose(t, se3_exp(delta))


# --------------------------------------------------------------------------
# Point transforms with analytic Jacobians (GTSAM transformFrom/transformTo)
# --------------------------------------------------------------------------


def transform_from(t: SE3, p: jnp.ndarray) -> jnp.ndarray:
    """Body -> world: R p + t. (..., 3) -> (..., 3)."""
    return jnp.einsum("...ij,...j->...i", t.rot, p) + t.trans


def transform_from_jacobians(t: SE3, p: jnp.ndarray):
    """Returns (p_world, d/dpose (..., 3, 6), d/dpoint (..., 3, 3)).

    Pose Jacobian is w.r.t. right perturbation [omega; v]:
    d/domega = -R [p]^, d/dv = R.
    """
    pw = transform_from(t, p)
    d_omega = -t.rot @ skew(p)
    d_v = t.rot
    return pw, jnp.concatenate([d_omega, d_v], axis=-1), t.rot


def transform_to(t: SE3, p: jnp.ndarray) -> jnp.ndarray:
    """World -> body: R^T (p - t). (..., 3) -> (..., 3)."""
    return jnp.einsum("...ji,...j->...i", t.rot, p - t.trans)


def transform_to_jacobians(t: SE3, p: jnp.ndarray):
    """Returns (p_body, d/dpose (..., 3, 6), d/dpoint (..., 3, 3)).

    d/domega = [p_body]^, d/dv = -I, d/dpoint = R^T.
    """
    pb = transform_to(t, p)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pb.dtype), t.rot.shape)
    d_pose = jnp.concatenate([skew(pb), -eye], axis=-1)
    return pb, d_pose, jnp.swapaxes(t.rot, -1, -2)


# --------------------------------------------------------------------------
# 7-vector pose conversions (dataset / kubric metadata layouts)
# --------------------------------------------------------------------------


def pose7_wxyz_to_se3(pose7: jnp.ndarray) -> SE3:
    """[x y z qw qx qy qz] (kubric metadata order) -> SE3."""
    return SE3(quat_wxyz_to_rot(pose7[..., 3:7]), pose7[..., :3])


def se3_to_pose7_wxyz(t: SE3) -> jnp.ndarray:
    return jnp.concatenate([t.trans, rot_to_quat_wxyz(t.rot)], axis=-1)


def pose7_xyzw_to_se3(pose7: jnp.ndarray) -> SE3:
    """[x y z qx qy qz qw] (pypose order) -> SE3."""
    return SE3(quat_xyzw_to_rot(pose7[..., 3:7]), pose7[..., :3])
