"""Differential tests for the Lie module.

Strategy mirrors (and extends) the reference's only test pattern: compare
analytic outputs against independent oracles — scipy.spatial.transform for
group ops and jax autodiff for every analytic Jacobian (reference:
tests/test_dynamics_factor.py compares GTSAM analytic Jacobians vs. pypose
jacrev).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRotation

from perseus_tpu import lie

RNG = np.random.default_rng(0)


def random_omegas() -> np.ndarray:
    """Rotation vectors covering small, generic, and near-pi angles."""
    generic = RNG.normal(size=(16, 3))
    tiny = RNG.normal(size=(8, 3)) * 1e-6
    axes = RNG.normal(size=(8, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    near_pi = axes * (np.pi - 1e-7)
    at_pi = axes * np.pi
    return np.concatenate([generic, tiny, near_pi, at_pi], axis=0)


def random_se3(n: int) -> lie.SE3:
    xi = jnp.asarray(RNG.normal(size=(n, 6)))
    return lie.se3_exp(xi)


# ------------------------- SO(3) vs scipy oracle -------------------------


def test_so3_exp_matches_scipy():
    omegas = random_omegas()
    ours = np.asarray(lie.so3_exp(jnp.asarray(omegas)))
    scipys = ScipyRotation.from_rotvec(omegas).as_matrix()
    np.testing.assert_allclose(ours, scipys, atol=1e-12)


def test_so3_log_roundtrip():
    omegas = random_omegas()
    r = lie.so3_exp(jnp.asarray(omegas))
    recovered = np.asarray(lie.so3_log(r))
    # log may return the equivalent rotation vector on the other chart near
    # pi; compare reconstructed rotations instead of raw vectors.
    r2 = np.asarray(lie.so3_exp(jnp.asarray(recovered)))
    np.testing.assert_allclose(np.asarray(r), r2, atol=1e-9)
    # away from pi the vectors themselves must match
    generic = omegas[:16]
    rec = np.asarray(lie.so3_log(lie.so3_exp(jnp.asarray(generic))))
    np.testing.assert_allclose(rec, generic, atol=1e-9)


def test_quat_conversions_match_scipy():
    omegas = random_omegas()
    scipy_rot = ScipyRotation.from_rotvec(omegas)
    r = jnp.asarray(scipy_rot.as_matrix())
    ours_xyzw = np.asarray(lie.rot_to_quat_xyzw(r))
    scipy_xyzw = scipy_rot.as_quat()
    # quaternion double cover: compare up to sign
    dot = np.abs(np.sum(ours_xyzw * scipy_xyzw, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-9)
    # and the rot reconstruction must be exact
    np.testing.assert_allclose(
        np.asarray(lie.quat_xyzw_to_rot(jnp.asarray(scipy_xyzw))), np.asarray(r), atol=1e-12
    )


def test_euler_xyz_matches_scipy():
    angles = RNG.normal(size=(16, 3))
    ours = np.asarray(lie.euler_xyz_to_rot(jnp.asarray(angles)))
    # intrinsic XYZ
    scipys = ScipyRotation.from_euler("XYZ", angles).as_matrix()
    np.testing.assert_allclose(ours, scipys, atol=1e-12)


# ----------------------- Jacobians vs autodiff oracle ---------------------


def test_so3_jacobians_vs_autodiff():
    """Jl/Jr are d so3_exp(w + Jl dw)/... — verified via the defining identity
    exp((w + dw)^) ~ exp(w^) exp((Jr(w) dw)^)."""
    for omega in random_omegas()[:20]:
        omega = jnp.asarray(omega)

        def f_right(dw):
            return lie.so3_log(
                lie.so3_exp(omega).T @ lie.so3_exp(omega + dw)
            )

        jac_auto = jax.jacfwd(f_right)(jnp.zeros(3))
        jr = lie.so3_right_jacobian(omega)
        np.testing.assert_allclose(np.asarray(jr), np.asarray(jac_auto), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(lie.so3_right_jacobian_inverse(omega)),
            np.linalg.inv(np.asarray(jr)),
            atol=1e-6,
        )


def test_se3_exp_log_roundtrip():
    # keep |omega| < pi: Log returns the principal branch, so twists with a
    # larger rotation correctly round-trip to the equivalent principal twist.
    xi_np = RNG.normal(size=(32, 6))
    xi_np[:, :3] *= 0.9 * np.pi / np.maximum(np.linalg.norm(xi_np[:, :3], axis=-1, keepdims=True), 1.0)
    xi = jnp.asarray(xi_np)
    back = lie.se3_log(lie.se3_exp(xi))
    np.testing.assert_allclose(np.asarray(back), np.asarray(xi), atol=1e-9)
    # beyond-pi twists: the reconstructed transform must still match
    xi_big = jnp.asarray(RNG.normal(size=(16, 6)) * 2.0)
    t_big = lie.se3_exp(xi_big)
    t_back = lie.se3_exp(lie.se3_log(t_big))
    np.testing.assert_allclose(np.asarray(t_back.rot), np.asarray(t_big.rot), atol=1e-9)
    np.testing.assert_allclose(np.asarray(t_back.trans), np.asarray(t_big.trans), atol=1e-9)
    # small twists
    xi_small = xi * 1e-7
    back_small = lie.se3_log(lie.se3_exp(xi_small))
    np.testing.assert_allclose(np.asarray(back_small), np.asarray(xi_small), atol=1e-15)


def test_se3_right_jacobian_vs_autodiff():
    """Jr(xi) = d Log(Exp(xi)^-1 Exp(xi + dxi)) / d dxi at 0."""
    for xi in RNG.normal(size=(12, 6)):
        xi = jnp.asarray(xi)

        def f(dxi):
            t0 = lie.se3_exp(xi)
            t1 = lie.se3_exp(xi + dxi)
            return lie.se3_log(lie.se3_between(t0, t1))

        jac_auto = jax.jacfwd(f)(jnp.zeros(6))
        jr = lie.se3_right_jacobian(xi)
        np.testing.assert_allclose(np.asarray(jr), np.asarray(jac_auto), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(lie.se3_right_jacobian_inverse(xi)),
            np.linalg.inv(np.asarray(jr)),
            atol=1e-6,
        )


def test_se3_logmap_derivative_vs_autodiff():
    for xi in RNG.normal(size=(8, 6)):
        t = lie.se3_exp(jnp.asarray(xi))

        def f(delta):
            return lie.se3_log(lie.se3_compose(t, lie.se3_exp(delta)))

        jac_auto = jax.jacfwd(f)(jnp.zeros(6))
        np.testing.assert_allclose(
            np.asarray(lie.se3_logmap_derivative(t)), np.asarray(jac_auto), atol=1e-6
        )


def test_se3_adjoint_identity():
    """T Exp(xi) T^-1 == Exp(Ad(T) xi)."""
    t = random_se3(8)
    xi = jnp.asarray(RNG.normal(size=(8, 6)) * 0.3)
    lhs = lie.se3_compose(lie.se3_compose(t, lie.se3_exp(xi)), lie.se3_inverse(t))
    rhs = lie.se3_exp(jnp.einsum("bij,bj->bi", lie.se3_adjoint(t), xi))
    np.testing.assert_allclose(np.asarray(lhs.rot), np.asarray(rhs.rot), atol=1e-9)
    np.testing.assert_allclose(np.asarray(lhs.trans), np.asarray(rhs.trans), atol=1e-9)


def test_transform_jacobians_vs_autodiff():
    t = random_se3(1)
    t = lie.SE3(t.rot[0], t.trans[0])
    p = jnp.asarray(RNG.normal(size=3))

    for fn, jac_fn in [
        (lie.transform_from, lie.transform_from_jacobians),
        (lie.transform_to, lie.transform_to_jacobians),
    ]:
        val, d_pose, d_point = jac_fn(t, p)
        np.testing.assert_allclose(np.asarray(val), np.asarray(fn(t, p)), atol=1e-12)

        def f_pose(delta, fn=fn):
            return fn(lie.se3_retract(t, delta), p)

        def f_point(dp, fn=fn):
            return fn(t, p + dp)

        np.testing.assert_allclose(
            np.asarray(d_pose), np.asarray(jax.jacfwd(f_pose)(jnp.zeros(6))), atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(d_point), np.asarray(jax.jacfwd(f_point)(jnp.zeros(3))), atol=1e-7
        )


def test_pose7_roundtrip():
    t = random_se3(16)
    p7 = lie.se3_to_pose7_wxyz(t)
    t2 = lie.pose7_wxyz_to_se3(p7)
    np.testing.assert_allclose(np.asarray(t.rot), np.asarray(t2.rot), atol=1e-9)
    np.testing.assert_allclose(np.asarray(t.trans), np.asarray(t2.trans), atol=1e-9)


def test_batched_shapes():
    """Everything broadcasts over leading dims."""
    xi = jnp.asarray(RNG.normal(size=(4, 5, 6)))
    t = lie.se3_exp(xi)
    assert t.rot.shape == (4, 5, 3, 3)
    assert lie.se3_log(t).shape == (4, 5, 6)
    assert lie.se3_adjoint(t).shape == (4, 5, 6, 6)
    assert lie.se3_right_jacobian(xi).shape == (4, 5, 6, 6)
    p = jnp.asarray(RNG.normal(size=(4, 5, 3)))
    assert lie.transform_from(t, p).shape == (4, 5, 3)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_dtype_polymorphic(dtype):
    xi = jnp.asarray(RNG.normal(size=(3, 6)), dtype=dtype)
    t = lie.se3_exp(xi)
    assert t.rot.dtype == dtype
    assert lie.se3_log(t).dtype == dtype
