"""Smoother tests.

1. Analytic Jacobians of every residual vs. jax.jacfwd under tangent
   perturbations — the same differential-oracle pattern as the reference's
   tests/test_dynamics_factor.py (which checks GTSAM analytic Jacobians
   against pypose autodiff), for both velocity frames.
2. Dynamics residual identities (exact propagation -> zero residual).
3. Batched LM recovers poses from noisy keypoint projections.
4. The fixed-lag smoother tracks a moving cube through a stream of
   measurements.
"""

import jax
import jax.numpy as jnp
import numpy as np

from perseus_tpu import lie
from perseus_tpu.camera import Intrinsics, intrinsics_from_fov, project
from perseus_tpu.datagen.labeling import cube_corners
from perseus_tpu.smoother import residuals as res
from perseus_tpu.smoother.fixed_lag import FixedLagSmoother
from perseus_tpu.smoother.lm import SmootherConfig, WindowState, lm_solve

RNG = np.random.default_rng(11)
DT = 0.1


def _rand_pose():
    return lie.se3_exp(jnp.asarray(RNG.normal(size=6)))


def test_dynamics_jacobians_vs_autodiff():
    for vel_frame in ("world", "body"):
        pose1, pose2 = _rand_pose(), _rand_pose()
        w1 = jnp.asarray(RNG.normal(size=3))
        v1 = jnp.asarray(RNG.normal(size=3))

        r, h_x1, h_w, h_v, h_x2 = res.dynamics_residual_and_jacobians(
            pose1, w1, v1, pose2, DT, vel_frame
        )
        np.testing.assert_allclose(
            np.asarray(r),
            np.asarray(res.dynamics_residual(pose1, w1, v1, pose2, DT, vel_frame)),
            atol=1e-12,
        )

        def f(dx1, dw, dv, dx2, vf=vel_frame):
            return res.dynamics_residual(
                lie.se3_retract(pose1, dx1), w1 + dw, v1 + dv, lie.se3_retract(pose2, dx2), DT, vf
            )

        zeros = (jnp.zeros(6), jnp.zeros(3), jnp.zeros(3), jnp.zeros(6))
        jacs = jax.jacfwd(f, argnums=(0, 1, 2, 3))(*zeros)
        for analytic, auto, name in zip(
            (h_x1, h_w, h_v, h_x2), jacs, ("pose1", "ang_vel", "vel", "pose2")
        ):
            np.testing.assert_allclose(
                np.asarray(analytic), np.asarray(auto), atol=1e-7, err_msg=f"{vel_frame}:{name}"
            )


def test_dynamics_exact_propagation_zero_residual():
    for vel_frame in ("world", "body"):
        pose1 = _rand_pose()
        w1 = jnp.asarray(RNG.normal(size=3))
        v1 = jnp.asarray(RNG.normal(size=3))
        v_body = lie.transform_to(lie.SE3(pose1.rot, jnp.zeros(3)), v1) if vel_frame == "world" else v1
        pose2 = lie.se3_compose(pose1, lie.se3_exp(DT * jnp.concatenate([w1, v_body])))
        r = res.dynamics_residual(pose1, w1, v1, pose2, DT, vel_frame)
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-10)


def test_constant_velocity():
    v1 = jnp.asarray(RNG.normal(size=3))
    v2 = jnp.asarray(RNG.normal(size=3))
    np.testing.assert_allclose(
        np.asarray(res.constant_velocity_residual(v1, v2)), np.asarray(v2 - v1), atol=0
    )
    h1, h2 = res.constant_velocity_jacobians(dtype=jnp.float64)
    np.testing.assert_array_equal(np.asarray(h1), -np.eye(3))
    np.testing.assert_array_equal(np.asarray(h2), np.eye(3))


def test_keypoint_projection_jacobian_vs_autodiff():
    k = Intrinsics(jnp.asarray(128.0), jnp.asarray(128.0), jnp.asarray(128.0), jnp.asarray(128.0))
    # a pose in front of the camera
    body_pose = lie.SE3(lie.so3_exp(jnp.asarray([0.2, -0.1, 0.3])), jnp.asarray([0.05, -0.02, 0.3]))
    point = jnp.asarray([0.02, -0.02, 0.02])
    meas = jnp.asarray([120.0, 130.0])

    for cam_pose in (None, lie.se3_exp(jnp.asarray(RNG.normal(size=6) * 0.1))):
        r, h = res.keypoint_projection_residual_and_jacobian(body_pose, k, meas, point, cam_pose)
        np.testing.assert_allclose(
            np.asarray(r),
            np.asarray(res.keypoint_projection_residual(body_pose, k, meas, point, cam_pose)),
            atol=1e-12,
        )

        def f(delta, cp=cam_pose):
            return res.keypoint_projection_residual(
                lie.se3_retract(body_pose, delta), k, meas, point, cp
            )

        jac = jax.jacfwd(f)(jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(h), np.asarray(jac), atol=1e-6)


def _simulate(t_frames: int, noise_px: float = 0.0, dtype=jnp.float64):
    """A cube translating + rotating in front of an identity camera."""
    k = intrinsics_from_fov(jnp.asarray(np.pi / 3, dtype=dtype), 256, 256)
    corners = cube_corners(0.035).astype(dtype)
    twist = jnp.asarray([0.3, -0.2, 0.4, 0.02, 0.03, -0.01], dtype=dtype)  # [w; v_body]
    pose0 = lie.SE3(
        lie.so3_exp(jnp.asarray([0.1, 0.2, -0.1], dtype=dtype)),
        jnp.asarray([0.02, -0.03, 0.35], dtype=dtype),
    )
    poses, meas = [], []
    pose = pose0
    for _ in range(t_frames):
        poses.append(pose)
        p_world = lie.transform_from(lie.SE3(pose.rot[None], pose.trans[None]), corners)
        meas.append(project(k, p_world))
        pose = lie.se3_compose(pose, lie.se3_exp(DT * twist))
    meas = jnp.stack(meas) + noise_px * jnp.asarray(
        RNG.normal(size=(t_frames, len(corners), 2)), dtype=dtype
    )
    return k, corners, poses, meas, twist


def test_lm_recovers_poses():
    t = 6
    k, corners, gt_poses, meas, twist = _simulate(t, noise_px=0.3)
    cfg = SmootherConfig(window=t, dt=DT, vel_frame="body", max_iterations=10)

    # init: ground truth perturbed
    rots, trans = [], []
    for p in gt_poses:
        pert = lie.se3_retract(p, jnp.asarray(RNG.normal(size=6) * 0.03))
        rots.append(pert.rot)
        trans.append(pert.trans)
    state = WindowState(
        rot=jnp.stack(rots),
        trans=jnp.stack(trans),
        ang_vel=jnp.tile(twist[:3] + 0.1, (t, 1)),
        vel=jnp.tile(twist[3:] + 0.01, (t, 1)),
    )
    valid = jnp.ones((t,), dtype=state.trans.dtype)
    prior = gt_poses[0]

    solved, cost = lm_solve(
        cfg, state, meas, valid, k, corners, prior, twist[:3], twist[3:]
    )
    for i, gt in enumerate(gt_poses):
        err = lie.se3_log(lie.se3_between(lie.SE3(solved.rot[i], solved.trans[i]), gt))
        assert float(jnp.linalg.norm(err)) < 2e-2, f"frame {i}: {np.asarray(err)}"
    assert np.isfinite(float(cost))


def test_fixed_lag_tracks_stream():
    t_frames = 14
    window = 6
    k, corners, gt_poses, meas, twist = _simulate(t_frames, noise_px=0.2)
    cfg = SmootherConfig(
        window=window, dt=DT, vel_frame="body", max_iterations=6,
        sigma_prior_pose=1.0, sigma_prior_vel=10.0,
    )
    smoother = FixedLagSmoother(cfg, k, corners, dtype=jnp.float64)
    carry = smoother.init(initial_pose=gt_poses[0])

    update = jax.jit(smoother.update)
    errs = []
    for i in range(t_frames):
        carry, pose = update(carry, meas[i])
        err = lie.se3_log(lie.se3_between(pose, gt_poses[i]))
        errs.append(float(jnp.linalg.norm(err)))
    # after warmup the track should be tight
    assert max(errs[window:]) < 2e-2, errs


def test_coarse_pose_large_rotation_cold_start():
    """VERDICT round-3 item 8: the weak-perspective POS init must bring a
    cold start with >= 90 deg true rotation into the LM basin (the old
    identity-rotation guess left it at 90-180 deg, outside). Asserts (a) the
    coarse rotation error is far below the identity-guess error, and (b) the
    fixed-lag smoother initialized from it converges on the stream."""
    k = intrinsics_from_fov(jnp.asarray(np.pi / 3, jnp.float64), 256, 256)
    corners = cube_corners(0.035).astype(jnp.float64)
    rng = np.random.default_rng(5)
    for axis_angle in ([np.pi / 2, 0.3, -0.2], [0.1, 2.4, 0.3], [1.8, -1.8, 0.5]):
        rot_gt = lie.so3_exp(jnp.asarray(axis_angle, jnp.float64))
        pose_gt = lie.SE3(rot_gt, jnp.asarray([0.03, -0.02, 0.4], jnp.float64))
        identity_err_deg = np.degrees(
            float(jnp.linalg.norm(lie.so3_log(pose_gt.rot)))
        )
        assert identity_err_deg >= 89.0  # the regime under test

        p_world = lie.transform_from(lie.SE3(pose_gt.rot[None], pose_gt.trans[None]), corners)
        meas0 = project(k, p_world)
        cfg = SmootherConfig(window=6, dt=DT, vel_frame="body", max_iterations=8)
        smoother = FixedLagSmoother(cfg, k, corners, dtype=jnp.float64)
        coarse = smoother.coarse_pose_from_keypoints(meas0)
        rot_err_deg = np.degrees(
            float(jnp.linalg.norm(lie.so3_log(coarse.rot.T @ pose_gt.rot)))
        )
        # weak perspective + Necker ambiguity: not exact, but way inside the
        # basin compared to the identity guess
        assert rot_err_deg < 0.5 * identity_err_deg, (rot_err_deg, identity_err_deg)
        assert abs(float(coarse.trans[2]) - 0.4) < 0.1  # depth from scale

        # (b) stream convergence from the coarse init: static-ish cube
        carry = smoother.init(initial_pose=coarse)
        update = jax.jit(smoother.update)
        twist = jnp.asarray([0.05, -0.04, 0.03, 0.002, 0.001, -0.002], jnp.float64)
        pose = pose_gt
        errs = []
        for i in range(12):
            pw = lie.transform_from(lie.SE3(pose.rot[None], pose.trans[None]), corners)
            m = project(k, pw) + 0.2 * jnp.asarray(rng.normal(size=(8, 2)))
            carry, est = update(carry, m)
            errs.append(float(jnp.linalg.norm(lie.se3_log(lie.se3_between(est, pose)))))
            pose = lie.se3_compose(pose, lie.se3_exp(DT * twist))
        assert min(errs[6:]) < 5e-2, (axis_angle, errs)


def test_block_normal_equations_match_jacfwd():
    """The analytic block assembly must reproduce J^T J, J^T r, and the cost
    of the dense-jacfwd oracle on a partially-valid noisy window."""
    from perseus_tpu.smoother.lm import assemble_normal_equations, retract_window, window_residuals

    t = 5
    k, corners, gt_poses, meas, twist = _simulate(t, noise_px=1.0)
    rots, trans = [], []
    for p in gt_poses:
        pert = lie.se3_retract(p, jnp.asarray(RNG.normal(size=6) * 0.05))
        rots.append(pert.rot)
        trans.append(pert.trans)
    state = WindowState(
        rot=jnp.stack(rots),
        trans=jnp.stack(trans),
        ang_vel=jnp.asarray(RNG.normal(size=(t, 3)) * 0.2 + np.asarray(twist[:3])),
        vel=jnp.asarray(RNG.normal(size=(t, 3)) * 0.02 + np.asarray(twist[3:])),
    )
    anchor = WindowState(
        rot=jnp.stack([p.rot for p in gt_poses]),
        trans=jnp.stack([p.trans for p in gt_poses]),
        ang_vel=jnp.tile(twist[:3], (t, 1)),
        vel=jnp.tile(twist[3:], (t, 1)),
    )
    valid = jnp.asarray([0.0, 0.0, 1.0, 1.0, 1.0])  # warmup frames masked
    prior = gt_poses[0]

    for vel_frame in ("world", "body"):
        for cam_pose in (None, lie.se3_exp(jnp.asarray(RNG.normal(size=6) * 0.1))):
            cfg = SmootherConfig(window=t, dt=DT, vel_frame=vel_frame)

            def residual_of(delta_flat):
                perturbed = retract_window(state, delta_flat.reshape(t, 12))
                return window_residuals(
                    cfg, perturbed, meas, valid, k, corners,
                    prior, twist[:3], twist[3:], cam_pose, anchor,
                )

            zero = jnp.zeros(12 * t, dtype=state.trans.dtype)
            r = residual_of(zero)
            jac = jax.jacfwd(residual_of)(zero)
            jtj, jtr, cost = assemble_normal_equations(
                cfg, state, meas, valid, k, corners,
                prior, twist[:3], twist[3:], cam_pose, anchor,
            )
            np.testing.assert_allclose(np.asarray(jtj), np.asarray(jac.T @ jac), atol=1e-7)
            np.testing.assert_allclose(np.asarray(jtr), np.asarray(jac.T @ r), atol=1e-8)
            np.testing.assert_allclose(float(cost), 0.5 * float(jnp.dot(r, r)), rtol=1e-10)


def test_lm_block_matches_jacfwd_solver():
    t = 6
    k, corners, gt_poses, meas, twist = _simulate(t, noise_px=0.3)
    rots, trans = [], []
    for p in gt_poses:
        pert = lie.se3_retract(p, jnp.asarray(RNG.normal(size=6) * 0.03))
        rots.append(pert.rot)
        trans.append(pert.trans)
    state = WindowState(
        rot=jnp.stack(rots),
        trans=jnp.stack(trans),
        ang_vel=jnp.tile(twist[:3] + 0.1, (t, 1)),
        vel=jnp.tile(twist[3:] + 0.01, (t, 1)),
    )
    valid = jnp.ones((t,), dtype=state.trans.dtype)
    solved = {}
    for solver in ("block", "jacfwd"):
        cfg = SmootherConfig(window=t, dt=DT, vel_frame="body", max_iterations=10, solver=solver)
        solved[solver], _ = lm_solve(
            cfg, state, meas, valid, k, corners, gt_poses[0], twist[:3], twist[3:]
        )
    np.testing.assert_allclose(
        np.asarray(solved["block"].trans), np.asarray(solved["jacfwd"].trans), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(solved["block"].rot), np.asarray(solved["jacfwd"].rot), atol=1e-8
    )


def test_fixed_lag_gn_mode_tracks_stream():
    """Incremental Gauss-Newton (accept_reject=False, 4 iterations) — the
    production streaming config — must track as tightly as full LM."""
    t_frames = 14
    window = 6
    k, corners, gt_poses, meas, twist = _simulate(t_frames, noise_px=0.2)
    cfg = SmootherConfig(
        window=window, dt=DT, vel_frame="body", max_iterations=4,
        accept_reject=False, sigma_prior_pose=1.0, sigma_prior_vel=10.0,
    )
    smoother = FixedLagSmoother(cfg, k, corners, dtype=jnp.float64)
    carry = smoother.init(initial_pose=gt_poses[0])
    update = jax.jit(smoother.update)
    errs = []
    for i in range(t_frames):
        carry, pose = update(carry, meas[i])
        errs.append(float(jnp.linalg.norm(lie.se3_log(lie.se3_between(pose, gt_poses[i])))))
    assert max(errs[window:]) < 2e-2, errs

def test_robust_kernel_survives_corrupted_corners():
    """With the Huber keypoint kernel (SmootherConfig.robust_keypoint_delta),
    1-2 grossly corrupted corners per frame must not break tracking; with the
    kernel disabled the same stream tracks measurably worse."""
    t_frames = 14
    window = 6
    k, corners, gt_poses, meas, twist = _simulate(t_frames, noise_px=0.2)
    # corrupt up to 2 corners per frame by tens of pixels
    meas_np = np.asarray(meas).copy()
    corrupt_rng = np.random.default_rng(7)
    for i in range(t_frames):
        for c in corrupt_rng.choice(meas_np.shape[1], size=2, replace=False):
            meas_np[i, c] += corrupt_rng.uniform(30.0, 80.0, size=2) * corrupt_rng.choice([-1, 1], 2)
    meas_bad = jnp.asarray(meas_np)

    def track(delta, kernel="huber"):
        cfg = SmootherConfig(
            window=window, dt=DT, vel_frame="body", max_iterations=6,
            sigma_prior_pose=1.0, sigma_prior_vel=10.0,
            robust_keypoint_delta=delta, robust_kernel=kernel,
        )
        smoother = FixedLagSmoother(cfg, k, corners, dtype=jnp.float64)
        carry = smoother.init(initial_pose=gt_poses[0])
        update = jax.jit(smoother.update)
        errs = []
        for i in range(t_frames):
            carry, pose = update(carry, meas_bad[i])
            errs.append(float(jnp.linalg.norm(lie.se3_log(lie.se3_between(pose, gt_poses[i])))))
        return max(errs[window:])

    err_gm = track(3.0, "gm")
    err_huber = track(3.0, "huber")
    err_plain = track(0.0)
    # redescending kernel rejects the outliers outright; Huber (convex,
    # cold-start-safe) still has to beat plain LS by a wide margin
    assert err_gm < 3e-2, (err_gm, err_huber, err_plain)
    assert err_huber < 0.3 * err_plain, (err_gm, err_huber, err_plain)

def test_block_tridiag_solver_matches_dense():
    """solve_block_tridiag == dense Cholesky solve on a random SPD
    block-tridiagonal system (f64)."""
    from perseus_tpu.smoother.lm import solve_block_tridiag

    t, bdim = 7, 12
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.normal(size=(t - 1, bdim, bdim)) * 0.3)
    d = jnp.asarray(
        np.stack([np.eye(bdim) * 10 + rng.normal(size=(bdim, bdim)) for _ in range(t)])
    )
    d = 0.5 * (d + jnp.swapaxes(d, -1, -2))
    rhs = jnp.asarray(rng.normal(size=(t, bdim)))

    dense = np.zeros((t * bdim, t * bdim))
    for i in range(t):
        dense[i * bdim : (i + 1) * bdim, i * bdim : (i + 1) * bdim] = np.asarray(d[i])
    for i in range(t - 1):
        dense[i * bdim : (i + 1) * bdim, (i + 1) * bdim : (i + 2) * bdim] = np.asarray(u[i])
        dense[(i + 1) * bdim : (i + 2) * bdim, i * bdim : (i + 1) * bdim] = np.asarray(u[i]).T

    x_block = np.asarray(solve_block_tridiag(d, u, rhs)).reshape(-1)
    x_dense = np.linalg.solve(dense, np.asarray(rhs).reshape(-1))
    np.testing.assert_allclose(x_block, x_dense, atol=1e-9)


def test_innovation_gate_rejects_identity_switch():
    """Whole-frame coherent detector failures (identity switch to a
    distractor: ALL corners shift together, the round-5 pose-trajectory
    failure at ~60-100 px) defeat per-corner robust kernels — the median
    residual IS the outlier. The innovation gate (SmootherConfig.gate_px)
    must coast through such frames on dynamics; with the gate off the same
    stream must track measurably worse."""
    t_frames = 16
    window = 6
    k, corners, gt_poses, meas, twist = _simulate(t_frames, noise_px=0.2)
    meas_np = np.asarray(meas).copy()
    # two identity-switch bursts after warmup: every corner shifted together
    for i in (9, 10, 13):
        meas_np[i] += np.asarray([70.0, -55.0])
    meas_bad = jnp.asarray(meas_np)

    def track(gate_px):
        cfg = SmootherConfig(
            window=window, dt=DT, vel_frame="body", max_iterations=6,
            sigma_prior_pose=1.0, sigma_prior_vel=10.0, gate_px=gate_px,
        )
        smoother = FixedLagSmoother(cfg, k, corners, dtype=jnp.float64)
        carry = smoother.init(initial_pose=gt_poses[0])
        update = jax.jit(smoother.update)
        errs, rejects = [], []
        for i in range(t_frames):
            carry, pose = update(carry, meas_bad[i])
            errs.append(float(jnp.linalg.norm(lie.se3_log(lie.se3_between(pose, gt_poses[i])))))
            rejects.append(int(carry.consec_rejects))
        return errs, rejects

    errs_gated, rejects = track(30.0)
    errs_off, _ = track(0.0)
    # the gate fired exactly on the corrupted frames...
    assert rejects[9] == 1 and rejects[10] == 2 and rejects[13] == 1, rejects
    assert sum(1 for r in rejects if r > 0) == 3, rejects
    # ...kept the corrupted-frame estimates near GT (dynamics coasting)...
    assert max(errs_gated[window:]) < 5e-2, errs_gated
    # ...and beats the ungated tracker by a wide margin on those frames
    assert max(errs_off[9:11]) > 5 * max(errs_gated[9:11]), (errs_off, errs_gated)


def test_innovation_gate_force_accepts_after_consecutive_rejects():
    """A genuine track change (the 'detector' permanently re-locks) must be
    re-acquired: after gate_max_consec consecutive rejections the gate
    force-accepts, instead of rejecting the new track forever."""
    t_frames = 18
    window = 6
    shift_at = 9
    k, corners, gt_poses, meas, twist = _simulate(t_frames, noise_px=0.2)
    meas_np = np.asarray(meas).copy()
    meas_np[shift_at:] += np.asarray([80.0, -60.0])  # permanent re-lock
    meas_bad = jnp.asarray(meas_np)
    cfg = SmootherConfig(
        window=window, dt=DT, vel_frame="body", max_iterations=6,
        sigma_prior_pose=1.0, sigma_prior_vel=10.0, gate_px=30.0, gate_max_consec=3,
    )
    smoother = FixedLagSmoother(cfg, k, corners, dtype=jnp.float64)
    carry = smoother.init(initial_pose=gt_poses[0])
    update = jax.jit(smoother.update)
    rejects = []
    for i in range(t_frames):
        carry, pose = update(carry, meas_bad[i])
        rejects.append(int(carry.consec_rejects))
    # 3 rejects, then a forced accept resets the counter; once the window
    # re-converges onto the shifted track the gate stays quiet
    assert rejects[shift_at : shift_at + 4] == [1, 2, 3, 0], rejects
    assert all(r == 0 for r in rejects[shift_at + 6 :]), rejects


def test_gate_reset_recovers_from_bad_cold_start():
    """The scale_run6 pose job 00000007 failure: a corrupted FIRST frame
    seeds the POS cold start far from the truth, after which the old gate
    rejected every good detection (innovation vs the diverged prediction)
    and the force-accept dropped single measurements into a diverged window
    that LM snapped back to — lost for the whole trajectory. The tracker
    reset (re-seed the window from the still-disagreeing frame's POS pose
    after gate_max_consec rejects) must recover within a few frames."""
    t_frames = 20
    window = 6
    k, corners, gt_poses, meas, twist = _simulate(t_frames, noise_px=0.2)
    meas_np = np.asarray(meas).copy()
    meas_np[0] += np.asarray([60.0, -45.0])  # corrupted first frame
    meas_bad = jnp.asarray(meas_np)
    cfg = SmootherConfig(
        window=window, dt=DT, vel_frame="body", max_iterations=6,
        sigma_prior_pose=1.0, sigma_prior_vel=10.0, gate_px=30.0, gate_max_consec=3,
    )
    smoother = FixedLagSmoother(cfg, k, corners, dtype=jnp.float64)
    # cold start exactly like eval/pose_eval.py: POS pose of frame 0 —
    # which here is the corrupted frame
    carry = smoother.init(smoother.coarse_pose_from_keypoints(meas_bad[0]))
    update = jax.jit(smoother.update)
    errs = []
    for i in range(t_frames):
        carry, pose = update(carry, meas_bad[i])
        errs.append(float(jnp.linalg.norm(lie.se3_log(lie.se3_between(pose, gt_poses[i])))))
    # recovered well before the fixed-lag warmup (= window frames) ends,
    # and stays locked for the rest of the stream
    assert max(errs[window:]) < 5e-2, errs


def test_gate_accepts_via_last_pose_when_velocity_contaminated():
    """The scale_run6 pose job 00000000 limit cycle: with contaminated
    VELOCITY state the dynamics coast flies away, so a prediction-only gate
    rejects perfect detections 3-at-a-time forever. The dual-reference gate
    must accept a frame that agrees with the last smoothed pose even when
    it disagrees with the dynamics prediction."""
    t_frames = 14
    window = 6
    k, corners, gt_poses, meas, twist = _simulate(t_frames, noise_px=0.2)
    cfg = SmootherConfig(
        window=window, dt=DT, vel_frame="body", max_iterations=6,
        sigma_prior_pose=1.0, sigma_prior_vel=10.0, gate_px=30.0, gate_max_consec=3,
    )
    smoother = FixedLagSmoother(cfg, k, corners, dtype=jnp.float64)
    carry = smoother.init(initial_pose=gt_poses[0])
    update = jax.jit(smoother.update)
    errs, rejects = [], []
    for i in range(t_frames):
        if i == 9:
            # inject gross velocity contamination mid-track: the next
            # dynamics prediction lands far from the measurement
            # dt * vel error of 0.1 units lateral at z ~ 0.35 shifts the
            # predicted projections ~60+ px — far beyond gate_px=30
            carry = carry._replace(
                window=carry.window._replace(
                    ang_vel=carry.window.ang_vel + 2.0,
                    vel=carry.window.vel + jnp.asarray([1.0, -1.0, 0.0]),
                )
            )
        carry, pose = update(carry, meas[i])
        errs.append(float(jnp.linalg.norm(lie.se3_log(lie.se3_between(pose, gt_poses[i])))))
        rejects.append(int(carry.consec_rejects))
    # the good measurement right after contamination is ACCEPTED (agrees
    # with the last smoothed pose), no reject streak starts, and the
    # window re-fits through the bad velocities
    assert rejects[9] == 0, rejects
    assert errs[9] < 0.1, errs
    # the gross +30 rad/s contamination takes ~3 accepted frames to flush
    # out of the window; what matters is no reject streak ever starts
    assert all(r == 0 for r in rejects), rejects
    assert max(errs[12:]) < 5e-2, errs
