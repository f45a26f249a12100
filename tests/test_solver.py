"""Windowed BA solver tests — the TPU equivalent of the reference's
synthetic project-perturb-solve harness
(keyframe_bundle_adjustment.cpp: evaluate_bundle_adjustment :419-609,
evaluate_bundle_adjustment_depth :860-1087, noise ladders with thresholds
0.001→0.01) and the solveTrimmed outlier test
(robust_optimization.cpp:134-156)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from limo_tpu.config import default_config
from limo_tpu.geometry import pose as pose_ops
from limo_tpu.geometry import quaternion as quat
from limo_tpu.geometry.camera import CameraRig
from limo_tpu.solver import assemble, run_lm, solve_trimmed
from limo_tpu.state import Selection, Window, empty_window

F, CX, CY = 600.0, 300.0, 200.0
DT = jnp.float64


def make_gt_poses():
    """5-pose trajectory mirroring the reference generator getPoses
    (keyframe_bundle_adjustment.cpp:232-250): forward motion along -x/-z
    with a small yaw."""
    deltas = [
        (np.zeros(3), 0.0),
        (np.array([-1.5, 0.0, -2.0]), -0.05),
        (np.array([-2.0, 0.0, 0.0]), -0.05),
        (np.array([-1.5, -0.1, 0.0]), 0.0),
        (np.array([-2.9, 0.0, 0.0]), 0.0),
    ]
    poses = [pose_ops.identity(DT)]
    for t, yaw in deltas[1:]:
        d = pose_ops.make(
            quat.qfrom_axis_angle(jnp.array([0.0, 0.0, 1.0], DT), jnp.asarray(yaw, DT)),
            jnp.asarray(t, DT))
        poses.append(pose_ops.compose(poses[-1], d))
    return jnp.stack(poses)


def make_landmarks(rng, n=120):
    """Landmarks in front of the camera band (visible from all poses)."""
    lms = rng.uniform(-1, 1, size=(n, 3)) * np.array([15.0, 8.0, 5.0]) \
        + np.array([0.0, 0.0, 30.0])
    return jnp.asarray(lms, DT)


def build_window(gt_poses, lms, rig, pose_noise=None, lm_noise=None,
                 pixel_noise=0.0, with_depth=False, depth_noise=0.0,
                 rng=None, n_outliers=0):
    """Project landmarks through GT poses+camera, fill a Window with
    (optionally) perturbed initial state — the reference test recipe."""
    K_used, L_used = gt_poses.shape[0], lms.shape[0]
    cfg = default_config().replace()
    cap = cfg.capacity
    w = empty_window(cap, DT)
    K, L, C = w.K, w.L, w.C

    f, pp, tcv = rig.focal[0], rig.principal[0], rig.T_cam_veh[0]
    pcam = jax.vmap(lambda p: pose_ops.apply(tcv, pose_ops.apply(p, lms)))(gt_poses)
    uv, ok = jax.vmap(lambda pc: jax.vmap(
        lambda q: (F * q[:2] / q[2] + jnp.array([CX, CY], DT), q[2] > 0))(pc))(pcam)
    uv, zs = uv, pcam[..., 2]
    assert bool(ok.all())

    obs = np.zeros((L, K, C, 3))
    obs_mask = np.zeros((L, K, C), bool)
    uv_np = np.asarray(uv)
    if pixel_noise > 0:
        uv_np = uv_np + rng.normal(0, pixel_noise, uv_np.shape)
    if n_outliers > 0:
        # corrupt the tracks of the first n_outliers landmarks
        uv_np[:, :n_outliers] += rng.uniform(30, 60, uv_np[:, :n_outliers].shape)
    for k in range(K_used):
        obs[:L_used, k, 0, :2] = uv_np[k]
        d = np.asarray(zs[k])
        if with_depth:
            if depth_noise > 0:
                d = d + rng.normal(0, depth_noise, d.shape)
            obs[:L_used, k, 0, 2] = d
        else:
            obs[:L_used, k, 0, 2] = -1.0
        obs_mask[:L_used, k, 0] = True

    poses0 = np.array(jnp.tile(pose_ops.identity(DT), (K, 1)))
    poses0[:K_used] = np.asarray(gt_poses)
    if pose_noise is not None:
        ang, tr = pose_noise
        for k in range(2, K_used):  # first two stay exact (Pose/Scale fixed)
            dq = np.asarray(quat.qexp(jnp.asarray(rng.normal(0, ang, 3), DT)))
            poses0[k, :4] = np.asarray(quat.qmul(jnp.asarray(dq, DT),
                                                 jnp.asarray(poses0[k, :4], DT)))
            poses0[k, 4:] += rng.normal(0, tr, 3)

    lms0 = np.zeros((L, 3))
    lms0[:L_used] = np.asarray(lms)
    if lm_noise is not None:
        lms0[:L_used] += rng.normal(0, lm_noise, (L_used, 3))

    w = w._replace(
        stamps=w.stamps.at[:K_used].set(jnp.arange(K_used, dtype=w.stamps.dtype) * 0.4),
        poses=jnp.asarray(poses0, DT),
        kf_valid=w.kf_valid.at[:K_used].set(True),
        fix_pose=w.fix_pose.at[0].set(True),
        fix_scale=w.fix_scale.at[1].set(True),
        lm_pos=jnp.asarray(lms0, DT),
        lm_valid=w.lm_valid.at[:L_used].set(True),
        lm_has_depth=w.lm_has_depth.at[:L_used].set(bool(with_depth)),
        lm_id=w.lm_id.at[:L_used].set(jnp.arange(L_used, dtype=jnp.int32)),
        obs=jnp.asarray(obs, DT),
        obs_mask=jnp.asarray(obs_mask),
    )
    return w, cfg


def default_selection(w: Window, scale_weight=0.0, scale_target=0.0):
    L = w.L
    return Selection(
        lm_selected=w.lm_valid,
        gp_kf=jnp.zeros((L,), jnp.int32),
        gp_weight=jnp.zeros((L,), DT),
        scale_kf0=jnp.asarray(0, jnp.int32),
        scale_kf1=jnp.asarray(1, jnp.int32),
        scale_target=jnp.asarray(scale_target, DT),
        scale_weight=jnp.asarray(scale_weight, DT),
        plane_dist_fixed=jnp.asarray(False),
    )


def pose_errors(w, gt_poses):
    K_used = gt_poses.shape[0]
    dq = jax.vmap(quat.qangle)(w.poses[:K_used, :4], gt_poses[:, :4])
    dt = jnp.linalg.norm(w.poses[:K_used, 4:] - gt_poses[:, 4:], axis=-1)
    return np.asarray(dq), np.asarray(dt)


RIG = CameraRig.single(F, CX, CY, dtype=DT)


class TestAssemble:
    def test_zero_residual_at_gt(self, rng):
        gt = make_gt_poses()
        lms = make_landmarks(rng)
        w, cfg = build_window(gt, lms, RIG)
        sel = default_selection(w)
        eqs, stats = assemble(w, sel, RIG, cfg)
        assert float(eqs.cost) < 1e-16
        assert np.all(np.isfinite(np.asarray(eqs.H_pp)))
        np.testing.assert_allclose(np.asarray(eqs.b_p), 0.0, atol=1e-7)
        assert int(stats.n_depth) == 0

    def test_gradient_nonzero_when_perturbed(self, rng):
        gt = make_gt_poses()
        lms = make_landmarks(rng)
        w, cfg = build_window(gt, lms, RIG, pose_noise=(0.01, 0.1), rng=rng)
        sel = default_selection(w)
        eqs, _ = assemble(w, sel, RIG, cfg)
        assert float(eqs.cost) > 1.0
        assert np.linalg.norm(np.asarray(eqs.b_p)) > 0


class TestMonoBA:
    """Mirror of evaluate_bundle_adjustment noise ladder (:419-609)."""

    def _run(self, rng, pose_noise, lm_noise, pixel_noise, thres_rot, thres_t):
        gt = make_gt_poses()
        lms = make_landmarks(rng)
        w, cfg = build_window(gt, lms, RIG, pose_noise=pose_noise,
                              lm_noise=lm_noise, pixel_noise=pixel_noise, rng=rng)
        # mono: scale unobserved -> scale regularization on two oldest kfs
        target = float(jnp.linalg.norm(gt[1, 4:] - gt[0, 4:]))
        sel = default_selection(w, scale_weight=1000.0, scale_target=target)
        w2, cost, lam, acc = jax.jit(
            lambda w, sel: run_lm(w, sel, RIG, cfg, 30))(w, sel)
        dq, dt = pose_errors(w2, gt)
        assert dq.max() < thres_rot and dt.max() < thres_t, (dq, dt, float(cost))

    def test_no_noise(self, rng):
        self._run(rng, None, None, 0.0, 1e-5, 1e-5)

    def test_pose_noise(self, rng):
        self._run(rng, (0.02, 0.2), 0.3, 0.0, 1e-4, 1e-4)

    def test_pose_and_pixel_noise(self, rng):
        # reference noisy tier accepts isApprox(0.01) — *relative* 1%
        # (~8 cm on this ~8 m trajectory); we use the same effective bound
        self._run(rng, (0.02, 0.2), 0.3, 0.5, 5e-3, 8e-2)


class TestDepthBA:
    """Mirror of evaluate_bundle_adjustment_depth (:860-1087): measured depth
    observes scale, no scale regularization needed."""

    def test_depth_no_noise(self, rng):
        gt = make_gt_poses()
        lms = make_landmarks(rng)
        w, cfg = build_window(gt, lms, RIG, with_depth=True)
        sel = default_selection(w)
        w2, cost, _, _ = jax.jit(lambda w, s: run_lm(w, s, RIG, cfg, 30))(w, sel)
        dq, dt = pose_errors(w2, gt)
        assert dq.max() < 1e-5 and dt.max() < 1e-5

    def test_depth_recovers_scale(self, rng):
        # shrink translations by 10% — depth residuals must pull scale back
        gt = make_gt_poses()
        lms = make_landmarks(rng)
        w, cfg = build_window(gt, lms, RIG, with_depth=True)
        poses_scaled = np.array(w.poses)
        poses_scaled[2:5, 4:] *= 0.9
        w = w._replace(poses=jnp.asarray(poses_scaled, DT))
        sel = default_selection(w)
        w2, cost, _, _ = jax.jit(lambda w, s: run_lm(w, s, RIG, cfg, 40))(w, sel)
        dq, dt = pose_errors(w2, gt)
        assert dt.max() < 1e-4, dt

    def test_depth_with_noise(self, rng):
        gt = make_gt_poses()
        lms = make_landmarks(rng)
        w, cfg = build_window(gt, lms, RIG, pose_noise=(0.02, 0.2), lm_noise=0.3,
                              pixel_noise=0.5, with_depth=True, depth_noise=0.05,
                              rng=rng)
        sel = default_selection(w)
        w2, cost, _, _ = jax.jit(lambda w, s: run_lm(w, s, RIG, cfg, 40))(w, sel)
        dq, dt = pose_errors(w2, gt)
        assert dq.max() < 2e-2 and dt.max() < 5e-2


class TestTrimmedSolve:
    """Mirror of the solveTrimmed end-to-end test
    (robust_optimization.cpp:134-156): outlier tracks must be trimmed and the
    solution must match ground truth."""

    def test_outliers_trimmed(self, rng):
        gt = make_gt_poses()
        lms = make_landmarks(rng, n=150)
        # quantile 0.95 trims at most ~5% strictly above the pivot per
        # round (reference semantics) — keep the outlier fraction below that
        n_out = 6
        w, cfg = build_window(gt, lms, RIG, pose_noise=(0.01, 0.1),
                              lm_noise=0.2, pixel_noise=0.3, rng=rng,
                              n_outliers=n_out)
        target = float(jnp.linalg.norm(gt[1, 4:] - gt[0, 4:]))
        sel = default_selection(w, scale_weight=1000.0, scale_target=target)
        w2, sel2, info = jax.jit(
            lambda w, s: solve_trimmed(w, s, RIG, cfg))(w, sel)
        # the corrupted tracks must be dropped from the selection
        dropped = ~np.asarray(sel2.lm_selected[:n_out])
        assert dropped.sum() >= n_out - 1, dropped
        dq, dt = pose_errors(w2, gt)
        assert dq.max() < 2e-2 and dt.max() < 6e-2, (dq, dt)
        assert float(info.final_cost) < float(info.initial_cost)

    def test_fixed_trimmer_e2e(self, rng):
        """Per-family TrimmerSpecification with Fix dispatch
        (robust_solving.hpp:18-25,135-156; trimmer_fix.hpp:36-47) through the
        fused solve loop: constant-offset outlier tracks exceed the fixed
        residual threshold and must be removed, after which the solution
        matches ground truth (robust_optimization.cpp:134-156 semantics)."""
        import dataclasses
        gt = make_gt_poses()
        lms = make_landmarks(rng, n=150)
        n_out = 10  # fixed trimming has no quantile cap — trim all 10 at once
        w, cfg = build_window(gt, lms, RIG, pose_noise=(0.01, 0.1),
                              lm_noise=0.2, pixel_noise=0.3, rng=rng,
                              n_outliers=n_out)
        cfg = cfg.replace(robust=dataclasses.replace(
            cfg.robust,
            reprojection_trimmer="fixed", reprojection_trim_fixed_thres=10.0,
            depth_trimmer="fixed", depth_trim_fixed_thres=0.5))
        target = float(jnp.linalg.norm(gt[1, 4:] - gt[0, 4:]))
        sel = default_selection(w, scale_weight=1000.0, scale_target=target)
        w2, sel2, info = jax.jit(
            lambda w, s: solve_trimmed(w, s, RIG, cfg))(w, sel)
        dropped = ~np.asarray(sel2.lm_selected[:n_out])
        assert dropped.all(), dropped
        # inliers (moderate pixel noise) stay well below the 10 px threshold
        assert bool(np.asarray(sel2.lm_selected[n_out:150]).all())
        dq, dt = pose_errors(w2, gt)
        assert dq.max() < 2e-2 and dt.max() < 6e-2, (dq, dt)

    def test_solve_diagnostics(self, rng):
        """SolveInfo Summary/FullReport parity (robust_solving.hpp:44-74):
        per-round per-family trim counts and the accept/reject iteration
        trace must be populated and self-consistent."""
        from limo_tpu.solver.trimmed import trace_capacity
        gt = make_gt_poses()
        lms = make_landmarks(rng, n=150)
        n_out = 6
        w, cfg = build_window(gt, lms, RIG, pose_noise=(0.01, 0.1),
                              lm_noise=0.2, pixel_noise=0.3, rng=rng,
                              n_outliers=n_out)
        target = float(jnp.linalg.norm(gt[1, 4:] - gt[0, 4:]))
        sel = default_selection(w, scale_weight=1000.0, scale_target=target)
        _, _, info = jax.jit(
            lambda w, s: solve_trimmed(w, s, RIG, cfg))(w, sel)
        T = trace_capacity(cfg)
        n_it = int(info.n_iterations)
        assert 0 < n_it <= T
        trace = np.asarray(info.accept_trace)
        # exactly the first n_it slots are used, each accepted(1)/rejected(2)
        assert set(trace[:n_it]) <= {1, 2}
        assert (trace[n_it:] == 0).all()
        assert int(np.sum(trace == 1)) == int(info.n_accepted)
        assert int(info.n_rounds) == cfg.robust.num_trim_iterations
        # family counts sum to at least the union count (union <= sum)
        fam_sum = (int(np.sum(info.trimmed_repr))
                   + int(np.sum(info.trimmed_depth))
                   + int(np.sum(info.trimmed_gp)))
        assert fam_sum >= int(info.n_trimmed) > 0
        # cost trace: recorded costs are finite and end at final_cost
        costs = np.asarray(info.cost_trace)[:n_it]
        assert np.isfinite(costs).all()
        np.testing.assert_allclose(costs[-1], float(info.final_cost), rtol=1e-6)

    def test_no_trim_below_min_groups(self, rng):
        gt = make_gt_poses()
        lms = make_landmarks(rng, n=40)  # < 100 selected ⇒ no trimming
        w, cfg = build_window(gt, lms, RIG, pixel_noise=0.3, rng=rng)
        target = float(jnp.linalg.norm(gt[1, 4:] - gt[0, 4:]))
        sel = default_selection(w, scale_weight=1000.0, scale_target=target)
        _, sel2, info = jax.jit(lambda w, s: solve_trimmed(w, s, RIG, cfg))(w, sel)
        assert int(info.n_trimmed) == 0
        assert bool(jnp.all(sel2.lm_selected == sel.lm_selected))


class TestMotionParameterization:
    """setParameterization variants (bundle_adjuster_keyframes.cpp:172-183):
    FixRotation and the 'Bycicle' planar-arc model (CircularMotionPlus2d)
    wired as per-keyframe tangent bases in the solver."""

    def _cfg_with_mode(self, cfg, mode):
        import dataclasses
        return cfg.replace(solver=dataclasses.replace(
            cfg.solver, motion_parameterization=mode))

    def test_fix_rotation_recovers_translation_only(self, rng):
        gt = make_gt_poses()
        lms = make_landmarks(rng)
        # translation-only perturbation: rotations start at GT and must stay
        w, cfg = build_window(gt, lms, RIG, with_depth=True)
        poses0 = np.array(w.poses)
        poses0[2:5, 4:] += rng.normal(0, 0.3, (3, 3))
        w = w._replace(poses=jnp.asarray(poses0, DT))
        cfg = self._cfg_with_mode(cfg, "fix_rotation")
        sel = default_selection(w)
        w2, cost, _, acc = jax.jit(lambda w, s: run_lm(w, s, RIG, cfg, 30))(w, sel)
        dq, dt = pose_errors(w2, gt)
        assert int(acc) > 0
        assert dt.max() < 1e-4, dt
        # rotations untouched (were exact, must remain bit-identical tangent-wise)
        dq0 = np.asarray(jax.vmap(quat.qangle)(w.poses[:5, :4], w2.poses[:5, :4]))
        assert dq0.max() < 1e-12, dq0

    def test_circular_2d_planar_recovery(self, rng):
        # planar trajectory (z=0, pure z-yaw): in-plane xy perturbations are
        # recoverable through the 2-dof (yaw, arc) parameterization
        deltas = [(np.zeros(3), 0.0), (np.array([2.0, 0.1, 0.0]), 0.05),
                  (np.array([2.0, 0.3, 0.0]), 0.08),
                  (np.array([2.0, 0.5, 0.0]), 0.06),
                  (np.array([2.0, 0.6, 0.0]), 0.04)]
        poses = [pose_ops.identity(DT)]
        for t, yaw in deltas[1:]:
            d = pose_ops.make(
                quat.qfrom_axis_angle(jnp.array([0.0, 0.0, 1.0], DT),
                                      jnp.asarray(yaw, DT)),
                jnp.asarray(t, DT))
            poses.append(pose_ops.compose(poses[-1], d))
        gt = jnp.stack(poses)
        lms = rng.uniform(-1, 1, size=(120, 3)) * np.array([15.0, 8.0, 5.0]) \
            + np.array([0.0, 0.0, 30.0])
        w, cfg = build_window(gt, jnp.asarray(lms, DT), RIG, with_depth=True)
        poses0 = np.array(w.poses)
        poses0[2:5, 4] += rng.normal(0, 0.1, 3)   # x only (in-plane)
        w = w._replace(poses=jnp.asarray(poses0, DT))
        cfg = self._cfg_with_mode(cfg, "circular_2d")
        sel = default_selection(w)
        cost0 = float(assemble(w, sel, RIG, cfg)[0].cost)
        w2, cost, _, acc = jax.jit(lambda w, s: run_lm(w, s, RIG, cfg, 40))(w, sel)
        assert int(acc) > 0
        assert float(cost) < 0.5 * cost0, (float(cost), cost0)
        # invariants of the parameterization: z-translation frozen, rotation
        # stays a pure z-rotation
        np.testing.assert_allclose(np.asarray(w2.poses[:5, 6]),
                                   np.asarray(w.poses[:5, 6]), atol=1e-12)
        qxqy = np.abs(np.asarray(w2.poses[:5, 1:3]))
        assert qxqy.max() < 1e-9, qxqy


class TestPoseOnlyLandmarkWeight:
    """adjustPoseOnly applies ScaledLoss(CauchyLoss, landmark.weight)
    (bundle_adjuster_keyframes.cpp:589-591,832): a down-weighted outlier
    landmark must drag the motion-only pose less than a full-weight one."""

    def _setup(self, rng):
        from limo_tpu.solver import pose_only_step

        gt = make_gt_poses()
        lms = make_landmarks(rng, n=24)           # < 30 groups: no trimming
        pose_gt = gt[2]
        tcv = RIG.T_cam_veh[0]
        pcam = pose_ops.apply(tcv, pose_ops.apply(pose_gt, lms))
        uv = F * pcam[:, :2] / pcam[:, 2:3] + jnp.array([CX, CY], DT)
        obs = np.zeros((lms.shape[0], 1, 3))
        obs[:, 0, :2] = np.asarray(uv)
        obs[:, 0, 2] = -1.0
        # one gross outlier track (e.g. a feature on a moving object)
        obs[0, 0, :2] += 80.0
        mask = np.ones((lms.shape[0], 1), bool)
        prior = np.asarray(pose_gt)
        prior = prior.copy()
        prior[4:] += np.array([0.3, -0.2, 0.1])
        cfg = default_config()
        return pose_only_step, jnp.asarray(prior, DT), lms, \
            jnp.asarray(obs, DT), jnp.asarray(mask), \
            jnp.ones((lms.shape[0],), bool), cfg, pose_gt

    def test_downweighted_outlier_drags_less(self, rng):
        step, prior, lms, obs, mask, lm_mask, cfg, pose_gt = self._setup(rng)
        w_full = jnp.ones((lms.shape[0],), DT)
        w_down = w_full.at[0].set(0.1)
        res_full = step(prior, lms, obs, mask, lm_mask, RIG, cfg,
                        max_iters=8, lm_weight=w_full)
        res_down = step(prior, lms, obs, mask, lm_mask, RIG, cfg,
                        max_iters=8, lm_weight=w_down)
        err_full = float(jnp.linalg.norm(res_full.pose[4:] - pose_gt[4:]))
        err_down = float(jnp.linalg.norm(res_down.pose[4:] - pose_gt[4:]))
        assert err_down < err_full, (err_down, err_full)
        assert err_down < 0.02, err_down

    def test_default_weight_matches_ones(self, rng):
        step, prior, lms, obs, mask, lm_mask, cfg, _ = self._setup(rng)
        res_none = step(prior, lms, obs, mask, lm_mask, RIG, cfg, max_iters=4)
        res_ones = step(prior, lms, obs, mask, lm_mask, RIG, cfg, max_iters=4,
                        lm_weight=jnp.ones((lms.shape[0],), DT))
        np.testing.assert_allclose(np.asarray(res_none.pose),
                                   np.asarray(res_ones.pose), atol=1e-12)


class TestPoseOnlyGraduatedInit:
    """Graduated non-convexity for the scan path's motion-only solve
    (SolverConfig.scan_pose_only_graduated_init). NOTE on coverage: a
    clean single-pose setup does NOT discriminate — with near-uniform
    residual magnitudes the Cauchy weights cancel in the damped Newton
    step (H and g scale together), so even a 2° turn-onset prior recovers
    at any schedule; the failure the schedule fixes only manifests inside
    the full drive (stale window landmarks + guided-match dropouts +
    noise, docs/PERF.md km-drive analysis) and is gated there by the km
    rendered-drive test. Here we pin the OFF case: graduated_init=1.0
    must be bit-identical to the default (reference adjustPoseOnly
    behavior, bundle_adjuster_keyframes.cpp:832)."""

    def _setup(self, rng):
        from limo_tpu.solver import pose_only_step

        gt = make_gt_poses()
        lms = make_landmarks(rng, n=24)
        pose_gt = gt[2]
        tcv = RIG.T_cam_veh[0]
        pcam = pose_ops.apply(tcv, pose_ops.apply(pose_gt, lms))
        uv = F * pcam[:, :2] / pcam[:, 2:3] + jnp.array([CX, CY], DT)
        obs = np.zeros((lms.shape[0], 1, 3))
        obs[:, 0, :2] = np.asarray(uv)
        obs[:, 0, 2] = -1.0
        mask = np.ones((lms.shape[0], 1), bool)
        # turn-onset prior: ~2° yaw error => ~f*tan(2°) ≈ 16 px, every
        # residual far outside the 1.6 px Cauchy scale
        dyaw = np.radians(2.0)
        qerr = np.array([np.cos(dyaw / 2), 0.0, 0.0, np.sin(dyaw / 2)])
        prior = np.asarray(pose_gt).copy()
        w, x, y, z = prior[:4]
        a, b, c, d = qerr
        prior[:4] = [a * w - b * x - c * y - d * z,
                     a * x + b * w + c * z - d * y,
                     a * y - b * z + c * w + d * x,
                     a * z + b * y - c * x + d * w]
        cfg = default_config()
        return pose_only_step, jnp.asarray(prior, DT), lms, \
            jnp.asarray(obs, DT), jnp.asarray(mask), \
            jnp.ones((lms.shape[0],), bool), cfg, pose_gt

    def _yaw_err_deg(self, pose, pose_gt):
        d = abs(float(jnp.dot(pose[:4], pose_gt[:4])))
        return np.degrees(2 * np.arccos(min(d, 1.0)))

    def test_graduated_recovers_turn_onset_in_budget(self, rng):
        # the schedule must not HURT the benign case either: a 2° turn
        # onset recovers within the ≤4-iteration reference budget at both
        # settings on clean residuals
        step, prior, lms, obs, mask, lm_mask, cfg, pose_gt = self._setup(rng)
        res_plain = step(prior, lms, obs, mask, lm_mask, RIG, cfg,
                         max_iters=4)
        res_gnc = step(prior, lms, obs, mask, lm_mask, RIG, cfg,
                       max_iters=4, graduated_init=8.0)
        assert self._yaw_err_deg(res_plain.pose, pose_gt) < 0.05
        assert self._yaw_err_deg(res_gnc.pose, pose_gt) < 0.05

    def test_ginit_one_is_reference_behavior(self, rng):
        step, prior, lms, obs, mask, lm_mask, cfg, _ = self._setup(rng)
        res_def = step(prior, lms, obs, mask, lm_mask, RIG, cfg, max_iters=4)
        res_one = step(prior, lms, obs, mask, lm_mask, RIG, cfg, max_iters=4,
                       graduated_init=1.0)
        np.testing.assert_allclose(np.asarray(res_def.pose),
                                   np.asarray(res_one.pose), atol=1e-12)

    def test_rotrocc_on_converges_at_curve_scale(self, rng):
        """VERDICT r4 item 7 (accept behavior): with RotRocc ON
        (compensate_rotation=True — the reference's adjustPoseOnly default,
        bundle_adjuster_keyframes.cpp:832), the motion-only solve at a 2°
        curve-scale rotation deficit must still ACCEPT and converge within
        the ≤4-iteration reference budget. The divisor (rot-only error
        norm, ~tens of px at this magnitude) scales every inlier residual
        well below the Cauchy knee, so the problem is near-quadratic —
        divergence here would indicate a sign/normalization bug in the
        divisor (the hypothesis VERDICT r4 asked to rule out). Companion
        to the hand-computed divisor pin in
        test_residuals.py::test_rotrocc_curve_scale_hand_computed."""
        step, prior, lms, obs, mask, lm_mask, cfg, pose_gt = self._setup(rng)
        res = step(prior, lms, obs, mask, lm_mask, RIG, cfg, max_iters=4,
                   compensate_rotation=True)
        # converged: the 2° deficit is recovered (same bar as RotRocc OFF)
        assert self._yaw_err_deg(res.pose, pose_gt) < 0.05
        # and the translation did not drift off under the divisor's
        # reduced translation observability
        assert float(jnp.linalg.norm(res.pose[4:] - pose_gt[4:])) < 0.05
