"""Full-fidelity scan-program tests: the compiled lax.scan path must run the
SAME solve stack as the host pipeline — semantic label flow (updateLabels,
bundle_adjuster_keyframes.cpp:388-431), voxel/AddDepth selection
(solve():641-643), groundplane scale fusion (addGroundPlaneResiduals
:517-562 — the limo2 feature), and connectivity-based keyframe deactivation
(:907-987)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from limo_tpu.config import (CapacityConfig, LandmarkSelectionConfig,
                             LimoConfig)
from limo_tpu.geometry.camera import CameraRig
from limo_tpu.pipeline import scan_odometry as so
from limo_tpu.pipeline.metrics import ate_rmse
from limo_tpu.pipeline.synthetic import dense_tracks, make_world

R = 512


def _cfg(**kw):
    return LimoConfig(
        capacity=CapacityConfig(max_keyframes=12, max_landmarks=R,
                                max_cameras=1),
        landmark_selection=LandmarkSelectionConfig(height_over_ground=1.65),
        **kw)


def _rig(world):
    return CameraRig(
        focal=jnp.asarray([world.focal], jnp.float32),
        principal=jnp.asarray([world.principal], jnp.float32),
        T_cam_veh=jnp.asarray([world.T_cam_veh], jnp.float32))


class TestLabelFlow:
    def test_labels_reach_window_state(self):
        """Ground labels → lm_is_gp; shrubbery → lm_weight; outlier labels
        (cityscapes 26 'car') → lm_outlier, excluded from selection."""
        world = make_world(num_frames=40, n_landmarks=220, n_ground=80,
                           n_shrubbery=40, n_dynamic=30, seed=5)
        cfg = _cfg()
        rig = _rig(world)
        stamps, uvd, valid, labels = dense_tracks(
            world, R, with_depth=True, seed=6, with_labels=True)
        st, out = so.run_sequence(stamps, uvd, valid, rig, cfg, labels=labels)
        w = jax.device_get(st.window)
        lm_outlier = np.asarray(st.lm_outlier)
        lab = np.asarray(world.labels)
        M = lab.shape[0]

        # rows valid in the final window, by their world label
        ground_rows = (lab == 7)
        shrub_rows = (lab == 21)
        dyn_rows = (lab == 26)
        v = np.asarray(w.lm_valid)[:M]
        assert np.any(v & ground_rows), "no ground landmarks survived"
        # ground-labeled valid rows carry the gp flag
        assert np.all(np.asarray(w.lm_is_gp)[:M][v & ground_rows])
        # shrubbery rows carry the downweight
        sw = cfg.regularization.shrubbery_weight
        shrub_v = v & shrub_rows
        if np.any(shrub_v):
            np.testing.assert_allclose(np.asarray(w.lm_weight)[:M][shrub_v],
                                       sw, atol=1e-6)
        # observed dynamic rows are flagged outliers and never selected
        obs_dyn = dyn_rows & np.asarray(valid).any(0)[:M]
        assert np.all(lm_outlier[:M][obs_dyn])
        assert not np.any(np.asarray(st.sel_mask)[:M] & obs_dyn)
        # accuracy: labeled outliers must not wreck the trajectory
        ate = ate_rmse(world.kitti_gt(), so.poses_kitti(out))
        assert ate < 0.3, ate

    def test_gp_residuals_active(self):
        """With ground labels the solve must actually wire gp height
        residuals (lm_is_gp ∧ selected ∧ gp_weight > 0 — the limo2 scale
        fusion path)."""
        world = make_world(num_frames=40, n_landmarks=200, n_ground=100,
                           seed=7)
        cfg = _cfg()
        rig = _rig(world)
        stamps, uvd, valid, labels = dense_tracks(
            world, R, with_depth=True, seed=8, with_labels=True)
        st, out = so.run_sequence(stamps, uvd, valid, rig, cfg, labels=labels)
        sel = np.asarray(st.sel_mask)
        is_gp = np.asarray(st.window.lm_is_gp)
        assert int(np.sum(sel & is_gp)) >= 20, int(np.sum(sel & is_gp))


class TestGroundplaneScaleFusion:
    def test_gp_recovers_metric_scale_mono(self):
        """Mono (no depth) with a wrong-scale external prior: groundplane
        fusion (plane fixed at height_over_ground, gp height residuals)
        must pull the trajectory back to metric scale; without labels the
        scale error of the prior persists. Reference mechanism:
        bundle_adjuster_keyframes.cpp:703-737 (plane distances fixed when
        few depth residuals) + addGroundPlaneResiduals."""
        world = make_world(num_frames=60, n_landmarks=250, n_ground=120,
                           seed=11)
        cfg = _cfg()
        rig = _rig(world)
        F = world.poses_veh.shape[0]
        stamps, uvd, valid, labels = dense_tracks(
            world, R, with_depth=False, seed=12, with_labels=True)
        # bootstrap-only prior with a 1.3x scale error: the mono map
        # initializes at the wrong scale, then the motion model takes over —
        # only the groundplane can pull the map back to metric
        priors = np.asarray(world.poses_veh).copy()
        priors[:, 4:] *= 1.3
        prior_valid = np.zeros(F, bool)
        prior_valid[:10] = True

        def scale_err(out):
            est = so.poses_kitti(out)
            gt = world.kitti_gt()
            d_est = np.linalg.norm(np.diff(est[30:, :3, 3], axis=0), axis=1)
            d_gt = np.linalg.norm(np.diff(gt[30:, :3, 3], axis=0), axis=1)
            return abs(float(d_est.sum() / d_gt.sum()) - 1.0)

        _, out_gp = so.run_sequence(stamps, uvd, valid, rig, cfg,
                                    priors=priors, prior_valid=prior_valid,
                                    labels=labels)
        _, out_no = so.run_sequence(stamps, uvd, valid, rig, cfg,
                                    priors=priors, prior_valid=prior_valid)
        e_gp, e_no = scale_err(out_gp), scale_err(out_no)
        assert e_gp < 0.5 * e_no, (e_gp, e_no)
        assert e_gp < 0.08, e_gp


class TestConnectivityWindowing:
    def test_window_invariants(self):
        """deactivateKeyframes semantics in the scan: ≤ max_window active
        keyframes, exactly one Pose-fixed (the oldest active) and one
        Scale-fixed (second oldest)."""
        world = make_world(num_frames=80, n_landmarks=300, n_ground=80,
                           seed=13)
        cfg = _cfg()
        rig = _rig(world)
        stamps, uvd, valid = dense_tracks(world, R, with_depth=True, seed=14)
        st, out = so.run_sequence(stamps, uvd, valid, rig, cfg)
        w = jax.device_get(st.window)
        valid_kf = np.asarray(w.kf_valid)
        n_active = int(valid_kf.sum())
        assert 3 <= n_active <= cfg.window.max_size_optimization_window
        fp = np.asarray(w.fix_pose)
        fs = np.asarray(w.fix_scale)
        assert int(fp.sum()) == 1 and int(fs.sum()) == 1
        stamps_w = np.asarray(w.stamps)
        order = np.argsort(np.where(valid_kf, stamps_w, np.inf))
        assert fp[order[0]] and fs[order[1]]
        # active landmarks are window-observed only
        lm_v = np.asarray(w.lm_valid)
        obs_any = np.asarray(w.obs_mask).any(-1) & valid_kf[None, :]
        assert np.all(~lm_v | obs_any.any(1))
        # trajectory still accurate across many evictions
        ate = ate_rmse(world.kitti_gt(), so.poses_kitti(out))
        assert ate < 0.4, ate
