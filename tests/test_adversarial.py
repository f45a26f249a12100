"""Adversarial synthetic accuracy gates: each robustness mechanism must
EARN ITS KEEP — the e2e drift must degrade when the mechanism is disabled
and stay bounded when it is on (VERDICT r1 item 2; reference test pattern:
keyframe_bundle_adjustment.cpp:288-417 with noise/outlier injection).

Scenarios:
- heavy-tailed depth outliers + unlabeled dynamic objects → trimming
  (solveTrimmed quantile rejection, robust_solving.cpp:140-248)
- labeled dynamic objects (cityscapes 'car' 26) → semantic outlier labels
  (updateLabels, bundle_adjuster_keyframes.cpp:388-431)
- lidar dropout stretch (mono-only segment) → groundplane scale fusion
  (addGroundPlaneResiduals :517-562, the limo2 feature)
"""

import dataclasses

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


def _cfg():
    return LimoConfig(
        capacity=CapacityConfig(max_keyframes=12, max_landmarks=R,
                                max_cameras=1),
        landmark_selection=LandmarkSelectionConfig(height_over_ground=1.65))


def _rig(world):
    return CameraRig(
        focal=jnp.asarray([world.focal], jnp.float32),
        principal=jnp.asarray([world.principal], jnp.float32),
        T_cam_veh=jnp.asarray([world.T_cam_veh], jnp.float32))


def _ate(world, out):
    return ate_rmse(world.kitti_gt(), so.poses_kitti(out))


class TestTrimmingGate:
    def test_depth_outliers_need_trimming(self):
        """10% heavy-tailed lidar failures: quantile trimming keeps drift
        bounded; with trimming disabled the same data degrades the
        trajectory."""
        world = make_world(num_frames=50, n_landmarks=280, n_ground=80,
                           seed=21)
        cfg = _cfg()
        rig = _rig(world)
        stamps, uvd, valid = dense_tracks(
            world, R, with_depth=True, seed=22, depth_outlier_fraction=0.10)
        no_trim = dataclasses.replace(cfg, robust=dataclasses.replace(
            cfg.robust, num_trim_iterations=0))
        _, out_trim = so.run_sequence(stamps, uvd, valid, rig, cfg)
        _, out_no = so.run_sequence(stamps, uvd, valid, rig, no_trim)
        a_trim, a_no = _ate(world, out_trim), _ate(world, out_no)
        assert a_trim < a_no, (a_trim, a_no)
        assert a_trim < 0.35, a_trim


class TestSemanticLabelGate:
    def test_dynamic_objects_need_labels(self):
        """Coherently-moving object clusters at ~20% of tracks overwhelm the
        5%-per-round quantile trim; the semantic outlier labels must carry
        the rejection (the reference's outlier_labels.yaml mechanism)."""
        world = make_world(num_frames=50, n_landmarks=240, n_ground=70,
                           n_dynamic=80, dynamic_speed=6.0, seed=23)
        cfg = _cfg()
        rig = _rig(world)
        stamps, uvd, valid, labels = dense_tracks(
            world, R, with_depth=True, seed=24, with_labels=True)
        _, out_lab = so.run_sequence(stamps, uvd, valid, rig, cfg,
                                     labels=labels)
        _, out_no = so.run_sequence(stamps, uvd, valid, rig, cfg)
        a_lab, a_no = _ate(world, out_lab), _ate(world, out_no)
        assert a_lab < a_no, (a_lab, a_no)
        assert a_lab < 0.35, a_lab


class TestGroundplaneDropoutGate:
    def test_gp_holds_scale_through_lidar_outage(self):
        """Lidar dies for a 30-frame stretch (mono-only): scale must ride
        the groundplane constraint; without ground labels the scale drifts
        during the outage. This is limo2's reason to exist (README.md:61-63:
        groundplane + lidar scale fusion)."""
        world = make_world(num_frames=70, n_landmarks=280, n_ground=120,
                           seed=25)
        cfg = _cfg()
        rig = _rig(world)
        stamps, uvd, valid, labels = dense_tracks(
            world, R, with_depth=True, seed=26, with_labels=True,
            depth_dropout=(20, 50))

        def seg_scale_err(out):
            est = so.poses_kitti(out)
            gt = world.kitti_gt()
            d_est = np.linalg.norm(np.diff(est[20:50, :3, 3], axis=0), axis=1)
            d_gt = np.linalg.norm(np.diff(gt[20:50, :3, 3], axis=0), axis=1)
            return abs(float(d_est.sum() / d_gt.sum()) - 1.0)

        _, out_gp = so.run_sequence(stamps, uvd, valid, rig, cfg,
                                    labels=labels)
        _, out_no = so.run_sequence(stamps, uvd, valid, rig, cfg)
        e_gp, e_no = seg_scale_err(out_gp), seg_scale_err(out_no)
        # mono stretch: without gp the (weak) scale chain lets error grow;
        # with gp fusion the outage segment stays near metric
        assert e_gp < 0.05, (e_gp, e_no)
        assert e_gp <= e_no + 1e-3, (e_gp, e_no)
        assert _ate(world, out_gp) < 0.5


class TestShrubberyGate:
    def test_shrubbery_downweight_helps(self):
        """Vegetation with 3 px match jitter at ~25% of tracks: the
        shrubbery weight (launch value 0.9; here an aggressive 0.2 to make
        the effect decisive at this scale) must reduce drift vs weight 1.0
        (= labels ignored)."""
        world = make_world(num_frames=50, n_landmarks=200, n_ground=70,
                           n_shrubbery=90, seed=27)
        cfg = _cfg()
        rig = _rig(world)
        stamps, uvd, valid, labels = dense_tracks(
            world, R, with_depth=True, seed=28, with_labels=True,
            shrubbery_px_noise=3.0)
        cfg_dn = dataclasses.replace(cfg, regularization=dataclasses.replace(
            cfg.regularization, shrubbery_weight=0.2))
        cfg_off = dataclasses.replace(cfg, regularization=dataclasses.replace(
            cfg.regularization, shrubbery_weight=1.0))
        _, out_dn = so.run_sequence(stamps, uvd, valid, rig, cfg_dn,
                                    labels=labels)
        _, out_off = so.run_sequence(stamps, uvd, valid, rig, cfg_off,
                                     labels=labels)
        a_dn, a_off = _ate(world, out_dn), _ate(world, out_off)
        assert a_dn < a_off, (a_dn, a_off)
        assert a_dn < 0.35, a_dn
