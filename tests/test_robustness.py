"""Chaos tests for the defensive behaviors (SURVEY §5: 5-point failure →
no-motion fallback, empty/degenerate input frames, sensor outages,
checkpoint/resume mid-sequence). The reference handles these with
exceptions-and-continue in the ROS callback (mono_lidar.cpp:119-150,
general_helpers.hpp:111-124); the TPU drivers must survive the same abuse."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from limo_tpu.config import CapacityConfig, LandmarkSelectionConfig, LimoConfig
from limo_tpu.geometry.camera import CameraRig
from limo_tpu.pipeline.odometry import LidarOdometry, MonoOdometry
from limo_tpu.pipeline.synthetic import SyntheticTracker, make_world
from limo_tpu.pipeline.tracklets import Tracklets

DT = jnp.float64


def make_setup(num_frames=20, seed=0, with_depth=True):
    world = make_world(num_frames=num_frames, speed=8.0, yaw_rate=0.015,
                       n_landmarks=300, n_ground=100, seed=seed)
    rig = CameraRig.single(world.focal, world.principal[0], world.principal[1],
                           T_cam_veh=jnp.asarray(world.T_cam_veh, DT), dtype=DT)
    cfg = LimoConfig(
        capacity=CapacityConfig(max_keyframes=10, max_landmarks=512,
                                max_cameras=1),
        landmark_selection=dataclasses.replace(
            LandmarkSelectionConfig(), height_over_ground=1.65))
    tracker = SyntheticTracker(world, with_depth=with_depth, pixel_noise=0.3,
                               label_ground=with_depth)
    return world, rig, cfg, tracker


def empty_frame(stamp):
    tr = Tracklets.empty(window=1)
    tr.stamps = np.array([stamp])
    return tr


class TestInputChaos:
    def test_empty_tracklets_mid_sequence(self):
        """Frames with zero tracks (tracker dropout) must not crash or
        corrupt the trajectory (reference: getMatches returns empty,
        5-point falls back to no-motion)."""
        world, rig, cfg, tracker = make_setup()
        odo = LidarOdometry(rig, cfg, DT)
        for i in range(12):
            if i in (4, 5):  # total tracker outage for two frames
                odo.process_frame(float(world.stamps[i]),
                                  empty_frame(float(world.stamps[i])))
            else:
                tracker.observe(i)
                odo.process_frame(float(world.stamps[i]), tracker.tracklets())
        assert len(odo.trajectory) == 12
        est = odo.poses_kitti()
        assert np.isfinite(est).all()
        # after the outage the pipeline keeps keyframing and solving
        assert sum(r.is_keyframe for r in odo.trajectory[6:]) >= 2
        assert sum(r.solved for r in odo.trajectory) >= 1

    def test_depth_outage_degrades_to_mono(self):
        """Lidar dies mid-run: depths vanish from the tracklets; the solver
        must keep converging on reprojection + scale regularization."""
        world, rig, cfg, tracker = make_setup()
        odo = LidarOdometry(rig, cfg, DT)
        for i in range(14):
            tracker.observe(i)
            tr = tracker.tracklets()
            if i >= 7:  # depth outage
                uvd = tr.uvd.copy()
                uvd[..., 2] = -1.0
                tr = Tracklets(stamps=tr.stamps, uvd=uvd, mask=tr.mask,
                               ids=tr.ids, age=tr.age,
                               is_outlier=tr.is_outlier, label=tr.label)
            odo.process_frame(float(world.stamps[i]), tr)
        est = odo.poses_kitti()
        assert np.isfinite(est).all()
        assert sum(r.solved for r in odo.trajectory) >= 2

    def test_all_outlier_labels(self):
        """Every track labeled as a dynamic-object outlier: nothing usable
        for matching; must fall back to no-motion priors, not crash."""
        world, rig, cfg, tracker = make_setup(num_frames=8)
        odo = MonoOdometry(rig, cfg, DT)
        for i in range(6):
            tracker.observe(i)
            tr = tracker.tracklets()
            tr = Tracklets(stamps=tr.stamps, uvd=tr.uvd, mask=tr.mask,
                           ids=tr.ids, age=tr.age,
                           is_outlier=np.ones_like(tr.is_outlier),
                           label=tr.label)
            odo.process_frame(float(world.stamps[i]), tr)
        assert len(odo.trajectory) == 6
        assert np.isfinite(odo.poses_kitti()).all()

    def test_single_track_frames(self):
        """Degenerate geometry (1 track): below every scheme's minimum;
        pipeline survives and reports finite poses."""
        world, rig, cfg, tracker = make_setup(num_frames=8)
        odo = MonoOdometry(rig, cfg, DT)
        for i in range(6):
            tracker.observe(i)
            tr = tracker.tracklets()
            keep = np.zeros(tr.uvd.shape[0], bool)
            if keep.size:
                keep[0] = True
            tr = Tracklets(stamps=tr.stamps, uvd=tr.uvd[keep],
                           mask=tr.mask[keep], ids=tr.ids[keep],
                           age=tr.age[keep], is_outlier=tr.is_outlier[keep],
                           label=tr.label[keep])
            odo.process_frame(float(world.stamps[i]), tr)
        assert np.isfinite(odo.poses_kitti()).all()


class TestCheckpointMidSequence:
    def test_resume_continues_equivalently(self, tmp_path):
        """Checkpoint after frame k, resume in a fresh adjuster, continue —
        the resumed run must track the uninterrupted one."""
        from limo_tpu.utils.checkpoint import load_adjuster, save_adjuster

        world, rig, cfg, tracker = make_setup(num_frames=20, seed=2)
        odo_a = LidarOdometry(rig, cfg, DT)
        for i in range(20):
            tracker.observe(i)
            odo_a.process_frame(float(world.stamps[i]), tracker.tracklets())

        # interrupted twin: process 10 frames, checkpoint, resume, continue
        tracker_b = SyntheticTracker(world, with_depth=True, pixel_noise=0.3,
                                     label_ground=True)
        odo_b = LidarOdometry(rig, cfg, DT)
        for i in range(10):
            tracker_b.observe(i)
            odo_b.process_frame(float(world.stamps[i]), tracker_b.tracklets())
        p = str(tmp_path / "mid.npz")
        save_adjuster(odo_b.adjuster, p)

        odo_c = LidarOdometry(rig, cfg, DT)
        load_adjuster(odo_c.adjuster, p)
        # carry over the host-side trajectory/solve throttle state
        odo_c.trajectory = list(odo_b.trajectory)
        odo_c._last_solve_stamp = odo_b._last_solve_stamp
        odo_c._last_frame_stamp = odo_b._last_frame_stamp
        for i in range(10, 20):
            tracker_b.observe(i)
            odo_c.process_frame(float(world.stamps[i]), tracker_b.tracklets())

        est_a = odo_a.poses_kitti()
        est_c = odo_c.poses_kitti()
        # same inputs, same state → same trajectory (f64, identical programs)
        np.testing.assert_allclose(est_c[:, :3, 3], est_a[:, :3, 3],
                                   atol=1e-6)
