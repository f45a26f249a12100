"""End-to-end pipeline tests: synthetic sequence → odometry → trajectory.

The reference's system-level gate is KITTI drift via the eval scripts
(SURVEY §3.5/§4.5); with no dataset in the image we gate on a synthetic
KITTI-like world (generator mirrors the reference test recipe scaled up to a
full sequence) and assert ATE / drift bounds."""

import jax.numpy as jnp
import numpy as np
import pytest

import dataclasses

from limo_tpu.config import LandmarkSelectionConfig, LimoConfig
from limo_tpu.geometry.camera import CameraRig
from limo_tpu.pipeline.metrics import ate_rmse, kitti_drift
from limo_tpu.pipeline.odometry import LidarOdometry, MonoOdometry
from limo_tpu.pipeline.synthetic import SyntheticTracker, make_world

DT = jnp.float64


def run_pipeline(odo_cls, with_depth, num_frames=40, seed=0, **tracker_kw):
    world = make_world(num_frames=num_frames, speed=8.0, yaw_rate=0.015,
                       n_landmarks=500, n_ground=150, seed=seed)
    rig = CameraRig.single(world.focal, world.principal[0], world.principal[1],
                           T_cam_veh=jnp.asarray(world.T_cam_veh, DT), dtype=DT)
    # the groundplane prior must match the rig geometry (reference
    # height_over_ground param): synthetic ground lies 1.65 m below the
    # vehicle origin
    cfg = LimoConfig(landmark_selection=dataclasses.replace(
        LandmarkSelectionConfig(), height_over_ground=1.65))
    odo = odo_cls(rig, cfg, dtype=DT)
    tracker = SyntheticTracker(world, with_depth=with_depth, **tracker_kw)
    for i in range(num_frames):
        tracker.observe(i)
        tl = tracker.tracklets()
        odo.process_frame(world.stamps[i], tl)
    est = odo.poses_kitti()
    gt = world.kitti_gt()
    return world, odo, est, gt


class TestMonoPipeline:
    def test_short_clip_ate(self, rng):
        world, odo, est, gt = run_pipeline(MonoOdometry, with_depth=False,
                                           num_frames=40, pixel_noise=0.2,
                                           label_ground=False)
        n_kf = sum(1 for f in odo.trajectory if f.is_keyframe)
        n_solved = sum(1 for f in odo.trajectory if f.solved)
        assert n_kf >= 5, n_kf
        assert n_solved >= 2, n_solved
        # mono scale drifts; ATE with similarity alignment must be tight
        err = ate_rmse(gt, est, with_scale=True)
        assert err < 1.0, err

    def test_trajectory_length(self):
        world, odo, est, gt = run_pipeline(MonoOdometry, with_depth=False,
                                           num_frames=25, pixel_noise=0.2,
                                           label_ground=False)
        assert est.shape[0] == 25
        # trajectory actually moves
        assert np.linalg.norm(est[-1][:3, 3] - est[0][:3, 3]) > 3.0


class TestLidarPipeline:
    def test_depth_fixes_scale(self, rng):
        world, odo, est, gt = run_pipeline(LidarOdometry, with_depth=True,
                                           num_frames=40, pixel_noise=0.2,
                                           depth_noise=0.03)
        # metric scale observed: rigid (no-scale) ATE must be small
        err = ate_rmse(gt, est, with_scale=False)
        assert err < 1.0, err
        # drift over the ~32 m clip
        gt_len = np.linalg.norm(np.diff(gt[:, :3, 3], axis=0), axis=1).sum()
        end_err = np.linalg.norm(est[-1][:3, 3] - gt[-1][:3, 3])
        assert end_err / gt_len < 0.05, (end_err, gt_len)


class TestMetrics:
    def test_ate_identity(self):
        p = np.tile(np.eye(4), (10, 1, 1))
        p[:, 0, 3] = np.arange(10)
        assert ate_rmse(p, p) < 1e-12

    def test_ate_alignment_invariance(self, rng):
        p = np.tile(np.eye(4), (20, 1, 1))
        p[:, :3, 3] = rng.normal(size=(20, 3)) * 10
        # rotate the whole trajectory — aligned ATE stays ~0
        th = 0.7
        R = np.array([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
        q = p.copy()
        q[:, :3, 3] = p[:, :3, 3] @ R.T + np.array([5.0, -3.0, 2.0])
        assert ate_rmse(p, q) < 1e-9

    def test_kitti_drift_zero_for_exact(self):
        n = 300
        p = np.tile(np.eye(4), (n, 1, 1))
        p[:, 0, 3] = np.arange(n) * 0.5  # 150 m straight
        out = kitti_drift(p, p)
        assert out["num_segments"] > 0
        assert out["t_err_percent"] < 1e-9

    def test_kitti_drift_detects_scale_error(self):
        n = 300
        p = np.tile(np.eye(4), (n, 1, 1))
        p[:, 0, 3] = np.arange(n) * 0.5
        q = p.copy()
        q[:, 0, 3] *= 0.95  # 5% scale error
        out = kitti_drift(p, q)
        assert abs(out["t_err_percent"] - 5.0) < 0.5


class TestTrackletBuilderBounds:
    def test_dead_tracks_garbage_collected(self):
        """Regression: an unbounded stamp list made keep_window grow with
        total frames, so dead tracks were never GC'd and the track table
        (and to_tracklets row count) grew without bound."""
        from limo_tpu.pipeline.tracklets import TrackletBuilder

        b = TrackletBuilder(max_track_length=10)
        n_per = 8
        for t in range(300):
            # every frame spawns all-new tracks (prev_match = -1)
            uv = np.random.default_rng(t).uniform(0, 100, (n_per, 2))
            b.push_frame(float(t), uv, np.full((n_per,), -1, np.int64))
        assert len(b._stamps) <= 10
        # live + dead-within-window tracks only: bounded, not 300*8
        assert len(b._tracks) <= n_per * 10
        tl = b.to_tracklets()
        assert tl.uvd.shape[0] <= n_per * 10

    def test_long_tracks_survive(self):
        from limo_tpu.pipeline.tracklets import TrackletBuilder

        b = TrackletBuilder(max_track_length=10)
        uv = np.array([[5.0, 5.0]])
        b.push_frame(0.0, uv)
        for t in range(1, 30):
            b.push_frame(float(t), uv + t, np.array([0]))
        tl = b.to_tracklets()
        assert tl.uvd.shape[0] == 1          # one continuous track
        assert int(tl.age[0]) >= 9           # capped history, still old


class TestPaddedMatches:
    def test_matched_rows_survive_truncation(self):
        """Regression: head-truncation at capacity kept the lowest track
        ids (dead tracks) and starved the flow/essential gates."""
        import dataclasses as dc
        import jax.numpy as jnp
        from limo_tpu.config import CapacityConfig, LimoConfig
        from limo_tpu.geometry.camera import CameraRig
        from limo_tpu.pipeline.odometry import MonoOdometry
        from limo_tpu.pipeline.tracklets import Tracklets

        cap = 16
        cfg = LimoConfig(capacity=CapacityConfig(max_keyframes=5,
                                                 max_landmarks=cap,
                                                 max_cameras=1))
        odo = MonoOdometry(CameraRig.single(100.0, 50.0, 50.0), cfg)
        n = 64  # tracks exceed capacity; only the LAST few are matched
        uvd = np.zeros((n, 2, 3))
        uvd[..., 2] = -1.0
        mask = np.zeros((n, 2), bool)
        mask[-8:, :] = True                 # newest (highest-id) tracks
        uvd[-8:, :, :2] = np.random.default_rng(0).uniform(10, 90, (8, 2, 2))
        tl = Tracklets(stamps=np.array([1.0, 0.0]), uvd=uvd,
                       mask=mask, ids=np.arange(n, dtype=np.int64),
                       age=np.zeros(n, np.int32),
                       is_outlier=np.zeros(n, bool),
                       label=np.full(n, -2, np.int32))
        out = odo._padded_matches(tl, 1.0, 0.0)
        assert out is not None
        uv_a, uv_b, m = out
        assert uv_a.shape == (cap, 2) and m.shape == (cap,)
        assert int(m.sum()) == 8            # ALL matched rows kept
        assert np.all(uv_a[m] > 0)          # and they carry the real pixels


class TestArchiveConsistency:
    def test_archived_poses_frozen_and_dump_monotonic(self):
        """Evicted keyframes' poses are archived AT EVICTION TIME and must
        never change afterwards (later solves touch only active keyframes),
        and the per-frame KITTI dump stays time-monotonic and complete — the
        reference dumps each pose at frame time (mono_lidar.cpp:275-300),
        same semantics (VERDICT r1 item 10)."""
        import dataclasses as dc

        from limo_tpu.config import CapacityConfig, WindowConfig

        num_frames = 40
        world = make_world(num_frames=num_frames, speed=8.0, yaw_rate=0.015,
                           n_landmarks=400, n_ground=120, seed=6)
        rig = CameraRig.single(world.focal, world.principal[0],
                               world.principal[1],
                               T_cam_veh=jnp.asarray(world.T_cam_veh, DT),
                               dtype=DT)
        cfg = LimoConfig(
            capacity=CapacityConfig(max_keyframes=6, max_landmarks=1536),
            window=dc.replace(WindowConfig(),
                              max_size_optimization_window=6),
            landmark_selection=dataclasses.replace(
                LandmarkSelectionConfig(), height_over_ground=1.65))
        odo = LidarOdometry(rig, cfg, dtype=DT)
        tracker = SyntheticTracker(world, with_depth=True)
        frozen = {}
        for i in range(num_frames):
            tracker.observe(i)
            odo.process_frame(world.stamps[i], tracker.tracklets())
            for st, pose in odo.adjuster._archive.items():
                if st in frozen:
                    np.testing.assert_array_equal(frozen[st], pose, err_msg=(
                        f"archived pose for stamp {st} mutated after "
                        f"eviction at frame {i}"))
                else:
                    frozen[st] = pose.copy()
        assert len(frozen) >= 5, "window too large — no evictions exercised"

        stamps_out = np.array([f.stamp for f in odo.trajectory])
        assert np.all(np.diff(stamps_out) > 0), "dump not time-monotonic"
        est = odo.poses_kitti()
        assert est.shape == (num_frames, 4, 4)
        assert np.all(np.isfinite(est))
        # the dump's keyframe poses at eviction agree with the archive
        # (same stamp → same pose the adjuster froze)
        stamp_to_frame = {f.stamp: k for k, f in enumerate(odo.trajectory)}
        checked = 0
        for st, pose in frozen.items():
            k = stamp_to_frame.get(st)
            if k is None or k < 5:
                # bootstrap frames precede the first scale-locking solve —
                # their frame-time dump legitimately differs from the later
                # optimized pose (the reference has the same property: it
                # dumps at frame time, mono_lidar.cpp:275-300)
                continue
            # trajectory stores the pose at frame time; the archive stores
            # the final optimized pose at eviction — post-bootstrap the two
            # stay within the window-correction envelope
            d = np.linalg.norm(odo.trajectory[k].pose[4:] - pose[4:])
            assert d < 0.5, (st, d)
            checked += 1
        assert checked >= 5
