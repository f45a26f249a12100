"""Device-scan odometry tests: the whole per-frame pipeline (prior →
motion-only → keyframe gates → push/triangulate → throttled trimmed BA)
compiled as ONE lax.scan program (SURVEY §3.5's TPU-native batch evaluator;
reference call stack mono_lidar.cpp:88-373)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from limo_tpu.config import CapacityConfig, LimoConfig
from limo_tpu.geometry.camera import CameraRig
from limo_tpu.pipeline import scan_odometry as so
from limo_tpu.pipeline.metrics import ate_rmse
from limo_tpu.pipeline.synthetic import dense_tracks, make_world

R = 512  # landmark rows = capacity


@pytest.fixture(scope="module")
def setup():
    world = make_world(num_frames=40, n_landmarks=300, n_ground=80, seed=3)
    cfg = LimoConfig(capacity=CapacityConfig(
        max_keyframes=12, max_landmarks=R, max_cameras=1))
    rig = CameraRig(
        focal=jnp.asarray([world.focal], jnp.float32),
        principal=jnp.asarray([world.principal], jnp.float32),
        T_cam_veh=jnp.asarray([world.T_cam_veh], jnp.float32))
    return world, cfg, rig


class TestScanOdometry:
    def test_lidar_sequence(self, setup):
        world, cfg, rig = setup
        stamps, uvd, valid = dense_tracks(world, R, with_depth=True, seed=4)
        st, out = so.run_sequence(stamps, uvd, valid, rig, cfg)
        assert int(st.n_kf) >= 8
        assert int(np.asarray(out.solved).sum()) >= 5
        est = so.poses_kitti(out)
        ate = ate_rmse(world.kitti_gt(), est)
        assert ate < 0.3, ate
        # steady-state accuracy: after bootstrap the per-frame error is cm
        err = np.linalg.norm(est[:, :3, 3] - world.kitti_gt()[:, :3, 3], axis=1)
        assert err[10:].max() < 0.15, err[10:].max()

    def test_mono_with_external_prior(self, setup):
        # the reference's tf-odometry prior injection (mono_lidar.cpp:119-150)
        world, cfg, rig = setup
        stamps, uvd, valid = dense_tracks(world, R, with_depth=False, seed=4)
        rng = np.random.default_rng(9)
        priors = np.asarray(world.poses_veh).copy()
        priors[:, 4:] += rng.normal(0, 0.05, priors[:, 4:].shape)
        st, out = so.run_sequence(stamps, uvd, valid, rig, cfg, priors=priors)
        ate = ate_rmse(world.kitti_gt(), so.poses_kitti(out))
        assert ate < 1.0, ate

    def test_batch_matches_single(self, setup):
        world, cfg, rig = setup
        stamps, uvd, valid = dense_tracks(world, R, with_depth=True, seed=4)
        st1, out1 = so.run_sequence(stamps, uvd, valid, rig, cfg)
        sb = np.stack([stamps] * 2)
        ub = np.stack([uvd] * 2)
        vb = np.stack([valid] * 2)
        stb, outb = so.run_batch(sb, ub, vb, rig, cfg)
        # identical batch elements agree exactly; vs the non-vmapped program
        # only up to f32 reduction-order noise (vmap lowers cond→select)
        np.testing.assert_allclose(np.asarray(outb.pose[0]),
                                   np.asarray(outb.pose[1]), atol=0)
        # bootstrap frames are chaotic (accept/reject flips on f32 noise);
        # steady-state trajectories must agree
        np.testing.assert_allclose(np.asarray(outb.pose[0, 10:]),
                                   np.asarray(out1.pose[10:]), atol=5e-2)
        ate_b = ate_rmse(world.kitti_gt(), so.poses_kitti(
            jax.tree_util.tree_map(lambda x: x[0], outb)))
        assert ate_b < 0.3, ate_b

    def test_batch_vmap_chunked_matches(self, setup):
        # vmap_chunk serializes the batch into lax.map groups of vmapped
        # width (small-batch fix for the batch-max while_loop penalty,
        # PERF.md): identical elements stay identical, and the chunked
        # program matches the plain vmap in steady state.
        world, cfg, rig = setup
        stamps, uvd, valid = dense_tracks(world, R, with_depth=True, seed=4)
        sb = np.stack([stamps] * 2)
        ub = np.stack([uvd] * 2)
        vb = np.stack([valid] * 2)
        _, outv = so.run_batch(sb, ub, vb, rig, cfg)
        _, outm = so.run_batch(sb, ub, vb, rig, cfg, vmap_chunk=1)
        np.testing.assert_allclose(np.asarray(outm.pose[0]),
                                   np.asarray(outm.pose[1]), atol=0)
        np.testing.assert_allclose(np.asarray(outm.pose[0, 10:]),
                                   np.asarray(outv.pose[0, 10:]), atol=5e-2)

    def test_fleet_sharded_matches_batch(self, setup):
        # SURVEY §3.5: the sequence fleet as ONE mesh-sharded computation.
        # 3 sequences on a 4-device data axis (pad row dropped) must equal
        # the unsharded vmap bitwise (pure data parallelism).
        from limo_tpu.parallel import make_mesh
        world, cfg, rig = setup
        stamps, uvd, valid = dense_tracks(world, R, with_depth=True, seed=4)
        sb = np.stack([stamps] * 3)
        ub = np.stack([uvd] * 3)
        vb = np.stack([valid] * 3)
        stb, outb = so.run_batch(sb, ub, vb, rig, cfg)
        mesh = make_mesh(8, data=4)
        stf, outf = so.run_fleet(mesh, sb, ub, vb, rig, cfg)
        assert outf.pose.shape[0] == 3
        # identical sequences stay identical under sharding
        np.testing.assert_allclose(np.asarray(outf.pose[0]),
                                   np.asarray(outf.pose[2]), atol=0)
        # vs the unsharded vmap: partitioning changes f32 reduction order and
        # the LM accept/reject flips amplify it during bootstrap (same reason
        # test_batch_matches_single compares steady state only)
        np.testing.assert_allclose(np.asarray(outf.pose[0, 10:]),
                                   np.asarray(outb.pose[0, 10:]), atol=5e-2)
        ate = ate_rmse(world.kitti_gt(), so.poses_kitti(
            jax.tree_util.tree_map(lambda x: x[0], outf)))
        assert ate < 0.3, ate

    def test_keyframe_gating(self, setup):
        # standstill frames (zero flow) must not become keyframes
        world, cfg, rig = setup
        stamps, uvd, valid = dense_tracks(world, R, with_depth=True, seed=4)
        F = len(stamps)
        # freeze: repeat frame 5's observations for frames 6..F
        uvd2 = uvd.copy(); valid2 = valid.copy()
        for i in range(6, F):
            uvd2[i] = uvd[5]; valid2[i] = valid[5]
        st, out = so.run_sequence(stamps, uvd2, valid2, rig, cfg)
        kf = np.asarray(out.is_keyframe)
        assert kf[:6].sum() >= 1
        # flow is judged vs the last keyframe, so at most one more keyframe
        # fires (frozen frame vs pre-freeze keyframe still has flow); after
        # that the standstill rejection holds
        assert kf[8:].sum() <= 1, kf
        assert kf[12:].sum() == 0, kf
