"""Full-stack system test: rendered images + synthetic lidar clouds through
the complete pipeline (tracker → lidar depth → groundplane → windowed BA) —
the TPU equivalent of running the reference's kitti_standalone launch graph
end-to-end."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from limo_tpu.config import LandmarkSelectionConfig, LimoConfig, PriorConfig
from limo_tpu.frontend.lidar_depth import LidarDepthConfig
from limo_tpu.frontend.tracker import TrackerConfig
from limo_tpu.geometry import pose as pose_ops
from limo_tpu.geometry.camera import CameraRig
from limo_tpu.pipeline.full import LimoPipeline, LimoPipelineConfig, gamma_correct
from limo_tpu.pipeline.metrics import ate_rmse
from limo_tpu.pipeline.synthetic import make_world

W_IMG, H_IMG = 320, 240
F, CX, CY = 300.0, 160.0, 120.0


PATCH_R = 5  # rendered texture patch radius


def render_world(world, frame, dot_world, rng):
    """Render each landmark as a *unique textured patch* (fixed random
    pattern per landmark, smoothed) — appearance matching needs texture, as
    in real imagery; undifferentiated blobs are unmatchable by any
    descriptor."""
    from scipy.ndimage import gaussian_filter

    M = dot_world.shape[0]
    style = np.random.default_rng(1234)
    side = 2 * PATCH_R + 1
    patches = gaussian_filter(
        style.uniform(0, 1, (M, side, side)).astype(np.float32),
        sigma=(0, 1.0, 1.0))
    T_cam_origin = pose_ops.compose(jnp.asarray(world.T_cam_veh),
                                    jnp.asarray(world.poses_veh[frame]))
    p = np.asarray(pose_ops.apply(T_cam_origin, jnp.asarray(dot_world)))
    z = p[:, 2]
    uv = F * p[:, :2] / np.maximum(z[:, None], 1e-6) + np.array([CX, CY])
    vis = (z > 2.0) & (z < 60.0) & (uv[:, 0] > 8) & (uv[:, 0] < W_IMG - 8) \
        & (uv[:, 1] > 8) & (uv[:, 1] < H_IMG - 8)
    img = np.zeros((H_IMG, W_IMG), np.float32)
    for i in np.flatnonzero(vis):
        u, v = int(round(uv[i, 0])), int(round(uv[i, 1]))
        img[v - PATCH_R:v + PATCH_R + 1, u - PATCH_R:u + PATCH_R + 1] = \
            np.maximum(img[v - PATCH_R:v + PATCH_R + 1,
                           u - PATCH_R:u + PATCH_R + 1], patches[i])
    return np.clip(img, 0, 1)


def surface_cloud(world, frame, dot_world, rng, pts_per_dot=25):
    """Lidar return patches (vehicle frame) around each landmark + ground."""
    M = dot_world.shape[0]
    offs = rng.normal(0, 0.15, (M, pts_per_dot, 3))
    pts_w = dot_world[:, None] + offs
    pts_w = pts_w.reshape(-1, 3)
    # ground plane points in front of the vehicle
    gx = rng.uniform(2, 40, 800)
    gy = rng.uniform(-8, 8, 800)
    ground_w_local = np.stack([gx, gy, np.full(800, -1.65)], -1)
    T_origin_veh = pose_ops.inverse(jnp.asarray(world.poses_veh[frame]))
    ground_w = np.asarray(pose_ops.apply(T_origin_veh, jnp.asarray(ground_w_local)))
    all_w = np.concatenate([pts_w, ground_w])
    return np.asarray(pose_ops.apply(jnp.asarray(world.poses_veh[frame]),
                                     jnp.asarray(all_w)))


@pytest.mark.slow
class TestFullStack:
    def test_images_and_clouds_to_trajectory(self, rng):
        n_frames = 18
        world = make_world(num_frames=n_frames, speed=6.0, yaw_rate=0.01,
                           n_landmarks=0, n_ground=0, seed=3,
                           focal=F, pp=(CX, CY), image_size=(W_IMG, H_IMG))
        # dot landmarks in a corridor ahead (≥ 8 m — keeps per-frame flow in
        # the trackable range, like road scenes)
        dot_world = np.stack([
            rng.uniform(10, 90, 140),
            rng.uniform(-12, 12, 140),
            rng.uniform(-1.2, 3.0, 140)], -1)

        rig = CameraRig.single(F, CX, CY,
                               T_cam_veh=jnp.asarray(world.T_cam_veh, jnp.float64),
                               dtype=jnp.float64)
        cfg = LimoPipelineConfig(
            limo=LimoConfig(
                landmark_selection=dataclasses.replace(
                    LandmarkSelectionConfig(), height_over_ground=1.65),
                # prior_speed is a deployment config in the reference
                # (cfg/MonoLidar.rosif prior_speed); set to urban pace
                prior=dataclasses.replace(PriorConfig(), default_speed=8.0)),
            tracker=TrackerConfig(max_features=256, border=8),
            lidar=LidarDepthConfig(),
            use_groundplane=True, gp_band=(-2.5, -1.0),
            cloud_capacity=8192)
        pipe = LimoPipeline(rig, cfg, dtype=jnp.float64)

        for i in range(n_frames):
            img = render_world(world, i, dot_world, rng)
            cloud = surface_cloud(world, i, dot_world, rng)
            pipe.process(world.stamps[i], img, cloud)

        est = pipe.poses_kitti()
        gt = world.kitti_gt()
        # metric scale from lidar depth: rigid ATE over the ~10 m clip
        err = ate_rmse(gt, est, with_scale=False)
        assert err < 1.5, err
        # tracker actually supplied depth measurements
        tl = pipe.tracker.tracklets()
        assert (tl.uvd[tl.mask, 2] > 0).sum() > 50


class TestGamma:
    def test_gamma_correct(self):
        img = np.array([[0.25, 1.0, 0.0]])
        out = gamma_correct(img, 1.2)
        np.testing.assert_allclose(out, img ** (1 / 1.2))
