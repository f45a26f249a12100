"""Fused device pipeline (pipeline/fused.py): images + clouds → poses as
ONE compiled lax.scan — tracker, device-side track table, lidar depth,
groundplane, labels, and the windowed BA all inside the scan body
(VERDICT r3 item 1; reference launch graph kitti_standalone.launch:10-57)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from limo_tpu.config import (CapacityConfig, LandmarkSelectionConfig,
                             LimoConfig, PriorConfig)
from limo_tpu.frontend.lidar_depth import LidarDepthConfig
from limo_tpu.frontend.tracker import TrackerConfig
from limo_tpu.geometry.camera import CameraRig
from limo_tpu.pipeline import fused
from limo_tpu.pipeline.full import LimoPipelineConfig
from limo_tpu.pipeline.metrics import ate_rmse, kitti_drift
from limo_tpu.pipeline.render import SequenceRenderer
from limo_tpu.pipeline.synthetic import make_world


W_IMG, H_IMG, FOCAL = 512, 192, 450.0


def render_sequence(world, n_frames, rng, with_labels=True):
    """In-memory rendered streams: (images_u8 [F,H,W], clouds list,
    label_images [F,H,W] u8)."""
    rend = SequenceRenderer(world)
    imgs, clouds, labels = [], [], []
    for i in range(n_frames):
        img, lab = rend.frame(i)
        imgs.append((img * 255).astype(np.uint8))
        labels.append(lab)
        clouds.append(rend.cloud(i, rng))
    return (np.stack(imgs), clouds,
            np.stack(labels) if with_labels else None)


def small_configs(n_landmarks=768, max_feats=256):
    cfg = LimoConfig(
        capacity=CapacityConfig(max_keyframes=12, max_landmarks=n_landmarks),
        landmark_selection=dataclasses.replace(
            LandmarkSelectionConfig(), height_over_ground=1.65),
        prior=dataclasses.replace(PriorConfig(), default_speed=6.0))
    pcfg = LimoPipelineConfig(
        limo=cfg, tracker=TrackerConfig(max_features=max_feats, border=8),
        lidar=LidarDepthConfig(), use_groundplane=True,
        cloud_capacity=16384)
    return cfg, pcfg


class TestSlotAssignment:
    def test_inherit_and_allocate(self):
        import jax
        prev_slot = jnp.asarray([5, -1, 7, 3], jnp.int32)
        prev_index = jnp.asarray([2, 0, -1, 1], jnp.int32)  # cur→prev match
        feat_valid = jnp.asarray([True, True, True, False])
        lm_valid = jnp.zeros((10,), bool).at[jnp.asarray([3, 5, 7])].set(True)
        slot = np.asarray(jax.jit(fused._assign_slots)(
            prev_index, prev_slot, feat_valid, lm_valid))
        assert slot[0] == 7          # inherited from prev feature 2
        assert slot[1] == 5          # inherited from prev feature 0
        assert slot[3] == -1         # invalid feature gets nothing
        # feature 2 is new: gets a FREE slot (not 3/5/7, not inherited)
        assert slot[2] not in (3, 5, 7) and slot[2] >= 0
        assert len({s for s in slot if s >= 0}) == 3  # injective

    def test_capacity_exhaustion(self):
        import jax
        L = 4
        prev_index = jnp.full((6,), -1, jnp.int32)
        prev_slot = jnp.full((6,), -1, jnp.int32)
        feat_valid = jnp.ones((6,), bool)
        lm_valid = jnp.zeros((L,), bool).at[0].set(True)
        slot = np.asarray(jax.jit(fused._assign_slots)(
            prev_index, prev_slot, feat_valid, lm_valid))
        got = slot[slot >= 0]
        assert len(got) == 3                      # only 3 free slots
        assert len(set(got)) == 3 and 0 not in got


@pytest.mark.slow
class TestFusedPipeline:
    def _run(self, n_frames, chunk=None, rng=None, state=None):
        rng = rng or np.random.default_rng(11)
        world = make_world(num_frames=n_frames, speed=6.0, yaw_rate=0.012,
                           n_landmarks=360, n_ground=110, n_shrubbery=40,
                           n_dynamic=25, dynamic_speed=6.0, seed=9,
                           focal=FOCAL, pp=(W_IMG / 2.0, H_IMG / 2.0),
                           image_size=(W_IMG, H_IMG))
        imgs, clouds, labels = render_sequence(world, n_frames, rng)
        cfg, pcfg = small_configs()
        rig = CameraRig.single(world.focal, world.principal[0],
                               world.principal[1],
                               T_cam_veh=jnp.asarray(world.T_cam_veh,
                                                     jnp.float32))
        st, out = fused.run_fused(world.stamps[:n_frames], imgs, clouds,
                                  rig, cfg, pcfg, label_images=labels,
                                  chunk=chunk, state=state)
        return world, st, out

    def test_rendered_drive_end_to_end(self):
        """~120-frame rendered drive fully on-device: structure + accuracy.
        (The km-scale and 200-frame reference gates live in
        test_kitti_eval; this is the fast structural one.)"""
        n = 120
        world, st, out = self._run(n)
        assert out.pose.shape == (n, 7)
        assert np.all(np.isfinite(out.pose))
        # the pipeline is alive: tracks form, depths attach, solves happen
        assert out.n_tracks[5:].min() > 50, out.n_tracks
        assert out.n_matches[5:].min() > 30, out.n_matches
        assert out.n_depth[5:].min() > 20, out.n_depth
        assert out.is_keyframe.sum() >= 8
        assert out.solved.sum() >= 5
        est = fused.poses_kitti(out)
        gt = world.kitti_gt()[:n]
        ate = ate_rmse(gt, est)
        drift = kitti_drift(gt, est, lengths=(25.0, 50.0), step=5)
        assert np.isfinite(ate) and ate < 1.0, (ate, drift)
        assert drift["t_err_percent"] < 2.0, drift

    def test_chunked_matches_whole(self):
        """Chunked dispatch (incl. final-chunk padding) must reproduce the
        single-dispatch trajectory exactly — same compiled step, same
        state threading."""
        rng = np.random.default_rng(11)
        _, _, out_a = self._run(44, chunk=None, rng=rng)
        rng = np.random.default_rng(11)
        _, _, out_b = self._run(44, chunk=16, rng=rng)
        np.testing.assert_allclose(out_a.pose, out_b.pose, atol=1e-6)
        np.testing.assert_array_equal(out_a.is_keyframe, out_b.is_keyframe)
        np.testing.assert_array_equal(out_a.solved, out_b.solved)
