"""Unit tests for the rendered-sequence generator (pipeline/render.py) —
the e2e accuracy gate's imagery is load-bearing test infrastructure, so its
geometric contracts get their own checks: occlusion ordering, image/label
consistency, sub-pixel motion continuity, perspective patch scaling, and
lidar-billboard depth consistency."""

import numpy as np
import pytest

from limo_tpu.geometry import pose_host
from limo_tpu.pipeline.render import (LABEL_BUILDING, LABEL_CAR, LABEL_ROAD,
                                      LABEL_SKY, SequenceRenderer,
                                      write_kitti_sequence)
from limo_tpu.pipeline.synthetic import SyntheticWorld, kitti_like_extrinsics


def tiny_world(landmarks, labels=None, velocities=None, n_frames=4,
               focal=450.0, size=(512, 192)):
    landmarks = np.asarray(landmarks, float)
    M = landmarks.shape[0]
    poses = np.stack([
        pose_host.inverse(np.array([1.0, 0, 0, 0, i * 0.6, 0.0, 0.0]))
        for i in range(n_frames)])
    return SyntheticWorld(
        poses_veh=poses, stamps=np.arange(n_frames) * 0.1,
        landmarks=landmarks, is_ground=np.zeros(M, bool),
        focal=focal, principal=np.array([size[0] / 2.0, size[1] / 2.0]),
        T_cam_veh=kitti_like_extrinsics(1.65), image_size=size,
        labels=(np.asarray(labels, np.int32) if labels is not None else None),
        velocities=velocities, cam_height=1.65)


def project(world, frame, pt):
    T = pose_host.compose(world.T_cam_veh, world.poses_veh[frame])
    p = pose_host.apply(T, np.asarray(pt, float)[None])[0]
    uv = world.focal * p[:2] / p[2] + world.principal
    return uv, p[2]


class TestRenderer:
    def test_occlusion_near_wins(self):
        # two landmarks on the same ray: the nearer one must own the pixels
        far = [30.0, 0.0, 1.0]
        near = [15.0, 0.0, 0.5]       # same image direction, half the range
        w = tiny_world([far, near], labels=[-2, 26])
        r = SequenceRenderer(w)
        img, lab = r.frame(0)
        uv, _ = project(w, 0, near)
        u, v = int(round(uv[0])), int(round(uv[1]))
        assert lab[v, u] == LABEL_CAR          # near (label 26) occludes
        # the near patch's texture, not the far one's, is painted there
        assert img[v, u] > 0

    def test_labels_match_image_regions(self):
        w = tiny_world([[25.0, 3.0, 1.0]], labels=[-2])
        r = SequenceRenderer(w)
        img, lab = r.frame(0)
        uv, _ = project(w, 0, [25.0, 3.0, 1.0])
        u, v = int(round(uv[0])), int(round(uv[1]))
        assert lab[v, u] == LABEL_BUILDING
        # sky above the horizon, road below it
        assert lab[2, 2] == LABEL_SKY
        assert lab[-3, w.image_size[0] // 2] == LABEL_ROAD
        assert img[-3, w.image_size[0] // 2] > 0   # ground is textured

    def test_perspective_patch_scaling(self):
        # the same landmark twice as far paints a patch ~half the width
        w = tiny_world([[20.0, -4.0, 1.0], [40.0, 8.0, 1.0]],
                       labels=[-2, -2])
        r = SequenceRenderer(w)
        img, lab = r.frame(0)

        def patch_width(pt):
            uv, z = project(w, 0, pt)
            v = int(round(uv[1]))
            row = lab[v] == LABEL_BUILDING
            return row.sum(), w.focal * r.patch_world_halfsize / z

        w1, exp1 = patch_width([20.0, -4.0, 1.0])
        w2, exp2 = patch_width([40.0, 8.0, 1.0])
        assert abs(w1 - 2 * exp1) <= 3, (w1, exp1)
        assert abs(w2 - 2 * exp2) <= 3, (w2, exp2)

    def test_subpixel_motion_continuity(self):
        # the patch centroid must move with the projection at sub-pixel
        # resolution (no integer snapping) as the camera advances
        pt = [26.0, 2.0, 1.2]
        w = tiny_world([pt], labels=[-2], n_frames=4)
        r = SequenceRenderer(w)
        cents, gts = [], []
        for i in range(4):
            img, lab = r.frame(i)
            ys, xs = np.nonzero(lab == LABEL_BUILDING)
            weights = img[ys, xs]
            cents.append((xs * weights).sum() / weights.sum())
            gts.append(project(w, i, pt)[0][0])
        d_est = np.diff(cents)
        d_gt = np.diff(gts)
        # per-step flow matches GT flow below a pixel (the centroid
        # estimator itself carries ~0.3 px bias from the asymmetric patch
        # texture + the alpha-thresholded label mask; integer snapping
        # would show 1 px stair-steps)
        assert np.abs(d_est - d_gt).max() < 0.5, (d_est, d_gt)
        assert all(abs(d) > 0.05 for d in d_est)   # actually moving

    def test_dynamic_objects_move(self):
        vel = np.array([[0.0, 2.0, 0.0]])
        w = tiny_world([[25.0, 0.0, 1.0]], labels=[26], velocities=vel,
                       n_frames=3)
        r = SequenceRenderer(w)
        us = []
        for i in range(3):
            _, lab = r.frame(i)
            ys, xs = np.nonzero(lab == LABEL_CAR)
            us.append(xs.mean())
        # lateral world motion => monotonic image motion beyond egomotion
        uv0 = [project(w, i, [25.0, 0.0, 1.0])[0][0] for i in range(3)]
        rel = np.diff(us) - np.diff(uv0)
        assert np.all(np.abs(rel) > 2.0), (us, uv0)

    def test_cloud_billboard_depth_consistency(self):
        pt = np.array([[24.0, 1.0, 0.8]])
        w = tiny_world(pt, labels=[-2])
        r = SequenceRenderer(w)
        rng = np.random.default_rng(0)
        cloud = r.cloud(0, rng, n_ground=0)
        # returns near the landmark: range along the view direction stays
        # within ~2 cm of the landmark's own range (billboard, not a blob)
        d = np.linalg.norm(cloud - pose_host.apply(w.poses_veh[0], pt)[0],
                           axis=1)
        near = cloud[d < 0.8]
        assert near.shape[0] > 10
        rr = np.linalg.norm(near, axis=1)
        r0 = np.linalg.norm(pose_host.apply(w.poses_veh[0], pt)[0])
        assert np.abs(rr - r0).std() < 0.05

    def test_write_kitti_sequence_layout(self, tmp_path):
        w = tiny_world([[20.0, 0.0, 1.0], [30.0, -5.0, 0.5]],
                       labels=[-2, 26], n_frames=3)
        rng = np.random.default_rng(1)
        root = str(tmp_path / "00")
        gt = write_kitti_sequence(root, w, 3, rng, with_labels=True)
        import os
        for sub in ("image_0", "velodyne", "labels_0"):
            assert len(os.listdir(os.path.join(root, sub))) == 3
        from limo_tpu.io import kitti
        seq = kitti.KittiSequence.open(root, gt)
        assert seq.has_labels
        li = seq.load_labels(1)
        assert li is not None and li.shape == (192, 512)
        assert np.isfinite(seq.load_velodyne(1)).all()
        assert kitti.read_poses(gt).shape == (3, 4, 4)
