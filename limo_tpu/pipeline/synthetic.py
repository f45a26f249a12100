"""Synthetic KITTI-like world generator.

Produces ground-truth trajectories, landmark fields (structure + ground
points), and simulated tracklet streams (with optional lidar depth) — the
device-free equivalent of the reference's test generators
(keyframe_bundle_adjustment.cpp:232-417) extended to full sequences, used by
the e2e pipeline tests and bench.py (no KITTI data is shipped in this image).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..geometry import pose as pose_ops
from ..geometry import quaternion as quat
from .tracklets import Tracklets

# KITTI-ish camera: vehicle x-forward/z-up → camera z-forward/y-down
R_CAM_VEH = np.array([[0.0, -1.0, 0.0],
                      [0.0, 0.0, -1.0],
                      [1.0, 0.0, 0.0]])


def kitti_like_extrinsics(height: float = 1.65) -> np.ndarray:
    """pose_camera_vehicle (camera ← vehicle) with the camera ``height``
    above the vehicle origin projected to the ground."""
    m = np.eye(4)
    m[:3, :3] = R_CAM_VEH
    # camera sits at vehicle origin; ground is z = -height in vehicle frame
    return np.asarray(pose_ops.from_matrix(jnp.asarray(m)), np.float64)


@dataclass
class SyntheticWorld:
    poses_veh: np.ndarray        # [F,7] vehicle←origin (world-to-body) per frame
    stamps: np.ndarray           # [F]
    landmarks: np.ndarray        # [M,3] origin frame
    is_ground: np.ndarray        # [M] bool
    focal: float
    principal: np.ndarray
    T_cam_veh: np.ndarray        # [7]
    image_size: Tuple[int, int]  # (width, height)

    def kitti_gt(self) -> np.ndarray:
        """[F,4,4] origin←frame matrices (KITTI convention)."""
        return np.asarray(pose_ops.to_matrix(pose_ops.inverse(
            jnp.asarray(self.poses_veh))))


def make_world(num_frames: int = 60, hz: float = 10.0, speed: float = 10.0,
               yaw_rate: float = 0.02, n_landmarks: int = 600,
               n_ground: int = 200, seed: int = 0,
               focal: float = 718.0, pp=(607.0, 185.0),
               image_size=(1241, 376), cam_height: float = 1.65
               ) -> SyntheticWorld:
    """Vehicle drives forward (+x) with a gentle yaw; landmarks populate a
    corridor along the path; ground points lie on z = -cam_height."""
    rng = np.random.default_rng(seed)
    dt = 1.0 / hz
    stamps = np.arange(num_frames) * dt

    # integrate vehicle pose (origin←vehicle), then store inverse (veh←origin)
    T = np.eye(4)
    poses = []
    heading = 0.0
    pos = np.zeros(3)
    for i in range(num_frames):
        R = np.array([[np.cos(heading), -np.sin(heading), 0],
                      [np.sin(heading), np.cos(heading), 0],
                      [0, 0, 1.0]])
        m = np.eye(4)
        m[:3, :3] = R
        m[:3, 3] = pos
        poses.append(np.asarray(pose_ops.inverse(pose_ops.from_matrix(jnp.asarray(m)))))
        pos = pos + R @ np.array([speed * dt, 0, 0])
        heading += yaw_rate * dt * speed
    poses_veh = np.stack(poses)

    # landmark corridor bent along the integrated path (so long, curving
    # trajectories keep landmarks in view): sample an arc position on the
    # path (extended ~40 m past the end), then offset laterally in the local
    # heading frame
    ext_frames = int(40.0 / (speed * dt)) + 1
    path_pos = np.zeros((num_frames + ext_frames, 3))
    path_head = np.zeros(num_frames + ext_frames)
    p, h = np.zeros(3), 0.0
    for i in range(num_frames + ext_frames):
        path_pos[i], path_head[i] = p, h
        R = np.array([[np.cos(h), -np.sin(h), 0],
                      [np.sin(h), np.cos(h), 0], [0, 0, 1.0]])
        p = p + R @ np.array([speed * dt, 0, 0])
        h += yaw_rate * dt * speed

    def along_path(n, lat_lo, lat_hi, z_lo, z_hi):
        t = rng.uniform(0, len(path_pos) - 1, n)
        i0 = np.floor(t).astype(int)
        frac = t - i0
        pos = path_pos[i0] * (1 - frac[:, None]) \
            + path_pos[np.minimum(i0 + 1, len(path_pos) - 1)] * frac[:, None]
        head = path_head[i0]
        lat = rng.uniform(lat_lo, lat_hi, n)
        z = rng.uniform(z_lo, z_hi, n) if z_lo != z_hi else np.full(n, z_lo)
        off = np.stack([-np.sin(head) * lat, np.cos(head) * lat, z], -1)
        return pos + off

    structure = along_path(n_landmarks, -25, 25, -1.0, 4.0)
    ground = along_path(n_ground, -8, 8, -cam_height, -cam_height)
    landmarks = np.concatenate([structure, ground])
    is_ground = np.concatenate([np.zeros(n_landmarks, bool), np.ones(n_ground, bool)])

    return SyntheticWorld(
        poses_veh=poses_veh, stamps=stamps, landmarks=landmarks,
        is_ground=is_ground, focal=focal, principal=np.asarray(pp),
        T_cam_veh=kitti_like_extrinsics(cam_height), image_size=image_size)


class SyntheticTracker:
    """Simulates the external viso2 front end: projects visible landmarks and
    maintains tracks with global ids = landmark indices. Emits ``Tracklets``
    with the newest-first stamp window (max length 100, matching
    config_feature_matching.yaml)."""

    def __init__(self, world: SyntheticWorld, pixel_noise: float = 0.3,
                 depth_noise: float = 0.03, with_depth: bool = False,
                 depth_fraction: float = 0.6, max_track_length: int = 100,
                 max_range: float = 80.0, seed: int = 1,
                 outlier_fraction: float = 0.0, label_ground: bool = True):
        self.w = world
        self.pixel_noise = pixel_noise
        self.depth_noise = depth_noise
        self.with_depth = with_depth
        self.depth_fraction = depth_fraction
        self.max_track_length = max_track_length
        self.max_range = max_range
        self.label_ground = label_ground
        self.rng = np.random.default_rng(seed)
        M = world.landmarks.shape[0]
        self.has_depth_sensor = self.rng.uniform(size=M) < depth_fraction
        self.outlier_tracks = self.rng.uniform(size=M) < outlier_fraction
        self._frames: List[Tuple[float, np.ndarray, np.ndarray, np.ndarray]] = []

    def observe(self, frame_idx: int) -> None:
        w = self.w
        T_cam_origin = pose_ops.compose(jnp.asarray(w.T_cam_veh),
                                        jnp.asarray(w.poses_veh[frame_idx]))
        p_cam = np.asarray(pose_ops.apply(T_cam_origin, jnp.asarray(w.landmarks)))
        z = p_cam[:, 2]
        uv = w.focal * p_cam[:, :2] / np.maximum(z[:, None], 1e-6) + w.principal
        W, H = w.image_size
        vis = (z > 1.0) & (z < self.max_range) \
            & (uv[:, 0] >= 0) & (uv[:, 0] < W) & (uv[:, 1] >= 0) & (uv[:, 1] < H)
        uv = uv + self.rng.normal(0, self.pixel_noise, uv.shape)
        if np.any(self.outlier_tracks):
            bad = self.outlier_tracks & vis
            uv[bad] += self.rng.uniform(20, 60, (int(bad.sum()), 2))
        d = np.full(uv.shape[0], -1.0)
        if self.with_depth:
            dm = vis & self.has_depth_sensor
            d[dm] = z[dm] + self.rng.normal(0, self.depth_noise, int(dm.sum()))
        self._frames.insert(0, (w.stamps[frame_idx], uv, d, vis))
        if len(self._frames) > self.max_track_length:
            self._frames.pop()

    def tracklets(self) -> Tracklets:
        S = len(self._frames)
        M = self.w.landmarks.shape[0]
        seen = np.zeros(M, bool)
        for _, _, _, vis in self._frames:
            seen |= vis
        ids = np.flatnonzero(seen)
        N = ids.shape[0]
        uvd = np.zeros((N, S, 3))
        uvd[..., 2] = -1.0
        mask = np.zeros((N, S), bool)
        stamps = np.array([f[0] for f in self._frames])
        for si, (_, uv, d, vis) in enumerate(self._frames):
            sel = vis[ids]
            mask[:, si] = sel
            uvd[sel, si, :2] = uv[ids[sel]]
            uvd[sel, si, 2] = d[ids[sel]]
        age = mask.sum(1).astype(np.int32)
        label = np.full(N, -2, np.int32)
        if self.label_ground:
            label[self.w.is_ground[ids]] = 7  # cityscapes road
        return Tracklets(stamps=stamps, uvd=uvd, mask=mask,
                         ids=ids.astype(np.int64), age=age,
                         is_outlier=np.zeros(N, bool), label=label)


def dense_tracks(world: SyntheticWorld, num_rows: int,
                 pixel_noise: float = 0.3, depth_noise: float = 0.03,
                 with_depth: bool = False, depth_fraction: float = 0.6,
                 max_range: float = 80.0, seed: int = 1):
    """Dense per-frame observation tensors for the scan-odometry evaluator
    (:mod:`limo_tpu.pipeline.scan_odometry`): landmark row = world landmark
    index (capacity-padded).

    Returns (stamps [F], uvd [F,R,3], valid [F,R]) with R = num_rows.
    """
    rng = np.random.default_rng(seed)
    F_n = world.poses_veh.shape[0]
    M = world.landmarks.shape[0]
    assert M <= num_rows, (M, num_rows)
    W, H = world.image_size
    f, pp = world.focal, world.principal
    tcv = jnp.asarray(world.T_cam_veh)

    uvd = np.zeros((F_n, num_rows, 3), np.float64)
    uvd[..., 2] = -1.0
    valid = np.zeros((F_n, num_rows), bool)
    has_depth_row = rng.uniform(size=M) < depth_fraction

    lms = jnp.asarray(world.landmarks)
    for i in range(F_n):
        p_cam = np.asarray(pose_ops.apply(
            tcv, pose_ops.apply(jnp.asarray(world.poses_veh[i]), lms)))
        z = p_cam[:, 2]
        ok = z > 0.5
        uv = np.zeros((M, 2))
        uv[ok] = f * p_cam[ok, :2] / z[ok, None] + pp
        ok &= ((uv[:, 0] >= 0) & (uv[:, 0] < W)
               & (uv[:, 1] >= 0) & (uv[:, 1] < H) & (z < max_range))
        uv = uv + rng.normal(0, pixel_noise, uv.shape)
        uvd[i, :M, :2] = uv
        if with_depth:
            d = z + rng.normal(0, depth_noise, M)
            uvd[i, :M, 2] = np.where(ok & has_depth_row, d, -1.0)
        valid[i, :M] = ok
    return world.stamps.copy(), uvd, valid
