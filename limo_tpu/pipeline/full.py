"""Full Limo2 pipeline: images + lidar clouds → trajectory.

This is the TPU equivalent of the complete launch graph
(``launch/kitti_standalone.launch``): gamma-normalized image → feature
tracking → lidar depth per feature → (optional) semantic labels →
groundplane estimation → keyframe BA. Each stage is the corresponding
limo_tpu module; this class wires them per frame.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..config import LimoConfig
from ..frontend.groundplane import estimate_groundplane
from ..frontend.lidar_depth import (LidarDepthConfig, estimate_depths,
                                    ground_patch_depths)
from ..frontend.semantics import attach_labels
from ..frontend.tracker import FeatureTracker, TrackerConfig
from ..geometry import pose as pose_ops
from ..geometry.camera import CameraRig
from .odometry import FrameResult, LidarOdometry
from .tracklets import Tracklets


def gamma_correct(img: np.ndarray, gamma: float = 1.2) -> np.ndarray:
    """Brightness normalization (image_preproc gamma nodelet,
    feature_matching.launch:9-15; gamma 1.2)."""
    return np.clip(img, 0.0, 1.0) ** (1.0 / gamma)


@dataclass
class LimoPipelineConfig:
    limo: LimoConfig
    tracker: TrackerConfig
    lidar: LidarDepthConfig
    gamma: float = 1.2
    use_groundplane: bool = True
    gp_band: tuple = (-3.5, -1.0)   # ransac_plane_min/max_z (velodyne frame)


class LimoPipeline:
    """End-to-end online pipeline. Per frame:
    ``process(stamp, image, cloud_veh, label_image=None)``.

    cloud_veh: lidar points in the *vehicle* frame [N,3] (callers transform
    from the sensor frame with the calibration; see io.kitti).
    """

    def __init__(self, rig: CameraRig, cfg: Optional[LimoPipelineConfig] = None,
                 dtype=jnp.float32):
        if cfg is None:
            cfg = LimoPipelineConfig(limo=LimoConfig(), tracker=TrackerConfig(),
                                     lidar=LidarDepthConfig())
        self.cfg = cfg
        self.rig = rig
        self.dtype = dtype
        self.tracker = FeatureTracker(cfg.tracker)
        self.odometry = LidarOdometry(rig, cfg.limo, dtype)
        self._T_cam_veh = np.asarray(rig.T_cam_veh[0], np.float64)
        self._image_size: Optional[tuple] = None

    def process(self, stamp: float, image: np.ndarray,
                cloud_veh: Optional[np.ndarray] = None,
                label_image: Optional[np.ndarray] = None) -> FrameResult:
        if self._image_size is None:
            self._image_size = (image.shape[1], image.shape[0])
        img = gamma_correct(image.astype(np.float32), self.cfg.gamma)

        cloud_cam = None
        gp = None
        if cloud_veh is not None and cloud_veh.size:
            cloud_cam = np.asarray(pose_ops.apply(
                jnp.asarray(self._T_cam_veh, self.dtype),
                jnp.asarray(cloud_veh[:, :3], self.dtype)))
            if self.cfg.use_groundplane:
                gp = estimate_groundplane(
                    jnp.asarray(cloud_veh[:, :3], self.dtype),
                    jnp.ones(cloud_veh.shape[0], bool),
                    z_band=self.cfg.gp_band)

        def depth_fn(uv):
            if cloud_cam is None:
                return np.full(len(uv), -1.0)
            res = estimate_depths(
                jnp.asarray(cloud_cam, self.dtype),
                jnp.ones(cloud_cam.shape[0], bool),
                jnp.asarray(uv, self.dtype),
                jnp.asarray(float(self.rig.focal[0]), self.dtype),
                jnp.asarray(np.asarray(self.rig.principal[0]), self.dtype),
                self._image_size, self.cfg.lidar)
            d = np.array(res.depth)
            if gp is not None and bool(gp.ok):
                # road features: M-estimator local patch over the RANSAC
                # inliers (reference plane_estimator_use_mestimator, the
                # evaluated-best method), global-plane fallback inside
                n_veh = np.asarray(gp.normal)
                d_veh = float(gp.distance)
                R = np.asarray(pose_ops.to_matrix(
                    jnp.asarray(self._T_cam_veh)))[:3, :3]
                t = self._T_cam_veh[4:]
                n_cam = R @ n_veh
                d_cam = d_veh - float(n_cam @ t)
                gpd, gok = ground_patch_depths(
                    jnp.asarray(cloud_cam, self.dtype),
                    jnp.asarray(np.asarray(gp.inliers)),
                    jnp.asarray(uv, self.dtype),
                    jnp.asarray(n_cam, self.dtype), jnp.asarray(d_cam, self.dtype),
                    jnp.asarray(float(self.rig.focal[0]), self.dtype),
                    jnp.asarray(np.asarray(self.rig.principal[0]), self.dtype),
                    self._image_size, self.cfg.lidar)
                gpd = np.asarray(gpd)
                # fill features that lack object depth but hit the road plane
                miss = (d < 0) & np.asarray(gok)
                d[miss] = gpd[miss]
            return d

        self.tracker.process(stamp, img, depth_fn=depth_fn)
        tl = self.tracker.tracklets(window=self.cfg.limo.capacity.max_keyframes)
        if label_image is not None:
            tl = attach_labels(tl, label_image)
        return self.odometry.process_frame(stamp, tl)

    def poses_kitti(self) -> np.ndarray:
        return self.odometry.poses_kitti()
