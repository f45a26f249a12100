"""Multi-camera BA tests — mirror of the reference's 2-camera-rig tests
(keyframe_bundle_adjustment.cpp:807-858, :1090-1145): tracks routed to
cameras, joint window optimization recovers GT poses."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from limo_tpu.config import CapacityConfig, LimoConfig
from limo_tpu.geometry import pose as pose_ops
from limo_tpu.geometry import quaternion as quat
from limo_tpu.geometry.camera import CameraRig
from limo_tpu.pipeline.tracklets import Tracklets
from limo_tpu.window_manager import FIX_NONE, FIX_POSE, BundleAdjuster

F, CX, CY = 600.0, 300.0, 200.0
DT = jnp.float64


def two_cam_rig():
    """Stereo-ish rig: cam0 at vehicle origin, cam1 offset 0.5 m right."""
    t0 = pose_ops.identity(DT)
    t1 = pose_ops.make(quat.qidentity(DT), jnp.array([-0.5, 0.0, 0.0], DT))
    return CameraRig(
        focal=jnp.array([F, F], DT),
        principal=jnp.array([[CX, CY], [CX, CY]], DT),
        T_cam_veh=jnp.stack([t0, t1]),
    )


def project_tracklets_multicam(rig, poses, lms, stamps, cam_of_track):
    n_kf = len(poses)
    M = lms.shape[0]
    uvd = np.zeros((M, n_kf, 3))
    uvd[..., 2] = -1.0
    mask = np.zeros((M, n_kf), bool)
    order = np.argsort(stamps)[::-1]
    tcv = np.asarray(rig.T_cam_veh)
    for col, i in enumerate(order):
        for m in range(M):
            cam = cam_of_track[m]
            pc = np.asarray(pose_ops.apply(
                jnp.asarray(tcv[cam], DT),
                pose_ops.apply(jnp.asarray(poses[i], DT), jnp.asarray(lms[m], DT))))
            if pc[2] <= 0.1:
                continue
            uvd[m, col, :2] = F * pc[:2] / pc[2] + np.array([CX, CY])
            mask[m, col] = True
    return Tracklets(stamps=np.asarray(stamps)[order], uvd=uvd, mask=mask,
                     ids=np.arange(M, dtype=np.int64),
                     age=mask.sum(1).astype(np.int32),
                     is_outlier=np.zeros(M, bool),
                     label=np.full(M, -2, np.int32))


class TestMultiCam:
    def test_two_camera_window_ba(self, rng):
        rig = two_cam_rig()
        cfg = LimoConfig(capacity=dataclasses.replace(
            CapacityConfig(), max_cameras=2))
        lms = rng.uniform(-1, 1, (120, 3)) * np.array([10.0, 6.0, 4.0]) \
            + np.array([0, 0, 25.0])
        cam_of_track = {m: m % 2 for m in range(120)}
        poses = [np.array([1.0, 0, 0, 0, 0, 0, -1.2 * k]) for k in range(4)]
        stamps = [0.4 * k for k in range(4)]

        ba = BundleAdjuster(rig, cfg, DT)
        for k in range(4):
            tl = project_tracklets_multicam(rig, poses[: k + 1], lms,
                                            stamps[: k + 1], cam_of_track)
            p = np.asarray(poses[k], float).copy()
            if k >= 2:
                p[4:] += rng.normal(0, 0.1, 3)
            ba.push(stamps[k], tl, p, FIX_POSE if k == 0 else FIX_NONE,
                    track_camera=cam_of_track)
        # both cameras contributed observations
        assert ba._obs_mask[..., 0].any() and ba._obs_mask[..., 1].any()
        # triangulation across the rig is consistent
        known = ba._lm_valid & ba._lm_known
        err_tri = np.linalg.norm(ba._lm_pos[known] - lms[: known.sum()], axis=1)
        assert err_tri.max() < 0.1

        ba.deactivate_keyframes()
        info = ba.solve()
        assert float(info.final_cost) <= float(info.initial_cost)
        for k, s in enumerate(ba._kf_order):
            err = np.linalg.norm(ba._poses[s][4:] - poses[k][4:])
            assert err < 0.08, (k, err)  # ~2% of trajectory (mono scale, trimming active)
