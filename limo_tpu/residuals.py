"""Residual kernels — the TPU re-implementation of the reference cost functors.

Reference: ``keyframe_bundle_adjustment/internal/cost_functors_ceres.hpp``
(each function's docstring cites its functor). All functions are pure,
batched over leading axes via ``vmap``, and return ``(residual, valid)`` where
``valid=False`` reproduces the Ceres "return false ⇒ drop residual" semantics
as a mask (invalid residuals are zeroed by the caller, keeping shapes static).

Autodiff replaces Ceres autodiff: jacobians are taken w.r.t. *local tangents*
(pose ⊞ in :mod:`limo_tpu.geometry.pose`), matching the reference's local
parameterizations.
"""

from __future__ import annotations

import jax.numpy as jnp

from .geometry import pose as pose_ops
from .geometry.camera import Z_GUARD, project

ROT_COMP_MIN_SQ = 0.01  # rotation-compensation guard (cost_functors_ceres.hpp:144)


def _safe_norm(x, axis=-1, keepdims=False):
    """‖x‖ with a finite (zero) gradient at x=0.

    Plain ``jnp.linalg.norm`` has a NaN gradient at 0; residual rows attached
    to invalid keyframes sit exactly at 0 and are masked by weight — but
    NaN·0 = NaN would poison the assembled Hessian, so the guard is required.
    """
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    ok = sq > 1e-20
    return jnp.where(ok, jnp.sqrt(jnp.where(ok, sq, 1.0)), 0.0)


def reprojection(pose_kf_origin, point_origin, uv_observed, focal, principal,
                 T_cam_veh, compensate_rotation: bool = False):
    """``ReprojectionErrorWithQuaternions`` (cost_functors_ceres.hpp:53-182).

    Project world landmark through T_cam_veh ∘ T_kf_origin, pinhole, residual =
    predicted − observed (pixels). With ``compensate_rotation`` the residual is
    divided by the norm of the rotation-only reprojection error (RotRocc,
    Buczko et al.), as used in motion-only adjustment.

    Returns (res [...,2], valid [...]).
    """
    point_veh = pose_ops.apply(pose_kf_origin, point_origin)
    point_cam = pose_ops.apply(T_cam_veh, point_veh)
    uv_pred, valid = project(point_cam, focal, principal)
    res = uv_pred - uv_observed

    if compensate_rotation:
        rot_only = pose_ops.make(pose_ops.rotation(pose_kf_origin),
                                 jnp.zeros_like(pose_ops.translation(pose_kf_origin)))
        point_rot_cam = pose_ops.apply(T_cam_veh, pose_ops.apply(rot_only, point_origin))
        uv_rot, valid_rot = project(point_rot_cam, focal, principal)
        d = uv_rot - uv_observed
        rot_sq = jnp.sum(d * d, axis=-1)
        rot_ok = rot_sq >= ROT_COMP_MIN_SQ
        valid = valid & valid_rot & rot_ok
        denom = jnp.sqrt(jnp.where(rot_ok, rot_sq, 1.0))
        res = res / denom[..., None]
    return res, valid


def landmark_depth(pose_kf_origin, point_origin, depth_measured, T_cam_veh):
    """``LandmarkDepthError`` (cost_functors_ceres.hpp:187-222): z of the
    landmark in the camera frame minus the lidar-measured depth."""
    point_cam = pose_ops.apply(T_cam_veh, pose_ops.apply(pose_kf_origin, point_origin))
    res = point_cam[..., 2] - depth_measured
    return res[..., None], jnp.ones(res.shape, bool)


def pose_scale(pose1, pose0, target_scale):
    """``PoseRegularization`` (cost_functors_ceres.hpp:224-250):
    ‖translation(T1 ∘ T0⁻¹)‖ − target_scale."""
    delta_t = pose_ops.translation(pose_ops.relative(pose1, pose0))
    res = _safe_norm(delta_t, axis=-1) - target_scale
    return res[..., None], jnp.ones(res.shape, bool)


def speed(pose_cur, pose_before, pose_before2, dt_cur, dt_before):
    """``SpeedRegularization`` (cost_functors_ceres.hpp:253-298): scalar
    velocity difference of consecutive pose deltas."""
    v_cur = _safe_norm(
        pose_ops.translation(pose_ops.relative(pose_cur, pose_before)), axis=-1) / dt_cur
    v_before = _safe_norm(
        pose_ops.translation(pose_ops.relative(pose_before, pose_before2)), axis=-1) / dt_before
    res = v_cur - v_before
    return res[..., None], jnp.ones(res.shape, bool)


def speed_vector(pose_cur, pose_origin_before, vel_before, dt_cur):
    """``SpeedRegularizationVector2`` (cost_functors_ceres.hpp:300-353):
    3-vector velocity w.r.t. the (constant) previous pose minus the cached
    previous velocity. Only ``pose_cur`` is a variable.

    pose_origin_before: inverse of the previous keyframe pose (precomputed).
    """
    delta_t = pose_ops.translation(pose_ops.compose(pose_cur, pose_origin_before))
    res = delta_t / dt_cur - vel_before
    return res, jnp.ones(res.shape[:-1], bool)


def groundplane_height(pose_kf_origin, plane_dir, plane_dist, point_origin):
    """``GroundPlaneHeightRegularization`` (cost_functors_ceres.hpp:355-392):
    signed distance of the landmark (in keyframe frame) to the local plane:
    n · p_kf + d."""
    point_kf = pose_ops.apply(pose_kf_origin, point_origin)
    res = jnp.sum(plane_dir * point_kf, axis=-1) + plane_dist
    return res[..., None], jnp.ones(res.shape, bool)


def vector_difference(dir0, dir1):
    """``VectorDifferenceRegularization`` (cost_functors_ceres.hpp:394-414)."""
    res = dir0 - dir1
    return res, jnp.ones(res.shape[:-1], bool)


def translation_difference(pose0, pose1, pose2):
    """``TranslationDifferenceRegularization`` (cost_functors_ceres.hpp:440-469):
    constant-translation-delta (acceleration) regularizer:
    translation(T2∘T1⁻¹) − translation(T1∘T0⁻¹)."""
    d10 = pose_ops.translation(pose_ops.relative(pose1, pose0))
    d21 = pose_ops.translation(pose_ops.relative(pose2, pose1))
    res = d21 - d10
    return res, jnp.ones(res.shape[:-1], bool)


def groundplane_distance(dist0, dist1):
    """``GroundPlaneDistanceRegularization`` (cost_functors_ceres.hpp:507-526)."""
    res = jnp.asarray(dist0 - dist1)
    return res[..., None], jnp.ones(res.shape, bool)


def groundplane_motion(pose0, pose1, plane_dir0):
    """``GroundPlaneMotionRegularization`` (cost_functors_ceres.hpp:528-555):
    normalized forward motion must be ⟂ plane normal: n · (Δt/‖Δt‖)."""
    delta_t = pose_ops.translation(pose_ops.relative(pose0, pose1))
    n = _safe_norm(delta_t, axis=-1, keepdims=True)
    unit = delta_t / jnp.maximum(n, 1e-12)
    res = jnp.sum(plane_dir0 * unit, axis=-1)
    return res[..., None], jnp.ones(res.shape, bool)


def motion_model_circular(pose_cur, pose_prev):
    """``MotionModelRegularization`` (motion_model_regularization.hpp:32-78):
    planar circular-arc motion model. Residuals: y-motion vs r(1−cos yaw) and
    z-motion vs 0 (declared in the reference but not wired into solve)."""
    delta = pose_ops.relative(pose_cur, pose_prev)
    t = pose_ops.translation(delta)
    q = pose_ops.rotation(delta)
    # yaw of the delta rotation (around z, vehicle convention)
    siny = 2.0 * (q[..., 0] * q[..., 3] + q[..., 1] * q[..., 2])
    cosy = 1.0 - 2.0 * (q[..., 2] ** 2 + q[..., 3] ** 2)
    yaw = jnp.arctan2(siny, cosy)
    x = t[..., 0]
    small = jnp.abs(yaw) < 1e-3
    r = x / jnp.where(small, 1.0, jnp.sin(yaw))
    y_pred = jnp.where(small, 0.0, r * (1.0 - jnp.cos(yaw)))
    res = jnp.stack([t[..., 1] - y_pred, t[..., 2]], axis=-1)
    return res, jnp.ones(res.shape[:-1], bool)
