"""Pinhole camera model, batched + masked.

Reference: ``keyframe_bundle_adjustment/internal/definitions.hpp:93-124`` —
single focal length, principal point, extrinsic pose_camera_vehicle
(camera ← vehicle). The z-guard reproduces the reference's projection validity
check (``cost_functors_ceres.hpp:78-82``: |z| < 0.01 ⇒ invalid residual).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import pose as pose_ops

Z_GUARD = 0.01


class CameraRig(NamedTuple):
    """A rig of C pinhole cameras attached to the vehicle frame.

    focal:        [C]   single focal length per camera (reference style)
    principal:    [C,2] principal point (cx, cy)
    T_cam_veh:    [C,7] pose camera ← vehicle (extrinsics)
    """

    focal: jnp.ndarray
    principal: jnp.ndarray
    T_cam_veh: jnp.ndarray

    @property
    def num_cameras(self) -> int:
        return self.focal.shape[0]

    @staticmethod
    def single(focal, cx, cy, T_cam_veh=None, dtype=jnp.float32):
        if T_cam_veh is None:
            T_cam_veh = pose_ops.identity(dtype)
        return CameraRig(
            focal=jnp.array([focal], dtype=dtype),
            principal=jnp.array([[cx, cy]], dtype=dtype),
            T_cam_veh=jnp.asarray(T_cam_veh, dtype=dtype)[None, :],
        )


def project(point_cam, focal, principal):
    """Project camera-frame point(s) → (uv [..,2], valid [..] bool).

    Invalid when |z| < Z_GUARD (reference ``cost_functors_ceres.hpp:78``).
    The division is guarded so gradients stay finite on masked entries.
    """
    z = point_cam[..., 2]
    valid = jnp.abs(z) >= Z_GUARD
    safe_z = jnp.where(valid, z, 1.0)
    xy = point_cam[..., :2] / safe_z[..., None]
    uv = focal[..., None] * xy + principal
    return uv, valid


def backproject(uv, depth, focal, principal):
    """(u,v,z) → camera-frame 3D point. Inverse of project for z>0."""
    xy = (uv - principal) / focal[..., None]
    z = jnp.asarray(depth)[..., None]
    return jnp.concatenate([xy * z, z], axis=-1)


def viewing_ray(uv, focal, principal):
    """Unit viewing ray in camera frame for pixel(s) uv.

    Mirrors ``Camera::getViewingRay`` (``definitions.cpp:44-53``).
    """
    r = backproject(uv, jnp.ones(uv.shape[:-1], uv.dtype), focal, principal)
    return r / jnp.linalg.norm(r, axis=-1, keepdims=True)
