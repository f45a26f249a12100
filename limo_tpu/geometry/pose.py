"""7-parameter pose ops (quat wxyz + translation xyz), batched.

Convention (reference ``definitions.hpp:75-83``): a pose array
``p = [qw,qx,qy,qz,tx,ty,tz]`` denotes the isometry ``T = Trans(t) ∘ Rot(q)``,
i.e. ``apply(p, x) = R(q) @ x + t``. BA keyframe poses are stored
*keyframe ← origin* (world-to-body), so ``apply(pose_kf, p_origin)`` yields the
point in keyframe coordinates (``keyframe_bundle_adjustment/README.md:128-141``).
"""

from __future__ import annotations

import jax.numpy as jnp

from .quaternion import (
    qboxplus,
    qconj,
    qfrom_axis_angle,
    qidentity,
    qmul,
    qnormalize,
    qrot,
    qto_matrix,
    qfrom_matrix,
)


def identity(dtype=jnp.float32):
    return jnp.concatenate([qidentity(dtype), jnp.zeros(3, dtype=dtype)])


def rotation(p):
    return p[..., :4]


def translation(p):
    return p[..., 4:]


def make(q, t):
    return jnp.concatenate([q, t], axis=-1)


def apply(p, x):
    """apply(p, x) = R(q) x + t; x has shape [...,3] broadcastable with p."""
    return qrot(p[..., :4], x) + p[..., 4:]


def compose(p1, p2):
    """T1 ∘ T2 as pose arrays: apply(compose(p1,p2), x) == apply(p1, apply(p2, x))."""
    q = qmul(p1[..., :4], p2[..., :4])
    t = qrot(p1[..., :4], p2[..., 4:]) + p1[..., 4:]
    return make(q, t)


def inverse(p):
    qi = qconj(qnormalize(p[..., :4]))
    return make(qi, -qrot(qi, p[..., 4:]))


def relative(p1, p0):
    """T1 ∘ T0⁻¹ — the delta the reference uses everywhere for consecutive
    world-to-body poses (e.g. ``cost_functors_ceres.hpp:236``)."""
    return compose(p1, inverse(p0))


def boxplus(p, delta):
    """⊞ with 6-dof tangent [rot(3), trans(3)]: q' = exp(w) ⊗ q, t' = t + dt.

    Matches the reference's ProductParameterization(Quaternion ⊞, Identity(3))
    (``bundle_adjuster_keyframes.cpp:161-196``).
    """
    q = qboxplus(p[..., :4], delta[..., :3])
    t = p[..., 4:] + delta[..., 3:]
    return make(q, t)


def boxplus_circular_2d(p, delta):
    """⊞ with 2-dof planar circular-arc tangent [yaw, arc_length].

    Mirrors the reference's ``CircularMotionPlus2d``
    (local_parameterizations.hpp:170-227): the delta pose translates by the
    chord of a circle segment (dx = r·sin(yaw), dy = r·(1−cos yaw), r =
    arc/yaw; straight-line fallback below 1e-3 rad) and rotates by yaw
    around z, then left-composes: p' = delta_pose ∘ p."""
    yaw = delta[..., 0]
    arc = delta[..., 1]
    small = jnp.abs(yaw) < 1e-3
    safe_yaw = jnp.where(small, 1.0, yaw)
    r = arc / safe_yaw
    dx = jnp.where(small, arc, r * jnp.sin(yaw))
    dy = jnp.where(small, 0.0, r * (1.0 - jnp.cos(yaw)))
    zero = jnp.zeros_like(yaw)
    q = jnp.stack([jnp.cos(yaw / 2), zero, zero, jnp.sin(yaw / 2)], -1)
    t = jnp.stack([dx, dy, zero], -1)
    return compose(make(q, t), p)


def boxplus_fix_scale_circular(p, delta, fix_value=1.0):
    """⊞ with 3-dof euler tangent [pitch, yaw, roll] under fixed step length.

    Mirrors the reference's ``FixScaleCircularMotionPlus``
    (local_parameterizations.hpp:229-272), which works in camera coords
    (z forward, x right): the pose advances a fixed arc ``fix_value`` along a
    circle segment bent by ``yaw`` (rotation around the y axis) — forward step
    ``dz = sinc(yaw)·fix``, lateral step ``dx = (1−cos yaw)/yaw·fix`` — and the
    rotation delta (Rz(roll)·Ry(yaw)·Rx(pitch), the ceres euler convention) is
    *right*-composed: ``q' = q ⊗ q_delta``."""
    pitch, yaw, roll = delta[..., 0], delta[..., 1], delta[..., 2]
    small = jnp.abs(yaw) < 1e-3
    safe_yaw = jnp.where(small, 1.0, yaw)
    dz = jnp.where(small, fix_value, jnp.sin(yaw) / safe_yaw * fix_value)
    dx = jnp.where(small, 0.0, (1.0 - jnp.cos(yaw)) / safe_yaw * fix_value)
    ex = jnp.zeros(delta.shape[:-1] + (3,), p.dtype).at[..., 0].set(1.0)
    ey = jnp.zeros(delta.shape[:-1] + (3,), p.dtype).at[..., 1].set(1.0)
    ez = jnp.zeros(delta.shape[:-1] + (3,), p.dtype).at[..., 2].set(1.0)
    q_delta = qmul(qfrom_axis_angle(ez, roll),
                   qmul(qfrom_axis_angle(ey, yaw), qfrom_axis_angle(ex, pitch)))
    q = qmul(p[..., :4], q_delta)
    zero = jnp.zeros_like(dx)
    t = p[..., 4:] + jnp.stack([dx, zero, dz], -1)
    return make(q, t)


def tangent_basis(poses, mode):
    """Per-keyframe 6-dof tangent-space basis for alternate motion
    parameterizations (``setParameterization``,
    bundle_adjuster_keyframes.cpp:172-183).

    Returns ``(B [K,6,6], dim_mask [6])``: Gauss-Newton runs on the reduced
    coordinates ``d`` with full-tangent step ``B @ d`` (columns beyond the
    mode's dof are zeroed via ``dim_mask``). The bases equal the jacobian of
    the corresponding reference retraction at delta=0, so first-order
    behavior matches the Ceres local parameterizations exactly:

    - ``full_dof``:      identity (ProductParameterization(Quaternion, Id3)).
    - ``fix_rotation``:  identity basis, rotation dims masked out.
    - ``circular_2d``:   2 dof [yaw, arc] (``CircularMotionPlus2d``,
      local_parameterizations.hpp:170-227). Left-composition
      ``p' = delta(yaw,arc) ∘ p`` linearizes to w = yaw·ẑ,
      dt = arc·x̂ + yaw·(ẑ×t) in the keyframe frame.
    """
    K = poses.shape[0]
    dtype = poses.dtype
    eye = jnp.broadcast_to(jnp.eye(6, dtype=dtype), (K, 6, 6))
    if mode == "full_dof":
        return eye, jnp.ones((6,), dtype)
    if mode == "fix_rotation":
        return eye, jnp.array([0, 0, 0, 1, 1, 1], dtype)
    if mode == "circular_2d":
        t = poses[:, 4:]
        zeros = jnp.zeros((K,), dtype)
        ones = jnp.ones((K,), dtype)
        halves = jnp.full((K,), 0.5, dtype)
        # column 0: yaw — rotation about z (half-angle chart: qexp has
        # |w| = θ/2, so dw/dyaw = ẑ/2) plus the induced translation ẑ×t
        col_yaw = jnp.stack([zeros, zeros, halves, -t[:, 1], t[:, 0], zeros], -1)
        # column 1: arc — forward translation along the keyframe x axis
        col_arc = jnp.stack([zeros, zeros, zeros, ones, zeros, zeros], -1)
        zero_col = jnp.zeros((K, 6), dtype)
        B = jnp.stack([col_yaw, col_arc, zero_col, zero_col, zero_col,
                       zero_col], -1)
        return B, jnp.array([1, 1, 0, 0, 0, 0], dtype)
    raise ValueError(f"unknown motion parameterization: {mode!r}")


def normalize(p):
    return make(qnormalize(p[..., :4]), p[..., 4:])


def to_matrix(p):
    """pose7 → 4x4 homogeneous matrix."""
    R = qto_matrix(qnormalize(p[..., :4]))
    t = p[..., 4:]
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=p.dtype), p.shape[:-1] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def from_matrix(m):
    return make(qfrom_matrix(m[..., :3, :3]), m[..., :3, 3])
