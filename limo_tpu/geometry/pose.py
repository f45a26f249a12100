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
