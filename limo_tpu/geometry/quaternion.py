"""Quaternion algebra for TPU-native bundle adjustment.

Quaternions are stored ``(w, x, y, z)`` in the last axis, matching the
reference pose layout (``keyframe_bundle_adjustment/internal/definitions.hpp:23``:
poses are ``[qw, qx, qy, qz, tx, ty, tz]``).

All functions are shape-polymorphic over leading batch axes and dtype
polymorphic (f32 on TPU, f64 under ``jax_enable_x64`` for parity tests).

The box-plus retraction matches the reference's local parameterization
(``internal/local_parameterizations.hpp:47-92`` / Ceres
``QuaternionParameterization``): ``q' = exp(delta) * q`` with the *half angle*
convention ``exp(w) = (cos|w|, sin|w|/|w| * w)`` — a tangent vector of norm
``a`` rotates by angle ``2a``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def qidentity(dtype=jnp.float32):
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def qmul(q1, q2):
    """Hamilton product q1 ⊗ q2, (w,x,y,z) layout, batched on leading axes."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def qconj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def qinv(q):
    """Inverse for (possibly) non-unit quaternions."""
    return qconj(q) / jnp.sum(q * q, axis=-1, keepdims=True)


def qnormalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def qrot(q, v):
    """Rotate vector(s) v by unit quaternion(s) q.

    Uses the expanded form ``v' = v + 2*w*(u×v) + 2*u×(u×v)`` (u = vector part)
    which is cheaper than two Hamilton products and autodiff-friendly.
    """
    u = q[..., 1:]
    w = q[..., :1]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def qexp(w):
    """Tangent → quaternion, half-angle convention (|w| = theta/2).

    Matches Ceres' QuaternionParameterization ⊞ used by the reference
    (``local_parameterizations.hpp:57-76``). Taylor-guarded at 0 so that
    jacobians at delta=0 are exact (the reference uses the same first-order
    trick for autodiff stability).
    """
    sq = jnp.sum(w * w, axis=-1, keepdims=True)
    norm = jnp.sqrt(jnp.maximum(sq, _EPS))
    # sin(n)/n with series fallback for tiny n (keeps grad exact at 0).
    small = sq < 1e-12
    sinc = jnp.where(small, 1.0 - sq / 6.0, jnp.sin(norm) / norm)
    cos = jnp.where(small, 1.0 - sq / 2.0, jnp.cos(norm))
    return jnp.concatenate([cos, sinc * w], axis=-1)


def qlog(q):
    """Unit quaternion → tangent (half-angle convention), inverse of qexp."""
    qn = qnormalize(q)
    # Make w >= 0 so the angle is in [0, pi].
    sign = jnp.where(qn[..., :1] < 0, -1.0, 1.0)
    qn = qn * sign
    w = jnp.clip(qn[..., :1], -1.0, 1.0)
    vec = qn[..., 1:]
    vn = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    angle = jnp.arctan2(vn, w)
    scale = jnp.where(vn < 1e-9, 1.0 + (1.0 - w), angle / jnp.maximum(vn, _EPS))
    return scale * vec


def qboxplus(q, delta):
    """q' = exp(delta) ⊗ q  — left-multiplied retraction (reference ⊞)."""
    return qmul(qexp(delta), q)


def qangle(q0, q1):
    """Rotation angle (radians) between two unit quaternions.

    Mirrors ``calcQuaternionDiff`` (``definitions.cpp:104-111``).
    """
    d = qmul(qinv(q1), q0)
    d = qnormalize(d)
    w = jnp.clip(jnp.abs(d[..., 0]), 0.0, 1.0)
    return 2.0 * jnp.arccos(w)


def qfrom_axis_angle(axis, angle):
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    half = jnp.asarray(angle)[..., None] / 2.0
    return jnp.concatenate([jnp.cos(half), jnp.sin(half) * axis], axis=-1)


def qto_matrix(q):
    """Unit quaternion → 3x3 rotation matrix (batched)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def qfrom_matrix(m):
    """3x3 rotation matrix → unit quaternion (w,x,y,z), batched, branch-free.

    Shepperd's method via lax.switch on the largest diagonal pivot would be
    branchy; instead we compute all four candidate quaternions and select the
    numerically best (largest pivot) with where-masks — TPU friendly.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, one per pivot; each 4*q_i^2 = 1 + 2*m_ii - tr (or 1+tr).
    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS))

    qw = safe_sqrt(1.0 + tr) / 2.0
    c0 = jnp.stack([qw, (m21 - m12) / (4 * qw), (m02 - m20) / (4 * qw), (m10 - m01) / (4 * qw)], -1)
    qx = safe_sqrt(1.0 + m00 - m11 - m22) / 2.0
    c1 = jnp.stack([(m21 - m12) / (4 * qx), qx, (m01 + m10) / (4 * qx), (m02 + m20) / (4 * qx)], -1)
    qy = safe_sqrt(1.0 - m00 + m11 - m22) / 2.0
    c2 = jnp.stack([(m02 - m20) / (4 * qy), (m01 + m10) / (4 * qy), qy, (m12 + m21) / (4 * qy)], -1)
    qz = safe_sqrt(1.0 - m00 - m11 + m22) / 2.0
    c3 = jnp.stack([(m10 - m01) / (4 * qz), (m02 + m20) / (4 * qz), (m12 + m21) / (4 * qz), qz], -1)

    pivots = jnp.stack([tr, m00 - m11 - m22, -m00 + m11 - m22, -m00 - m11 + m22], -1)
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)  # [..., 4, 4]
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    return qnormalize(q)
