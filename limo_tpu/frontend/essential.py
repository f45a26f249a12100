"""Batched essential-matrix motion prior.

Reference: ``general_helpers.hpp:103-140`` (``calcMotion5Point``): OpenCV
``findEssentialMat`` (5-point RANSAC, prob 0.999, thres 1 px) +
``recoverPose``, with a 3 px mean-flow standstill gate, then translation
rescaled by prior speed × Δt (``getMotionUnscaled`` :209-231).

TPU re-design: RANSAC as a *fixed-hypothesis-count* batched kernel — H
minimal samples drawn with a counter-based hash, one vmapped 8-point solve
(SVD on 8×9), Sampson-distance scoring of all N correspondences against all
H hypotheses in one einsum, argmax inlier count, then a cheirality vote over
the 4 (R,t) decompositions. No data-dependent control flow; everything jits.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import pose as pose_ops
from ..geometry import quaternion as quat


class EssentialResult(NamedTuple):
    q: jnp.ndarray            # [4] rotation cam0→cam1 (wxyz)
    t: jnp.ndarray            # [3] unit translation
    inliers: jnp.ndarray      # [N] bool
    n_inliers: jnp.ndarray    # int
    ok: jnp.ndarray           # bool — enough flow + enough inliers


def _hash2(i, j):
    x = (i * jnp.uint32(0x9E3779B9)) ^ (j * jnp.uint32(0x85EBCA6B))
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


def _eight_point(x0, x1, w):
    """Weighted 8-point estimate of E from normalized coords.

    x0,x1: [M,2] normalized image coords; w: [M] 0/1 sample weights.
    Returns E [3,3] with essential singular-value structure enforced.
    """
    u0, v0 = x0[:, 0], x0[:, 1]
    u1, v1 = x1[:, 0], x1[:, 1]
    # epipolar constraint x1ᵀ E x0 = 0 rows
    A = jnp.stack([u1 * u0, u1 * v0, u1, v1 * u0, v1 * v0, v1, u0, v0,
                   jnp.ones_like(u0)], axis=-1)
    A = A * w[:, None]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    E = Vt[-1].reshape(3, 3)
    U, S, Vt2 = jnp.linalg.svd(E)
    s = (S[0] + S[1]) / 2.0
    E = U @ jnp.diag(jnp.array([s, s, 0.0], E.dtype)) @ Vt2
    return E


def _sampson_sq(E, x0, x1):
    """Squared Sampson distance of correspondences to the epipolar geometry."""
    ones = jnp.ones(x0.shape[:-1] + (1,), x0.dtype)
    p0 = jnp.concatenate([x0, ones], -1)
    p1 = jnp.concatenate([x1, ones], -1)
    Ex0 = p0 @ E.T      # [N,3]
    Etx1 = p1 @ E       # [N,3]
    num = jnp.sum(p1 * Ex0, -1) ** 2
    den = Ex0[:, 0] ** 2 + Ex0[:, 1] ** 2 + Etx1[:, 0] ** 2 + Etx1[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


def _decompose(E):
    """Four (R, t) candidates from E (Hartley-Zisserman)."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    return jnp.stack([R1, R1, R2, R2]), jnp.stack([t, -t, t, -t])


def _cheirality_depths(R, t, x0, x1):
    """Midpoint-free two-view depth signs for candidate (R,t): returns
    (z0, z1) per correspondence via the linear triangulation along rays."""
    f0 = jnp.concatenate([x0, jnp.ones(x0.shape[:-1] + (1,), x0.dtype)], -1)
    f1 = jnp.concatenate([x1, jnp.ones(x1.shape[:-1] + (1,), x1.dtype)], -1)
    Rf0 = f0 @ R.T
    # solve for depths: z1 * f1 = z0 * R f0 + t  → 2-unknown LS per point
    a = Rf0
    b = -f1
    # normal equations of [a b] [z0 z1]ᵀ = -t
    aa = jnp.sum(a * a, -1)
    ab = jnp.sum(a * b, -1)
    bb = jnp.sum(b * b, -1)
    at = jnp.sum(a * (-t), -1)
    bt = jnp.sum(b * (-t), -1)
    det = aa * bb - ab * ab
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    z0 = (at * bb - ab * bt) / det
    z1 = (aa * bt - ab * at) / det
    return z0, z1


def estimate_essential(uv0, uv1, match_mask, focal, principal,
                       num_hypotheses: int = 256,
                       thres_px: float = 1.0,
                       min_flow_px: float = 3.0,
                       seed: int = 0) -> EssentialResult:
    """Full motion-prior estimate from matched pixel coordinates.

    uv0, uv1: [N,2] matched points in frames 0 (older) and 1 (newer);
    returns the motion of frame1 relative to frame0 as (q, t) such that
    ``x_cam1 = R x_cam0 + t`` (OpenCV recoverPose convention).
    """
    dtype = uv0.dtype
    N = uv0.shape[0]
    H = num_hypotheses
    x0 = (uv0 - principal) / focal
    x1 = (uv1 - principal) / focal
    norm_thres_sq = (thres_px / focal) ** 2

    # standstill gate (general_helpers.hpp:111-124)
    flow = jnp.linalg.norm(uv1 - uv0, axis=-1)
    nm = jnp.maximum(jnp.sum(match_mask), 1)
    mean_flow = jnp.sum(jnp.where(match_mask, flow, 0.0)) / nm
    moving = mean_flow >= min_flow_px

    # --- draw H minimal samples of 8 valid correspondences -----------------
    hyp = jnp.arange(H, dtype=jnp.uint32)
    pick = jnp.arange(8, dtype=jnp.uint32)
    # map hash → index among valid matches via modular indexing of the
    # compacted valid list (stable fixed-shape gather)
    valid_idx = jnp.argsort(~match_mask)  # valid entries first
    n_valid = jnp.sum(match_mask).astype(jnp.uint32)
    r = _hash2(hyp[:, None] + jnp.uint32(seed * 7919), pick[None, :])
    sample = valid_idx[(r % jnp.maximum(n_valid, 1)).astype(jnp.int32)]  # [H,8]

    Es = jax.vmap(lambda s: _eight_point(x0[s], x1[s], jnp.ones(8, dtype)))(sample)

    # --- score all hypotheses ---------------------------------------------
    d = jax.vmap(lambda E: _sampson_sq(E, x0, x1))(Es)  # [H,N]
    inl = (d < norm_thres_sq) & match_mask[None, :]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    E = Es[best]

    # --- refine on the best inlier set (one weighted 8-point re-solve) -----
    w_in = inl[best].astype(dtype)
    E = _eight_point(x0, x1, w_in)
    d_ref = _sampson_sq(E, x0, x1)
    inliers = (d_ref < norm_thres_sq) & match_mask

    # --- recoverPose: cheirality vote over 4 decompositions ----------------
    Rs, ts = _decompose(E)

    def vote(R, t):
        z0, z1 = _cheirality_depths(R, t, x0, x1)
        return jnp.sum(((z0 > 0) & (z1 > 0) & inliers).astype(jnp.int32))

    votes = jax.vmap(vote)(Rs, ts)
    k = jnp.argmax(votes)
    R, t = Rs[k], ts[k]
    q = quat.qfrom_matrix(R)

    n_in = jnp.sum(inliers.astype(jnp.int32))
    ok = moving & (n_in >= 8)
    # standstill → identity motion (reference fallback :111-124)
    q = jnp.where(ok, q, quat.qidentity(dtype))
    t = jnp.where(ok, t, jnp.zeros(3, dtype))
    return EssentialResult(q=q, t=t, inliers=inliers & ok, n_inliers=n_in, ok=ok)


def motion_prior_unscaled(result: EssentialResult, T_cam_veh,
                          speed: float, dt: float):
    """``getMotionUnscaled`` (general_helpers.hpp:209-231): scale the unit
    translation by speed·Δt and conjugate camera motion into the vehicle
    frame. Returns pose delta T_cur_prev (vehicle frame, cur←prev)."""
    scale = speed * dt
    motion_cam = pose_ops.make(result.q, result.t * scale)
    Tcv = T_cam_veh
    Tvc = pose_ops.inverse(Tcv)
    return pose_ops.compose(Tvc, pose_ops.compose(motion_cam, Tcv))
