"""Batched linear-midpoint triangulation.

Reference: ``keyframe_bundle_adjustment/internal/triangulator.hpp:51-75`` —
minimize sum_i || (I - r_i r_i^T)(p - c_i) ||^2 over world-frame ray directions
r_i and camera centers c_i; accumulate A = sum(I - r r^T), b = sum((I - r r^T) c)
and solve the 3x3 system.

TPU design: one fused einsum over the observation axis + a batched 3x3 solve,
``vmap``-able over the landmark axis — no per-landmark loop.
"""

from __future__ import annotations

import jax.numpy as jnp


def triangulate_rays(rays, centers, mask=None):
    """Midpoint triangulation of one landmark from many rays.

    rays:    [N,3] unit ray directions in world/origin frame
    centers: [N,3] camera centers in world/origin frame
    mask:    [N] optional bool validity mask

    Returns (point [3], ok bool). ``ok`` is False when the system is rank
    deficient (fewer than 2 valid, or near-parallel rays).
    """
    dtype = rays.dtype
    if mask is None:
        mask = jnp.ones(rays.shape[:-1], bool)
    m = mask.astype(dtype)[..., None, None]
    eye = jnp.eye(3, dtype=dtype)
    # P_i = I - r_i r_i^T  (projector onto plane orthogonal to the ray)
    P = eye - rays[..., :, None] * rays[..., None, :]
    P = P * m
    A = jnp.sum(P, axis=-3)
    b = jnp.sum(jnp.einsum("...ij,...j->...i", P, centers), axis=-2)
    # Tikhonov-guard the solve so masked-out landmarks don't produce NaNs;
    # validity is reported separately via the determinant.
    det = jnp.linalg.det(A)
    ok = jnp.abs(det) > 1e-9
    A_safe = A + (1.0 - ok.astype(dtype)) * eye
    point = jnp.linalg.solve(A_safe, b)
    return point, ok


def triangulate_batch(rays, centers, mask):
    """Triangulate L landmarks from up to N observations each.

    rays:    [L,N,3], centers: [L,N,3], mask: [L,N]
    Returns (points [L,3], ok [L]).
    """
    dtype = rays.dtype
    m = mask.astype(dtype)[..., None, None]
    eye = jnp.eye(3, dtype=dtype)
    P = (eye - rays[..., :, None] * rays[..., None, :]) * m
    A = jnp.sum(P, axis=-3)  # [L,3,3]
    b = jnp.einsum("lnij,lnj->li", P, centers)
    det = jnp.linalg.det(A)
    ok = (jnp.abs(det) > 1e-9) & (jnp.sum(mask, axis=-1) >= 2)
    A_safe = A + (1.0 - ok.astype(dtype))[..., None, None] * eye
    points = jnp.linalg.solve(A_safe, b[..., None])[..., 0]
    return points, ok
