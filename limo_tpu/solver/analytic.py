"""Analytic jacobians of the observation residuals.

The autodiff (jacfwd) path materializes [L,K,C,3,6]+[L,K,C,3,3] jacobian
tensors whose HBM traffic dominates the solve (measured: batching windows
does not increase throughput ⇒ bandwidth-bound). The closed forms below are
exact (tested against autodiff to machine precision) and feed either the
fused einsum path or the Pallas assembly kernel without intermediate
materialization.

Derivation (conventions of :mod:`limo_tpu.geometry.pose`):
  p_veh = R(q) x + t           (pose keyframe←origin, ⊞: q'=exp(w)q, t'=t+dt)
  p_cam = R_cv p_veh + t_cv    (extrinsics constant)
  uv    = f * (p_x, p_y)/p_z + pp ;  depth residual = p_z − d

  ∂p_veh/∂w  = −2 [R(q) x]×   (half-angle tangent: exp(w) rotates by 2|w|)
  ∂p_veh/∂dt = I
  ∂p_veh/∂x  = R(q)
  ∂p_cam/∂·  = R_cv ∂p_veh/∂·
  ∂uv/∂p_cam = f/z [[1,0,−x/z],[0,1,−y/z]] ;  ∂depth/∂p_cam = (0,0,1)
"""

from __future__ import annotations

import jax.numpy as jnp


def skew(v):
    """[v]× for batched v [...,3] → [...,3,3]."""
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack([
        jnp.stack([z, -v[..., 2], v[..., 1]], -1),
        jnp.stack([v[..., 2], z, -v[..., 0]], -1),
        jnp.stack([-v[..., 1], v[..., 0], z], -1),
    ], -2)


def obs_residual_jac(R_kf, t_kf, x, uvd, focal, principal, R_cv, t_cv):
    """Residual + analytic jacobians for one (or batched) observation.

    R_kf [...,3,3], t_kf [...,3]: keyframe rotation/translation.
    x [...,3]: landmark (origin frame). uvd [...,3]: measurement.

    Returns (r [...,3], valid [...], Jp [...,3,6], Jl [...,3,3]) with the
    same validity semantics as :func:`limo_tpu.residuals.reprojection`
    (|z_cam| < 0.01 ⇒ invalid row pair; depth row always valid, caller
    masks by d>0)."""
    y = jnp.einsum("...ij,...j->...i", R_kf, x)          # R x
    p_veh = y + t_kf
    p_cam = jnp.einsum("...ij,...j->...i", R_cv, p_veh) + t_cv
    z = p_cam[..., 2]
    valid = jnp.abs(z) >= 0.01
    safe_z = jnp.where(valid, z, 1.0)
    inv_z = 1.0 / safe_z
    xy = p_cam[..., :2] * inv_z[..., None]
    uv_pred = focal[..., None] * xy + principal
    r_uv = uv_pred - uvd[..., :2]
    r_d = z - uvd[..., 2]
    r = jnp.concatenate([r_uv, r_d[..., None]], -1)

    # ∂(uv,depth)/∂p_cam  [...,3,3]
    fz = focal * inv_z
    row_u = jnp.stack([fz, jnp.zeros_like(fz), -fz * xy[..., 0]], -1)
    row_v = jnp.stack([jnp.zeros_like(fz), fz, -fz * xy[..., 1]], -1)
    row_d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], r.dtype),
                             row_u.shape)
    D = jnp.stack([row_u, row_v, row_d], -2)

    # ∂p_cam/∂w = −2 R_cv [y]× ; ∂p_cam/∂dt = R_cv ; ∂p_cam/∂x = R_cv R_kf
    Rcv_sy = jnp.einsum("...ij,...jk->...ik", R_cv, skew(y))
    dp_dw = -2.0 * Rcv_sy
    dp_dt = jnp.broadcast_to(R_cv, dp_dw.shape)
    dp_dx = jnp.einsum("...ij,...jk->...ik", R_cv, R_kf)

    Jp = jnp.concatenate([
        jnp.einsum("...ri,...ik->...rk", D, dp_dw),
        jnp.einsum("...ri,...ik->...rk", D, dp_dt),
    ], -1)                                               # [...,3,6]
    Jl = jnp.einsum("...ri,...ik->...rk", D, dp_dx)      # [...,3,3]
    return r, valid, Jp, Jl
