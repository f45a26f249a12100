"""Normal-equation assembly with per-landmark Schur elimination.

This replaces Ceres' problem graph + DENSE_SCHUR
(``bundle_adjuster_keyframes.cpp:564-627`` residual wiring,
``robust_solving.hpp:93-108`` solver config) with a fixed-shape, masked,
batched pipeline:

  parameters  δ = [pose tangents K×6 | plane tangents K×4 | landmarks L×3]
  residuals   r = [reprojection 2/obs | depth 1/obs | gp-height 1/lm | regs]

Per-observation jacobians come from forward-mode autodiff of the residual
kernels w.r.t. local tangents (the reference's local parameterizations are the
``boxplus`` retractions in :mod:`limo_tpu.geometry.pose`), vmapped over the
flattened landmark-major observation axis. The reduced (pose+plane) system is
dense (P = 10K ≈ 200 — the same size Ceres dense-solves after Schur
elimination); landmark blocks are eliminated with batched 3×3 inverses.

Robust losses enter as IRLS row weights sqrt(w·ρ'(s)) (Cauchy for
reprojection/depth, Huber for groundplane height), matching Ceres'
ScaledLoss(CauchyLoss(a), w) wiring in ``addKeyframeToProblem``.

All L-axis reductions are ``segment``-free sums over the landmark-major axis,
so the whole assembly shards over a landmark mesh axis with one ``psum`` of
(H_pp, b_p, S-correction) — see :mod:`limo_tpu.parallel.sharding`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import residuals as res_k
from ..geometry import pose as pose_ops
from ..robust import cauchy_weight, huber_weight
from ..state import Selection, Window

PD = 10  # per-keyframe parameter dims: 6 pose tangent + 4 plane tangent


def plane_boxplus(plane, delta):
    """Plane retraction: additive-then-renormalize normal (reference
    ``FixScaleVectorPlus``, local_parameterizations.hpp:135-165) +
    additive distance."""
    n = plane[..., :3] + delta[..., :3]
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    d = plane[..., 3] + delta[..., 3]
    return jnp.concatenate([n, d[..., None]], axis=-1)


class NormalEqs(NamedTuple):
    H_pp: jnp.ndarray   # [P,P] pose+plane block (undamped, gauge-masked)
    b_p: jnp.ndarray    # [P]   -J_pᵀ r
    V: jnp.ndarray      # [L,3,3] landmark blocks
    b_l: jnp.ndarray    # [L,3]
    W: jnp.ndarray      # [L,P,3] cross blocks
    cost: jnp.ndarray   # robust cost (0.5 Σ w·ρ(s)), Ceres convention
    param_mask: jnp.ndarray  # [P] 1 for free dims, 0 for fixed/gauge dims
    lm_mask: jnp.ndarray     # [L] bool landmarks participating


class ResidualStats(NamedTuple):
    """Raw (loss-free) per-landmark max block norms per family + counts —
    the inputs to trimming (``robust_solving.cpp:16-91``)."""

    repr_score: jnp.ndarray   # [L] max ‖r_repr‖ over obs of landmark
    depth_score: jnp.ndarray  # [L]
    gp_score: jnp.ndarray     # [L]
    repr_valid: jnp.ndarray   # [L] bool has ≥1 repr residual
    depth_valid: jnp.ndarray  # [L]
    gp_valid: jnp.ndarray     # [L]
    n_depth: jnp.ndarray      # scalar int — depth residual count
    n_gp: jnp.ndarray         # scalar int — gp residual count


# ---------------------------------------------------------------------------
# Per-observation residual kernel (reprojection + optional depth fused).
# ---------------------------------------------------------------------------

def _obs_residual(pose_tangent, lm_delta, pose, lm, uvd, focal, principal,
                  T_cam_veh, compensate_rotation=False):
    """3-vector residual [repr_u, repr_v, depth] for one observation, as a
    function of the local tangents (for autodiff)."""
    p = pose_ops.boxplus(pose, pose_tangent)
    x = lm + lm_delta
    rr, r_valid = res_k.reprojection(p, x, uvd[:2], focal, principal, T_cam_veh,
                                     compensate_rotation=compensate_rotation)
    rd, _ = res_k.landmark_depth(p, x, uvd[2], T_cam_veh)
    return jnp.concatenate([rr, rd]), r_valid


def _gp_residual(pose_tangent, plane_tangent, lm_delta, pose, plane, lm):
    """Groundplane height residual for one landmark vs its attached keyframe."""
    p = pose_ops.boxplus(pose, pose_tangent)
    pl = plane_boxplus(plane, plane_tangent)
    r, _ = res_k.groundplane_height(p, pl[:3], pl[3], lm + lm_delta)
    return r


def assemble(window: Window, sel: Selection, rig, cfg,
             compensate_rotation: bool = False,
             pose_only: bool = False,
             speed_reg=None) -> tuple[NormalEqs, ResidualStats]:
    """Build the (masked, undamped) normal equations at the current state.

    speed_reg: optional (kf_index, pose_origin_before, vel_before, dt, weight)
    for the motion-only constant-velocity residual
    (``adjustPoseOnly``:835-853).
    """
    K, L, C = window.K, window.L, window.C
    P = K * PD
    dtype = window.poses.dtype
    f = rig.focal.astype(dtype)
    pp = rig.principal.astype(dtype)
    Tcv = rig.T_cam_veh.astype(dtype)

    robust_cfg = cfg.robust
    reg_cfg = cfg.regularization

    # ---- flatten observations landmark-major: index i -> (l, k, c) ----
    N = L * K * C
    lm_idx = jnp.arange(N, dtype=jnp.int32) // (K * C)
    kf_idx = (jnp.arange(N, dtype=jnp.int32) // C) % K
    cam_idx = jnp.arange(N, dtype=jnp.int32) % C

    uvd = window.obs.reshape(N, 3)
    obs_ok = window.obs_mask.reshape(N)

    lm_active = window.lm_valid & sel.lm_selected
    obs_ok = obs_ok & lm_active[lm_idx] & window.kf_valid[kf_idx]

    poses_o = window.poses[kf_idx]
    lms_o = window.lm_pos[lm_idx]
    f_o = f[cam_idx]
    pp_o = pp[cam_idx]
    Tcv_o = Tcv[cam_idx]

    zero6 = jnp.zeros((N, 6), dtype)
    zero3 = jnp.zeros((N, 3), dtype)

    def obs_fn(pt, ld, pose, lm, uvd1, f1, pp1, tcv1):
        return _obs_residual(pt, ld, pose, lm, uvd1, f1, pp1, tcv1,
                             compensate_rotation=compensate_rotation)

    # jacfwd over the 9 tangent dims (cheap: 9 JVPs, vectorized by vmap)
    jac_fn = jax.jacfwd(lambda pt, ld, *a: obs_fn(pt, ld, *a)[0], argnums=(0, 1))
    r_obs, obs_proj_ok = jax.vmap(obs_fn)(zero6, zero3, poses_o, lms_o, uvd, f_o, pp_o, Tcv_o)
    Jp_obs, Jl_obs = jax.vmap(jac_fn)(zero6, zero3, poses_o, lms_o, uvd, f_o, pp_o, Tcv_o)
    # r_obs [N,3], Jp_obs [N,3,6], Jl_obs [N,3,3]

    repr_ok = obs_ok & obs_proj_ok
    depth_ok = obs_ok & (uvd[:, 2] > 0) & window.lm_has_depth[lm_idx]

    # ---- robust IRLS row weights --------------------------------------
    s_repr = jnp.sum(r_obs[:, :2] ** 2, axis=-1)
    s_depth = r_obs[:, 2] ** 2
    w_lm = window.lm_weight[lm_idx]
    w_repr = w_lm * cauchy_weight(s_repr, robust_cfg.reprojection_thres)
    w_depth = w_lm * cauchy_weight(s_depth, robust_cfg.depth_thres)
    w_repr = jnp.where(repr_ok, w_repr, 0.0)
    w_depth = jnp.where(depth_ok, w_depth, 0.0)
    row_w = jnp.stack([w_repr, w_repr, w_depth], axis=-1)  # [N,3]

    # robust cost (Ceres: 0.5 Σ w ρ(s))
    a2r = robust_cfg.reprojection_thres ** 2
    a2d = robust_cfg.depth_thres ** 2
    rho_repr = a2r * jnp.log1p(s_repr / a2r)
    rho_depth = a2d * jnp.log1p(s_depth / a2d)
    cost = 0.5 * jnp.sum(jnp.where(repr_ok, w_lm * rho_repr, 0.0)) \
        + 0.5 * jnp.sum(jnp.where(depth_ok, w_lm * rho_depth, 0.0))

    # ---- scatter into blocks ------------------------------------------
    # weighted jacobians
    Jp_w = Jp_obs * row_w[:, :, None]   # rows scaled by w (≙ σ² on JᵀJ)
    # U (pose-block) contributions: per-k 6x6
    U_k = jnp.zeros((K, 6, 6), dtype).at[kf_idx].add(
        jnp.einsum("nri,nrj->nij", Jp_w, Jp_obs))
    b_pose_k = jnp.zeros((K, 6), dtype).at[kf_idx].add(
        -jnp.einsum("nri,nr->ni", Jp_w, r_obs))
    # V landmark blocks [L,3,3]
    V = jnp.zeros((L, 3, 3), dtype).at[lm_idx].add(
        jnp.einsum("nri,nrj->nij", Jl_obs * row_w[:, :, None], Jl_obs))
    b_l = jnp.zeros((L, 3), dtype).at[lm_idx].add(
        -jnp.einsum("nri,nr->ni", Jl_obs * row_w[:, :, None], r_obs))
    # W cross blocks, stored per (l,k): [L,K,6,3], then embedded in [L,P,3]
    flat_lk = lm_idx * K + kf_idx
    W_lk6 = jnp.zeros((L * K, 6, 3), dtype).at[flat_lk].add(
        jnp.einsum("nri,nrj->nij", Jp_w, Jl_obs))
    W_lk6 = W_lk6.reshape(L, K, 6, 3)

    # ---- groundplane height residuals (one per gp landmark) ------------
    gp_kf = sel.gp_kf
    gp_on = lm_active & window.lm_is_gp & (sel.gp_weight > 0) & window.kf_valid[gp_kf]
    gp_poses = window.poses[gp_kf]
    gp_planes = window.planes[gp_kf]
    z6 = jnp.zeros((L, 6), dtype)
    z4 = jnp.zeros((L, 4), dtype)
    z3 = jnp.zeros((L, 3), dtype)
    r_gp = jax.vmap(_gp_residual)(z6, z4, z3, gp_poses, gp_planes, window.lm_pos)[:, 0]
    Jgp = jax.vmap(jax.jacfwd(_gp_residual, argnums=(0, 1, 2)))(
        z6, z4, z3, gp_poses, gp_planes, window.lm_pos)
    Jgp_pose, Jgp_plane, Jgp_lm = (j[:, 0, :] for j in Jgp)  # [L,6],[L,4],[L,3]

    s_gp = r_gp ** 2
    w_gp = sel.gp_weight * huber_weight(s_gp, reg_cfg.gp_height_huber_delta)
    w_gp = jnp.where(gp_on, w_gp, 0.0)
    # Huber rho for cost
    hd = reg_cfg.gp_height_huber_delta
    rho_gp = jnp.where(s_gp <= hd * hd, s_gp, 2.0 * hd * jnp.sqrt(jnp.maximum(s_gp, 1e-20)) - hd * hd)
    cost = cost + 0.5 * jnp.sum(jnp.where(gp_on, sel.gp_weight * rho_gp, 0.0))

    Jgp_kp = jnp.concatenate([Jgp_pose, Jgp_plane], axis=-1)  # [L,10] (pose+plane of gp_kf)
    U_gp = jnp.zeros((K, PD, PD), dtype).at[gp_kf].add(
        w_gp[:, None, None] * Jgp_kp[:, :, None] * Jgp_kp[:, None, :])
    b_gp_k = jnp.zeros((K, PD), dtype).at[gp_kf].add(
        -(w_gp * r_gp)[:, None] * Jgp_kp)
    V = V + w_gp[:, None, None] * Jgp_lm[:, :, None] * Jgp_lm[:, None, :]
    b_l = b_l - (w_gp * r_gp)[:, None] * Jgp_lm
    # gp cross term into W at (l, gp_kf): [10,3] block
    W_gp = w_gp[:, None, None] * Jgp_kp[:, :, None] * Jgp_lm[:, None, :]  # [L,10,3]

    # ---- assemble dense H_pp [P,P] ------------------------------------
    H_pp = jnp.zeros((P, P), dtype)
    # embed per-k blocks: pose 6x6 at (10k,10k), gp 10x10 at (10k,10k)
    kk = jnp.arange(K)
    blocks = jnp.zeros((K, PD, PD), dtype)
    blocks = blocks.at[:, :6, :6].add(U_k) + U_gp
    # scatter block-diagonal
    row_ix = (kk[:, None, None] * PD + jnp.arange(PD)[None, :, None])
    col_ix = (kk[:, None, None] * PD + jnp.arange(PD)[None, None, :])
    H_pp = H_pp.at[row_ix, col_ix].add(blocks)
    b_p = jnp.zeros((K, PD), dtype).at[:, :6].add(b_pose_k)
    b_p = (b_p + b_gp_k).reshape(P)

    # embed W: [L,K,10,3] -> [L,P,3]
    W_full = jnp.zeros((L, K, PD, 3), dtype)
    W_full = W_full.at[:, :, :6, :].set(W_lk6)
    W_full = W_full.at[jnp.arange(L), gp_kf].add(W_gp)
    W_full = W_full.reshape(L, P, 3)

    # ---- regularization residuals (dense over pose+plane params) -------
    reg_r, reg_w, reg_J = _regularizer_system(window, sel, cfg, speed_reg, pose_only)
    # reg_r [R], reg_w [R], reg_J [R,P]
    H_pp = H_pp + jnp.einsum("r,ri,rj->ij", reg_w, reg_J, reg_J)
    b_p = b_p - jnp.einsum("r,ri,r->i", reg_w, reg_J, reg_r)
    cost = cost + 0.5 * jnp.sum(reg_w * reg_r * reg_r)

    # ---- gauge / fixation masks ---------------------------------------
    kf_free = window.kf_valid & (~window.fix_pose)
    pose_dim_mask = jnp.repeat(kf_free, 6).reshape(K, 6)
    plane_free = window.plane_valid & window.kf_valid
    plane_dim_mask = jnp.concatenate(
        [jnp.repeat(plane_free, 3).reshape(K, 3),
         (plane_free & (~sel.plane_dist_fixed))[:, None]], axis=-1)
    param_mask = jnp.concatenate([pose_dim_mask, plane_dim_mask], -1).reshape(P)
    param_mask = param_mask.astype(dtype)

    if pose_only:
        # motion-only: landmarks fixed (deactivateLandmarks, :221-270)
        lm_free = jnp.zeros((L,), bool)
    else:
        lm_free = lm_active

    # apply masks: zero fixed rows/cols; unit diagonal added later w/ damping
    H_pp = H_pp * param_mask[:, None] * param_mask[None, :]
    b_p = b_p * param_mask
    W_full = W_full * param_mask[None, :, None] * lm_free[:, None, None]
    V = jnp.where(lm_free[:, None, None], V, jnp.eye(3, dtype=dtype)[None])
    b_l = b_l * lm_free[:, None]

    stats = ResidualStats(
        repr_score=jnp.zeros((L,), dtype).at[lm_idx].max(
            jnp.where(repr_ok, jnp.sqrt(s_repr), 0.0)),
        depth_score=jnp.zeros((L,), dtype).at[lm_idx].max(
            jnp.where(depth_ok, jnp.sqrt(s_depth), 0.0)),
        gp_score=jnp.where(gp_on, jnp.abs(r_gp), 0.0),
        repr_valid=jnp.zeros((L,), jnp.int32).at[lm_idx].add(repr_ok.astype(jnp.int32)) > 0,
        depth_valid=jnp.zeros((L,), jnp.int32).at[lm_idx].add(depth_ok.astype(jnp.int32)) > 0,
        gp_valid=gp_on,
        n_depth=jnp.sum(depth_ok.astype(jnp.int32)),
        n_gp=jnp.sum(gp_on.astype(jnp.int32)),
    )
    eqs = NormalEqs(H_pp=H_pp, b_p=b_p, V=V, b_l=b_l, W=W_full, cost=cost,
                    param_mask=param_mask, lm_mask=lm_free)
    return eqs, stats


def compute_cost(window: Window, sel: Selection, rig, cfg,
                 compensate_rotation: bool = False,
                 pose_only: bool = False, speed_reg=None) -> jnp.ndarray:
    """Robust cost only — no jacobians. Used for LM accept/reject so the
    compiled graph stays ~9× smaller than a full assemble per candidate."""
    K, L, C = window.K, window.L, window.C
    dtype = window.poses.dtype
    f = rig.focal.astype(dtype)
    pp = rig.principal.astype(dtype)
    Tcv = rig.T_cam_veh.astype(dtype)
    robust_cfg = cfg.robust
    reg_cfg = cfg.regularization

    N = L * K * C
    lm_idx = jnp.arange(N, dtype=jnp.int32) // (K * C)
    kf_idx = (jnp.arange(N, dtype=jnp.int32) // C) % K
    cam_idx = jnp.arange(N, dtype=jnp.int32) % C
    uvd = window.obs.reshape(N, 3)
    obs_ok = window.obs_mask.reshape(N)
    lm_active = window.lm_valid & sel.lm_selected
    obs_ok = obs_ok & lm_active[lm_idx] & window.kf_valid[kf_idx]

    r_obs, proj_ok = jax.vmap(
        lambda pose, lm, uvd1, f1, pp1, tcv1: _obs_residual(
            jnp.zeros(6, dtype), jnp.zeros(3, dtype), pose, lm, uvd1, f1, pp1,
            tcv1, compensate_rotation=compensate_rotation)
    )(window.poses[kf_idx], window.lm_pos[lm_idx], uvd, f[cam_idx], pp[cam_idx],
      Tcv[cam_idx])
    repr_ok = obs_ok & proj_ok
    depth_ok = obs_ok & (uvd[:, 2] > 0) & window.lm_has_depth[lm_idx]
    s_repr = jnp.sum(r_obs[:, :2] ** 2, axis=-1)
    s_depth = r_obs[:, 2] ** 2
    w_lm = window.lm_weight[lm_idx]
    a2r = robust_cfg.reprojection_thres ** 2
    a2d = robust_cfg.depth_thres ** 2
    cost = 0.5 * jnp.sum(jnp.where(repr_ok, w_lm * a2r * jnp.log1p(s_repr / a2r), 0.0)) \
        + 0.5 * jnp.sum(jnp.where(depth_ok, w_lm * a2d * jnp.log1p(s_depth / a2d), 0.0))

    # gp height
    gp_kf = sel.gp_kf
    gp_on = lm_active & window.lm_is_gp & (sel.gp_weight > 0) & window.kf_valid[gp_kf]
    r_gp = jax.vmap(_gp_residual)(
        jnp.zeros((L, 6), dtype), jnp.zeros((L, 4), dtype), jnp.zeros((L, 3), dtype),
        window.poses[gp_kf], window.planes[gp_kf], window.lm_pos)[:, 0]
    s_gp = r_gp ** 2
    hd = reg_cfg.gp_height_huber_delta
    rho_gp = jnp.where(s_gp <= hd * hd, s_gp,
                       2.0 * hd * jnp.sqrt(jnp.maximum(s_gp, 1e-20)) - hd * hd)
    cost = cost + 0.5 * jnp.sum(jnp.where(gp_on, sel.gp_weight * rho_gp, 0.0))

    # regularizers (values only)
    reg_r, reg_w = _regularizer_values(window, sel, cfg, speed_reg, pose_only)
    return cost + 0.5 * jnp.sum(reg_w * reg_r * reg_r)


def residual_stats(window: Window, sel: Selection, rig, cfg,
                   compensate_rotation: bool = False) -> "ResidualStats":
    """Loss-free per-landmark residual scores for trimming — forward pass
    only (``calculateResiduals``/``getMaximumResidual``,
    robust_solving.cpp:16-91 evaluate without loss)."""
    K, L, C = window.K, window.L, window.C
    dtype = window.poses.dtype
    f = rig.focal.astype(dtype)
    pp = rig.principal.astype(dtype)
    Tcv = rig.T_cam_veh.astype(dtype)

    N = L * K * C
    lm_idx = jnp.arange(N, dtype=jnp.int32) // (K * C)
    kf_idx = (jnp.arange(N, dtype=jnp.int32) // C) % K
    cam_idx = jnp.arange(N, dtype=jnp.int32) % C
    uvd = window.obs.reshape(N, 3)
    obs_ok = window.obs_mask.reshape(N)
    lm_active = window.lm_valid & sel.lm_selected
    obs_ok = obs_ok & lm_active[lm_idx] & window.kf_valid[kf_idx]

    r_obs, proj_ok = jax.vmap(
        lambda pose, lm, uvd1, f1, pp1, tcv1: _obs_residual(
            jnp.zeros(6, dtype), jnp.zeros(3, dtype), pose, lm, uvd1, f1, pp1,
            tcv1, compensate_rotation=compensate_rotation)
    )(window.poses[kf_idx], window.lm_pos[lm_idx], uvd, f[cam_idx], pp[cam_idx],
      Tcv[cam_idx])
    repr_ok = obs_ok & proj_ok
    depth_ok = obs_ok & (uvd[:, 2] > 0) & window.lm_has_depth[lm_idx]
    s_repr = jnp.sqrt(jnp.sum(r_obs[:, :2] ** 2, axis=-1))
    s_depth = jnp.abs(r_obs[:, 2])

    gp_kf = sel.gp_kf
    gp_on = lm_active & window.lm_is_gp & (sel.gp_weight > 0) & window.kf_valid[gp_kf]
    r_gp = jax.vmap(_gp_residual)(
        jnp.zeros((L, 6), dtype), jnp.zeros((L, 4), dtype), jnp.zeros((L, 3), dtype),
        window.poses[gp_kf], window.planes[gp_kf], window.lm_pos)[:, 0]

    return ResidualStats(
        repr_score=jnp.zeros((L,), dtype).at[lm_idx].max(jnp.where(repr_ok, s_repr, 0.0)),
        depth_score=jnp.zeros((L,), dtype).at[lm_idx].max(jnp.where(depth_ok, s_depth, 0.0)),
        gp_score=jnp.where(gp_on, jnp.abs(r_gp), 0.0),
        repr_valid=jnp.zeros((L,), jnp.int32).at[lm_idx].add(repr_ok.astype(jnp.int32)) > 0,
        depth_valid=jnp.zeros((L,), jnp.int32).at[lm_idx].add(depth_ok.astype(jnp.int32)) > 0,
        gp_valid=gp_on,
        n_depth=jnp.sum(depth_ok.astype(jnp.int32)),
        n_gp=jnp.sum(gp_on.astype(jnp.int32)),
    )


def _regularizer_values(window: Window, sel: Selection, cfg, speed_reg, pose_only):
    """(residuals, weights) of the pose/plane regularizer stack at delta=0."""
    r, w, _ = _regularizer_system(window, sel, cfg, speed_reg, pose_only,
                                  with_jacobian=False)
    return r, w


def _regularizer_system(window: Window, sel: Selection, cfg, speed_reg, pose_only,
                        with_jacobian: bool = True):
    """All pose/plane-only regularizers as one stacked residual vector with
    a dense jacobian over the P parameters. Fixed residual count R.

    Families (reference wiring in solve(), :703-818):
      scale:        1 residual — ‖t(T_k1 ∘ T_k0⁻¹)‖ − target
      plane normal chain:   3(K-1) — n_k − n_{k+1} (weight 3w)
      plane dist chain:     (K-1)  — d_k − d_{k+1} (weight w)
      plane motion:         (K-1)  — n_k · Δt̂ (weight 2w)
      plane prior:          3K     — n_k − (0,0,1) (weight w)
      speed (motion-only):  3      — constant-velocity vector residual
    """
    K = window.K
    P = K * PD
    dtype = window.poses.dtype
    reg = cfg.regularization
    w_gp = reg.gp_reg_weight

    # consecutive active keyframe chain: for each k, next active kf index.
    # Precomputed as arrays: chain_ok[k] = kf_valid[k] & kf_valid[next[k]]
    kf_valid = window.kf_valid
    # window slots are kept time-ordered by the host manager; chain is k -> k+1
    chain_ok = kf_valid[:-1] & kf_valid[1:]
    plane_ok = window.plane_valid & kf_valid
    chain_plane_ok = plane_ok[:-1] & plane_ok[1:]

    def all_res(delta):
        dp = delta[:, :6]
        dpl = delta[:, 6:]
        poses = pose_ops.boxplus(window.poses, dp)
        planes = plane_boxplus(window.planes, dpl)
        parts = []
        # scale regularization
        p0 = poses[sel.scale_kf0]
        p1 = poses[sel.scale_kf1]
        r_scale, _ = res_k.pose_scale(p1, p0, sel.scale_target)
        parts.append(r_scale)
        # plane chains
        r_ndiff, _ = res_k.vector_difference(planes[:-1, :3], planes[1:, :3])
        parts.append(r_ndiff.reshape(-1))
        r_ddiff = planes[:-1, 3] - planes[1:, 3]
        parts.append(r_ddiff)
        r_motion, _ = res_k.groundplane_motion(poses[:-1], poses[1:], planes[:-1, :3])
        parts.append(r_motion.reshape(-1))
        # plane prior to (0,0,1)
        prior = jnp.array([0.0, 0.0, 1.0], dtype)
        r_prior = planes[:, :3] - prior
        parts.append(r_prior.reshape(-1))
        # speed regularization (motion-only)
        if speed_reg is not None:
            kf_i, pob, vel, dt, _w = speed_reg
            r_speed, _ = res_k.speed_vector(poses[kf_i], pob, vel, dt)
            parts.append(r_speed)
        return jnp.concatenate(parts)

    delta0 = jnp.zeros((K, PD), dtype)
    r = all_res(delta0)
    J = (jax.jacrev(lambda d: all_res(d.reshape(K, PD)))(delta0.reshape(-1))
         if with_jacobian else None)

    # weights per residual row
    w_parts = [
        sel.scale_weight[None],
        (3.0 * w_gp) * jnp.repeat(chain_plane_ok.astype(dtype), 3),
        w_gp * chain_plane_ok.astype(dtype),
        (2.0 * w_gp) * (chain_ok & plane_ok[:-1]).astype(dtype),
        w_gp * plane_ok.astype(dtype).repeat(3),
    ]
    if speed_reg is not None:
        w_parts.append(jnp.full((3,), speed_reg[4], dtype))
    w = jnp.concatenate(w_parts)
    if pose_only:
        # motion-only solve uses only the speed regularizer among regs
        keep = jnp.zeros_like(w)
        if speed_reg is not None:
            keep = keep.at[-3:].set(1.0)
        w = w * keep
    return r, w, (J.reshape(r.shape[0], P) if with_jacobian else None)
