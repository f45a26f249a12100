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
    """Cross blocks are stored in BLOCK form, not as a dense [L,P,3]:
    every landmark couples to at most K pose blocks (6 dims each) plus the
    plane block (4 dims) of its ONE attached groundplane keyframe. The
    Schur correction then contracts [L,K,6,3] tensors — 2.8× fewer MXU
    passes than the padded [L,P,3] form, which matters because the Schur
    product must run at full f32 precision (see solver/lm.py)."""

    H_pp: jnp.ndarray   # [P,P] pose+plane block (undamped, gauge-masked)
    b_p: jnp.ndarray    # [P]   -J_pᵀ r
    V: jnp.ndarray      # [L,3,3] landmark blocks
    b_l: jnp.ndarray    # [L,3]
    W6: jnp.ndarray     # [L,K,6,3] pose↔landmark cross blocks
    Wp: jnp.ndarray     # [L,4,3] plane↔landmark cross block (gp keyframe)
    gp_oh: jnp.ndarray  # [L,K] one-hot of the attached gp keyframe
    cost: jnp.ndarray   # robust cost (0.5 Σ w·ρ(s)), Ceres convention
    param_mask: jnp.ndarray  # [P] 1 for free dims, 0 for fixed/gauge dims
    lm_mask: jnp.ndarray     # [L] bool landmarks participating


def assembly_plan(L: int, dtype, cfg, compensate_rotation: bool = False
                  ) -> str:
    """Which assembly path a solve with these parameters takes — the single
    source of truth for the gating, also surfaced by bench.py so perf
    regressions are attributable to the path actually run.

    Returns "pallas[tile=N]" (optionally "+interpret" off-TPU) or
    "einsum(<reason>)".

    Gating: the fused Mosaic kernel needs concrete (non-traced) loss
    scales (they bake in as compile-time constants — the fused tuning grid
    vmaps over traced thresholds), plain reprojection, f32, a 128-aligned
    landmark tile (512 full-speed single-chip; 256/128 keep the kernel for
    landmark-sharded shard_map shards where per-shard L = L/model), and a
    TPU backend (or ``pallas_interpret`` for CPU dryrun coverage)."""
    import jax.numpy as jnp  # local: keep module import order unchanged

    robust_cfg = cfg.robust
    if not getattr(cfg.solver, "use_pallas_assembly", False):
        return "einsum(disabled)"
    static_thres = not (isinstance(robust_cfg.reprojection_thres,
                                   jax.core.Tracer)
                        or isinstance(robust_cfg.depth_thres,
                                      jax.core.Tracer))
    if not static_thres:
        return "einsum(traced-thresholds)"
    if compensate_rotation:
        return "einsum(rotation-compensated)"
    if dtype != jnp.float32:
        return "einsum(dtype)"
    from .pallas_assemble import TL as _TL
    tile = next((t for t in (_TL, 256, 128) if L % t == 0), None)
    if tile is None:
        return "einsum(tile-misaligned)"
    if jax.default_backend() == "tpu":
        return f"pallas[tile={tile}]"
    if getattr(cfg.solver, "pallas_interpret", False):
        return f"pallas[tile={tile}]+interpret"
    return "einsum(backend)"


def plan_tile(plan: str) -> "int | None":
    if not plan.startswith("pallas"):
        return None
    return int(plan.split("tile=")[1].split("]")[0])


def _kernel_inputs(window: Window, rig, lm_active):
    """Lane-major operand layout shared by the fused assembly kernel and
    the cost-only kernel (solver/pallas_assemble.py)."""
    from ..geometry.quaternion import qnormalize, qto_matrix

    K, L, C = window.K, window.L, window.C
    dtype = window.poses.dtype
    f = rig.focal.astype(dtype)
    pp = rig.principal.astype(dtype)
    Tcv = rig.T_cam_veh.astype(dtype)
    obs_t = window.obs.transpose(1, 2, 3, 0).reshape(K * C * 3, L)
    base = (window.obs_mask & lm_active[:, None, None]
            & window.kf_valid[None, :, None])
    repr_base = base.astype(dtype).transpose(1, 2, 0).reshape(K * C, L)
    depth_base = (base & (window.obs[..., 2] > 0)
                  & window.lm_has_depth[:, None, None]
                  ).astype(dtype).transpose(1, 2, 0).reshape(K * C, L)
    lm_t = window.lm_pos.T
    wlm = window.lm_weight[None, :]
    R_kf = qto_matrix(qnormalize(window.poses[:, :4]))
    pose_mats = jnp.concatenate([R_kf.reshape(K, 9),
                                 window.poses[:, 4:]], -1)
    R_cv = qto_matrix(qnormalize(Tcv[:, :4]))
    cam_mats = jnp.concatenate([
        R_cv.reshape(C, 9), Tcv[:, 4:], f[:, None], pp], -1)
    return obs_t, repr_base, depth_base, lm_t, wlm, pose_mats, cam_mats, base


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


def _obs_system(window: Window, sel: Selection, rig, cfg,
                compensate_rotation: bool, with_jacobians: bool):
    """Residuals (+ optional tangent jacobians) for every (l,k,c) slot on the
    dense grid, with IRLS row weights and the robust cost.

    Returns (r [L,K,C,3], repr_ok, depth_ok [L,K,C], row_w [L,K,C,3],
    Jp [L,K,C,3,6]|None, Jl [L,K,C,3,3]|None, cost scalar)."""
    K, L, C = window.K, window.L, window.C
    dtype = window.poses.dtype
    f = rig.focal.astype(dtype)
    pp = rig.principal.astype(dtype)
    Tcv = rig.T_cam_veh.astype(dtype)
    robust_cfg = cfg.robust

    # Autodiff on the flattened obs axis. An analytic-jacobian grid path
    # exists (solver/analytic.py, exactness-tested vs this one) but benches
    # 2× slower under XLA on TPU — the tiny 3×3 einsum chains trigger layout
    # shuffles that jacfwd's fused code avoids. Its closed forms live on as
    # the derivation the Pallas assembly kernel implements in registers.
    N = L * K * C
    uvd = window.obs.reshape(N, 3)
    kf_idx = (jnp.arange(N, dtype=jnp.int32) // C) % K
    cam_idx = jnp.arange(N, dtype=jnp.int32) % C
    lm_idx = jnp.arange(N, dtype=jnp.int32) // (K * C)
    poses_o = window.poses[kf_idx]
    lms_o = window.lm_pos[lm_idx]

    def obs_fn(pt, ld, pose, lm, uvd1, f1, pp1, tcv1):
        return _obs_residual(pt, ld, pose, lm, uvd1, f1, pp1, tcv1,
                             compensate_rotation=compensate_rotation)

    zero6 = jnp.zeros((N, 6), dtype)
    zero3 = jnp.zeros((N, 3), dtype)
    args = (zero6, zero3, poses_o, lms_o, uvd, f[cam_idx], pp[cam_idx],
            Tcv[cam_idx])
    r_flat, proj_ok_f = jax.vmap(obs_fn)(*args)
    if with_jacobians:
        jac_fn = jax.jacfwd(lambda pt, ld, *a: obs_fn(pt, ld, *a)[0],
                            argnums=(0, 1))
        Jp_f, Jl_f = jax.vmap(jac_fn)(*args)
        Jp = Jp_f.reshape(L, K, C, 3, 6)
        Jl = Jl_f.reshape(L, K, C, 3, 3)
    else:
        Jp = Jl = None
    r = r_flat.reshape(L, K, C, 3)
    proj_ok = proj_ok_f
    lm_active = window.lm_valid & sel.lm_selected
    base_ok = (window.obs_mask & lm_active[:, None, None]
               & window.kf_valid[None, :, None])
    repr_ok = base_ok & proj_ok.reshape(L, K, C)
    # cheirality guard on depth rows: z_cam = r_d + d_measured must be > 0
    # (post-trim window updates can momentarily push a landmark behind the
    # camera; the reference removes those in the pre-solve selector only)
    z_cam = r[..., 2] + window.obs[..., 2]
    depth_ok = base_ok & (window.obs[..., 2] > 0) \
        & window.lm_has_depth[:, None, None] & (z_cam > 0)

    s_repr = jnp.sum(r[..., :2] ** 2, -1)
    s_depth = r[..., 2] ** 2
    w_lm = window.lm_weight[:, None, None]
    w_repr = jnp.where(repr_ok,
                       w_lm * cauchy_weight(s_repr, robust_cfg.reprojection_thres),
                       0.0)
    w_depth = jnp.where(depth_ok,
                        w_lm * cauchy_weight(s_depth, robust_cfg.depth_thres),
                        0.0)
    row_w = jnp.stack([w_repr, w_repr, w_depth], -1)

    a2r = robust_cfg.reprojection_thres ** 2
    a2d = robust_cfg.depth_thres ** 2
    cost = 0.5 * jnp.sum(jnp.where(repr_ok, w_lm * a2r * jnp.log1p(s_repr / a2r), 0.0)) \
        + 0.5 * jnp.sum(jnp.where(depth_ok, w_lm * a2d * jnp.log1p(s_depth / a2d), 0.0))
    return r, repr_ok, depth_ok, row_w, Jp, Jl, cost


def _gp_system(window: Window, sel: Selection, cfg, with_jacobians: bool):
    """Groundplane height residuals per landmark vs the attached keyframe.

    Returns (r_gp [L], w_gp [L], gp_on [L], cost, Jgp_kp [L,10]|None,
    Jgp_lm [L,3]|None)."""
    L = window.L
    dtype = window.poses.dtype
    reg_cfg = cfg.regularization
    gp_kf = sel.gp_kf
    lm_active = window.lm_valid & sel.lm_selected
    gp_on = lm_active & window.lm_is_gp & (sel.gp_weight > 0) \
        & window.kf_valid[gp_kf]
    gp_poses = window.poses[gp_kf]
    gp_planes = window.planes[gp_kf]
    z6 = jnp.zeros((L, 6), dtype)
    z4 = jnp.zeros((L, 4), dtype)
    z3 = jnp.zeros((L, 3), dtype)
    r_gp = jax.vmap(_gp_residual)(z6, z4, z3, gp_poses, gp_planes,
                                  window.lm_pos)[:, 0]
    s_gp = r_gp ** 2
    w_gp = jnp.where(gp_on,
                     sel.gp_weight * huber_weight(s_gp, reg_cfg.gp_height_huber_delta),
                     0.0)
    hd = reg_cfg.gp_height_huber_delta
    rho = jnp.where(s_gp <= hd * hd, s_gp,
                    2.0 * hd * jnp.sqrt(jnp.maximum(s_gp, 1e-20)) - hd * hd)
    cost = 0.5 * jnp.sum(jnp.where(gp_on, sel.gp_weight * rho, 0.0))
    if with_jacobians:
        Jgp = jax.vmap(jax.jacfwd(_gp_residual, argnums=(0, 1, 2)))(
            z6, z4, z3, gp_poses, gp_planes, window.lm_pos)
        Jgp_pose, Jgp_plane, Jgp_lm = (j[:, 0, :] for j in Jgp)
        Jgp_kp = jnp.concatenate([Jgp_pose, Jgp_plane], -1)
    else:
        Jgp_kp = Jgp_lm = None
    return r_gp, w_gp, gp_on, cost, Jgp_kp, Jgp_lm


def assemble(window: Window, sel: Selection, rig, cfg,
             compensate_rotation: bool = False,
             pose_only: bool = False,
             speed_reg=None, axis_name=None) -> tuple[NormalEqs, ResidualStats]:
    """Build the (masked, undamped) normal equations at the current state.

    speed_reg: optional (kf_index, pose_origin_before, vel_before, dt, weight)
    for the motion-only constant-velocity residual
    (``adjustPoseOnly``:835-853).

    axis_name: set when called inside ``shard_map`` with the landmark axis
    split over a mesh axis. The observation/groundplane contributions to the
    reduced pose system (H_pp, b_p, cost, family counts) are ``psum``-reduced
    over that axis; V/W/b_l stay local to each landmark shard. Replicated
    regularizers are added *after* the psum so they enter exactly once.
    """
    K, L, C = window.K, window.L, window.C
    P = K * PD
    dtype = window.poses.dtype
    f = rig.focal.astype(dtype)
    pp = rig.principal.astype(dtype)
    Tcv = rig.T_cam_veh.astype(dtype)

    robust_cfg = cfg.robust
    reg_cfg = cfg.regularization

    lm_active = window.lm_valid & sel.lm_selected
    plan = assembly_plan(L, dtype, cfg, compensate_rotation)
    use_pallas, tile, interpret = (plan.startswith("pallas"),
                                   plan_tile(plan), "interpret" in plan)
    if use_pallas:
        # fused Mosaic kernel: residuals + analytic jacobians in registers,
        # only the reduced blocks hit HBM (solver/pallas_assemble.py)
        from .pallas_assemble import assemble_obs_pallas
        (obs_t, repr_base, depth_base, lm_t, wlm, pose_mats, cam_mats,
         base) = _kernel_inputs(window, rig, lm_active)
        blocks_obs = assemble_obs_pallas(
            obs_t, repr_base, depth_base, lm_t, wlm, pose_mats, cam_mats,
            K=K, C=C, a2r=float(robust_cfg.reprojection_thres) ** 2,
            a2d=float(robust_cfg.depth_thres) ** 2,
            interpret=interpret, tl=tile)
        U_k, b_pose_k = blocks_obs.U, blocks_obs.b_pose
        V, b_l = blocks_obs.V, blocks_obs.b_l
        W_lk6 = blocks_obs.W
        cost = blocks_obs.cost
        # stats come from the cheap forward pass when trimming needs them;
        # here report residual-free placeholders consistent with masks
        r_obs = jnp.zeros((L, K, C, 3), dtype)
        repr_ok = base
        depth_ok = (base & (window.obs[..., 2] > 0)
                    & window.lm_has_depth[:, None, None])
    else:
        # ---- residuals + jacobians on the dense [L,K,C] grid -------------
        # The landmark-major layout makes every "segment sum" a plain axis
        # reduction (einsum → MXU); no scatters on the hot path (scatters
        # serialize badly on TPU).
        r_obs, repr_ok, depth_ok, row_w, Jp_obs, Jl_obs, cost = _obs_system(
            window, sel, rig, cfg, compensate_rotation, with_jacobians=True)

        # ---- reduce into blocks (contractions over the obs axes) ---------
        # Pinned to full-f32: these J^T W J contractions ARE the normal
        # equations — at the global "default" level they lower to bf16 MXU
        # passes whose ~0.4% entry error measurably degrades LM step
        # quality on real-tracker data (r4 on-chip fused-drive ladder:
        # einsum-default 2.26% vs einsum-highest 1.40% drift; CPU 1.11%).
        # The production TPU path assembles these blocks in the exact-f32
        # Pallas kernel, so this pin prices only the fallback.
        hi = jax.lax.Precision.HIGHEST
        Jp_w = Jp_obs * row_w[..., None]     # [L,K,C,3,6] rows scaled by w
        U_k = jnp.einsum("lkcri,lkcrj->kij", Jp_w, Jp_obs, precision=hi)
        b_pose_k = -jnp.einsum("lkcri,lkcr->ki", Jp_w, r_obs, precision=hi)
        Jl_w = Jl_obs * row_w[..., None]
        V = jnp.einsum("lkcri,lkcrj->lij", Jl_w, Jl_obs, precision=hi)
        b_l = -jnp.einsum("lkcri,lkcr->li", Jl_w, r_obs, precision=hi)
        W_lk6 = jnp.einsum("lkcri,lkcrj->lkij", Jp_w, Jl_obs,
                           precision=hi)                    # [L,K,6,3]

    # ---- groundplane height residuals (one per gp landmark) ------------
    r_gp, w_gp, gp_on, gp_cost, Jgp_kp, Jgp_lm = _gp_system(
        window, sel, cfg, with_jacobians=True)
    cost = cost + gp_cost
    # one-hot over the attached keyframe turns every gp "scatter" into a
    # small matmul (K = 20 — MXU-friendly, no TPU scatter serialization);
    # full-f32 pins: the scale information rides these gp blocks, and the
    # Pallas production path still runs THESE einsums (the kernel covers
    # observation blocks only)
    hi_gp = jax.lax.Precision.HIGHEST
    gp_oh = jax.nn.one_hot(sel.gp_kf, K, dtype=dtype)        # [L,K]
    U_gp = jnp.einsum("lk,l,li,lj->kij", gp_oh, w_gp, Jgp_kp, Jgp_kp,
                      precision=hi_gp)
    b_gp_k = -jnp.einsum("lk,l,li->ki", gp_oh, w_gp * r_gp, Jgp_kp,
                         precision=hi_gp)
    V = V + w_gp[:, None, None] * Jgp_lm[:, :, None] * Jgp_lm[:, None, :]
    b_l = b_l - (w_gp * r_gp)[:, None] * Jgp_lm
    # gp cross blocks in BLOCK form: pose part routes to the attached
    # keyframe's 6 pose dims; plane part is one [4,3] block per landmark
    W6 = W_lk6 + jnp.einsum("lk,l,li,lj->lkij", gp_oh, w_gp,
                            Jgp_kp[:, :6], Jgp_lm, precision=hi_gp)
    Wp = w_gp[:, None, None] * Jgp_kp[:, 6:, None] * Jgp_lm[:, None, :]

    # ---- assemble dense H_pp [P,P] (block-diagonal embed, no scatter) ----
    blocks = jnp.pad(U_k, ((0, 0), (0, PD - 6), (0, PD - 6))) + U_gp  # [K,PD,PD]
    # broadcast-multiply with the identity mask, NOT einsum(..., eye):
    # the dot-with-identity form sends XLA's algebraic simplifier into a
    # circular rewrite loop on the SPMD-partitioned program ("stuck ...
    # 50 runs", MULTICHIP_r02) — elementwise masking compiles clean
    H_pp = (blocks[:, :, None, :]
            * jnp.eye(K, dtype=dtype)[:, None, :, None]).reshape(P, P)
    b_p = (jnp.pad(b_pose_k, ((0, 0), (0, PD - 6))) + b_gp_k).reshape(P)

    if axis_name is not None:
        # landmark-sharded execution: reduce the L-axis contributions once,
        # over ICI (this is the single collective of the assembly)
        H_pp = jax.lax.psum(H_pp, axis_name)
        b_p = jax.lax.psum(b_p, axis_name)
        cost = jax.lax.psum(cost, axis_name)

    # ---- regularization residuals (dense over pose+plane params) -------
    reg_r, reg_w, reg_J = _regularizer_system(window, sel, cfg, speed_reg, pose_only)
    # reg_r [R], reg_w [R], reg_J [R,P]; full-f32 pins (tiny dots, and the
    # scale/plane regularizers are cancellation-prone — advisor r3)
    hi_rg = jax.lax.Precision.HIGHEST
    H_pp = H_pp + jnp.einsum("r,ri,rj->ij", reg_w, reg_J, reg_J,
                             precision=hi_rg)
    b_p = b_p - jnp.einsum("r,ri,r->i", reg_w, reg_J, reg_r,
                           precision=hi_rg)
    cost = cost + 0.5 * jnp.sum(reg_w * reg_r * reg_r)

    # ---- alternate motion parameterization (tangent-basis projection) ---
    # setParameterization variants (bundle_adjuster_keyframes.cpp:172-183):
    # Gauss-Newton in the reduced coordinates d with step B@d is exactly the
    # restricted parameterization to first order, so we project the assembled
    # system once instead of re-deriving every jacobian.
    mode = getattr(cfg.solver, "motion_parameterization", "full_dof")
    if mode != "full_dof":
        B, tangent_mask = pose_ops.tangent_basis(window.poses, mode)
        T = jnp.concatenate([
            jnp.concatenate([B, jnp.zeros((K, 6, PD - 6), dtype)], -1),
            jnp.concatenate([
                jnp.zeros((K, PD - 6, 6), dtype),
                jnp.broadcast_to(jnp.eye(PD - 6, dtype=dtype),
                                 (K, PD - 6, PD - 6))], -1),
        ], axis=-2)                                            # [K,PD,PD]
        H4 = H_pp.reshape(K, PD, K, PD)
        H_pp = jnp.einsum("kai,kalb,lbj->kilj", T, H4, T).reshape(P, P)
        b_p = jnp.einsum("kai,ka->ki", T, b_p.reshape(K, PD)).reshape(P)
        # project the pose part of the cross blocks (plane part is identity)
        W6 = jnp.einsum("kai,lkab->lkib", B, W6)
    else:
        tangent_mask = jnp.ones((6,), dtype)

    # ---- gauge / fixation masks ---------------------------------------
    kf_free = window.kf_valid & (~window.fix_pose)
    pose_dim_mask = kf_free[:, None].astype(dtype) * tangent_mask[None, :]
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
    lm_f = lm_free.astype(dtype)
    W6 = W6 * pose_dim_mask[None, :, :, None] * lm_f[:, None, None, None]
    # the plane block's gauge mask gathered at each landmark's gp keyframe
    Wp = Wp * (gp_oh @ plane_dim_mask.astype(dtype))[:, :, None] \
        * lm_f[:, None, None]
    V = jnp.where(lm_free[:, None, None], V, jnp.eye(3, dtype=dtype)[None])
    b_l = b_l * lm_free[:, None]

    s_repr = jnp.linalg.norm(r_obs[..., :2], axis=-1)
    s_depth = jnp.abs(r_obs[..., 2])
    stats = ResidualStats(
        repr_score=jnp.max(jnp.where(repr_ok, s_repr, 0.0), axis=(1, 2)),
        depth_score=jnp.max(jnp.where(depth_ok, s_depth, 0.0), axis=(1, 2)),
        gp_score=jnp.where(gp_on, jnp.abs(r_gp), 0.0),
        repr_valid=jnp.any(repr_ok, axis=(1, 2)),
        depth_valid=jnp.any(depth_ok, axis=(1, 2)),
        gp_valid=gp_on,
        n_depth=_gcount(depth_ok, axis_name),
        n_gp=_gcount(gp_on, axis_name),
    )
    eqs = NormalEqs(H_pp=H_pp, b_p=b_p, V=V, b_l=b_l, W6=W6, Wp=Wp,
                    gp_oh=gp_oh, cost=cost,
                    param_mask=param_mask, lm_mask=lm_free)
    return eqs, stats


def _gcount(mask, axis_name):
    """Global count of a boolean mask — psum over the mesh axis if sharded."""
    n = jnp.sum(mask.astype(jnp.int32))
    return n if axis_name is None else jax.lax.psum(n, axis_name)


def compute_cost(window: Window, sel: Selection, rig, cfg,
                 compensate_rotation: bool = False,
                 pose_only: bool = False, speed_reg=None,
                 axis_name=None) -> jnp.ndarray:
    """Robust cost only — no jacobians. Used for LM accept/reject so the
    compiled graph stays ~9× smaller than a full assemble per candidate.

    When the assembly plan is the fused Pallas kernel, the observation
    cost comes from the cost-only kernel variant (same arithmetic and f32
    accumulation order as assemble's cost, so accept/reject comparisons
    are internally consistent); the einsum forward pass otherwise."""
    plan = assembly_plan(window.L, window.poses.dtype, cfg,
                         compensate_rotation)
    if plan.startswith("pallas"):
        from .pallas_assemble import cost_obs_pallas
        lm_active = window.lm_valid & sel.lm_selected
        (obs_t, repr_base, depth_base, lm_t, wlm, pose_mats, cam_mats,
         _) = _kernel_inputs(window, rig, lm_active)
        cost = cost_obs_pallas(
            obs_t, repr_base, depth_base, lm_t, wlm, pose_mats, cam_mats,
            K=window.K, C=window.C,
            a2r=float(cfg.robust.reprojection_thres) ** 2,
            a2d=float(cfg.robust.depth_thres) ** 2,
            interpret="interpret" in plan, tl=plan_tile(plan))
    else:
        _, _, _, _, _, _, cost = _obs_system(window, sel, rig, cfg,
                                             compensate_rotation,
                                             with_jacobians=False)
    _, _, _, gp_cost, _, _ = _gp_system(window, sel, cfg, with_jacobians=False)
    cost = cost + gp_cost
    if axis_name is not None:
        cost = jax.lax.psum(cost, axis_name)
    reg_r, reg_w = _regularizer_values(window, sel, cfg, speed_reg, pose_only)
    return cost + 0.5 * jnp.sum(reg_w * reg_r * reg_r)


def residual_stats(window: Window, sel: Selection, rig, cfg,
                   compensate_rotation: bool = False,
                   axis_name=None) -> "ResidualStats":
    """Loss-free per-landmark residual scores for trimming — forward pass
    only (``calculateResiduals``/``getMaximumResidual``,
    robust_solving.cpp:16-91 evaluate without loss)."""
    r_obs, repr_ok, depth_ok, _, _, _, _ = _obs_system(
        window, sel, rig, cfg, compensate_rotation, with_jacobians=False)
    r_gp, _, gp_on, _, _, _ = _gp_system(window, sel, cfg, with_jacobians=False)
    s_repr = jnp.linalg.norm(r_obs[..., :2], axis=-1)
    s_depth = jnp.abs(r_obs[..., 2])
    return ResidualStats(
        repr_score=jnp.max(jnp.where(repr_ok, s_repr, 0.0), axis=(1, 2)),
        depth_score=jnp.max(jnp.where(depth_ok, s_depth, 0.0), axis=(1, 2)),
        gp_score=jnp.where(gp_on, jnp.abs(r_gp), 0.0),
        repr_valid=jnp.any(repr_ok, axis=(1, 2)),
        depth_valid=jnp.any(depth_ok, axis=(1, 2)),
        gp_valid=gp_on,
        n_depth=_gcount(depth_ok, axis_name),
        n_gp=_gcount(gp_on, axis_name),
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

    # consecutive-in-TIME active keyframe chain. Window slots are NOT
    # time-ordered in general (both the host slot allocator and the scan
    # ring reuse evicted slots), so the chain pairs come from a stamp sort:
    # pair i links the i-th and (i+1)-th oldest active keyframes — exactly
    # the reference's consecutive-keyframe chains
    # (addGroundplaneRegularization, bundle_adjuster_keyframes.cpp:769-818).
    kf_valid = window.kf_valid
    big = jnp.asarray(jnp.inf, window.stamps.dtype)
    order = jnp.argsort(jnp.where(kf_valid, window.stamps, big))
    ia, ib = order[:-1], order[1:]
    n_valid = jnp.sum(kf_valid.astype(jnp.int32))
    pair_ok = jnp.arange(K - 1) < (n_valid - 1)
    chain_ok = pair_ok
    plane_ok = window.plane_valid & kf_valid
    chain_plane_ok = pair_ok & plane_ok[ia] & plane_ok[ib]
    # One-hot row-selection matrices instead of traced-index gathers: the
    # autodiff transpose of a gather is a scatter-add (serializes on TPU and
    # runs every LM iteration inside the solve loop); the transpose of a
    # one-hot matmul is a matmul. K ≈ 20, so these are tiny MXU ops.
    oh_a = jax.nn.one_hot(ia, K, dtype=dtype)          # [K-1,K]
    oh_b = jax.nn.one_hot(ib, K, dtype=dtype)
    oh_s0 = jax.nn.one_hot(sel.scale_kf0, K, dtype=dtype)   # [K]
    oh_s1 = jax.nn.one_hot(sel.scale_kf1, K, dtype=dtype)

    # One-hot selection is only EXACT at full precision: under the solver's
    # global matmul level these dots lower to bf16 MXU passes on TPU, which
    # round the selected pose translations (keyframe←origin, unbounded — no
    # window rebase) and the near-cancelling plane-chain differences
    # (n_k − n_{k+1} ~ 1e-3) BEFORE the subtraction. [K-1,K]×[K,7] dots —
    # pinning them is free (advisor r3 finding).
    def _pick(oh, x):
        return jnp.einsum("...k,kj->...j", oh, x,
                          precision=jax.lax.Precision.HIGHEST)

    def all_res(delta):
        dp = delta[:, :6]
        dpl = delta[:, 6:]
        poses = pose_ops.boxplus(window.poses, dp)
        planes = plane_boxplus(window.planes, dpl)
        poses_a = _pick(oh_a, poses)  # exact row selection (rows are one-hot)
        poses_b = _pick(oh_b, poses)
        planes_a = _pick(oh_a, planes)
        planes_b = _pick(oh_b, planes)
        parts = []
        # scale regularization
        p0 = _pick(oh_s0, poses)
        p1 = _pick(oh_s1, poses)
        r_scale, _ = res_k.pose_scale(p1, p0, sel.scale_target)
        parts.append(r_scale)
        # plane chains (time-ordered pairs)
        r_ndiff, _ = res_k.vector_difference(planes_a[:, :3], planes_b[:, :3])
        parts.append(r_ndiff.reshape(-1))
        r_ddiff = planes_a[:, 3] - planes_b[:, 3]
        parts.append(r_ddiff)
        r_motion, _ = res_k.groundplane_motion(poses_a, poses_b, planes_a[:, :3])
        parts.append(r_motion.reshape(-1))
        # plane prior to (0,0,1)
        prior = jnp.array([0.0, 0.0, 1.0], dtype)
        r_prior = planes[:, :3] - prior
        parts.append(r_prior.reshape(-1))
        # speed regularization (motion-only)
        if speed_reg is not None:
            kf_i, pob, vel, dt, _w = speed_reg
            oh_sp = jax.nn.one_hot(kf_i, K, dtype=dtype)
            r_speed, _ = res_k.speed_vector(_pick(oh_sp, poses), pob, vel, dt)
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
        (2.0 * w_gp) * (chain_ok & plane_ok[ia]).astype(dtype),
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
