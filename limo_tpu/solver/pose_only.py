"""Motion-only (pose-only) adjustment — ``adjustPoseOnly`` re-designed.

Reference (``bundle_adjuster_keyframes.cpp:820-888``): the newest frame's
pose is optimized against the *fixed* landmarks of the last selection with
Cauchy-weighted reprojection + depth residuals, an optional constant-velocity
``SpeedRegularizationVector2`` residual (weight 1−rot/0.03 when recent
rotation < 0.03 rad), quantile trimming (groups ≥ 30), and ≤4 LM iterations.

TPU design: the problem has exactly 6 unknowns, so the normal equations are a
single 6×6 solve; residuals/jacobians are one vmapped pass over [L,C]
observations; the LM loop is a ``lax.while_loop``; trimming is a mask update.
The whole step jits to a few microseconds of device work.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .. import residuals as res_k
from ..geometry import pose as pose_ops
from ..robust import cauchy_weight, trim_quantile
from ..utils.precision import highest_matmul


class PoseOnlyResult(NamedTuple):
    pose: jnp.ndarray        # [7] optimized pose
    cost: jnp.ndarray
    n_used: jnp.ndarray      # residual groups used after trimming


def _residuals_all(pose, lm_pos, obs, obs_mask, lm_mask, rig, cfg,
                   compensate_rotation):
    """(r [L,C,3], repr_ok [L,C], depth_ok [L,C]) at the given pose."""
    f = rig.focal.astype(pose.dtype)
    pp = rig.principal.astype(pose.dtype)
    tcv = rig.T_cam_veh.astype(pose.dtype)

    def per_cam(c_f, c_pp, c_tcv, uvd, m):
        rr, ok = res_k.reprojection(pose, lm_pos, uvd[..., :2], c_f, c_pp, c_tcv,
                                    compensate_rotation=compensate_rotation)
        rd, _ = res_k.landmark_depth(pose, lm_pos, uvd[..., 2], c_tcv)
        return jnp.concatenate([rr, rd], -1), ok

    r, proj_ok = jax.vmap(per_cam, in_axes=(0, 0, 0, 1, 1), out_axes=(1, 1))(
        f, pp, tcv, obs, obs_mask)
    valid = obs_mask & lm_mask[:, None]
    repr_ok = valid & proj_ok
    # cheirality guard on the depth residual: z_cam = r_d + d_measured must be
    # positive (a landmark behind the camera must not contribute a depth row)
    z_cam = r[..., 2] + obs[..., 2]
    depth_ok = valid & (obs[..., 2] > 0) & (z_cam > 0)
    return r, repr_ok, depth_ok


@highest_matmul
def pose_only_step(pose_prior, lm_pos, obs, obs_mask, lm_mask, rig, cfg,
                   speed_reg=None, max_iters: int = 4,
                   compensate_rotation: bool = False,
                   lm_weight=None,
                   graduated_init: float = 1.0) -> PoseOnlyResult:
    """Optimize one pose against fixed landmarks.

    lm_pos [L,3], obs [L,C,3], obs_mask [L,C], lm_mask [L] (last selection).
    speed_reg: (pose_origin_before [7], vel_before [3], dt, weight) or None.
    lm_weight [L]: per-landmark loss scale — the reference applies
    ``ScaledLoss(CauchyLoss, landmark.weight)`` in adjustPoseOnly's residuals
    (bundle_adjuster_keyframes.cpp:589-591,832), so shrubbery-downweighted
    landmarks pull less on the motion-only pose too.

    graduated_init > 1 enables graduated non-convexity: iteration ``it``
    runs with the Cauchy scales multiplied by ``max(ginit·2^-it, 1)``, so
    a prior that starts far outside the robust basin (a sharp-turn onset
    under a constant-velocity prior puts EVERY inlier at ~16 px while
    reprojection_thres is 1.6 px) still sees full gradient early, while
    the final iterations re-tighten to the true scale. On the km rendered
    drive's turns the per-frame diagnostics show 3.0-8.6° deficits
    recovered inside the ≤4-iteration budget with this schedule active
    (docs/PERF.md km-drive failure chain — note the catastrophic km
    failure itself was the frame-dependent plausibility guard in the scan
    step, not this solve). 1.0 = reference behavior (the reference never
    needs this because its prior is a fresh per-frame 5-point that
    already contains the turn rotation).
    """
    rcfg = cfg.robust
    dtype = pose_prior.dtype
    ginit = float(graduated_init)
    w_lm = (jnp.ones((lm_pos.shape[0], 1), dtype) if lm_weight is None
            else lm_weight[:, None].astype(dtype))

    def cost_and_system(pose, lm_use, smul=1.0):
        def r_fn(tangent):
            p = pose_ops.boxplus(pose, tangent)
            r, repr_ok, depth_ok = _residuals_all(
                p, lm_pos, obs, obs_mask, lm_use, rig, cfg, compensate_rotation)
            parts = [r.reshape(-1)]
            if speed_reg is not None:
                pob, vel, dt, _w = speed_reg
                rs, _ = res_k.speed_vector(p, pob, vel, dt)
                parts.append(rs)
            return jnp.concatenate(parts), (repr_ok, depth_ok)

        z = jnp.zeros((6,), dtype)
        (r, (repr_ok, depth_ok)) = r_fn(z)
        J = jax.jacfwd(lambda t: r_fn(t)[0])(z)  # [R,6]

        # weights: per-(l,c) cauchy on repr block norm / depth; speed trivial
        thr_r = rcfg.reprojection_thres * smul
        thr_d = rcfg.depth_thres * smul
        r3 = r[: obs.size].reshape(obs.shape[0], obs.shape[1], 3)
        s_repr = jnp.sum(r3[..., :2] ** 2, -1)
        s_depth = r3[..., 2] ** 2
        w_repr = jnp.where(repr_ok,
                           w_lm * cauchy_weight(s_repr, thr_r), 0.0)
        w_depth = jnp.where(depth_ok,
                            w_lm * cauchy_weight(s_depth, thr_d), 0.0)
        w = jnp.stack([w_repr, w_repr, w_depth], -1).reshape(-1)
        if speed_reg is not None:
            w = jnp.concatenate([w, jnp.full((3,), speed_reg[3], dtype)])
        a2r, a2d = thr_r ** 2, thr_d ** 2
        cost = 0.5 * (jnp.sum(jnp.where(repr_ok, w_lm * a2r * jnp.log1p(s_repr / a2r), 0.0))
                      + jnp.sum(jnp.where(depth_ok, w_lm * a2d * jnp.log1p(s_depth / a2d), 0.0)))
        if speed_reg is not None:
            cost = cost + 0.5 * speed_reg[3] * jnp.sum(r[-3:] ** 2)
        H = jnp.einsum("r,ri,rj->ij", w, J, J)
        g = -jnp.einsum("r,ri,r->i", w, J, r)
        return cost, H, g, (r3, repr_ok, depth_ok)

    def lm_loop(pose, lm_use, iters):
        def smul_at(it):
            if ginit <= 1.0:
                return jnp.asarray(1.0, dtype)
            return jnp.maximum(ginit * 0.5 ** it.astype(dtype), 1.0)

        def body(state):
            pose, lam, it, done = state
            smul = smul_at(it)
            # current-pose cost at THIS iteration's scale so accept/reject
            # compares like with like under the graduated schedule
            cost, H, g, _ = cost_and_system(pose, lm_use, smul)
            Hd = H + lam * jnp.diag(jnp.maximum(jnp.diagonal(H), 1e-6))
            delta = jnp.linalg.solve(Hd + 1e-12 * jnp.eye(6, dtype=dtype), g)
            cand = pose_ops.normalize(pose_ops.boxplus(pose, delta))
            new_cost, _, _, _ = cost_and_system(cand, lm_use, smul)
            accept = jnp.isfinite(new_cost) & (new_cost < cost)
            pose = jnp.where(accept, cand, pose)
            lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-10),
                            jnp.minimum(lam * 4.0, 1e8))
            rel = (cost - new_cost) / jnp.maximum(cost, 1e-12)
            # no convergence exit while the scale is still relaxed
            done = accept & (rel < cfg.solver.function_tolerance) \
                & (smul <= 1.0)
            return pose, lam, it + 1, done

        def cond(state):
            return (~state[3]) & (state[2] < iters)

        pose, _, _, _ = jax.lax.while_loop(
            cond, body,
            (pose, jnp.asarray(cfg.solver.initial_lambda, dtype),
             jnp.asarray(0, jnp.int32), jnp.asarray(False)))
        cost, _, _, _ = cost_and_system(pose, lm_use)
        return pose, cost

    # trim round (2 iters) then refinement, reference trimmer spec
    pose, _ = lm_loop(pose_prior, lm_mask, rcfg.trim_iteration_lm_steps)
    _, _, _, (r3, repr_ok, depth_ok) = cost_and_system(pose, lm_mask)
    score_repr = jnp.max(jnp.where(repr_ok, jnp.linalg.norm(r3[..., :2], axis=-1), 0.0), -1)
    score_depth = jnp.max(jnp.where(depth_ok, jnp.abs(r3[..., 2]), 0.0), -1)
    grp_repr = jnp.any(repr_ok, -1)
    grp_depth = jnp.any(depth_ok, -1)
    n_groups = jnp.sum(grp_repr.astype(jnp.int32))
    trim_on = n_groups > 30
    out = (trim_quantile(score_repr, grp_repr, rcfg.reprojection_quantile)
           & (jnp.sum(grp_repr) >= rcfg.min_residual_groups))
    out = out | (trim_quantile(score_depth, grp_depth, rcfg.depth_quantile)
                 & (jnp.sum(grp_depth) >= rcfg.min_residual_groups))
    lm_use = lm_mask & ~(out & trim_on)

    pose, cost = lm_loop(pose, lm_use, max_iters)
    return PoseOnlyResult(pose=pose, cost=cost,
                          n_used=jnp.sum(lm_use.astype(jnp.int32)))
