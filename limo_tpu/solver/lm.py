"""Levenberg-Marquardt driver with per-landmark Schur elimination.

Replaces ``ceres::Solve`` (LM + DENSE_SCHUR, ``robust_solving.hpp:93-108``)
with a ``lax.while_loop`` on device:

  1. assemble masked normal equations (ba_core.assemble)
  2. damp:  H' = H + λ·diag(H) (Marquardt scaling), both the landmark blocks
     V and the reduced pose/plane block
  3. Schur: S = H_pp − Σ_l W_l V_l⁻¹ W_lᵀ  (batched 3×3 inverses + one einsum)
  4. dense-solve S δp = rhs (P = 10K ≈ 200, same as Ceres' reduced system)
  5. back-substitute δl = V⁻¹(b_l − Wᵀ δp)
  6. accept/reject on robust cost; λ ↓ on accept, ↑ on reject (classic LM,
     mirroring Ceres' trust-region expand/shrink behavior)

The iteration-budget parameter is a *traced* operand so trimmed solving can
re-enter with different budgets (2, 3×2, refinement) without recompiles.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..state import Selection, Window
from ..utils.precision import solver_matmul
from .ba_core import PD, assemble, compute_cost, plane_boxplus
from ..geometry import pose as pose_ops


class LMState(NamedTuple):
    window: Window
    lam: jnp.ndarray
    cost: jnp.ndarray
    it: jnp.ndarray
    done: jnp.ndarray
    n_accepted: jnp.ndarray


def _inv3(V):
    """Batched analytic 3x3 inverse via adjugate (faster than LU on TPU)."""
    a, b, c = V[..., 0, 0], V[..., 0, 1], V[..., 0, 2]
    d, e, f = V[..., 1, 0], V[..., 1, 1], V[..., 1, 2]
    g, h, i = V[..., 2, 0], V[..., 2, 1], V[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    adj = jnp.stack([
        jnp.stack([A, -(b * i - c * h), (b * f - c * e)], -1),
        jnp.stack([B, (a * i - c * g), -(a * f - c * d)], -1),
        jnp.stack([C, -(a * h - b * g), (a * e - b * d)], -1),
    ], -2)
    return adj / det[..., None, None]


def solve_normal_equations(eqs, lam, axis_name=None):
    """Damped Schur solve → (delta_p [P], delta_l [L,3]).

    axis_name: inside ``shard_map`` with landmarks split over a mesh axis,
    the Schur correction (an L-axis reduction) is ``psum``-reduced; the
    reduced dense solve then runs replicated on every shard and the landmark
    back-substitution stays local.

    Matmul precision is pinned to full-f32 HERE regardless of the outer
    solver level: S = H_pp − W·V⁻¹·Wᵀ cancels almost exactly on weakly
    constrained dims (mono scale!), and bf16 MXU passes lose that
    difference — this is the step behind the round-2 2-cam ATE blowup
    (utils/precision.py). Assembly reductions are either exact-f32 in the
    Pallas kernel or benign sums, so they follow the cheaper global level.
    """
    with jax.default_matmul_precision("highest"):
        return _solve_normal_equations(eqs, lam, axis_name)


def _apply_vinv(Vinv, X):
    """X·Vinv over the last axis, expanded as ELEMENTWISE broadcasting
    arithmetic (VPU, exact f32) — a batched [L,·,3]×[L,3,3] einsum lowers
    to L tiny MXU dots whose full-precision variant dominates the solve's
    wall time; the elementwise form is both exact and fast.
    X [L,...,3], Vinv [L,3,3] → [L,...,3]."""
    nb = X.ndim - 2
    Vb = Vinv.reshape(Vinv.shape[:1] + (1,) * nb + (3, 3))
    return (X[..., 0:1] * Vb[..., 0, :]
            + X[..., 1:2] * Vb[..., 1, :]
            + X[..., 2:3] * Vb[..., 2, :])


def _solve_normal_equations(eqs, lam, axis_name=None):
    dtype = eqs.H_pp.dtype
    P = eqs.H_pp.shape[0]
    L, K = eqs.W6.shape[0], eqs.W6.shape[1]
    # Marquardt damping on diagonals (with absolute floor for flat dims)
    diag_p = jnp.diagonal(eqs.H_pp)
    H_pp = eqs.H_pp + jnp.diag(lam * jnp.maximum(diag_p, 1e-6))
    # keep fixed dims well-posed: unit diagonal where masked out
    H_pp = H_pp + jnp.diag(1.0 - eqs.param_mask)
    Vdiag = jnp.diagonal(eqs.V, axis1=-2, axis2=-1)
    V = eqs.V + (lam * jnp.maximum(Vdiag, 1e-6))[..., None] * jnp.eye(3, dtype=dtype)
    Vinv = _inv3(V)

    # ---- Schur complement (ONE psum when sharded) ----------------------
    # Augmented Gram form: with Wb = [W | b_l], G = (Wb Vinv) Wbᵀ gives the
    # S correction, its rhs, AND the rhs·Vinv·rhs scalar in ONE full-f32
    # MXU contraction — the only big dot that must run at "highest"
    # (cancellation analysis in solve_normal_equations's docstring).
    # W6 [L,K,6,3] pose blocks + Wp [L,4,3] plane block routed by gp_oh.
    gp_oh = eqs.gp_oh
    Wfull = jnp.concatenate([
        eqs.W6, gp_oh[:, :, None, None] * eqs.Wp[:, None, :, :]], axis=2)
    Wb = jnp.concatenate([Wfull.reshape(L, P, 3), eqs.b_l[:, None, :]],
                         axis=1)                               # [L,P+1,3]
    WbV = _apply_vinv(Vinv, Wb)                                # exact f32 VPU
    G = jnp.einsum("lpi,lqi->pq", WbV, Wb)                     # [P+1,P+1]
    S_corr = G[:P, :P]
    rhs_corr = G[:P, P]
    if axis_name is not None:
        S_corr, rhs_corr = jax.lax.psum((S_corr, rhs_corr), axis_name)
    S = H_pp - S_corr
    rhs = eqs.b_p - rhs_corr

    # dense solve of the reduced system (P ≈ 200)
    S = 0.5 * (S + S.T)
    delta_p = jax.scipy.linalg.solve(S, rhs, assume_a="pos")
    # guard: a failed Cholesky (NaNs) yields a ZERO step — the LM loop
    # rejects it (cost did not strictly decrease) and retries with larger
    # λ, which is exactly the trust-region response to an indefinite
    # system. The previous guard dense-LU-resolved instead: a sequential
    # 200×200 LU on TPU that XLA executes UNconditionally every iteration
    # (both sides of the where), costing more than the Schur product.
    bad = ~jnp.all(jnp.isfinite(delta_p))
    delta_p = jnp.where(bad, jnp.zeros_like(delta_p), delta_p)
    delta_p = delta_p * eqs.param_mask

    # back-substitution (elementwise Vinv application; one matvec)
    wtdp = jnp.einsum("lpi,p->li", Wb[:, :P], delta_p)
    delta_l = _apply_vinv(Vinv, eqs.b_l - wtdp)
    # a failed Cholesky must yield a FULLY zero candidate: with only delta_p
    # zeroed, delta_l = V⁻¹ b_l is a landmark-only move from an indefinite
    # system that can strictly decrease cost, get ACCEPTED, and drive λ down
    # — the opposite of the trust-region response (advisor r3 finding)
    delta_l = jnp.where(bad, jnp.zeros_like(delta_l), delta_l)
    delta_l = delta_l * eqs.lm_mask[:, None]
    return delta_p, delta_l


def apply_step(window: Window, delta_p, delta_l,
               motion_parameterization: str = "full_dof") -> Window:
    K = window.K
    d = delta_p.reshape(K, PD)
    d6 = d[:, :6]
    if motion_parameterization != "full_dof":
        # reduced coordinates → full tangent via the per-keyframe basis
        # (must match the projection applied in assemble)
        B, _ = pose_ops.tangent_basis(window.poses, motion_parameterization)
        d6 = jnp.einsum("kij,kj->ki", B, d6)
    new_poses = pose_ops.boxplus(window.poses, d6)
    new_planes = plane_boxplus(window.planes, d[:, 6:])
    return window._replace(
        poses=pose_ops.normalize(new_poses),
        planes=new_planes,
        lm_pos=window.lm_pos + delta_l,
    )


@solver_matmul
def run_lm(window: Window, sel: Selection, rig, cfg, max_iters,
           compensate_rotation: bool = False, pose_only: bool = False,
           speed_reg=None, initial_lambda=None, axis_name=None):
    """Run up to ``max_iters`` accepted+rejected LM steps. Returns
    (window, final_cost, final_lambda, n_accepted)."""
    scfg = cfg.solver
    lam0 = scfg.initial_lambda if initial_lambda is None else initial_lambda

    def get_eqs(w):
        return assemble(w, sel, rig, cfg, compensate_rotation=compensate_rotation,
                        pose_only=pose_only, speed_reg=speed_reg,
                        axis_name=axis_name)

    def get_cost(w):
        return compute_cost(w, sel, rig, cfg,
                            compensate_rotation=compensate_rotation,
                            pose_only=pose_only, speed_reg=speed_reg,
                            axis_name=axis_name)

    cost0 = get_cost(window)
    dtype = window.poses.dtype
    st = LMState(window=window,
                 lam=jnp.asarray(lam0, dtype),
                 cost=cost0,
                 it=jnp.asarray(0, jnp.int32),
                 done=jnp.asarray(False),
                 n_accepted=jnp.asarray(0, jnp.int32))
    max_iters = jnp.asarray(max_iters, jnp.int32)

    def cond(s: LMState):
        return (~s.done) & (s.it < max_iters)

    def body(s: LMState):
        # one full assembly for the step; candidate judged by cost only
        eqs, _ = get_eqs(s.window)
        delta_p, delta_l = solve_normal_equations(eqs, s.lam, axis_name=axis_name)
        cand = apply_step(
            s.window, delta_p, delta_l,
            motion_parameterization=getattr(
                scfg, "motion_parameterization", "full_dof"))
        new_cost = get_cost(cand)
        finite = jnp.isfinite(new_cost)
        accept = finite & (new_cost < s.cost)
        window = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, b, a), s.window, cand)
        lam = jnp.where(accept,
                        jnp.maximum(s.lam * cfg.solver.lambda_down, scfg.min_lambda),
                        jnp.minimum(s.lam * cfg.solver.lambda_up, scfg.max_lambda))
        rel_decrease = (s.cost - new_cost) / jnp.maximum(s.cost, 1e-12)
        converged = accept & (rel_decrease < scfg.function_tolerance)
        stuck = (~accept) & (s.lam >= scfg.max_lambda)
        return LMState(window=window, lam=lam,
                       cost=jnp.where(accept, new_cost, s.cost),
                       it=s.it + 1,
                       done=converged | stuck,
                       n_accepted=s.n_accepted + accept.astype(jnp.int32))

    out = jax.lax.while_loop(cond, body, st)
    return out.window, out.cost, out.lam, out.n_accepted
