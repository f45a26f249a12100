"""Trimmed least squares — the TPU re-implementation of
``robust_optimization::solveTrimmed`` (robust_solving.cpp:140-248).

Algorithm (reference semantics, SURVEY §2.2):
  for each outer round:
    1. run LM for a small budget (2 iters); if cost did not decrease,
       extend the round to 3× the budget (robust_solving.cpp:167-181)
    2. evaluate raw loss-free residuals grouped per landmark; score =
       max block norm within the group (robust_solving.cpp:67-91)
    3. per family (depth / reprojection / gp) trim by its
       ``TrimmerSpecification`` — Fix | Quantile dispatch per family
       (robust_solving.hpp:18-25,135-156; apply_trimmer.hpp:29-45) —
       skipping families with < min_residual_groups valid groups
    4. union outlier groups over families; remove ALL residuals of those
       landmarks (here: clear the selection mask — weights, not shapes)
    5. the trust region resets each round (trust_region_relaxation_factor=-10)
  finally: one refinement run with the full iteration budget.

Compile-time design: ONE ``lax.while_loop`` whose body is a single LM
iteration; round boundaries, the divergence-retry extension, trimming, and
the final refinement phase are all traced state transitions inside the loop.
The compiled program contains exactly one normal-equation assembly graph —
this matters under remote-compile TPU backends where program size dominates
compile latency.

Diagnostics: :class:`SolveInfo` carries the merged-``Summary``/FullReport
equivalents (robust_solving.hpp:44-74; ``bundle_adjuster_keyframes.cpp:766``)
as fixed-shape arrays — per-round per-family trim counts and an
accept/reject trace with per-iteration costs — cheap int/f32 vectors that
make perf/accuracy regressions attributable from bench and eval logs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..robust import trim_fixed, trim_quantile
from ..utils.precision import solver_matmul
from ..state import Selection, Window
from .ba_core import assemble, compute_cost, residual_stats
from .lm import apply_step, solve_normal_equations


class SolveInfo(NamedTuple):
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    n_trimmed: jnp.ndarray
    n_accepted: jnp.ndarray
    # ---- Summary/FullReport parity (robust_solving.hpp:44-74) ----------
    n_iterations: jnp.ndarray = None   # total LM iterations executed
    n_rounds: jnp.ndarray = None       # trim rounds completed
    trimmed_repr: jnp.ndarray = None   # [R] per-round reprojection-family counts
    trimmed_depth: jnp.ndarray = None  # [R]
    trimmed_gp: jnp.ndarray = None     # [R]
    accept_trace: jnp.ndarray = None   # [T] int8: 0 unused, 1 accepted, 2 rejected
    cost_trace: jnp.ndarray = None     # [T] cost after each executed iteration


def trace_capacity(cfg) -> int:
    """Fixed length of the iteration-trace arrays for a given config."""
    rcfg, scfg = cfg.robust, cfg.solver
    return (rcfg.num_trim_iterations
            * scfg.diverged_retry_factor * rcfg.trim_iteration_lm_steps
            + scfg.refinement_iterations)


class _TrimState(NamedTuple):
    window: Window
    lm_selected: jnp.ndarray
    lam: jnp.ndarray
    cost: jnp.ndarray
    round_start_cost: jnp.ndarray
    it_in_round: jnp.ndarray   # LM iterations taken in the current round
    it_total: jnp.ndarray      # LM iterations taken overall (trace cursor)
    round_idx: jnp.ndarray     # 0..num_rounds-1 trim rounds, num_rounds = refinement
    extended: jnp.ndarray      # divergence-retry extension active
    n_trimmed: jnp.ndarray
    n_accepted: jnp.ndarray
    trimmed_repr: jnp.ndarray  # [R] per-round family counts
    trimmed_depth: jnp.ndarray
    trimmed_gp: jnp.ndarray
    accept_trace: jnp.ndarray  # [T] int8
    cost_trace: jnp.ndarray    # [T]
    done: jnp.ndarray


@solver_matmul
def solve_trimmed(window: Window, sel: Selection, rig, cfg,
                  compensate_rotation: bool = False, axis_name=None):
    """Full trimmed solve. Returns (window, selection, SolveInfo).

    The returned selection has trimmed landmarks removed (mask cleared) —
    mirroring the reference's permanent RemoveResidualBlock surgery.

    axis_name: set when running inside ``shard_map`` with the landmark axis
    split over a mesh axis (see :mod:`limo_tpu.parallel.sharding`). All
    L-axis reductions become explicit collectives: one ``psum`` of the
    reduced pose system per LM iteration, an ``all_gather`` of the [L] trim
    scores per trim round, and ``psum``-ed family counts for the
    min-residual-groups guards.
    """
    rcfg = cfg.robust
    scfg = cfg.solver
    dtype = window.poses.dtype

    num_rounds = rcfg.num_trim_iterations
    budget = rcfg.trim_iteration_lm_steps
    budget_ext = scfg.diverged_retry_factor * budget
    refine_iters = scfg.refinement_iterations
    T = trace_capacity(cfg)

    def sel_with(mask):
        return sel._replace(lm_selected=mask)

    def get_cost(w, mask):
        return compute_cost(w, sel_with(mask), rig, cfg,
                            compensate_rotation=compensate_rotation,
                            axis_name=axis_name)

    def gsum(x):
        # dtype=int32 also pins the x64-mode accumulator (jnp.sum would
        # promote to int64 and poison the int32 count arrays downstream)
        n = jnp.sum(x, dtype=jnp.int32)
        return n if axis_name is None else jax.lax.psum(n, axis_name)

    initial_cost = get_cost(window, sel.lm_selected)
    # trimming only engages with >100 selected landmarks (solve():741-746)
    n_selected = gsum(window.lm_valid & sel.lm_selected)
    trim_active = n_selected > 100

    def family_outliers(score, valid, trimmer, quantile, fixed_thres):
        """Per-family TrimmerSpecification dispatch (apply_trimmer.hpp:29-45)
        with the min-groups guard (getResidualsToRemove,
        robust_solving.cpp:100-125)."""
        if trimmer == "quantile":
            out = trim_quantile(score, valid, quantile, axis_name)
        elif trimmer == "fixed":
            out = trim_fixed(score, valid, fixed_thres)
        else:
            raise ValueError(f"unknown trimmer type {trimmer!r}")
        return out & (gsum(valid) >= rcfg.min_residual_groups)

    def trim(st: _TrimState) -> _TrimState:
        stats = residual_stats(st.window, sel_with(st.lm_selected), rig, cfg,
                               compensate_rotation=compensate_rotation,
                               axis_name=axis_name)
        out_repr = family_outliers(stats.repr_score, stats.repr_valid,
                                   rcfg.reprojection_trimmer,
                                   rcfg.reprojection_quantile,
                                   rcfg.reprojection_trim_fixed_thres)
        out_depth = family_outliers(stats.depth_score, stats.depth_valid,
                                    rcfg.depth_trimmer, rcfg.depth_quantile,
                                    rcfg.depth_trim_fixed_thres)
        out_gp = family_outliers(stats.gp_score, stats.gp_valid,
                                 rcfg.gp_trimmer, rcfg.gp_quantile,
                                 rcfg.gp_trim_fixed_thres)
        out_repr = out_repr & trim_active
        out_depth = out_depth & trim_active
        out_gp = out_gp & trim_active
        outliers = out_repr | out_depth | out_gp
        mask = st.lm_selected & (~outliers)
        ridx = jnp.clip(st.round_idx, 0, max(num_rounds - 1, 0))
        return st._replace(
            lm_selected=mask,
            n_trimmed=(st.n_trimmed + gsum(outliers)).astype(jnp.int32),
            trimmed_repr=st.trimmed_repr.at[ridx].set(gsum(out_repr)),
            trimmed_depth=st.trimmed_depth.at[ridx].set(gsum(out_depth)),
            trimmed_gp=st.trimmed_gp.at[ridx].set(gsum(out_gp)),
            cost=get_cost(st.window, mask),
        )

    def body(st: _TrimState) -> _TrimState:
        # ---- one LM iteration ------------------------------------------
        eqs, _ = assemble(st.window, sel_with(st.lm_selected), rig, cfg,
                          compensate_rotation=compensate_rotation,
                          axis_name=axis_name)
        delta_p, delta_l = solve_normal_equations(eqs, st.lam,
                                                  axis_name=axis_name)
        cand = apply_step(
            st.window, delta_p, delta_l,
            motion_parameterization=getattr(
                scfg, "motion_parameterization", "full_dof"))
        new_cost = get_cost(cand, st.lm_selected)
        accept = jnp.isfinite(new_cost) & (new_cost < st.cost)
        window = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, b, a), st.window, cand)
        lam = jnp.where(accept,
                        jnp.maximum(st.lam * scfg.lambda_down, scfg.min_lambda),
                        jnp.minimum(st.lam * scfg.lambda_up, scfg.max_lambda))
        rel_step = (st.cost - new_cost) / jnp.maximum(st.cost, 1e-12)
        converged = accept & (rel_step < scfg.function_tolerance)
        cost = jnp.where(accept, new_cost, st.cost)
        tcur = jnp.clip(st.it_total, 0, T - 1)
        st = st._replace(
            window=window, lam=lam, cost=cost,
            it_in_round=st.it_in_round + 1,
            it_total=st.it_total + 1,
            n_accepted=st.n_accepted + accept.astype(jnp.int32),
            accept_trace=st.accept_trace.at[tcur].set(
                jnp.where(accept, 1, 2).astype(jnp.int8)),
            cost_trace=st.cost_trace.at[tcur].set(cost))

        # ---- round bookkeeping -----------------------------------------
        in_refinement = st.round_idx >= num_rounds
        round_budget = jnp.where(in_refinement, refine_iters,
                                 jnp.where(st.extended, budget_ext, budget))
        at_budget = st.it_in_round >= round_budget
        decreased = st.cost < st.round_start_cost
        # divergence retry: trim rounds only (robust_solving.cpp:172-181)
        extend = at_budget & (~in_refinement) & (~st.extended) & (~decreased)
        round_over = at_budget & (~extend)

        # refinement ends at budget, on convergence, or when hopeless
        refinement_done = in_refinement & (
            round_over | converged | (st.lam >= scfg.max_lambda))

        def end_round(s):
            s = trim(s)
            return s._replace(
                round_idx=s.round_idx + 1,
                it_in_round=jnp.zeros_like(s.it_in_round),
                extended=jnp.zeros_like(s.extended),
                lam=jnp.asarray(scfg.initial_lambda, dtype),  # TR reset/round
                round_start_cost=s.cost)

        st = st._replace(extended=st.extended | extend)
        st = jax.lax.cond(round_over & (~in_refinement), end_round,
                          lambda s: s, st)
        return st._replace(done=refinement_done)

    def cond(st: _TrimState):
        return (~st.done) & (st.round_idx <= num_rounds)

    st0 = _TrimState(
        window=window,
        lm_selected=sel.lm_selected,
        lam=jnp.asarray(scfg.initial_lambda, dtype),
        cost=initial_cost,
        round_start_cost=initial_cost,
        it_in_round=jnp.asarray(0, jnp.int32),
        it_total=jnp.asarray(0, jnp.int32),
        round_idx=jnp.asarray(0, jnp.int32),
        extended=jnp.asarray(False),
        n_trimmed=jnp.asarray(0, jnp.int32),
        n_accepted=jnp.asarray(0, jnp.int32),
        trimmed_repr=jnp.zeros((max(num_rounds, 1),), jnp.int32),
        trimmed_depth=jnp.zeros((max(num_rounds, 1),), jnp.int32),
        trimmed_gp=jnp.zeros((max(num_rounds, 1),), jnp.int32),
        accept_trace=jnp.zeros((T,), jnp.int8),
        cost_trace=jnp.zeros((T,), dtype),
        done=jnp.asarray(False),
    )
    out = jax.lax.while_loop(cond, body, st0)
    info = SolveInfo(initial_cost=initial_cost, final_cost=out.cost,
                     n_trimmed=out.n_trimmed, n_accepted=out.n_accepted,
                     n_iterations=out.it_total,
                     n_rounds=jnp.minimum(out.round_idx, num_rounds),
                     trimmed_repr=out.trimmed_repr,
                     trimmed_depth=out.trimmed_depth,
                     trimmed_gp=out.trimmed_gp,
                     accept_trace=out.accept_trace,
                     cost_trace=out.cost_trace)
    return out.window, sel_with(out.lm_selected), info
