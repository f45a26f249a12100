"""Independent-optimizer cross-check of the LM+Schur solver.

The reference trusts Ceres; we have no Ceres. This gate minimizes the EXACT
robust objective (``ba_core.compute_cost`` — the same function the LM loop
accepts/rejects on) with scipy L-BFGS-B over [pose tangents | plane tangents |
landmark deltas] and requires the on-device LM+Schur solver to reach an
equal-or-better minimum — validating the whole damped-Schur machinery
(jacobians, elimination, back-substitution, gauge masks) against an
optimizer that shares none of its code."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import minimize

from __graft_entry__ import _make_problem
from limo_tpu.solver import apply_step, assemble, run_lm
from limo_tpu.solver.ba_core import PD, compute_cost


def test_lm_matches_independent_optimizer():
    w, sel, rig, cfg = _make_problem(5, 64, 5, 40, jnp.float64, seed=3)
    L = w.L
    P = w.K * PD

    eqs, _ = jax.jit(lambda a, b: assemble(a, b, rig, cfg))(w, sel)
    cost0 = float(eqs.cost)

    def obj(x):
        dp = x[:P] * eqs.param_mask
        dl = x[P:].reshape(L, 3) * eqs.lm_mask[:, None].astype(x.dtype)
        return compute_cost(apply_step(w, dp, dl), sel, rig, cfg)

    val_grad = jax.jit(jax.value_and_grad(obj))

    def fg(x):
        v, g = val_grad(jnp.asarray(x))
        return float(v), np.asarray(g, np.float64)

    res = minimize(fg, np.zeros(P + 3 * L), jac=True, method="L-BFGS-B",
                   options={"maxiter": 4000, "maxfun": 6000,
                            "ftol": 1e-15, "gtol": 1e-12})
    assert res.fun < cost0, (res.fun, cost0)

    _, cost_lm, _, n_acc = jax.jit(
        lambda a, b: run_lm(a, b, rig, cfg, 100))(w, sel)
    cost_lm = float(cost_lm)
    assert int(n_acc) > 0
    assert cost_lm < cost0
    # equal-or-better minimum than the independent optimizer
    assert cost_lm <= res.fun * 1.02 + 1e-9, (cost_lm, res.fun)
