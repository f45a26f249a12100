"""Benchmark: trimmed windowed-BA solves per second on one chip.

The reference caps each windowed solve at 0.15 s wall (3 Ceres threads,
launch/keyframe_ba_monolid.launch:47) — i.e. ~6.67 solves/s sustained.
This bench runs the identical-scale problem (12 active keyframes, 800
landmarks with lidar depth, Cauchy losses, quantile trimming + refinement)
through the TPU-native solver and reports solves/s.

Measurement: ONE compiled program runs 10 chained cold solves via
``lax.scan`` — each link re-solves the ORIGINAL window (feeding the
converged output forward would let refinement exit early and flatter the
number) with a numerically-negligible data dependency on the previous
link's cost so XLA cannot hoist the solve out of the loop. One dispatch
per measurement amortizes the axon tunnel's per-call RPC gap (0.5–3 ms,
varies by the hour) out of the headline, so it tracks CODE changes; the
spread across the 3 timed dispatches still exposes INFRASTRUCTURE noise
(VERDICT r2 weak #7 asked for exactly this separability). A single
program also halves the cold-compile bill — the axon backend cannot
serialize executables, so every bench process recompiles.

Prints ONE JSON line whose headline keys are
{"metric", "value", "unit", "vs_baseline"}; extra keys attribute the
number:
  - assembly_path: which assembly the solve compiled ("pallas[tile=512]"
    or an einsum fallback reason) — a silent fallback is a perf bug;
  - ms_per_solve_batches: per-solve ms of each timed dispatch;
  - solve_iterations / rounds / trim counts from SolveInfo — a change in
    convergence behavior (more LM iterations) shows up here, separating
    "slower per iteration" from "doing more iterations".
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_SOLVES_PER_SEC = 1.0 / 0.15
NCHAIN = 10


def main():
    from limo_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from limo_tpu.solver import solve_trimmed
    from limo_tpu.solver.ba_core import assembly_plan
    from __graft_entry__ import _make_problem

    w, sel, rig, cfg = _make_problem(20, 1536, 12, 800, jnp.float32, seed=1)
    path = assembly_plan(w.L, jnp.float32, cfg)

    def run_chain(w0, s0):
        def chain(carry, _):
            # carry: previous final cost; 1e-30-scaled => exact zero effect
            # on f32 lm_pos values, but a real dependency for the scheduler
            wi = w0._replace(lm_pos=w0.lm_pos + carry * 1e-30)
            _, _, inf = solve_trimmed(wi, s0, rig, cfg)
            return inf.final_cost, inf

        return jax.lax.scan(chain, jnp.asarray(0.0, jnp.float32), None,
                            length=NCHAIN)

    step = jax.jit(run_chain)
    t0 = time.time()
    _, infos = step(w, sel)
    jax.block_until_ready(infos.final_cost)
    compile_s = time.time() - t0

    per_batch = []
    for _ in range(3):
        t0 = time.time()
        _, infos = step(w, sel)
        jax.block_until_ready(infos.final_cost)
        per_batch.append((time.time() - t0) / NCHAIN)
    per = sorted(per_batch)[1]
    value = 1.0 / per

    final = np.asarray(infos.final_cost)
    assert np.allclose(final, final[0], rtol=1e-4), final  # links identical

    print(json.dumps({
        "metric": "trimmed_window_ba_solves_per_sec_12kf_800lm",
        "value": round(value, 3),
        "unit": "solves/s",
        "vs_baseline": round(value / REFERENCE_SOLVES_PER_SEC, 3),
        "assembly_path": path,
        "ms_per_solve_batches": [round(p * 1e3, 3) for p in per_batch],
        "compile_s": round(compile_s, 1),
        "solve_iterations": int(np.asarray(infos.n_iterations)[0]),
        "solve_rounds": int(np.asarray(infos.n_rounds)[0]),
        "trimmed": int(np.asarray(infos.n_trimmed)[0]),
        "final_cost": round(float(final[0]), 2),
    }), flush=True)


if __name__ == "__main__":
    main()
