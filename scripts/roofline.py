"""Roofline / speed-of-light accounting for the solver and front-end
kernels (VERDICT r3 item 5; BASELINE.md "speed-of-light per chip").

Methodology (axon: the tunnel blocks jax.profiler device traces, so the
evidence is (a) XLA's own per-program cost analysis — FLOPs + HBM bytes
from the compiled TPU executable — and (b) measured single-dispatch chained
device time, decomposed into per-LM-iteration slope and fixed intercept by
varying the iteration budget; both on one real v5e chip):

  v5e peaks used: 197 TFLOP/s bf16 MXU, ~49 TFLOP/s f32-equivalent
  (3-pass), 819 GB/s HBM.

Run: python scripts/roofline.py  (on the axon TPU session).
"""
import dataclasses
import json
import sys
import time


def chain_time(step, args, nchain, reps=3):
    import jax
    t0 = time.time()
    out = step(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = step(*args)
        jax.block_until_ready(out)
        best = min(best, (time.time() - t0) / nchain)
    return best, compile_s


def main():
    from limo_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from limo_tpu.solver import solve_trimmed
    from __graft_entry__ import _make_problem

    NCHAIN = 10
    results = {}

    def bench_iter_budget(K_cap, L_cap, K_used, L_used, iters):
        w, sel, rig, cfg = _make_problem(K_cap, L_cap, K_used, L_used,
                                         jnp.float32, seed=1)
        # The trim rounds run rcfg.trim_iteration_lm_steps each; the
        # refinement budget is the controllable iteration axis. With
        # function_tolerance=0 the refinement runs its FULL budget, so
        # n_iterations = trim steps + `iters` exactly — the sweep's
        # independent variable.
        cfg = dataclasses.replace(cfg, solver=dataclasses.replace(
            cfg.solver, refinement_iterations=iters,
            function_tolerance=0.0))

        def run_chain(w0, s0):
            def link(carry, _):
                wi = w0._replace(lm_pos=w0.lm_pos + carry * 1e-30)
                _, _, inf = solve_trimmed(wi, s0, rig, cfg)
                return inf.final_cost, inf.n_iterations
            return jax.lax.scan(link, jnp.asarray(0.0, jnp.float32), None,
                                length=NCHAIN)

        step = jax.jit(run_chain)
        per, compile_s = chain_time(step, (w, sel), NCHAIN)
        _, n_iters = step(w, sel)
        n = int(np.asarray(n_iters)[0])
        # cost analysis of a single solve at this budget
        one = jax.jit(lambda a, b: solve_trimmed(a, b, rig, cfg))
        ca = one.lower(w, sel).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        return {"budget": iters, "n_iterations": n, "ms": per * 1e3,
                "flops": float(ca.get("flops", -1)),
                "bytes": float(ca.get("bytes accessed", -1)),
                "compile_s": round(compile_s, 1)}

    # --- solver: iteration-budget sweep at the production size -----------
    rows = []
    for it in (3, 6, 12, 24):
        r = bench_iter_budget(20, 1536, 12, 800, it)
        rows.append(r)
        print("12kfx800lm", json.dumps(r), flush=True)
    results["solve_12kf_800lm"] = rows

    # --- solver: the 64 kf x 7800 lm window-scaling point ----------------
    rows = []
    for it in (3, 12):
        r = bench_iter_budget(64, 8192, 64, 7800, it)
        rows.append(r)
        print("64kfx7800lm", json.dumps(r), flush=True)
    results["solve_64kf_7800lm"] = rows

    # slope/intercept decomposition
    for key in ("solve_12kf_800lm", "solve_64kf_7800lm"):
        rr = results[key]
        xs = np.array([r["n_iterations"] for r in rr], float)
        ys = np.array([r["ms"] for r in rr], float)
        A = np.stack([xs, np.ones_like(xs)], 1)
        slope, intercept = np.linalg.lstsq(A, ys, rcond=None)[0]
        print(f"{key}: {slope*1e3:.0f} us/LM-iter, "
              f"intercept {intercept:.2f} ms", flush=True)
        results[key + "_fit"] = {"us_per_iter": slope * 1e3,
                                 "intercept_ms": intercept}

    # --- front end: detect+match and lidar-depth programs ----------------
    from limo_tpu.pipeline import fused as fu
    from limo_tpu.pipeline.evaluation import make_km_rendered_world
    from limo_tpu.pipeline.render import SequenceRenderer
    from limo_tpu.pipeline.full import LimoPipelineConfig
    from limo_tpu.config import LimoConfig
    from limo_tpu.frontend.tracker import TrackerConfig
    from limo_tpu.frontend.lidar_depth import LidarDepthConfig
    from limo_tpu.geometry.camera import CameraRig

    world, _ = make_km_rendered_world(num_frames=24)
    rend = SequenceRenderer(world)
    rng = np.random.default_rng(0)
    F = 16
    imgs = np.stack([(rend.frame(i)[0] * 255).astype(np.uint8)
                     for i in range(F)])
    clouds = [rend.cloud(i, rng) for i in range(F)]
    cfg = LimoConfig()
    pcfg = LimoPipelineConfig(limo=cfg,
                              tracker=TrackerConfig(max_features=256,
                                                    border=8),
                              lidar=LidarDepthConfig(),
                              use_groundplane=True, cloud_capacity=16384)
    rig = CameraRig.single(world.focal, world.principal[0],
                           world.principal[1],
                           T_cam_veh=jnp.asarray(world.T_cam_veh,
                                                 jnp.float32))
    run = fu._get_runner(rig, cfg, pcfg, world.image_size, False)
    st = fu.init_fused_state(cfg, pcfg)
    cl, cm = fu.pad_clouds(clouds, pcfg.cloud_capacity)
    xs = (jnp.asarray(world.stamps[:F], jnp.float32), jnp.asarray(imgs),
          jnp.asarray(cl), jnp.asarray(cm),
          jnp.zeros((F,) + imgs.shape[1:], jnp.uint8))
    per, compile_s = chain_time(run, (st, xs), F)
    lowered = (run.lower(st, xs) if hasattr(run, "lower")
               else jax.jit(run).lower(st, xs))
    ca = lowered.compile().cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    results["fused_frame"] = {
        "ms_per_frame": per * 1e3,
        "flops_per_frame": float(ca.get("flops", -1)) / F,
        "bytes_per_frame": float(ca.get("bytes accessed", -1)) / F,
        "compile_s": round(compile_s, 1)}
    print("fused", json.dumps(results["fused_frame"]), flush=True)

    with open("/tmp/roofline_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print("DONE")


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
