"""Benchmark: trimmed windowed-BA solves per second on one chip.

The reference caps each windowed solve at 0.15 s wall (3 Ceres threads,
launch/keyframe_ba_monolid.launch:47) — i.e. ~6.67 solves/s sustained.
This bench runs the identical-scale problem (12 active keyframes, 800
landmarks with lidar depth, Cauchy losses, quantile trimming + refinement)
through the TPU-native solver and reports solves/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_SOLVES_PER_SEC = 1.0 / 0.15


def main():
    from limo_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from limo_tpu.solver import solve_trimmed
    from __graft_entry__ import _make_problem

    w, sel, rig, cfg = _make_problem(20, 1536, 12, 800, jnp.float32, seed=1)

    step = jax.jit(lambda w, s: solve_trimmed(w, s, rig, cfg))
    out = step(w, sel)
    jax.block_until_ready(out[0].poses)

    # median of 3 batches of 10: robust to axon-tunnel RPC jitter
    per_batch = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(10):
            out = step(w, sel)
        jax.block_until_ready(out[0].poses)
        per_batch.append((time.time() - t0) / 10)
    per = sorted(per_batch)[1]
    value = 1.0 / per

    print(json.dumps({
        "metric": "trimmed_window_ba_solves_per_sec_12kf_800lm",
        "value": round(value, 3),
        "unit": "solves/s",
        "vs_baseline": round(value / REFERENCE_SOLVES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
