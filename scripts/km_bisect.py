"""Bisect the km rendered-drive failure: which profile feature breaks it."""
import os
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np

sys.path.insert(0, ".")
from limo_tpu.pipeline.evaluation import (evaluate_rendered_long_drive,
                                          make_km_rendered_world)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 400
variants = {
    "plain": dict(with_standstill=False, with_turns=False),
    "still": dict(with_standstill=True, with_turns=False),
    "turns": dict(with_standstill=False, with_turns=True),
    "both": dict(with_standstill=True, with_turns=True),
}
for name, kw in variants.items():
    rep, out, still = evaluate_rendered_long_drive(num_frames=N, chunk=64,
                                                   world_kw=kw)
    world, _ = make_km_rendered_world(N, **kw)
    from limo_tpu.pipeline import fused as fu
    est = fu.poses_kitti(out)
    gt = world.kitti_gt()
    err = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=1)
    # first frame where error exceeds 2 m and per-decile error profile
    bad = np.flatnonzero(err > 2.0)
    print(f"{name}: {rep.to_json()}")
    print(f"  err deciles {np.round(err[::N//10], 2).tolist()} "
          f"first>2m: {bad[0] if len(bad) else -1} "
          f"min n_matches[5:]: {int(np.asarray(out.n_matches)[5:].min())}",
          flush=True)
