"""Km-drive structure matrix (VERDICT r5 item 1): which world feature owns
the f340-520 translation-scale collapse. All runs use the CURRENT renderer.
Prints the per-phase translation-scale ratio table per variant."""
import os
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from limo_tpu.pipeline import fused as fu
from limo_tpu.pipeline.evaluation import (evaluate_rendered_long_drive,
                                          make_km_rendered_world)

N = 1000


def phase_table(est, gt):
    de = np.einsum("fij,fjk->fik", np.linalg.inv(est[:-1]), est[1:])
    dg = np.einsum("fij,fjk->fik", np.linalg.inv(gt[:-1]), gt[1:])
    te = np.linalg.norm(de[:, :3, 3], axis=1)
    tg = np.linalg.norm(dg[:, :3, 3], axis=1)
    m = tg > 0.05
    r = np.where(m, te / np.maximum(tg, 1e-9), np.nan)
    seg = lambda a, b: (np.nanmean(r[a:b]) if m[a:b].any() else float("nan"))
    return {"f50-340": seg(50, 340), "f340-350": seg(340, 350),
            "turn1": seg(350, 382), "decel": seg(382, 400),
            "accel": seg(460, 490), "f490-520": seg(490, 520),
            "f520-740": seg(520, 740), "turn2": seg(745, 785),
            "tail": seg(785, 999),
            "path_scale": np.nansum(te[m]) / np.nansum(tg[m])}


variants = {
    "full": {},
    "nodyn": {"n_dynamic": 0},
    "nostill": {"with_standstill": False},
}
which = sys.argv[1:] or list(variants)
for name in which:
    kw = variants[name]
    rep, out, _ = evaluate_rendered_long_drive(num_frames=N, chunk=64,
                                               world_kw=kw)
    world, _ = make_km_rendered_world(N, **kw)
    est = fu.poses_kitti(out)
    gt = world.kitti_gt()
    pt = phase_table(est, gt)
    print(f"[{name}] t_err {rep.drift['t_err_percent']:.2f}% "
          f"r_err {rep.drift['r_err_deg_per_m']:.4f} ate {rep.ate:.2f}")
    print("   " + " ".join(f"{k} {v:.3f}" for k, v in pt.items()), flush=True)
