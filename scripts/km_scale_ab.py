"""A/B matrix for the km-drive scale deficit (VERDICT r5 item 1): which
front-end setting injects the under-translation through turns. Runs the
400-frame turns-only drive with matcher variants and reports per-phase
translation-scale ratios."""
import os
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
import dataclasses
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
from limo_tpu.config import (LandmarkSelectionConfig, LimoConfig, PriorConfig)
from limo_tpu.frontend.lidar_depth import LidarDepthConfig
from limo_tpu.frontend.tracker import TrackerConfig
from limo_tpu.pipeline import fused as fu
from limo_tpu.pipeline.evaluation import (evaluate_rendered_long_drive,
                                          make_km_rendered_world)
from limo_tpu.pipeline.full import LimoPipelineConfig

N = int(os.environ.get("N_FRAMES", 400))
KW = dict(with_standstill=False, with_turns=True)


def make_cfg(**tracker_kw):
    limo = LimoConfig(
        landmark_selection=dataclasses.replace(
            LandmarkSelectionConfig(), height_over_ground=1.65),
        prior=dataclasses.replace(PriorConfig(), default_speed=12.0))
    return LimoPipelineConfig(
        limo=limo,
        tracker=TrackerConfig(max_features=256, border=8, **tracker_kw),
        lidar=LidarDepthConfig(), use_groundplane=True,
        cloud_capacity=16384)


def phase_ratios(est, gt):
    de = np.einsum("fij,fjk->fik", np.linalg.inv(est[:-1]), est[1:])
    dg = np.einsum("fij,fjk->fik", np.linalg.inv(gt[:-1]), gt[1:])
    te = np.linalg.norm(de[:, :3, 3], axis=1)
    tg = np.linalg.norm(dg[:, :3, 3], axis=1)
    m = tg > 0.05
    r = np.where(m, te / np.maximum(tg, 1e-9), 1.0)
    # turns-only profile at N frames: turns at 0.35N and 0.75N, len 0.03N
    t1, t2, tl = int(0.35 * N), int(0.75 * N), int(0.03 * N)
    seg = lambda a, b: r[a:b][m[a:b]].mean() if m[a:b].any() else float("nan")
    return {"cruise1": seg(int(0.06 * N), t1 - 5),
            "turn1": seg(t1 - 5, t1 + tl + 10),
            "mid": seg(t1 + tl + 10, t2 - 5),
            "turn2": seg(t2 - 5, t2 + tl + 10),
            "tail": seg(t2 + tl + 10, N - 1),
            "path_scale": te[m].sum() / tg[m].sum()}


variants = {
    "baseline": {},
    "sigma400": {"locality_sigma": 400.0},
    "sigma1e4": {"locality_sigma": 1e4},
    "unguided": {"guided": False},
}
which = sys.argv[1:] or list(variants)
world, _ = make_km_rendered_world(N, **KW)
gt = world.kitti_gt()
for name in which:
    cfg = make_cfg(**variants[name])
    rep, out, _ = evaluate_rendered_long_drive(num_frames=N, chunk=64,
                                               cfg=cfg, world_kw=KW)
    est = fu.poses_kitti(out)
    pr = phase_ratios(est, gt)
    print(f"{name:10s} t_err {rep.drift['t_err_percent']:.2f}% "
          f"r_err {rep.drift['r_err_deg_per_m']:.4f} ate {rep.ate:.2f} | "
          + " ".join(f"{k} {v:.3f}" for k, v in pr.items()), flush=True)
