"""Per-frame diagnostics through the sharp turn of the km rendered drive."""
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
from limo_tpu.geometry import pose_host
from limo_tpu.pipeline import fused as fu
from limo_tpu.pipeline.evaluation import (evaluate_rendered_long_drive,
                                          make_km_rendered_world)

N = 400
kw = dict(with_standstill=False, with_turns=True)
rep, out, still = evaluate_rendered_long_drive(num_frames=N, chunk=64,
                                               world_kw=kw)
world, _ = make_km_rendered_world(N, **kw)
est = fu.poses_kitti(out)
gt = world.kitti_gt()
err = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=1)
# per-frame relative motion error (est vs gt frame-to-frame)
def qang(qa, qb):
    d = abs(float(np.dot(qa, qb)))
    return np.degrees(2 * np.arccos(min(d, 1.0)))


pose = np.asarray(out.pose)
prior = np.asarray(out.prior)
refined = np.asarray(out.refined)
for i in range(120, 200):
    dg = np.linalg.inv(gt[i]) @ gt[i + 1]
    de = np.linalg.inv(est[i]) @ est[i + 1]
    dt_err = np.linalg.norm(de[:3, 3] - dg[:3, 3])
    ang_g = np.degrees(np.arccos(np.clip((np.trace(dg[:3, :3]) - 1) / 2, -1, 1)))
    ang_rel = np.degrees(np.arccos(np.clip(
        (np.trace(np.linalg.inv(de[:3, :3]) @ dg[:3, :3]) - 1) / 2, -1, 1)))
    # rotation the prior predicts vs last frame's pose; correction applied
    # by pose-only on top of the prior
    pr_rot = qang(prior[i, :4], pose[i - 1, :4]) if i else 0.0
    corr = qang(refined[i, :4], prior[i, :4])
    print(f"f{i:3d} err {err[i]:7.2f} dt_err {dt_err:6.3f} "
          f"gt_rot {ang_g:5.2f} rot_err {ang_rel:5.2f} "
          f"prior_rot {pr_rot:5.2f} po_corr {corr:5.2f} "
          f"po_ok {int(out.po_ok[i])} nuse {int(out.n_usable[i]):3d} "
          f"kf {int(out.is_keyframe[i])} sv {int(out.solved[i])} "
          f"m {int(out.n_matches[i]):3d}")
