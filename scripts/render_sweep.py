"""Renderer-parameter sweep on the 120-frame fused-test scene: patch texture
resolution vs bbox cap, after the true-perspective-scale fix."""
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
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
from limo_tpu.frontend import tracker as trk
from limo_tpu.geometry.camera import CameraRig
from limo_tpu.pipeline import fused
from limo_tpu.pipeline.metrics import ate_rmse, kitti_drift
from limo_tpu.pipeline.render import SequenceRenderer
from limo_tpu.pipeline.synthetic import make_world

W_IMG, H_IMG, FOCAL = 512, 192, 450.0
N = 120

variants = {
    "r7_cap40": dict(patch_r=7, patch_px_max=40),
    "r15_cap40": dict(patch_r=15, patch_px_max=40),
    "r7_cap20": dict(patch_r=7, patch_px_max=20),
    "r15_cap24": dict(patch_r=15, patch_px_max=24),
}
which = sys.argv[1:] or list(variants)
world = make_world(num_frames=N, speed=6.0, yaw_rate=0.012,
                   n_landmarks=360, n_ground=110, n_shrubbery=40,
                   n_dynamic=25, dynamic_speed=6.0, seed=9,
                   focal=FOCAL, pp=(W_IMG / 2.0, H_IMG / 2.0),
                   image_size=(W_IMG, H_IMG))
from test_fused import small_configs

gt = world.kitti_gt()[:N]
for name in which:
    rng = np.random.default_rng(11)
    rend = SequenceRenderer(world, **variants[name])
    imgs, clouds, labels = [], [], []
    for i in range(N):
        img, lab = rend.frame(i)
        imgs.append((img * 255).astype(np.uint8))
        labels.append(lab)
        clouds.append(rend.cloud(i, rng))
    imgs = np.stack(imgs)
    labels = np.stack(labels)
    # corner density probe
    dcfg = trk.TrackerConfig(max_features=512, border=8)
    nc = [int(np.asarray(trk.detect(
        jnp.asarray(imgs[i].astype(np.float32) / 255.0), dcfg).valid).sum())
        for i in (10, 60, 110)]
    cfg, pcfg = small_configs()
    rig = CameraRig.single(world.focal, world.principal[0],
                           world.principal[1],
                           T_cam_veh=jnp.asarray(world.T_cam_veh, jnp.float32))
    _, out = fused.run_fused(world.stamps[:N], imgs, clouds, rig, cfg, pcfg,
                             label_images=labels)
    est = fused.poses_kitti(out)
    drift = kitti_drift(gt, est, lengths=(25.0, 50.0), step=5)
    print(f"{name:10s} ate {ate_rmse(gt, est):6.3f} "
          f"t {drift['t_err_percent']:5.2f}% r {drift['r_err_deg_per_m']:.4f} "
          f"corners {nc} min_matches {int(np.asarray(out.n_matches)[5:].min())}",
          flush=True)
