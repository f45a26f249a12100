"""Standalone repro: does pose_only_step under-translate at turn onset?

Synthetic single-frame experiment at the km scene's statistics (f=450,
512x192, ~45 landmarks with lidar depth, 1.2 m/frame forward + 2.1 deg/frame
yaw). Prior = constant-velocity (carries translation but no turn rotation).
Sweep iteration budgets / graduated schedules / landmark counts."""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from limo_tpu.config import LimoConfig
from limo_tpu.geometry import pose as pose_ops
from limo_tpu.geometry import quaternion as quat
from limo_tpu.geometry.camera import CameraRig
from limo_tpu.solver.pose_only import pose_only_step

DT = jnp.float64
F, W, H = 450.0, 512, 192
CX, CY = W / 2.0, H / 2.0
rig = CameraRig.single(F, CX, CY, dtype=DT)
# camera looks +z (vehicle frame = camera frame here for simplicity? No --
# use the same T_cam_veh convention as the synthetic world: x right, y down,
# z forward; vehicle x forward. Use identity extrinsic + landmarks in cam
# coords to keep the repro minimal: "forward" = +z.
cfg = LimoConfig()

rng = np.random.default_rng(7)


def run_case(n_lm=45, depth_frac=0.7, yaw_deg=2.1, fwd=1.2, noise=0.3,
             iters=4, ginit=8.0, lm_noise=0.0, label=""):
    # landmarks in the OLD camera frame (old pose = identity)
    z = rng.uniform(6, 60, n_lm)
    x = rng.uniform(-0.5, 0.5, n_lm) * z * (W / F)     # inside FOV
    y = rng.uniform(-0.3, 0.25, n_lm) * z * (H / F)
    lms = np.stack([x, y, z], -1)
    # true new pose: yaw about y (camera frame: y down => yaw) + forward z
    th = np.radians(yaw_deg)
    q_true = np.array([np.cos(th / 2), 0.0, np.sin(th / 2), 0.0])
    R = np.asarray(quat.qto_matrix(jnp.asarray(q_true)))
    # pose = new<-origin (origin = old cam frame): p_new = R p + t with
    # camera moving forward fwd along z: t = -R @ [0,0,fwd]
    t_true = -R @ np.array([0.0, 0.0, fwd])
    pose_true = jnp.asarray(np.concatenate([q_true, t_true]), DT)
    p_new = (lms @ R.T) + t_true
    uv = F * p_new[:, :2] / p_new[:, 2:] + np.array([CX, CY])
    uv += rng.normal(0, noise, uv.shape)
    d = p_new[:, 2] + rng.normal(0, 0.05, n_lm)
    has_d = rng.uniform(size=n_lm) < depth_frac
    obs = np.concatenate([uv, np.where(has_d, d, -1.0)[:, None]], -1)
    # prior: constant velocity = forward only, no yaw
    pose_prior = jnp.asarray([1.0, 0, 0, 0, 0.0, 0.0, -fwd], DT)
    lmp = jnp.asarray(lms + rng.normal(0, lm_noise, lms.shape), DT)
    res = pose_only_step(pose_prior, lmp, jnp.asarray(obs, DT)[:, None, :],
                         jnp.ones((n_lm, 1), bool), jnp.ones((n_lm,), bool),
                         rig, cfg, max_iters=iters, graduated_init=ginit)
    # recovered per-frame motion: displacement |Δp| of camera center
    p_est = -np.asarray(quat.qto_matrix(res.pose[:4])).T @ np.asarray(res.pose[4:])
    ratio = np.linalg.norm(p_est) / fwd
    yaw_err = np.degrees(2 * np.arccos(min(abs(float(
        jnp.dot(res.pose[:4], jnp.asarray(q_true)))), 1.0)))
    print(f"{label:42s} ratio {ratio:6.3f} yaw_err {yaw_err:6.3f} "
          f"n_used {int(res.n_used)}")
    return ratio


print("== iteration budget sweep (turn onset, CV prior) ==")
for iters in (2, 4, 8, 16):
    run_case(iters=iters, label=f"iters={iters} ginit=8")
print("== graduated schedule ==")
for g in (1.0, 4.0, 8.0, 32.0):
    run_case(ginit=g, label=f"iters=4 ginit={g}")
print("== no rotation (cruise) ==")
run_case(yaw_deg=0.4, label="yaw=0.4deg iters=4")
run_case(yaw_deg=0.0, label="yaw=0 iters=4")
print("== landmark noise (window landmarks not exact) ==")
for ln in (0.1, 0.3):
    run_case(lm_noise=ln, label=f"lm_noise={ln} iters=4")
print("== few landmarks (decayed selection) ==")
run_case(n_lm=16, label="n_lm=16 iters=4")
print("== no depth (mono) ==")
run_case(depth_frac=0.0, label="depth_frac=0 iters=4")
