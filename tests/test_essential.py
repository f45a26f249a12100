"""Motion-prior tests: batched essential-matrix RANSAC must recover known
two-view motion (the reference relies on OpenCV findEssentialMat/recoverPose,
general_helpers.hpp:103-140 — we verify the same contract)."""

import jax.numpy as jnp
import numpy as np

from limo_tpu.frontend.essential import (EssentialResult, estimate_essential,
                                         motion_prior_unscaled)
from limo_tpu.geometry import pose as pose_ops
from limo_tpu.geometry import quaternion as quat

F, CX, CY = 600.0, 300.0, 200.0
DT = jnp.float64


def synth_pair(rng, R_gt, t_gt, n=200, noise=0.0, outliers=0):
    pts = rng.uniform(-1, 1, (n, 3)) * np.array([8.0, 5.0, 6.0]) + np.array([0, 0, 15.0])
    x0 = pts
    x1 = pts @ np.asarray(R_gt).T + np.asarray(t_gt)
    uv0 = F * x0[:, :2] / x0[:, 2:] + np.array([CX, CY])
    uv1 = F * x1[:, :2] / x1[:, 2:] + np.array([CX, CY])
    if noise > 0:
        uv0 = uv0 + rng.normal(0, noise, uv0.shape)
        uv1 = uv1 + rng.normal(0, noise, uv1.shape)
    if outliers > 0:
        uv1[:outliers] += rng.uniform(20, 80, (outliers, 2))
    return jnp.asarray(uv0, DT), jnp.asarray(uv1, DT)


def angle_between(v1, v2):
    c = np.dot(v1, v2) / (np.linalg.norm(v1) * np.linalg.norm(v2))
    return np.arccos(np.clip(c, -1, 1))


class TestEssential:
    def test_pure_translation(self, rng):
        t_gt = np.array([0.0, 0.0, -1.0])  # camera moves +z → points shift -z
        uv0, uv1 = synth_pair(rng, np.eye(3), t_gt)
        res = estimate_essential(uv0, uv1, jnp.ones(uv0.shape[0], bool),
                                 jnp.asarray(F, DT), jnp.asarray([CX, CY], DT))
        assert bool(res.ok)
        t = np.asarray(res.t)
        assert angle_between(t, t_gt) < 0.02, t
        angle = float(quat.qangle(res.q, quat.qidentity(DT)))
        assert angle < 0.01

    def test_rotation_translation(self, rng):
        qz = quat.qfrom_axis_angle(jnp.array([0.0, 1.0, 0.0], DT), jnp.asarray(0.05, DT))
        R_gt = np.asarray(quat.qto_matrix(qz))
        t_gt = np.array([0.2, 0.0, -1.0])
        t_gt /= np.linalg.norm(t_gt)
        uv0, uv1 = synth_pair(rng, R_gt, t_gt, noise=0.3)
        res = estimate_essential(uv0, uv1, jnp.ones(uv0.shape[0], bool),
                                 jnp.asarray(F, DT), jnp.asarray([CX, CY], DT))
        assert bool(res.ok)
        assert angle_between(np.asarray(res.t), t_gt) < 0.05
        dq = float(quat.qangle(res.q, qz))
        assert dq < 0.01

    def test_outlier_robustness(self, rng):
        t_gt = np.array([0.1, 0.05, -1.0]); t_gt /= np.linalg.norm(t_gt)
        uv0, uv1 = synth_pair(rng, np.eye(3), t_gt, noise=0.3, outliers=60)
        res = estimate_essential(uv0, uv1, jnp.ones(uv0.shape[0], bool),
                                 jnp.asarray(F, DT), jnp.asarray([CX, CY], DT))
        assert bool(res.ok)
        assert angle_between(np.asarray(res.t), t_gt) < 0.08
        # most corrupted matches flagged as outliers
        assert int(res.inliers[:60].sum()) < 15

    def test_standstill_gate(self, rng):
        uv0, _ = synth_pair(rng, np.eye(3), np.zeros(3))
        uv1 = uv0 + 0.5  # sub-threshold flow
        res = estimate_essential(uv0, uv1, jnp.ones(uv0.shape[0], bool),
                                 jnp.asarray(F, DT), jnp.asarray([CX, CY], DT))
        assert not bool(res.ok)
        np.testing.assert_allclose(res.q, [1, 0, 0, 0], atol=1e-12)
        np.testing.assert_allclose(res.t, 0.0, atol=1e-12)

    def test_motion_prior_scaling(self, rng):
        res = EssentialResult(q=quat.qidentity(DT), t=jnp.array([0.0, 0.0, -1.0], DT),
                              inliers=jnp.ones(10, bool),
                              n_inliers=jnp.asarray(10), ok=jnp.asarray(True))
        delta = motion_prior_unscaled(res, pose_ops.identity(DT), speed=13.0, dt=0.1)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(delta)[4:]), 1.3, atol=1e-9)
