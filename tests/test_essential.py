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


def synth_planar_pair(rng, R_gt, t_gt, n=200, noise=0.0):
    """ALL points on one plane (the ground, y = +1.5 in camera coords,
    y-down) — the dominant-groundplane KITTI configuration where the 8-point
    DLT is rank-degenerate (coplanar points span only a 2-parameter E
    family) but the 5-point minimal problem stays well-posed."""
    pts = rng.uniform(-1, 1, (n, 3)) * np.array([8.0, 0.0, 6.0]) \
        + np.array([0, 1.5, 15.0])
    x0 = pts
    x1 = pts @ np.asarray(R_gt).T + np.asarray(t_gt)
    uv0 = F * x0[:, :2] / x0[:, 2:] + np.array([CX, CY])
    uv1 = F * x1[:, :2] / x1[:, 2:] + np.array([CX, CY])
    if noise > 0:
        uv0 = uv0 + rng.normal(0, noise, uv0.shape)
        uv1 = uv1 + rng.normal(0, noise, uv1.shape)
    return jnp.asarray(uv0, DT), jnp.asarray(uv1, DT)


class TestFivePointPlanar:
    def test_planar_scene_five_point_stays_accurate(self, rng):
        """On a purely coplanar scene the 5-point prior must still recover
        the motion (VERDICT r1 item 3 done-criterion)."""
        t_gt = np.array([0.05, 0.0, -1.0]); t_gt /= np.linalg.norm(t_gt)
        qz = quat.qfrom_axis_angle(jnp.array([0.0, 1.0, 0.0], DT),
                                   jnp.asarray(0.03, DT))
        R_gt = np.asarray(quat.qto_matrix(qz))
        uv0, uv1 = synth_planar_pair(rng, R_gt, t_gt, noise=0.2)
        res5 = estimate_essential(uv0, uv1, jnp.ones(uv0.shape[0], bool),
                                  jnp.asarray(F, DT),
                                  jnp.asarray([CX, CY], DT), method="5point")
        assert bool(res5.ok)
        err5_t = angle_between(np.asarray(res5.t), t_gt)
        err5_q = float(quat.qangle(res5.q, qz))
        assert err5_t < 0.05, err5_t
        assert err5_q < 0.01, err5_q

    def test_planar_scene_beats_eight_point(self, rng):
        """Same scene through the 8-point path: the degenerate DLT must do
        measurably worse than the minimal solver (parity evidence that the
        5-point is the one carrying planar scenes)."""
        t_gt = np.array([0.05, 0.0, -1.0]); t_gt /= np.linalg.norm(t_gt)
        uv0, uv1 = synth_planar_pair(rng, np.eye(3), t_gt, noise=0.2)
        mask = jnp.ones(uv0.shape[0], bool)
        fpp = (jnp.asarray(F, DT), jnp.asarray([CX, CY], DT))
        res5 = estimate_essential(uv0, uv1, mask, *fpp, method="5point")
        res8 = estimate_essential(uv0, uv1, mask, *fpp, method="8point")
        err5 = angle_between(np.asarray(res5.t), t_gt)
        err8 = angle_between(np.asarray(res8.t), t_gt)
        assert err5 < 0.05, err5
        assert err5 < err8, (err5, err8)

    def test_general_scene_parity_with_eight_point(self, rng):
        """On a general (non-planar) scene both solvers must agree with the
        ground truth — the 5-point default is not a regression."""
        t_gt = np.array([0.2, 0.1, -1.0]); t_gt /= np.linalg.norm(t_gt)
        qz = quat.qfrom_axis_angle(jnp.array([0.0, 1.0, 0.0], DT),
                                   jnp.asarray(0.04, DT))
        R_gt = np.asarray(quat.qto_matrix(qz))
        uv0, uv1 = synth_pair(rng, R_gt, t_gt, noise=0.3)
        mask = jnp.ones(uv0.shape[0], bool)
        fpp = (jnp.asarray(F, DT), jnp.asarray([CX, CY], DT))
        for method in ("5point", "8point"):
            res = estimate_essential(uv0, uv1, mask, *fpp, method=method)
            assert bool(res.ok), method
            assert angle_between(np.asarray(res.t), t_gt) < 0.05, method
            assert float(quat.qangle(res.q, qz)) < 0.01, method
