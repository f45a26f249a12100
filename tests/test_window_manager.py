"""BundleAdjuster (window manager) tests — mirrors the reference's
deactivateKeyframes window/fixation invariants test
(keyframe_bundle_adjustment.cpp:744-805), push/triangulation behavior
(:485-607), and updateLabels semantics (bundle_adjuster_keyframes.cpp:388-431)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from limo_tpu.config import CapacityConfig, LimoConfig
from limo_tpu.geometry import pose as pose_ops
from limo_tpu.geometry.camera import CameraRig
from limo_tpu.pipeline.tracklets import Tracklets
from limo_tpu.window_manager import (FIX_NONE, FIX_POSE, FIX_SCALE,
                                     BundleAdjuster,
                                     NotEnoughKeyframesException)

F, CX, CY = 600.0, 300.0, 200.0
DT = jnp.float64
RIG = CameraRig.single(F, CX, CY, dtype=DT)


def project_tracklets(poses, lms, stamps, with_depth=False):
    """Tracklets from GT projections, newest-first stamps."""
    n_kf = len(poses)
    M = lms.shape[0]
    uvd = np.zeros((M, n_kf, 3))
    uvd[..., 2] = -1.0
    mask = np.zeros((M, n_kf), bool)
    order = np.argsort(stamps)[::-1]  # newest first
    for col, i in enumerate(order):
        pc = np.asarray(pose_ops.apply(jnp.asarray(poses[i], DT), jnp.asarray(lms, DT)))
        uv = F * pc[:, :2] / pc[:, 2:3] + np.array([CX, CY])
        uvd[:, col, :2] = uv
        if with_depth:
            uvd[:, col, 2] = pc[:, 2]
        mask[:, col] = pc[:, 2] > 0.1
    return Tracklets(stamps=np.asarray(stamps)[order], uvd=uvd, mask=mask,
                     ids=np.arange(M, dtype=np.int64),
                     age=mask.sum(1).astype(np.int32),
                     is_outlier=np.zeros(M, bool),
                     label=np.full(M, -2, np.int32))


def make_sequence(n_kf=6, n_lm=60, seed=0, with_depth=False):
    rng = np.random.default_rng(seed)
    lms = rng.uniform(-1, 1, (n_lm, 3)) * np.array([10.0, 6.0, 4.0]) + np.array([0, 0, 25.0])
    poses = [np.array([1.0, 0, 0, 0, 0, 0, -1.2 * k]) for k in range(n_kf)]
    stamps = [0.4 * k for k in range(n_kf)]
    return poses, lms, stamps


class TestPush:
    def test_push_and_triangulate(self):
        poses, lms, stamps = make_sequence(3)
        ba = BundleAdjuster(RIG, LimoConfig(), DT)
        for k, (p, s) in enumerate(zip(poses, stamps)):
            tl = project_tracklets(poses[: k + 1], lms, stamps[: k + 1])
            ba.push(s, tl, p, FIX_POSE if k == 0 else FIX_NONE)
        assert ba.num_keyframes == 3
        # triangulated landmark error < 0.1 (reference assertion :531-536)
        est = ba._lm_pos[ba._lm_valid]
        err = np.linalg.norm(est - lms[: est.shape[0]], axis=1)
        assert err.max() < 0.1, err.max()

    def test_push_depth_backprojection(self):
        poses, lms, stamps = make_sequence(1, with_depth=True)
        ba = BundleAdjuster(RIG, LimoConfig(), DT)
        tl = project_tracklets(poses[:1], lms, stamps[:1], with_depth=True)
        ba.push(stamps[0], tl, poses[0], FIX_POSE)
        est = ba._lm_pos[ba._lm_valid]
        err = np.linalg.norm(est - lms[: est.shape[0]], axis=1)
        assert err.max() < 1e-6  # exact depth ⇒ exact backprojection
        assert ba._lm_has_depth[ba._lm_valid].all()

    def test_solve_requires_three(self):
        poses, lms, stamps = make_sequence(2)
        ba = BundleAdjuster(RIG, LimoConfig(), DT)
        for k in range(2):
            tl = project_tracklets(poses[: k + 1], lms, stamps[: k + 1])
            ba.push(stamps[k], tl, poses[k])
        with pytest.raises(NotEnoughKeyframesException):
            ba.solve()


class TestDeactivateKeyframes:
    """Mirror of the reference windowing test (:744-805)."""

    def _build(self, n_kf, max_window=4, min_connecting=3):
        cfg = LimoConfig(window=dataclasses.replace(
            LimoConfig().window,
            max_size_optimization_window=max_window,
            min_num_connecting_landmarks=min_connecting))
        poses, lms, stamps = make_sequence(n_kf)
        ba = BundleAdjuster(RIG, cfg, DT)
        for k in range(n_kf):
            tl = project_tracklets(poses[: k + 1], lms, stamps[: k + 1])
            ba.push(stamps[k], tl, poses[k], FIX_POSE if k == 0 else FIX_NONE)
        return ba

    def test_window_cap(self):
        ba = self._build(6, max_window=4)
        ba.deactivate_keyframes()
        assert ba.num_keyframes <= 4
        # newest keyframes survive
        active_stamps = [ba._stamps[s] for s in ba._kf_order]
        assert max(active_stamps) == 0.4 * 5

    def test_fixation_assignment(self):
        ba = self._build(6, max_window=4)
        ba.deactivate_keyframes()
        # oldest active → Pose, 2nd-oldest → Scale (reference :962-986)
        assert ba._fixation[ba._kf_order[0]] == FIX_POSE
        assert ba._fixation[ba._kf_order[1]] == FIX_SCALE
        for s in ba._kf_order[2:]:
            assert ba._fixation[s] == FIX_NONE

    def test_evicted_archived(self):
        ba = self._build(6, max_window=3)
        ba.deactivate_keyframes()
        # evicted keyframes' poses archived for trajectory export
        assert len(ba._archive) >= 2

    def test_landmarks_pruned_to_window(self):
        ba = self._build(6, max_window=3)
        # add a landmark observed only by evicted keyframes
        slot = ba._alloc_lm_slot(99999)
        ba._obs_mask[slot, ba._kf_order[0], 0] = True
        ba.deactivate_keyframes()
        assert not ba._lm_valid[slot]


class TestUpdateLabels:
    def test_label_semantics(self):
        poses, lms, stamps = make_sequence(1)
        ba = BundleAdjuster(RIG, LimoConfig(), DT)
        tl = project_tracklets(poses[:1], lms, stamps[:1])
        ba.push(stamps[0], tl, poses[0], FIX_POSE)
        lab = tl.label.copy()
        lab[0] = 26   # car → outlier
        lab[1] = 21   # vegetation → shrubbery
        lab[2] = 7    # road → groundplane
        tl2 = Tracklets(stamps=tl.stamps, uvd=tl.uvd, mask=tl.mask, ids=tl.ids,
                        age=tl.age, is_outlier=tl.is_outlier, label=lab)
        ba.update_labels(tl2, shrubbery_weight=0.9)
        s0 = ba._lm_slot[0]
        s1 = ba._lm_slot[1]
        s2 = ba._lm_slot[2]
        assert ba._lm_outlier[s0]
        assert ba._lm_weight[s1] == pytest.approx(0.9)
        assert ba._lm_is_gp[s2]

    def test_outlier_flag(self):
        poses, lms, stamps = make_sequence(1)
        ba = BundleAdjuster(RIG, LimoConfig(), DT)
        tl = project_tracklets(poses[:1], lms, stamps[:1])
        ba.push(stamps[0], tl, poses[0], FIX_POSE)
        flags = tl.is_outlier.copy()
        flags[5] = True
        tl2 = Tracklets(stamps=tl.stamps, uvd=tl.uvd, mask=tl.mask, ids=tl.ids,
                        age=tl.age, is_outlier=flags, label=tl.label)
        ba.update_labels(tl2)
        assert ba._lm_outlier[ba._lm_slot[5]]


class TestSolveIntegration:
    def test_solve_reduces_perturbed_cost(self, rng):
        poses, lms, stamps = make_sequence(4, with_depth=True)
        ba = BundleAdjuster(RIG, LimoConfig(), DT)
        for k in range(4):
            tl = project_tracklets(poses[: k + 1], lms, stamps[: k + 1],
                                   with_depth=True)
            p = np.asarray(poses[k], float).copy()
            if k >= 2:
                p[4:] += rng.normal(0, 0.1, 3)
            ba.push(stamps[k], tl, p, FIX_POSE if k == 0 else FIX_NONE)
        ba.deactivate_keyframes()
        info = ba.solve()
        assert float(info.final_cost) <= float(info.initial_cost)
        # poses recovered near GT
        for k, s in enumerate(ba._kf_order):
            err = np.linalg.norm(ba._poses[s][4:] - poses[k][4:])
            assert err < 0.05, (k, err)
