"""Residual kernel tests mirroring the reference's hand-computed functor tests
(keyframe_bundle_adjustment.cpp: CostFunctor :118-175, groundplane +
translation-difference functors :1346-1394) and robust_optimization trimmer
tests (robust_optimization.cpp:89-133)."""

import jax
import jax.numpy as jnp
import numpy as np

from limo_tpu import residuals, robust
from limo_tpu.geometry import pose as pose_ops
from limo_tpu.geometry import quaternion as quat


F, CX, CY = 600.0, 300.0, 200.0


def identity_pose():
    return pose_ops.identity(jnp.float64)


class TestReprojection:
    def test_zero_at_ground_truth(self):
        lm = jnp.array([1.0, 1.0, 10.0])
        # observed = exact projection with identity pose and extrinsics
        uv = jnp.array([F * 0.1 + CX, F * 0.1 + CY])
        res, valid = residuals.reprojection(identity_pose(), lm, uv,
                                            jnp.asarray(F), jnp.array([CX, CY]),
                                            identity_pose())
        assert bool(valid)
        np.testing.assert_allclose(res, 0.0, atol=1e-10)

    def test_pixel_offset(self):
        lm = jnp.array([0.0, 0.0, 5.0])
        uv = jnp.array([CX + 2.0, CY - 3.0])
        res, valid = residuals.reprojection(identity_pose(), lm, uv,
                                            jnp.asarray(F), jnp.array([CX, CY]),
                                            identity_pose())
        np.testing.assert_allclose(res, [-2.0, 3.0], atol=1e-10)

    def test_behind_camera_invalid(self):
        lm = jnp.array([0.0, 0.0, 0.001])
        uv = jnp.array([CX, CY])
        res, valid = residuals.reprojection(identity_pose(), lm, uv,
                                            jnp.asarray(F), jnp.array([CX, CY]),
                                            identity_pose())
        assert not bool(valid)
        assert np.all(np.isfinite(np.asarray(res)))

    def test_with_pose_transform(self, rng):
        # project through a nontrivial pose and check residual is zero when
        # observation is generated with the same transform chain
        q = quat.qexp(jnp.asarray(rng.normal(size=3) * 0.1))
        pose_kf = pose_ops.make(q, jnp.asarray(rng.normal(size=3)))
        T_cam_veh = pose_ops.make(quat.qexp(jnp.asarray(rng.normal(size=3) * 0.05)),
                                  jnp.asarray([0.1, -0.2, 0.3]))
        lm = jnp.array([2.0, -1.0, 25.0])
        p_cam = pose_ops.apply(T_cam_veh, pose_ops.apply(pose_kf, lm))
        uv = F * p_cam[:2] / p_cam[2] + jnp.array([CX, CY])
        res, valid = residuals.reprojection(pose_kf, lm, uv, jnp.asarray(F),
                                            jnp.array([CX, CY]), T_cam_veh)
        assert bool(valid)
        np.testing.assert_allclose(res, 0.0, atol=1e-9)

    def test_rotation_compensation(self):
        # pure translation pose: rotation-only reprojection = identity projection.
        # observed offset from center so the rot-only error is nonzero; the
        # compensated residual is plain/(rot-only error norm).
        pose_kf = pose_ops.make(quat.qidentity(jnp.float64), jnp.array([1.0, 0.0, 0.0]))
        lm = jnp.array([0.0, 0.0, 10.0])
        uv = jnp.array([CX - 10.0, CY])
        res_plain, _ = residuals.reprojection(pose_kf, lm, uv, jnp.asarray(F),
                                              jnp.array([CX, CY]), identity_pose())
        res_comp, valid = residuals.reprojection(pose_kf, lm, uv, jnp.asarray(F),
                                                 jnp.array([CX, CY]), identity_pose(),
                                                 compensate_rotation=True)
        assert bool(valid)
        # rot-only prediction is the center, so rot-only error norm is 10
        np.testing.assert_allclose(res_comp, np.asarray(res_plain) / 10.0, atol=1e-9)

    def test_rotation_compensation_guard(self):
        # rot-only error below sqrt(0.01) px ⇒ invalid (reference :144)
        pose_kf = pose_ops.make(quat.qidentity(jnp.float64), jnp.array([1.0, 0.0, 0.0]))
        lm = jnp.array([0.0, 0.0, 10.0])
        uv = jnp.array([CX, CY])  # rot-only error exactly zero
        _, valid = residuals.reprojection(pose_kf, lm, uv, jnp.asarray(F),
                                          jnp.array([CX, CY]), identity_pose(),
                                          compensate_rotation=True)
        assert not bool(valid)

    def test_rotrocc_curve_scale_hand_computed(self):
        """VERDICT r4 item 7: pin the RotRocc divisor against an INDEPENDENT
        hand computation at curve-scale rotation (2°/frame yaw — the km
        drive's sharp-turn magnitude) with a non-trivial camera extrinsic.
        The reference semantics being certified
        (cost_functors_ceres.hpp:130-148): the rotation-only transform is
        ``T_cam_veh ∘ Quaternion(pose.rotation())`` — the keyframe pose with
        its TRANSLATION ZEROED (not the pose inverse, not a relative pose),
        the divisor is the norm of (rot-only prediction − observation), and
        both the true and rot-only projections must pass the |z| ≥ 0.01
        guard. The hand computation below builds rotation matrices from the
        quaternion components directly — no limo_tpu pose ops."""

        def qmat(q):  # wxyz quaternion → rotation matrix, textbook formula
            w, x, y, z = q
            return np.array([
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])

        # keyframe←origin pose: 2° yaw (about vehicle z) + forward motion
        th = np.radians(2.0)
        q_kf = np.array([np.cos(th / 2), 0.0, 0.0, np.sin(th / 2)])
        t_kf = np.array([0.04, -1.2, 0.02])
        # camera←vehicle: axes permutation-ish small rotation + offset
        phi = np.radians(1.0)
        q_cv = np.array([np.cos(phi / 2), np.sin(phi / 2), 0.0, 0.0])
        t_cv = np.array([0.1, -0.25, 0.3])
        lm = np.array([3.0, -1.5, 22.0])          # landmark in origin frame
        obs = np.array([CX + 40.0, CY - 25.0])    # off-prediction observation

        R_kf, R_cv = qmat(q_kf), qmat(q_cv)
        # full chain: p_cam = R_cv (R_kf p + t_kf) + t_cv
        p_cam = R_cv @ (R_kf @ lm + t_kf) + t_cv
        pred = F * p_cam[:2] / p_cam[2] + np.array([CX, CY])
        # rot-only chain: translation of the KEYFRAME pose zeroed
        p_rot = R_cv @ (R_kf @ lm) + t_cv
        pred_rot = F * p_rot[:2] / p_rot[2] + np.array([CX, CY])
        denom = np.linalg.norm(pred_rot - obs)
        expected = (pred - obs) / denom
        assert p_cam[2] > 0.01 and p_rot[2] > 0.01 and denom > 0.1

        pose_kf = jnp.asarray(np.concatenate([q_kf, t_kf]))
        T_cv = jnp.asarray(np.concatenate([q_cv, t_cv]))
        res, valid = residuals.reprojection(
            pose_kf, jnp.asarray(lm), jnp.asarray(obs), jnp.asarray(F),
            jnp.array([CX, CY]), T_cv, compensate_rotation=True)
        assert bool(valid)
        np.testing.assert_allclose(np.asarray(res), expected, rtol=1e-12)
        # sanity of the magnitude: at 2° yaw the divisor is dominated by the
        # rotation-induced image motion (tens of px at f=600), so the
        # compensated residual is O(residual/flow) — dimensionless-ish
        assert 0.0 < np.abs(expected).max() < 10.0

    def test_jacobian_finite(self, rng):
        pose_kf = pose_ops.make(quat.qexp(jnp.asarray(rng.normal(size=3) * 0.1)),
                                jnp.asarray(rng.normal(size=3)))
        lm = jnp.array([2.0, -1.0, 25.0])
        uv = jnp.array([CX + 5, CY - 5])

        def r(delta, dlm):
            res, _ = residuals.reprojection(pose_ops.boxplus(pose_kf, delta), lm + dlm,
                                            uv, jnp.asarray(F), jnp.array([CX, CY]),
                                            identity_pose())
            return res

        Jp = jax.jacfwd(r, argnums=0)(jnp.zeros(6), jnp.zeros(3))
        Jl = jax.jacfwd(r, argnums=1)(jnp.zeros(6), jnp.zeros(3))
        assert Jp.shape == (2, 6) and Jl.shape == (2, 3)
        assert np.all(np.isfinite(Jp)) and np.all(np.isfinite(Jl))
        assert np.linalg.norm(Jp) > 0 and np.linalg.norm(Jl) > 0


class TestDepth:
    def test_exact(self):
        lm = jnp.array([1.0, 2.0, 7.5])
        res, valid = residuals.landmark_depth(identity_pose(), lm, 7.5, identity_pose())
        np.testing.assert_allclose(res, 0.0, atol=1e-12)
        res, _ = residuals.landmark_depth(identity_pose(), lm, 5.0, identity_pose())
        np.testing.assert_allclose(res, [2.5], atol=1e-12)


class TestRegularizers:
    def test_pose_scale(self):
        p0 = identity_pose()
        p1 = pose_ops.make(quat.qidentity(jnp.float64), jnp.array([3.0, 4.0, 0.0]))
        res, _ = residuals.pose_scale(p1, p0, 5.0)
        np.testing.assert_allclose(res, 0.0, atol=1e-12)
        res, _ = residuals.pose_scale(p1, p0, 4.0)
        np.testing.assert_allclose(res, [1.0], atol=1e-12)

    def test_speed(self):
        t = lambda v: pose_ops.make(quat.qidentity(jnp.float64), jnp.asarray(v))
        p2, p1, p0 = t([0.0, 0, 0]), t([2.0, 0, 0]), t([4.0, 0, 0])
        res, _ = residuals.speed(p0, p1, p2, 1.0, 1.0)
        np.testing.assert_allclose(res, 0.0, atol=1e-12)
        res, _ = residuals.speed(p0, p1, p2, 1.0, 2.0)  # v_cur=2, v_before=1
        np.testing.assert_allclose(res, [1.0], atol=1e-12)

    def test_speed_vector(self):
        prev = pose_ops.make(quat.qidentity(jnp.float64), jnp.array([1.0, 0.0, 0.0]))
        cur = pose_ops.make(quat.qidentity(jnp.float64), jnp.array([3.0, 0.0, 0.0]))
        vel_before = jnp.array([2.0, 0.0, 0.0])
        res, _ = residuals.speed_vector(cur, pose_ops.inverse(prev), vel_before, 1.0)
        np.testing.assert_allclose(res, 0.0, atol=1e-12)

    def test_groundplane_height(self):
        # Mirrors reference hand-computed gp functor test (:1346-1360):
        # landmark at origin height -1.7, plane normal (0,0,1), dist 1.7 → res 0
        plane_dir = jnp.array([0.0, 0.0, 1.0])
        lm = jnp.array([5.0, 2.0, -1.7])
        res, _ = residuals.groundplane_height(identity_pose(), plane_dir, 1.7, lm)
        np.testing.assert_allclose(res, 0.0, atol=1e-12)
        res, _ = residuals.groundplane_height(identity_pose(), plane_dir, 1.5, lm)
        np.testing.assert_allclose(res, [-0.2], atol=1e-12)

    def test_translation_difference(self):
        t = lambda v: pose_ops.make(quat.qidentity(jnp.float64), jnp.asarray(v))
        p0, p1, p2 = t([0.0, 0, 0]), t([1.0, 0, 0]), t([2.0, 0, 0])
        res, _ = residuals.translation_difference(p0, p1, p2)
        np.testing.assert_allclose(res, 0.0, atol=1e-12)
        p2b = t([2.5, 0, 0])
        res, _ = residuals.translation_difference(p0, p1, p2b)
        np.testing.assert_allclose(res, [0.5, 0.0, 0.0], atol=1e-12)

    def test_groundplane_motion(self):
        p1 = identity_pose()
        p0 = pose_ops.make(quat.qidentity(jnp.float64), jnp.array([10.0, 0.0, 0.0]))
        n = jnp.array([0.0, 0.0, 1.0])
        res, _ = residuals.groundplane_motion(p0, p1, n)
        np.testing.assert_allclose(res, 0.0, atol=1e-12)  # motion in plane
        n2 = jnp.array([1.0, 0.0, 0.0])
        res, _ = residuals.groundplane_motion(p0, p1, n2)
        np.testing.assert_allclose(res, [1.0], atol=1e-12)

    def test_vector_and_distance(self):
        res, _ = residuals.vector_difference(jnp.array([1.0, 2, 3]), jnp.array([1.0, 1, 1]))
        np.testing.assert_allclose(res, [0.0, 1.0, 2.0], atol=1e-12)
        res, _ = residuals.groundplane_distance(jnp.asarray(2.0), jnp.asarray(1.5))
        np.testing.assert_allclose(res, [0.5], atol=1e-12)


class TestRobust:
    def test_cauchy_weight(self):
        # rho'(0) = 1, decreasing
        w0 = robust.cauchy_weight(jnp.asarray(0.0), 1.6)
        np.testing.assert_allclose(w0, 1.0)
        w = robust.cauchy_weight(jnp.asarray(1.6 ** 2), 1.6)
        np.testing.assert_allclose(w, 0.5)

    def test_huber_weight(self):
        np.testing.assert_allclose(robust.huber_weight(jnp.asarray(0.01), 1.0), 1.0)
        np.testing.assert_allclose(robust.huber_weight(jnp.asarray(4.0), 1.0), 0.5)

    def test_trim_fixed(self):
        # robust_optimization.cpp:89-110: fixed threshold, exact outlier count
        scores = jnp.array([0.1, 0.5, 2.0, 0.3, 5.0, 0.2])
        valid = jnp.ones(6, bool)
        out = robust.trim_fixed(scores, valid, 1.0)
        assert out.tolist() == [False, False, True, False, True, False]

    def test_trim_quantile(self):
        # robust_optimization.cpp:111-133: q=0.9 ⇒ top 10% rejected
        scores = jnp.asarray(np.arange(100, dtype=np.float64))
        valid = jnp.ones(100, bool)
        out = robust.trim_quantile(scores, valid, 0.9)
        assert int(out.sum()) == 9  # strictly above pivot at index 90
        assert bool(out[-1]) and not bool(out[89])

    def test_trim_quantile_respects_mask(self):
        scores = jnp.concatenate([jnp.asarray(np.arange(50, dtype=np.float64)),
                                  jnp.full(50, 1e9)])
        valid = jnp.concatenate([jnp.ones(50, bool), jnp.zeros(50, bool)])
        out = robust.trim_quantile(scores, valid, 0.9)
        assert not bool(out[50:].any())
        assert int(out.sum()) <= 5

    def test_min_groups_guard(self):
        scores = jnp.array([0.1, 10.0, 0.2])
        valid = jnp.ones(3, bool)
        out = robust.residuals_to_remove(scores, valid, "quantile", 0.5, min_groups=30)
        assert not bool(out.any())
