"""Geometry kernel tests, mirroring the reference unit tests
(keyframe_bundle_adjustment.cpp: Triangulator tests :51-117, CostFunctor
round-trips :118-175) plus quaternion/pose algebra invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from limo_tpu.geometry import quaternion as quat
from limo_tpu.geometry import pose as pose_ops
from limo_tpu.geometry import camera as cam_ops
from limo_tpu.geometry import triangulation
from limo_tpu.geometry.camera import CameraRig


def rand_quat(rng, n=()):
    q = rng.normal(size=n + (4,))
    return jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True))


def rand_pose(rng, n=()):
    return jnp.concatenate([rand_quat(rng, n), jnp.asarray(rng.normal(size=n + (3,)))], -1)


class TestQuaternion:
    def test_mul_identity(self, rng):
        q = rand_quat(rng, (5,))
        qi = jnp.broadcast_to(quat.qidentity(q.dtype), q.shape)
        np.testing.assert_allclose(quat.qmul(q, qi), q, atol=1e-12)
        np.testing.assert_allclose(quat.qmul(qi, q), q, atol=1e-12)

    def test_inverse(self, rng):
        q = rand_quat(rng, (5,))
        qq = quat.qmul(q, quat.qinv(q))
        np.testing.assert_allclose(qq[..., 0], 1.0, atol=1e-10)
        np.testing.assert_allclose(qq[..., 1:], 0.0, atol=1e-10)

    def test_rotation_matches_matrix(self, rng):
        q = rand_quat(rng, (7,))
        v = jnp.asarray(rng.normal(size=(7, 3)))
        R = quat.qto_matrix(q)
        np.testing.assert_allclose(quat.qrot(q, v), jnp.einsum("nij,nj->ni", R, v), atol=1e-10)

    def test_matrix_roundtrip(self, rng):
        q = rand_quat(rng, (20,))
        q2 = quat.qfrom_matrix(quat.qto_matrix(q))
        # sign-ambiguous
        dot = jnp.abs(jnp.sum(q * q2, axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-9)

    def test_exp_log_roundtrip(self, rng):
        w = jnp.asarray(rng.normal(size=(10, 3)) * 0.5)
        np.testing.assert_allclose(quat.qlog(quat.qexp(w)), w, atol=1e-9)

    def test_exp_half_angle_convention(self):
        # tangent of norm a rotates by 2a (Ceres QuaternionParameterization)
        a = 0.3
        q = quat.qexp(jnp.array([0.0, 0.0, a]))
        angle = quat.qangle(q, quat.qidentity(q.dtype))
        np.testing.assert_allclose(angle, 2 * a, atol=1e-9)

    def test_boxplus_zero(self, rng):
        q = rand_quat(rng, (4,))
        q2 = quat.qboxplus(q, jnp.zeros((4, 3)))
        np.testing.assert_allclose(q2, q, atol=1e-12)

    def test_boxplus_jacobian_nonzero(self, rng):
        # grads at delta=0 must be exact, not zero (series guard)
        q = rand_quat(rng)
        J = jax.jacfwd(lambda d: quat.qboxplus(q, d))(jnp.zeros(3))
        assert np.all(np.isfinite(J))
        assert np.linalg.norm(J) > 0.5


class TestPose:
    def test_compose_apply(self, rng):
        p1, p2 = rand_pose(rng, (3,)), rand_pose(rng, (3,))
        x = jnp.asarray(rng.normal(size=(3, 3)))
        lhs = pose_ops.apply(pose_ops.compose(p1, p2), x)
        rhs = pose_ops.apply(p1, pose_ops.apply(p2, x))
        np.testing.assert_allclose(lhs, rhs, atol=1e-10)

    def test_inverse(self, rng):
        p = rand_pose(rng, (3,))
        x = jnp.asarray(rng.normal(size=(3, 3)))
        np.testing.assert_allclose(
            pose_ops.apply(pose_ops.inverse(p), pose_ops.apply(p, x)), x, atol=1e-10)

    def test_matrix_roundtrip(self, rng):
        p = rand_pose(rng, (6,))
        m = pose_ops.to_matrix(p)
        p2 = pose_ops.from_matrix(m)
        x = jnp.asarray(rng.normal(size=(6, 3)))
        np.testing.assert_allclose(pose_ops.apply(p, x), pose_ops.apply(p2, x), atol=1e-9)

    def test_boxplus_translation_additive(self, rng):
        p = rand_pose(rng)
        d = jnp.array([0.0, 0.0, 0.0, 1.0, -2.0, 3.0])
        p2 = pose_ops.boxplus(p, d)
        np.testing.assert_allclose(pose_ops.translation(p2),
                                   pose_ops.translation(p) + d[3:], atol=1e-12)
        np.testing.assert_allclose(pose_ops.rotation(p2), pose_ops.rotation(p), atol=1e-12)


class TestCamera:
    def test_project_backproject(self, rng):
        f = jnp.array([600.0])
        pp = jnp.array([[300.0, 200.0]])
        pts = jnp.asarray(rng.uniform(0.5, 30.0, size=(10, 3)))
        uv, valid = cam_ops.project(pts, f[0], pp[0])
        assert bool(jnp.all(valid))
        pts2 = cam_ops.backproject(uv, pts[:, 2], f[0], pp[0])
        np.testing.assert_allclose(pts2, pts, rtol=1e-9)

    def test_z_guard(self):
        uv, valid = cam_ops.project(jnp.array([1.0, 1.0, 0.001]), jnp.asarray(600.0),
                                    jnp.array([300.0, 200.0]))
        assert not bool(valid)
        assert np.all(np.isfinite(np.asarray(uv)))

    def test_viewing_ray(self, rng):
        f, pp = jnp.asarray(600.0), jnp.array([300.0, 200.0])
        pt = jnp.array([2.0, -1.0, 8.0])
        uv, _ = cam_ops.project(pt, f, pp)
        ray = cam_ops.viewing_ray(uv, f, pp)
        np.testing.assert_allclose(ray, pt / np.linalg.norm(pt), atol=1e-9)


class TestTriangulation:
    def test_two_rays_exact(self):
        # Mirror of reference Triangulator.process (test :51-75)
        p = jnp.array([1.0, 1.0, 3.0])
        c0 = jnp.zeros(3)
        c1 = jnp.array([1.0, -1.0, 0.0])
        r0 = p / jnp.linalg.norm(p)
        d1 = p - c1
        r1 = d1 / jnp.linalg.norm(d1)
        pt, ok = triangulation.triangulate_rays(jnp.stack([r0, r1]), jnp.stack([c0, c1]))
        assert bool(ok)
        np.testing.assert_allclose(pt, p, atol=1e-5)

    def test_two_rays_offset_poses(self):
        # Mirror of reference Triangulator.process2 (test :76-117)
        p_gt = jnp.array([0.5, -1.0, 3.0])
        t0 = jnp.array([1.0, -0.1, 0.5])
        t1 = t0 + jnp.array([0.5, -0.05, 0.25])
        r0 = (p_gt - t0) / jnp.linalg.norm(p_gt - t0)
        r1 = (p_gt - t1) / jnp.linalg.norm(p_gt - t1)
        pt, ok = triangulation.triangulate_rays(jnp.stack([r0, r1]), jnp.stack([t0, t1]))
        assert bool(ok)
        np.testing.assert_allclose(pt, p_gt, atol=1e-5)

    def test_batch_and_mask(self, rng):
        L, N = 50, 6
        pts_gt = jnp.asarray(rng.uniform(-10, 10, size=(L, 3)) + np.array([0, 0, 20]))
        centers = jnp.asarray(rng.uniform(-5, 5, size=(N, 3)))
        rays = pts_gt[:, None, :] - centers[None, :, :]
        rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
        mask = jnp.asarray(rng.uniform(size=(L, N)) > 0.3)
        mask = mask.at[:, :2].set(True)  # ensure >= 2 obs
        pts, ok = triangulation.triangulate_batch(
            rays, jnp.broadcast_to(centers, (L, N, 3)), mask)
        assert bool(jnp.all(ok))
        np.testing.assert_allclose(pts, pts_gt, atol=1e-6)

    def test_parallel_rays_invalid(self):
        r = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        c = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
        pt, ok = triangulation.triangulate_rays(r, c)
        assert not bool(ok)
        assert np.all(np.isfinite(np.asarray(pt)))


class TestCameraRig:
    def test_single(self):
        rig = CameraRig.single(600.0, 300.0, 200.0)
        assert rig.num_cameras == 1
        assert rig.T_cam_veh.shape == (1, 7)


class TestCircularMotion:
    """Mirror of the CircularMotion2d ⊞ test
    (keyframe_bundle_adjustment.cpp:1396-1425)."""

    def test_straight_line(self):
        p = pose_ops.identity(jnp.float64)
        out = pose_ops.boxplus_circular_2d(p, jnp.array([0.0, 2.0]))
        np.testing.assert_allclose(pose_ops.translation(out), [2.0, 0.0, 0.0],
                                   atol=1e-12)
        np.testing.assert_allclose(pose_ops.rotation(out), [1, 0, 0, 0], atol=1e-12)

    def test_quarter_circle(self):
        # yaw = pi/2, arc = pi/2 * r with r=2 → chord endpoint (2, 2)
        p = pose_ops.identity(jnp.float64)
        yaw = np.pi / 2
        arc = yaw * 2.0
        out = pose_ops.boxplus_circular_2d(p, jnp.array([yaw, arc]))
        np.testing.assert_allclose(pose_ops.translation(out), [2.0, 2.0, 0.0],
                                   atol=1e-9)
        angle = quat.qangle(pose_ops.rotation(out),
                            quat.qfrom_axis_angle(jnp.array([0.0, 0, 1.0]),
                                                  jnp.asarray(yaw)))
        assert float(angle) < 1e-9

    def test_left_composition(self, rng):
        # p' = delta ∘ p — applying to a point matches manual composition
        q = rand_quat(rng)
        p = jnp.concatenate([q, jnp.asarray(rng.normal(size=3))])
        d = jnp.array([0.3, 1.5])
        out = pose_ops.boxplus_circular_2d(p, d)
        x = jnp.asarray(rng.normal(size=3))
        delta_pose = pose_ops.boxplus_circular_2d(pose_ops.identity(jnp.float64), d)
        np.testing.assert_allclose(
            pose_ops.apply(out, x),
            pose_ops.apply(delta_pose, pose_ops.apply(p, x)), atol=1e-9)


class TestFixScaleCircular:
    """FixScaleCircularMotionPlus ⊞ (local_parameterizations.hpp:229-272):
    fixed-arc-length step in camera coords (z forward), yaw = bend around y."""

    def test_straight_ahead(self):
        p = pose_ops.identity(jnp.float64)
        out = pose_ops.boxplus_fix_scale_circular(
            p, jnp.zeros(3, jnp.float64), fix_value=2.5)
        np.testing.assert_allclose(pose_ops.translation(out), [0.0, 0.0, 2.5],
                                   atol=1e-12)
        np.testing.assert_allclose(pose_ops.rotation(out), [1, 0, 0, 0],
                                   atol=1e-12)

    def test_bent_arc(self):
        # yaw=pi/2 with unit arc → quarter circle of radius 2/pi:
        # dz = sin(yaw)/yaw, dx = (1-cos(yaw))/yaw
        p = pose_ops.identity(jnp.float64)
        yaw = np.pi / 2
        out = pose_ops.boxplus_fix_scale_circular(
            p, jnp.array([0.0, yaw, 0.0]), fix_value=1.0)
        np.testing.assert_allclose(
            pose_ops.translation(out),
            [(1 - np.cos(yaw)) / yaw, 0.0, np.sin(yaw) / yaw], atol=1e-9)
        angle = quat.qangle(pose_ops.rotation(out),
                            quat.qfrom_axis_angle(jnp.array([0.0, 1.0, 0.0]),
                                                  jnp.asarray(yaw)))
        assert float(angle) < 1e-9

    def test_rotation_right_composed(self, rng):
        # q' = q ⊗ q_delta with q_delta = Rz(roll)·Ry(yaw)·Rx(pitch)
        q = rand_quat(rng)
        p = jnp.concatenate([q, jnp.asarray(rng.normal(size=3))])
        d = jnp.array([0.1, 0.2, -0.3])
        out = pose_ops.boxplus_fix_scale_circular(p, d, fix_value=0.0)
        qd = quat.qmul(
            quat.qfrom_axis_angle(jnp.array([0.0, 0, 1.0]), d[2]),
            quat.qmul(
                quat.qfrom_axis_angle(jnp.array([0.0, 1.0, 0]), d[1]),
                quat.qfrom_axis_angle(jnp.array([1.0, 0, 0]), d[0])))
        angle = quat.qangle(pose_ops.rotation(out), quat.qmul(q, qd))
        assert float(angle) < 1e-9
        # fix_value=0 ⇒ translation untouched
        np.testing.assert_allclose(pose_ops.translation(out),
                                   pose_ops.translation(p), atol=1e-12)


class TestTangentBasis:
    def test_full_dof_identity(self):
        poses = jnp.tile(pose_ops.identity(jnp.float64), (3, 1))
        B, mask = pose_ops.tangent_basis(poses, "full_dof")
        np.testing.assert_allclose(np.asarray(B), np.broadcast_to(np.eye(6), (3, 6, 6)))
        np.testing.assert_allclose(np.asarray(mask), 1.0)

    def test_fix_rotation_masks_rot(self):
        poses = jnp.tile(pose_ops.identity(jnp.float64), (2, 1))
        B, mask = pose_ops.tangent_basis(poses, "fix_rotation")
        np.testing.assert_allclose(np.asarray(mask), [0, 0, 0, 1, 1, 1])

    def test_circular_matches_retraction_jacobian(self, rng):
        """The circular_2d basis must equal d(boxplus_circular_2d)/d(delta)
        at delta=0 pushed through our boxplus chart."""
        import jax

        q = rand_quat(rng)
        p = jnp.concatenate([q, jnp.asarray(rng.normal(size=3))])

        def retract_in_chart(d2):
            # circular retraction expressed as a tangent in our boxplus chart:
            # rotation tangent = log(q' ⊗ q⁻¹), translation tangent = t' − t
            out = pose_ops.boxplus_circular_2d(p, d2)
            w = quat.qlog(quat.qmul(out[:4], quat.qinv(p[:4])))
            return jnp.concatenate([w, out[4:] - p[4:]])

        J = jax.jacfwd(retract_in_chart)(jnp.zeros(2, jnp.float64))  # [6,2]
        B, mask = pose_ops.tangent_basis(p[None], "circular_2d")
        np.testing.assert_allclose(np.asarray(J), np.asarray(B[0, :, :2]),
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(mask), [1, 1, 0, 0, 0, 0])


class TestRelativeDisplacement:
    """The plausibility guards in the scan step bound the VEHICLE
    displacement ‖relative(p1,p0)[4:]‖, never the raw Δt of veh←origin
    poses: position = −Rᵀt, so far from origin a small legitimate heading
    fix has a huge raw Δt at near-zero displacement. The raw-t guard
    rejected exactly the corrections a sharp turn needs (km rendered-drive
    failure at ~170 m: a 3° fix read as 8.8 m of 'translation')."""

    def test_rotation_fix_far_from_origin_is_small_displacement(self):
        import numpy as np

        p_world = np.array([170.0, 40.0, 0.0])
        def veh_from_origin(yaw):
            q = np.array([np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)])
            R = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                          [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1.0]])
            return jnp.asarray(np.concatenate([q, -R @ p_world]))

        p0 = veh_from_origin(0.50)
        p1 = veh_from_origin(0.50 + np.radians(3.0))   # 3° heading fix
        raw_dt = float(jnp.linalg.norm(p1[4:] - p0[4:]))
        disp = float(jnp.linalg.norm(pose_ops.relative(p1, p0)[4:]))
        assert raw_dt > 5.0, raw_dt          # the trap: reads as a teleport
        assert disp < 1e-9, disp             # the truth: vehicle never moved
        # and a genuine 2 m jump reads as 2 m regardless of heading
        p2 = jnp.concatenate([p1[:4], p1[4:] + jnp.asarray([0.0, 2.0, 0.0])])
        assert abs(float(jnp.linalg.norm(
            pose_ops.relative(p2, p1)[4:])) - 2.0) < 1e-9
