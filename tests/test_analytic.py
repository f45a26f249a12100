"""Analytic jacobians must equal autodiff to machine precision."""

import jax
import jax.numpy as jnp
import numpy as np

from limo_tpu.geometry import pose as pose_ops
from limo_tpu.geometry import quaternion as quat
from limo_tpu.residuals import landmark_depth, reprojection
from limo_tpu.solver.analytic import obs_residual_jac

F, CX, CY = 600.0, 300.0, 200.0


def rand_pose(rng):
    q = quat.qexp(jnp.asarray(rng.normal(size=3) * 0.3))
    return pose_ops.make(q, jnp.asarray(rng.normal(size=3) * 2.0))


class TestAnalyticJacobians:
    def test_matches_autodiff(self, rng):
        for _ in range(10):
            pose_kf = rand_pose(rng)
            tcv = rand_pose(rng)
            x = jnp.asarray(rng.normal(size=3) * 5 + np.array([0, 0, 20.0]))
            uvd = jnp.asarray(rng.uniform(0, 400, 3))
            f = jnp.asarray(F)
            pp = jnp.asarray([CX, CY])

            def res_fn(delta, dlm):
                p = pose_ops.boxplus(pose_kf, delta)
                rr, _ = reprojection(p, x + dlm, uvd[:2], f, pp, tcv)
                rd, _ = landmark_depth(p, x + dlm, uvd[2], tcv)
                return jnp.concatenate([rr, rd])

            Jp_ad = jax.jacfwd(res_fn, 0)(jnp.zeros(6), jnp.zeros(3))
            Jl_ad = jax.jacfwd(res_fn, 1)(jnp.zeros(6), jnp.zeros(3))
            r_ad = res_fn(jnp.zeros(6), jnp.zeros(3))

            R_kf = quat.qto_matrix(pose_kf[:4])
            R_cv = quat.qto_matrix(tcv[:4])
            r, valid, Jp, Jl = obs_residual_jac(
                R_kf, pose_kf[4:], x, uvd, f, pp, R_cv, tcv[4:])
            assert bool(valid)
            np.testing.assert_allclose(r, r_ad, atol=1e-9)
            np.testing.assert_allclose(Jp, Jp_ad, atol=1e-9)
            np.testing.assert_allclose(Jl, Jl_ad, atol=1e-9)

    def test_batched(self, rng):
        N = 50
        poses = jnp.stack([rand_pose(rng) for _ in range(N)])
        tcv = rand_pose(rng)
        xs = jnp.asarray(rng.normal(size=(N, 3)) * 5 + np.array([0, 0, 20.0]))
        uvds = jnp.asarray(rng.uniform(0, 400, (N, 3)))
        R_kf = quat.qto_matrix(poses[:, :4])
        R_cv = jnp.broadcast_to(quat.qto_matrix(tcv[:4]), (N, 3, 3))
        r, valid, Jp, Jl = obs_residual_jac(
            R_kf, poses[:, 4:], xs, uvds, jnp.full((N,), F),
            jnp.asarray([CX, CY]), R_cv, jnp.broadcast_to(tcv[4:], (N, 3)))
        assert r.shape == (N, 3) and Jp.shape == (N, 3, 6) and Jl.shape == (N, 3, 3)
        # spot-check one against autodiff
        i = 7

        def res_fn(delta, dlm):
            p = pose_ops.boxplus(poses[i], delta)
            rr, _ = reprojection(p, xs[i] + dlm, uvds[i, :2], jnp.asarray(F),
                                 jnp.asarray([CX, CY]), tcv)
            rd, _ = landmark_depth(p, xs[i] + dlm, uvds[i, 2], tcv)
            return jnp.concatenate([rr, rd])

        np.testing.assert_allclose(Jp[i], jax.jacfwd(res_fn, 0)(jnp.zeros(6), jnp.zeros(3)), atol=1e-9)
        np.testing.assert_allclose(Jl[i], jax.jacfwd(res_fn, 1)(jnp.zeros(6), jnp.zeros(3)), atol=1e-9)
