"""pose_host (numpy) must match geometry.pose / geometry.quaternion (jax)."""

import jax.numpy as jnp
import numpy as np

from limo_tpu.geometry import pose as pj
from limo_tpu.geometry import pose_host as ph
from limo_tpu.geometry import quaternion as qj


def rand_pose(rng, n=None):
    q = rng.normal(size=(4,) if n is None else (n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    t = rng.normal(size=(3,) if n is None else (n, 3))
    return np.concatenate([q, t], -1)


class TestPoseHostEquivalence:
    def test_all_ops_match_jax(self, rng):
        p1 = rand_pose(rng)
        p2 = rand_pose(rng)
        x = rng.normal(size=(11, 3))
        np.testing.assert_allclose(
            ph.apply(p1, x), np.asarray(pj.apply(jnp.asarray(p1), jnp.asarray(x))),
            atol=1e-12)
        np.testing.assert_allclose(
            ph.compose(p1, p2),
            np.asarray(pj.compose(jnp.asarray(p1), jnp.asarray(p2))), atol=1e-12)
        np.testing.assert_allclose(
            ph.inverse(p1), np.asarray(pj.inverse(jnp.asarray(p1))), atol=1e-12)
        np.testing.assert_allclose(
            ph.relative(p1, p2),
            np.asarray(pj.relative(jnp.asarray(p1), jnp.asarray(p2))), atol=1e-12)
        np.testing.assert_allclose(
            ph.to_matrix(p1), np.asarray(pj.to_matrix(jnp.asarray(p1))),
            atol=1e-12)
        np.testing.assert_allclose(
            ph.qangle(p1[:4], p2[:4]),
            float(qj.qangle(jnp.asarray(p1[:4]), jnp.asarray(p2[:4]))),
            atol=1e-9)

    def test_batched(self, rng):
        ps = rand_pose(rng, 7)
        xs = rng.normal(size=(7, 3))
        np.testing.assert_allclose(
            ph.apply(ps, xs), np.asarray(pj.apply(jnp.asarray(ps), jnp.asarray(xs))),
            atol=1e-12)
        np.testing.assert_allclose(
            ph.compose(ps, ps[::-1]),
            np.asarray(pj.compose(jnp.asarray(ps), jnp.asarray(ps[::-1]))),
            atol=1e-12)
        np.testing.assert_allclose(
            ph.to_matrix(ps), np.asarray(pj.to_matrix(jnp.asarray(ps))),
            atol=1e-12)

    def test_roundtrip(self, rng):
        p = rand_pose(rng)
        np.testing.assert_allclose(ph.compose(p, ph.inverse(p)),
                                   np.array([1, 0, 0, 0, 0, 0, 0.0]), atol=1e-12)
