"""Lidar-depth front-end tests (behavior contract =
res/mono_lidar_fusion_parameters.yaml, SURVEY §2.12): neighbor selection,
histogram foreground isolation, triangle patch fit, thresholds, and the
ground-plane RANSAC depth path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from limo_tpu.frontend.groundplane import estimate_groundplane
from limo_tpu.frontend.lidar_depth import (LidarDepthConfig, DepthResult,
                                           estimate_depths,
                                           gather_neighbors,
                                           ground_feature_depths)

F, CX, CY = 600.0, 300.0, 200.0
IMG = (620, 400)
DT = jnp.float64


def make_wall_cloud(rng, z=10.0, n=40000, jitter=0.0):
    """Planar wall at depth z covering the image."""
    u = rng.uniform(0, IMG[0], n)
    v = rng.uniform(0, IMG[1], n)
    x = (u - CX) / F * z
    y = (v - CY) / F * z
    zs = np.full(n, z) + (rng.normal(0, jitter, n) if jitter else 0.0)
    return np.stack([x, y, zs], -1)


class TestNeighborGather:
    def test_finds_rect_neighbors(self, rng):
        cloud = jnp.asarray(make_wall_cloud(rng), DT)
        uv = jnp.asarray([[300.0, 200.0], [100.0, 100.0]], DT)
        pts, uvs, mask = gather_neighbors(
            cloud, jnp.ones(cloud.shape[0], bool), uv, jnp.asarray(F, DT),
            jnp.asarray([CX, CY], DT), IMG, LidarDepthConfig())
        # every returned neighbor projects inside the rectangle
        cfg = LidarDepthConfig()
        for i in range(2):
            m = np.asarray(mask[i])
            du = np.abs(np.asarray(uvs[i])[m, 0] - float(uv[i, 0]))
            dv = np.abs(np.asarray(uvs[i])[m, 1] - float(uv[i, 1]))
            assert (du <= cfg.search_width / 2 + 1e-9).all()
            assert (dv <= cfg.search_height / 2 + 1e-9).all()

    def test_behind_camera_cut(self, rng):
        cloud = np.concatenate([make_wall_cloud(rng),
                                make_wall_cloud(rng) * np.array([1, 1, -1])])
        uv = jnp.asarray([[300.0, 200.0]], DT)
        pts, _, mask = gather_neighbors(
            jnp.asarray(cloud, DT), jnp.ones(cloud.shape[0], bool), uv,
            jnp.asarray(F, DT), jnp.asarray([CX, CY], DT), IMG,
            LidarDepthConfig())
        assert bool((jnp.where(mask, pts[..., 2], 1.0) > 0).all())


class TestEstimateDepths:
    def test_wall_depth(self, rng):
        cloud = jnp.asarray(make_wall_cloud(rng, z=12.0, n=60000), DT)
        uv = jnp.asarray(rng.uniform(50, 350, (20, 2)), DT)
        res = estimate_depths(cloud, jnp.ones(cloud.shape[0], bool), uv,
                              jnp.asarray(F, DT), jnp.asarray([CX, CY], DT), IMG)
        ok = np.asarray(res.valid)
        assert ok.sum() >= 15, ok.sum()
        np.testing.assert_allclose(np.asarray(res.depth)[ok], 12.0, atol=0.05)

    def test_foreground_isolation(self, rng):
        # background wall at 30 m + foreground object at 8 m around a feature:
        # histogram segmentation must return the foreground depth
        bg = make_wall_cloud(rng, z=30.0, n=40000)
        fg_uv = np.array([200.0, 150.0])
        n_fg = 30
        u = fg_uv[0] + rng.uniform(-4, 4, n_fg)
        v = fg_uv[1] + rng.uniform(-4, 4, n_fg)
        z = np.full(n_fg, 8.0) + rng.normal(0, 0.02, n_fg)
        fg = np.stack([(u - CX) / F * z, (v - CY) / F * z, z], -1)
        cloud = jnp.asarray(np.concatenate([bg, fg]), DT)
        res = estimate_depths(cloud, jnp.ones(cloud.shape[0], bool),
                              jnp.asarray([fg_uv], DT), jnp.asarray(F, DT),
                              jnp.asarray([CX, CY], DT), IMG)
        assert bool(res.valid[0])
        np.testing.assert_allclose(float(res.depth[0]), 8.0, atol=0.3)

    def test_no_neighbors_invalid(self, rng):
        cloud = jnp.asarray(make_wall_cloud(rng, n=200), DT)  # sparse
        uv = jnp.asarray([[10.0, 10.0]], DT)  # corner, no points nearby
        res = estimate_depths(cloud, jnp.ones(cloud.shape[0], bool), uv,
                              jnp.asarray(F, DT), jnp.asarray([CX, CY], DT), IMG)
        # either invalid or... with 50 random points the corner is empty
        if not bool(res.valid[0]):
            assert float(res.depth[0]) == -1.0

    def test_global_threshold(self, rng):
        cloud = jnp.asarray(make_wall_cloud(rng, z=150.0, n=60000), DT)
        uv = jnp.asarray([[300.0, 200.0]], DT)
        res = estimate_depths(cloud, jnp.ones(cloud.shape[0], bool), uv,
                              jnp.asarray(F, DT), jnp.asarray([CX, CY], DT), IMG)
        assert not bool(res.valid[0])  # beyond 100 m cap
        assert float(res.depth[0]) == -1.0

    def test_slanted_plane_interpolation(self, rng):
        # depth varies with u; the patch fit must interpolate between rings
        n = 60000
        u = rng.uniform(0, IMG[0], n)
        v = rng.uniform(0, IMG[1], n)
        z = 10.0 + (u - CX) * 0.01
        cloud = np.stack([(u - CX) / F * z, (v - CY) / F * z, z], -1)
        uv = jnp.asarray([[350.0, 180.0]], DT)
        res = estimate_depths(jnp.asarray(cloud, DT),
                              jnp.ones(n, bool), uv, jnp.asarray(F, DT),
                              jnp.asarray([CX, CY], DT), IMG)
        assert bool(res.valid[0])
        np.testing.assert_allclose(float(res.depth[0]), 10.0 + 50 * 0.01, atol=0.3)


class TestGroundplaneDepth:
    def test_ransac_plane_and_ground_depth(self, rng):
        # synthetic: vehicle-frame ground at z=-2.4 (velodyne height, spec
        # band [-3.5,-1]) plus structure noise above
        n = 3000
        x = rng.uniform(3, 40, n)
        y = rng.uniform(-8, 8, n)
        ground = np.stack([x, y, np.full(n, -2.4) + rng.normal(0, 0.02, n)], -1)
        clutter = rng.uniform(-1, 1, (500, 3)) * np.array([20, 8, 1]) \
            + np.array([20, 0, 0.5])
        pts = jnp.asarray(np.concatenate([ground, clutter]), DT)
        res = estimate_groundplane(pts, jnp.ones(pts.shape[0], bool))
        assert bool(res.ok)
        n_est = np.asarray(res.normal)
        assert abs(n_est[2]) > 0.99
        np.testing.assert_allclose(float(res.distance), 2.4, atol=0.05)

    def test_ground_feature_depth(self):
        # camera 1.65 m above ground, looking forward (camera frame: y
        # down): ground points have y=+1.65, so with normal (0,-1,0) the
        # plane n·p + d = 0 needs d = +1.65
        normal = jnp.asarray([0.0, -1.0, 0.0], DT)
        d = jnp.asarray(1.65, DT)
        # feature below the horizon: v > cy
        uv = jnp.asarray([[300.0, 300.0]], DT)
        depth, valid = ground_feature_depths(normal, d, uv, jnp.asarray(F, DT),
                                             jnp.asarray([CX, CY], DT))
        assert bool(valid[0])
        # ray y-component: (300-200)/600 → y = z*1/6 = 1.65 → z = 9.9
        np.testing.assert_allclose(float(depth[0]), 9.9, rtol=1e-6)


class TestGroundPatch:
    def test_mestimator_local_patch(self, rng):
        """Local weighted patch recovers a sloped road better than the global
        plane (reference plane_estimator_use_mestimator)."""
        from limo_tpu.frontend.lidar_depth import ground_patch_depths
        # camera frame: y down. Road with slight slope: y = 1.65 + 0.01*z
        n = 40000
        u = rng.uniform(0, IMG[0], n)
        v = rng.uniform(CY + 10, IMG[1], n)  # below horizon
        # solve for z along each ray: y = z*(v-cy)/F == 1.65 + 0.01*z
        a = (v - CY) / F
        z = 1.65 / (a - 0.01)
        y = 1.65 + 0.01 * z
        x = (u - CX) / F * z
        cloud = np.stack([x, y, z], -1)
        ok = (z > 1) & (z < 90)
        cloud = cloud[ok]
        # global (unsloped) plane guess: n=(0,-1,0), d=1.65
        n_glob = jnp.asarray([0.0, -1.0, 0.0], DT)
        d_glob = jnp.asarray(1.65, DT)
        uvf = jnp.asarray([[300.0, 260.0], [200.0, 300.0]], DT)
        depth, valid = ground_patch_depths(
            jnp.asarray(cloud, DT), jnp.ones(cloud.shape[0], bool), uvf,
            n_glob, d_glob, jnp.asarray(F, DT), jnp.asarray([CX, CY], DT), IMG)
        assert bool(valid.all())
        # expected depth from the true sloped road
        for i, (uu, vv) in enumerate([(300.0, 260.0), (200.0, 300.0)]):
            aa = (vv - CY) / F
            z_true = 1.65 / (aa - 0.01)
            np.testing.assert_allclose(float(depth[i]), z_true, rtol=0.02)

    def test_fallback_to_global_plane(self, rng):
        from limo_tpu.frontend.lidar_depth import ground_patch_depths
        # no inlier points at all → global plane intersection
        cloud = jnp.asarray(rng.normal(size=(100, 3)) + np.array([0, -5, 10.0]), DT)
        n_glob = jnp.asarray([0.0, -1.0, 0.0], DT)
        d_glob = jnp.asarray(1.65, DT)
        uvf = jnp.asarray([[300.0, 300.0]], DT)
        depth, valid = ground_patch_depths(
            cloud, jnp.zeros(100, bool), uvf, n_glob, d_glob,
            jnp.asarray(F, DT), jnp.asarray([CX, CY], DT), IMG)
        assert bool(valid[0])
        np.testing.assert_allclose(float(depth[0]), 9.9, rtol=1e-5)


class TestVariantModes:
    """The off-by-default reference variants: kd-tree-style radius neighbor
    search (neighbor_search_mode 1), PCA patch fit (do_use_PCA), and
    region-growing depth segmentation (do_use_depth_segmentation)."""

    def test_radius_neighbor_mode(self, rng):
        cloud = jnp.asarray(make_wall_cloud(rng), DT)
        uv = jnp.asarray([[300.0, 200.0], [80.0, 320.0]], DT)
        cfg = LidarDepthConfig(neighbor_mode="radius", radius_px=10.0)
        pts, uvs, mask = gather_neighbors(
            cloud, jnp.ones(cloud.shape[0], bool), uv, jnp.asarray(F, DT),
            jnp.asarray([CX, CY], DT), IMG, cfg)
        for i in range(2):
            m = np.asarray(mask[i])
            assert m.sum() >= 3
            d = np.linalg.norm(np.asarray(uvs[i])[m] - np.asarray(uv[i]), axis=-1)
            assert (d <= cfg.radius_px + 1e-9).all()

    def test_radius_wider_than_rect(self, rng):
        # radius 10 px must reach points the 6x9 rectangle cannot
        cloud = jnp.asarray(make_wall_cloud(rng, n=4000), DT)
        uv = jnp.asarray(rng.uniform(100, 300, (10, 2)), DT)
        args = (cloud, jnp.ones(cloud.shape[0], bool), uv, jnp.asarray(F, DT),
                jnp.asarray([CX, CY], DT), IMG)
        _, _, m_rect = gather_neighbors(*args, LidarDepthConfig())
        _, _, m_rad = gather_neighbors(
            *args, LidarDepthConfig(neighbor_mode="radius", radius_px=10.0))
        assert int(m_rad.sum()) >= int(m_rect.sum())

    def test_pca_patch_wall(self, rng):
        cloud = jnp.asarray(make_wall_cloud(rng, z=15.0, n=60000), DT)
        uv = jnp.asarray(rng.uniform(60, 340, (20, 2)), DT)
        cfg = LidarDepthConfig(patch_mode="pca", neighbor_mode="radius",
                               radius_px=10.0, max_neighbors=32)
        res = estimate_depths(cloud, jnp.ones(cloud.shape[0], bool), uv,
                              jnp.asarray(F, DT), jnp.asarray([CX, CY], DT),
                              IMG, cfg)
        ok = np.asarray(res.valid)
        assert ok.sum() >= 12, ok.sum()
        np.testing.assert_allclose(np.asarray(res.depth)[ok], 15.0, atol=0.1)

    def test_pca_rejects_line(self, rng):
        # colinear points (single scanline) must fail the eigenvalue gates
        n = 60
        u = np.linspace(195.0, 205.0, n)
        v = np.full(n, 150.0)
        z = np.full(n, 10.0)
        line = np.stack([(u - CX) / F * z, (v - CY) / F * z, z], -1)
        cfg = LidarDepthConfig(patch_mode="pca")
        res = estimate_depths(jnp.asarray(line, DT), jnp.ones(n, bool),
                              jnp.asarray([[200.0, 150.0]], DT),
                              jnp.asarray(F, DT), jnp.asarray([CX, CY], DT),
                              IMG, cfg)
        # patch fit fails -> falls back to segment-mean depth; still usable,
        # but the PCA gate itself must have rejected the line: with a
        # perfect line the plane normal is ill-defined, so the triangle/pca
        # estimate must not be marked as a patch intersection far off 10 m
        d = float(res.depth[0])
        assert res.valid[0] == False or abs(d - 10.0) < 0.5

    def test_region_growing_foreground(self, rng):
        # same foreground/background split as the histogram test — region
        # growing from the pixel-nearest seed must select the foreground
        bg = make_wall_cloud(rng, z=30.0, n=40000)
        fg_uv = np.array([200.0, 150.0])
        n_fg = 30
        u = fg_uv[0] + rng.uniform(-4, 4, n_fg)
        v = fg_uv[1] + rng.uniform(-4, 4, n_fg)
        # pin one point on the feature pixel: the region-growing seed is the
        # pixel-nearest neighbor (reference step 2), keep that deterministic
        u[0], v[0] = fg_uv
        z = np.full(n_fg, 8.0) + rng.normal(0, 0.02, n_fg)
        fg = np.stack([(u - CX) / F * z, (v - CY) / F * z, z], -1)
        cloud = jnp.asarray(np.concatenate([bg, fg]), DT)
        cfg = LidarDepthConfig(segmentation_mode="region_growing")
        res = estimate_depths(cloud, jnp.ones(cloud.shape[0], bool),
                              jnp.asarray([fg_uv], DT), jnp.asarray(F, DT),
                              jnp.asarray([CX, CY], DT), IMG, cfg)
        assert bool(res.valid[0])
        assert abs(float(res.depth[0]) - 8.0) < 0.5, float(res.depth[0])

    def test_region_growing_caps_points(self, rng):
        from limo_tpu.frontend.lidar_depth import _region_grow_segment
        cfg = LidarDepthConfig(segmentation_mode="region_growing",
                               rg_max_points=4)
        K = 12
        pts = jnp.asarray(rng.normal(0, 0.01, (1, K, 3)) + [0, 0, 5.0], DT)
        uvs = jnp.asarray(rng.uniform(99, 101, (1, K, 2)), DT)
        seg, found = _region_grow_segment(
            pts, jnp.ones((1, K), bool), uvs,
            jnp.asarray([[100.0, 100.0]], DT), cfg)
        assert bool(found[0])
        assert int(seg.sum()) <= 4


class TestEigh3Sym:
    """Closed-form symmetric 3×3 eigensolver: must match LAPACK on random
    SPD and near-degenerate planar covariances (the depth estimator's
    actual regime), and survive diagonal/repeated-eigenvalue corner cases
    without NaNs."""

    def test_matches_lapack(self, rng):
        from limo_tpu.frontend.lidar_depth import eigh3_sym
        M = rng.normal(size=(500, 3, 3))
        A = M @ M.transpose(0, 2, 1)
        D = rng.normal(size=(500, 6, 3))
        D[..., 2] *= 1e-3                      # near-planar point sets
        A2 = np.einsum("nki,nkj->nij", D, D)
        for arr in (A, A2):
            ev_ref, V_ref = np.linalg.eigh(arr)
            ev, v = jax.jit(eigh3_sym)(jnp.asarray(arr))
            np.testing.assert_allclose(np.asarray(ev), ev_ref,
                                       rtol=1e-5, atol=1e-8)
            dots = np.abs(np.sum(np.asarray(v) * V_ref[..., 0], -1))
            assert dots.min() > 1.0 - 1e-6, dots.min()

    def test_degenerate_no_nan(self):
        from limo_tpu.frontend.lidar_depth import eigh3_sym
        cases = jnp.stack([
            jnp.eye(3),                         # triple eigenvalue
            jnp.diag(jnp.array([3.0, 1.0, 2.0])),
            jnp.zeros((3, 3)),
            jnp.diag(jnp.array([2.0, 2.0, 5.0])),  # repeated smallest
        ])
        ev, v = jax.jit(eigh3_sym)(cases)
        assert np.isfinite(np.asarray(ev)).all()
        assert np.isfinite(np.asarray(v)).all()
        np.testing.assert_allclose(np.linalg.norm(np.asarray(v), axis=-1),
                                   1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ev)[1], [1.0, 2.0, 3.0],
                                   atol=1e-6)
        # eigenvector belongs to the smallest eigenvalue
        res = np.einsum("nij,nj->ni", np.asarray(cases), np.asarray(v)) \
            - np.asarray(ev)[:, :1] * np.asarray(v)
        assert np.abs(res).max() < 1e-5

    def test_repeated_smallest_oblique_eigenspace(self, rng):
        """Repeated λ1 with a NON-axis-aligned eigenspace (cov ≈ λ·I + n·nᵀ,
        n oblique): the degenerate fallback must return a vector in the null
        plane of n, not an axis basis vector (advisor r3 finding). The tiny
        1e-12 scaling underflows the row cross products below the vanish
        threshold in f32, forcing the repeated-λ1 fallback branch."""
        from limo_tpu.frontend.lidar_depth import eigh3_sym

        ns = np.stack([[1.0, 2.0, 2.0], [2.0, -1.0, 2.0], [3.0, 4.0, 0.0],
                       [1.0, 1.0, 1.0]])
        A = (2.0 * np.eye(3)[None] + np.einsum("ni,nj->nij", ns, ns))
        for scale in (1.0, 1e-12):   # 1e-12 (f32): exercises the fallback
            As = (scale * A).astype(np.float32)
            ev, v = jax.jit(eigh3_sym)(jnp.asarray(As))
            v = np.asarray(v)
            n_hat = ns / np.linalg.norm(ns, axis=-1, keepdims=True)
            # eigenvector of the repeated smallest eigenvalue ⟂ n
            assert np.abs(np.sum(v * n_hat, -1)).max() < 1e-3
            np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0,
                                       atol=1e-5)
            # residual check at the repeated eigenvalue. Tolerance is loose
            # relative to λmax: at a repeated root the trig λ1 passes
            # through arccos near ±1 where its derivative blows up, so the
            # f32 eigenVALUE carries ~1e-3·λmax error there — the
            # eigenVECTOR (the plane normal the depth estimator consumes)
            # is exact, which the ⟂-n assertion above pins tightly.
            lam1 = np.asarray(ev)[:, 0]
            res = np.einsum("nij,nj->ni", As, v) - (lam1[:, None] * v)
            assert np.abs(res).max() < 5e-3 * scale, res


class TestJacobiEigh3:
    """Cyclic-Jacobi 3×3 eigensolver (utils/eig3.py) — the backend-
    deterministic, high-relative-accuracy replacement for jnp.linalg.eigh
    in the plane fits (VERDICT r3: TPU-vs-CPU eigh numerics were the
    residual accuracy gap on the rendered drive)."""

    def test_spd_matches_lapack_f64(self, rng):
        from limo_tpu.utils.eig3 import jacobi_eigh3
        M = rng.normal(size=(500, 3, 3))
        A = (M @ M.transpose(0, 2, 1)).astype(np.float32)
        ev, V = jax.jit(jacobi_eigh3)(jnp.asarray(A))
        ev, V = np.asarray(ev), np.asarray(V)
        evr, Vr = np.linalg.eigh(A.astype(np.float64))
        np.testing.assert_allclose(ev, evr, rtol=2e-6,
                                   atol=2e-6 * np.abs(evr).max())
        # V columns orthonormal and diagonalizing
        VtV = np.einsum("nij,nik->njk", V, V)
        np.testing.assert_allclose(VtV, np.broadcast_to(np.eye(3), VtV.shape),
                                   atol=5e-6)
        D = np.einsum("nji,njk,nkl->nil", V, A, V)
        offmax = np.abs(D - np.einsum("nii->ni", D)[:, :, None]
                        * np.eye(3)).max()
        assert offmax < 5e-6 * np.abs(evr).max(), offmax

    def test_planar_high_relative_accuracy(self, rng):
        """1e7-eigenvalue-spread planar covariances (the RANSAC ground-fit
        regime that broke the trig closed form, commit 3c14b08): Jacobi at
        f32 must keep RELATIVE λ1 accuracy and an exact normal."""
        from limo_tpu.utils.eig3 import smallest_eigvec3
        D = rng.normal(size=(500, 400, 3))
        D[..., 0] *= 30.0
        D[..., 1] *= 8.0
        D[..., 2] *= 0.01
        C = (np.einsum("nki,nkj->nij", D, D) / 400.0).astype(np.float32)
        ev, v = jax.jit(smallest_eigvec3)(jnp.asarray(C))
        ev, v = np.asarray(ev), np.asarray(v)
        evr, Vr = np.linalg.eigh(C.astype(np.float64))
        assert (evr[:, 2] / evr[:, 0]).max() > 1e6   # the regime is real
        rel = np.abs(ev[:, 0] - evr[:, 0]) / evr[:, 0]
        assert rel.max() < 1e-5, rel.max()           # measured ~8e-8
        dots = np.abs(np.sum(v * Vr[..., 0], -1))
        assert dots.min() > 1.0 - 1e-9, dots.min()   # normal exact at f32

    def test_degenerate_inputs(self):
        from limo_tpu.utils.eig3 import jacobi_eigh3
        cases = jnp.stack([
            jnp.eye(3), jnp.zeros((3, 3)),
            jnp.diag(jnp.array([2.0, 2.0, 5.0])),
            jnp.diag(jnp.array([3.0, 1.0, 2.0])),
        ])
        ev, V = jax.jit(jacobi_eigh3)(cases)
        ev, V = np.asarray(ev), np.asarray(V)
        assert np.isfinite(ev).all() and np.isfinite(V).all()
        np.testing.assert_allclose(ev[3], [1.0, 2.0, 3.0], atol=1e-7)
        np.testing.assert_allclose(
            np.einsum("nij,nik->njk", V, V),
            np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-6)
