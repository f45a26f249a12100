"""Multi-device sharding tests on the 8-virtual-CPU-device mesh: the
landmark/model + window/data sharded solver must produce the same result as
the single-device solve (GSPMD partitioning is numerically transparent)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from limo_tpu.parallel import (device_put_selection, device_put_window,
                               make_mesh, make_sharded_solver)
from limo_tpu.solver import solve_trimmed

from test_solver import (RIG, build_window, default_selection, make_gt_poses,
                         make_landmarks, pose_errors)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(7)
    gt = make_gt_poses()
    lms = make_landmarks(rng, n=120)
    w, cfg = build_window(gt, lms, RIG, pose_noise=(0.01, 0.1), lm_noise=0.2,
                          pixel_noise=0.3, rng=rng)
    sel = default_selection(w, scale_weight=1000.0,
                            scale_target=float(jnp.linalg.norm(gt[1, 4:] - gt[0, 4:])))
    return gt, w, cfg, sel


class TestShardedSolve:
    def test_mesh_shapes(self):
        mesh = make_mesh(8)
        assert mesh.shape["data"] * mesh.shape["model"] == 8

    def test_sharded_equals_single(self, problem):
        gt, w, cfg, sel = problem
        ref_w, ref_sel, ref_info = jax.jit(
            lambda w, s: solve_trimmed(w, s, RIG, cfg))(w, sel)

        mesh = make_mesh(8, data=1)   # all 8 devices on the landmark axis
        ws = device_put_window(w, mesh, batched=False)
        sels = device_put_selection(sel, mesh, batched=False)
        solver = make_sharded_solver(mesh, RIG, cfg, batched=False)
        out_w, out_sel, out_info = solver(ws, sels)

        np.testing.assert_allclose(np.asarray(out_w.poses),
                                   np.asarray(ref_w.poses), atol=1e-6)
        np.testing.assert_allclose(float(out_info.final_cost),
                                   float(ref_info.final_cost), rtol=1e-6)

    def test_batched_data_parallel(self, problem):
        gt, w, cfg, sel = problem
        mesh = make_mesh(8, data=2)
        B = 2
        wb = jax.tree_util.tree_map(lambda x: jnp.stack([x] * B), w)
        selb = jax.tree_util.tree_map(lambda x: jnp.stack([x] * B), sel)
        wb = device_put_window(wb, mesh, batched=True)
        selb = device_put_selection(selb, mesh, batched=True)
        solver = make_sharded_solver(mesh, RIG, cfg, batched=True)
        out_w, out_sel, out_info = solver(wb, selb)
        # identical inputs → identical outputs per batch element
        np.testing.assert_allclose(np.asarray(out_w.poses[0]),
                                   np.asarray(out_w.poses[1]), atol=1e-12)
        # and the solve converged toward GT
        dq, dt = pose_errors(
            jax.tree_util.tree_map(lambda x: x[0], out_w), gt)
        assert dt.max() < 0.1


class TestShardMapSolver:
    """Explicit-collective (shard_map) landmark-sharded solver: must match
    the single-device solve and the GSPMD path."""

    def test_shard_map_equals_single(self, problem):
        from limo_tpu.parallel import make_shard_map_solver

        gt, w, cfg, sel = problem
        ref_w, ref_sel, ref_info = jax.jit(
            lambda w, s: solve_trimmed(w, s, RIG, cfg))(w, sel)

        mesh = make_mesh(8, data=1)
        ws = device_put_window(w, mesh, batched=False)
        sels = device_put_selection(sel, mesh, batched=False)
        solver = make_shard_map_solver(mesh, RIG, cfg, batched=False)
        out_w, out_sel, out_info = solver(ws, sels)

        np.testing.assert_allclose(np.asarray(out_w.poses),
                                   np.asarray(ref_w.poses), atol=1e-6)
        np.testing.assert_allclose(float(out_info.final_cost),
                                   float(ref_info.final_cost), rtol=1e-6)
        # trim decisions identical (global quantile via all_gather)
        np.testing.assert_array_equal(np.asarray(out_sel.lm_selected),
                                      np.asarray(ref_sel.lm_selected))

    def test_shard_map_batched(self, problem):
        from limo_tpu.parallel import make_shard_map_solver

        gt, w, cfg, sel = problem
        mesh = make_mesh(8, data=2)
        B = 2
        wb = jax.tree_util.tree_map(lambda x: jnp.stack([x] * B), w)
        selb = jax.tree_util.tree_map(lambda x: jnp.stack([x] * B), sel)
        wb = device_put_window(wb, mesh, batched=True)
        selb = device_put_selection(selb, mesh, batched=True)
        solver = make_shard_map_solver(mesh, RIG, cfg, batched=True)
        out_w, out_sel, out_info = solver(wb, selb)
        np.testing.assert_allclose(np.asarray(out_w.poses[0]),
                                   np.asarray(out_w.poses[1]), atol=1e-12)
        dq, dt = pose_errors(
            jax.tree_util.tree_map(lambda x: x[0], out_w), gt)
        assert dt.max() < 0.1


class TestShardMapPallas:
    def test_shard_map_pallas_interpret_matches_einsum(self):
        """The fused assembly kernel must run ON EACH LANDMARK SHARD inside
        shard_map (per-shard L static and 128-aligned → kernel tile 128);
        interpret mode covers the kernel path on the CPU mesh. End-to-end
        solve comparison (f32 accumulation order differs from einsums, so
        blocks are not compared bitwise)."""
        import dataclasses

        from __graft_entry__ import _make_problem
        from limo_tpu.parallel import make_shard_map_solver

        w, sel, rig, cfg = _make_problem(5, 512, 5, 96, jnp.float32, seed=3)
        mesh = make_mesh(8, data=2)          # model=4 → per-shard L=128
        ws = device_put_window(w, mesh, batched=False)
        sels = device_put_selection(sel, mesh, batched=False)

        cfg_pal = cfg.replace(solver=dataclasses.replace(
            cfg.solver, use_pallas_assembly=True, pallas_interpret=True))
        cfg_ein = cfg.replace(solver=dataclasses.replace(
            cfg.solver, use_pallas_assembly=False))
        out_p = make_shard_map_solver(mesh, rig, cfg_pal)(ws, sels)
        out_e = make_shard_map_solver(mesh, rig, cfg_ein)(ws, sels)
        cost_p = float(out_p[2].final_cost)
        cost_e = float(out_e[2].final_cost)
        assert np.isfinite(cost_p) and np.isfinite(cost_e)
        np.testing.assert_allclose(cost_p, cost_e, rtol=5e-3)
        np.testing.assert_allclose(np.asarray(out_p[0].poses[:5]),
                                   np.asarray(out_e[0].poses[:5]), atol=5e-3)
        # and the kernel genuinely solved something
        assert cost_p < float(out_p[2].initial_cost)
