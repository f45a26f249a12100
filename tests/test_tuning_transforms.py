"""Tests for the tuning grid search, transform tree, and flow debug image
(reference: res/tune_parameters_kitti.py, static_transform_alias.cpp,
general_helpers.hpp getFlowImg)."""

import numpy as np
import pytest

from limo_tpu.config import LimoConfig
from limo_tpu.pipeline.tuning import GridPoint, apply_point, grid_search
from limo_tpu.utils import TransformLookupError, TransformTree, flow_image

from test_utils import build_ba


class TestGridSearch:
    def test_apply_point(self):
        cfg = apply_point(LimoConfig(), 0.12, 1.3, 0.5)
        assert cfg.robust.depth_thres == 0.12
        assert cfg.robust.reprojection_thres == 1.3
        assert cfg.regularization.shrubbery_weight == 0.5

    def test_grid_covers_product_and_sorts(self):
        seen = []

        def fake_eval(cfg):
            seen.append((cfg.robust.depth_thres,
                         cfg.robust.reprojection_thres,
                         cfg.regularization.shrubbery_weight))
            # lower depth_thres → better drift (deterministic fake)
            return {"ate_m": cfg.robust.depth_thres,
                    "t_err_percent": cfg.robust.depth_thres * 10,
                    "r_err_deg_per_m": 0.001}

        pts = grid_search(evaluate=fake_eval,
                          depth_thres=(0.2, 0.1), reprojection_thres=(1.0, 1.6),
                          shrubbery_weights=(0.9,))
        assert len(pts) == 4 == len(seen)
        assert set(seen) == {(0.2, 1.0, 0.9), (0.2, 1.6, 0.9),
                             (0.1, 1.0, 0.9), (0.1, 1.6, 0.9)}
        # sorted best-first by translation drift
        assert pts[0].depth_thres == 0.1
        drifts = [p.drift_t for p in pts]
        assert drifts == sorted(drifts)

    def test_nan_drift_falls_back_to_ate(self):
        def fake_eval(cfg):
            return {"ate_m": cfg.robust.depth_thres,
                    "t_err_percent": float("nan"),
                    "r_err_deg_per_m": float("nan")}

        pts = grid_search(evaluate=fake_eval, depth_thres=(0.3, 0.1),
                          reprojection_thres=(1.0,), shrubbery_weights=(0.9,))
        assert pts[0].depth_thres == 0.1

    def test_fused_grid_matches_serial(self):
        """The vmapped traced-loss-scale sweep must reproduce the serial
        per-point (static-constant) runs: same scan program, scales as
        tracers instead of compile-time constants."""
        import dataclasses

        import jax
        import jax.numpy as jnp

        from limo_tpu.config import CapacityConfig
        from limo_tpu.geometry.camera import CameraRig
        from limo_tpu.pipeline import scan_odometry as so
        from limo_tpu.pipeline.synthetic import dense_tracks, make_world

        rows = 256
        cfg = LimoConfig(capacity=CapacityConfig(
            max_keyframes=12, max_landmarks=rows, max_cameras=1))
        world = make_world(num_frames=30, speed=8.0, yaw_rate=0.015,
                           n_landmarks=180, n_ground=50, seed=2)
        stamps, uvd, valid = dense_tracks(world, rows, with_depth=True,
                                          seed=7)
        rig = CameraRig.single(world.focal, world.principal[0],
                               world.principal[1],
                               T_cam_veh=world.T_cam_veh)
        grid = np.array([[0.16, 1.6], [0.10, 1.0]])
        _, outs = so.run_tuning_grid(stamps, uvd, valid, rig, cfg, grid)
        assert outs.pose.shape[:2] == (2, 30)
        for g, (d, r) in enumerate(grid):
            tcfg = dataclasses.replace(cfg, robust=dataclasses.replace(
                cfg.robust, depth_thres=float(d),
                reprojection_thres=float(r)))
            _, ref = so.run_sequence(stamps, uvd, valid, rig, tcfg)
            # bootstrap frames are chaotic (accept/reject flips on f32
            # noise under vmap's cond→select); steady state must agree
            np.testing.assert_allclose(np.asarray(outs.pose[g, 10:]),
                                       np.asarray(ref.pose[10:]), atol=5e-2)
        # different loss scales genuinely produce different trajectories
        assert not np.allclose(np.asarray(outs.pose[0]),
                               np.asarray(outs.pose[1]))

    def test_fused_grid_search_ranks(self):
        from limo_tpu.pipeline.tuning import grid_search_fused
        pts = grid_search_fused(depth_thres=(0.16, 0.10),
                                reprojection_thres=(1.6,),
                                num_frames=30, landmark_rows=256)
        assert len(pts) == 2
        assert all(np.isfinite(p.ate) for p in pts)
        # sorted best-first on translation drift
        assert pts[0].drift_t <= pts[1].drift_t

    def test_fused_grid_chunking_matches_unchunked(self):
        # a 3-point grid forced through 2-point padded chunks must return
        # the same ranking + metrics as the single-dispatch path
        from limo_tpu.pipeline.tuning import grid_search_fused
        kw = dict(depth_thres=(0.16, 0.10), reprojection_thres=(1.6,),
                  num_frames=30, landmark_rows=256)
        whole = grid_search_fused(**kw)
        chunked = grid_search_fused(max_chunk=1, **kw)
        # compare per-point metrics keyed by the grid coordinates — the
        # *ranking* may legitimately flip when two points' drift nearly
        # ties (vmap width changes f32 fusion/reduction order)
        wm = {(p.depth_thres, p.reprojection_thres): p for p in whole}
        cm = {(p.depth_thres, p.reprojection_thres): p for p in chunked}
        assert wm.keys() == cm.keys() and len(wm) == 2
        for k in wm:
            np.testing.assert_allclose(wm[k].ate, cm[k].ate, atol=1e-3)

    def test_json_roundtrip(self):
        import json
        p = GridPoint(0.1, 1.0, 0.9, 0.01, 0.8, 0.002)
        d = json.loads(p.to_json())
        assert d["depth_thres"] == 0.1 and d["t_err_percent"] == 0.8

    def test_invalid_key_raises_before_evaluating(self):
        def must_not_run(cfg):
            raise AssertionError("evaluated despite bad key")

        with pytest.raises(ValueError, match="unknown sort key"):
            grid_search(evaluate=must_not_run, key="t_err")

    def test_nan_drift_ranks_after_valid_drift(self):
        """A diverged point (NaN drift, tiny ATE) must not outrank a healthy
        config when sorting on drift."""
        def fake_eval(cfg):
            if cfg.robust.depth_thres == 0.1:  # "diverged" point
                return {"ate_m": 0.001, "t_err_percent": float("nan"),
                        "r_err_deg_per_m": float("nan")}
            return {"ate_m": 5.0, "t_err_percent": 2.0,
                    "r_err_deg_per_m": 0.01}

        pts = grid_search(evaluate=fake_eval, depth_thres=(0.1, 0.2),
                          reprojection_thres=(1.0,), shrubbery_weights=(0.9,))
        assert pts[0].depth_thres == 0.2  # valid drift wins
        assert pts[-1].depth_thres == 0.1


class TestYamlConfig:
    LABELS_YAML = ("outlier_labels: [0, 1, 2, 3, 5, 24, 25, 26, -1]\n"
                   "shrubbery_labels: [21, 22, 23]\n"
                   "labels:\n  21: 'vegetation'\n  26: 'car'\n")

    def test_load_label_sets(self, tmp_path):
        from limo_tpu.config import load_label_sets
        p = tmp_path / "labels.yaml"
        p.write_text(self.LABELS_YAML)
        outliers, shrubbery, names = load_label_sets(str(p))
        assert outliers == frozenset({0, 1, 2, 3, 5, 24, 25, 26, -1})
        assert shrubbery == frozenset({21, 22, 23})
        assert names[26] == "car"
        p2 = tmp_path / "bad.yaml"
        p2.write_text("outlier_labels: [1]\n")  # missing shrubbery_labels
        with pytest.raises(ValueError, match="shrubbery_labels not defined"):
            load_label_sets(str(p2))

    def test_default_label_sets_match_reference_table(self, tmp_path):
        """The built-in constants must equal the reference's
        res/outlier_labels.yaml when loaded through the same code path."""
        from limo_tpu.config import load_label_sets
        from limo_tpu.window_manager import (DEFAULT_OUTLIER_LABELS,
                                             DEFAULT_SHRUBBERY_LABELS)
        p = tmp_path / "ref.yaml"
        p.write_text("outlier_labels: [0, 1, 2, 3, 5, 24, 25, 26, 27, 28, "
                     "29, 30, 31, 32, 33, -1]\nshrubbery_labels: [21, 22, 23]\n")
        outliers, shrubbery, _ = load_label_sets(str(p))
        assert outliers == DEFAULT_OUTLIER_LABELS
        assert shrubbery == DEFAULT_SHRUBBERY_LABELS

    def test_config_overlay(self, tmp_path):
        from limo_tpu.config import config_from_yaml
        p = tmp_path / "run.yaml"
        p.write_text("robust:\n  depth_thres: 0.12\n"
                     "window:\n  max_size_optimization_window: 12\n"
                     "landmark_selection:\n  voxel_size_xyz: [0.4, 0.4, 0.2]\n")
        cfg = config_from_yaml(str(p))
        assert cfg.robust.depth_thres == 0.12
        assert cfg.robust.reprojection_thres == 1.6  # untouched default
        assert cfg.window.max_size_optimization_window == 12
        assert cfg.landmark_selection.voxel_size_xyz == (0.4, 0.4, 0.2)

    def test_empty_yaml_files(self, tmp_path):
        from limo_tpu.config import config_from_yaml, load_label_sets
        p = tmp_path / "empty.yaml"
        p.write_text("# nothing here\n")
        with pytest.raises(ValueError, match="outlier_labels not defined"):
            load_label_sets(str(p))
        cfg = config_from_yaml(str(p))          # empty overlay = defaults
        assert cfg.robust.depth_thres == 0.16
        p.write_text("robust:\n")               # group header, no keys
        assert config_from_yaml(str(p)).robust.depth_thres == 0.16

    def test_config_overlay_rejects_unknown(self, tmp_path):
        from limo_tpu.config import config_from_yaml
        p = tmp_path / "bad.yaml"
        p.write_text("robust:\n  not_a_field: 1\n")
        with pytest.raises(ValueError, match="unknown keys"):
            config_from_yaml(str(p))
        p.write_text("nope:\n  x: 1\n")
        with pytest.raises(ValueError, match="unknown config group"):
            config_from_yaml(str(p))


class TestTransformTree:
    def _T(self, yaw=0.0, t=(0, 0, 0)):
        c, s = np.cos(yaw), np.sin(yaw)
        T = np.eye(4)
        T[:2, :2] = [[c, -s], [s, c]]
        T[:3, 3] = t
        return T

    def test_chain_and_inverse(self):
        tree = TransformTree()
        T_ab = self._T(0.3, (1, 2, 0))
        T_bc = self._T(-0.1, (0, 0, 3))
        tree.set_transform("a", "b", T_ab)
        tree.set_transform("b", "c", T_bc)
        np.testing.assert_allclose(tree.lookup("a", "c"), T_ab @ T_bc, atol=1e-12)
        # reversed direction = inverse
        np.testing.assert_allclose(tree.lookup("c", "a") @ (T_ab @ T_bc),
                                   np.eye(4), atol=1e-12)
        np.testing.assert_allclose(tree.lookup("b", "b"), np.eye(4))

    def test_alias_clones_subtree_edge(self):
        """do_aliasing: lookup once, re-register under estimate/ names
        (static_transform_alias.cpp:50-66)."""
        tree = TransformTree()
        tree.set_transform("world", "vehicle", self._T(0.2, (5, 0, 0)))
        tree.set_transform("vehicle", "camera", self._T(0.0, (0.5, 0, 1.2)))
        T = tree.alias("vehicle", "camera", "estimate/vehicle", "estimate/camera")
        np.testing.assert_allclose(
            tree.lookup("estimate/vehicle", "estimate/camera"), T, atol=1e-12)
        # aliased subtree is disconnected from the source tree
        with pytest.raises(TransformLookupError):
            tree.lookup("world", "estimate/camera")

    def test_reverse_rebroadcast_wins(self):
        """Latest set_transform wins even in the opposite orientation."""
        tree = TransformTree()
        T1 = self._T(0.0, (1, 0, 0))
        T2 = self._T(0.0, (0, 99, 0))
        tree.set_transform("a", "b", T1)
        tree.set_transform("b", "a", T2)
        np.testing.assert_allclose(tree.lookup("b", "a"), T2, atol=1e-12)
        np.testing.assert_allclose(tree.lookup("a", "b"), np.linalg.inv(T2),
                                   atol=1e-12)

    def test_non_rigid_edge_inverts_exactly(self):
        tree = TransformTree()
        S = np.diag([2.0, 2.0, 2.0, 1.0])  # scale passes the shape check
        tree.set_transform("a", "b", S)
        np.testing.assert_allclose(tree.lookup("b", "a"),
                                   np.diag([0.5, 0.5, 0.5, 1.0]), atol=1e-12)

    def test_unknown_frame_raises(self):
        tree = TransformTree()
        tree.set_transform("a", "b", np.eye(4))
        with pytest.raises(TransformLookupError):
            tree.lookup("a", "zz")


class TestFlowImage:
    def test_dots_drawn_and_colored(self):
        ba = build_ba()
        img = flow_image(ba, shape=(600, 1300))
        assert img.shape == (600, 1300, 3) and img.dtype == np.uint8
        lit = np.flatnonzero(img.any(-1))
        n_meas = int(ba._obs_mask[:, ba._kf_order, 0].sum())
        assert lit.size > 0
        # each measurement stamps <= 5 pixels
        assert lit.size <= 5 * n_meas
        # deterministic: same window → same image
        np.testing.assert_array_equal(img, flow_image(ba, shape=(600, 1300)))

    def test_out_of_bounds_features_clipped(self):
        ba = build_ba()
        ba._obs[:, :, 0, 0] += 1e5  # push u far out of frame
        img = flow_image(ba, shape=(100, 200))
        assert not img.any()

    def test_fused_grid_sweeps_shrubbery(self):
        """The third reference sweep dimension (shrubbery_weight,
        res/tune_parameters_kitti.py:3-17) flows through the scan step's
        label channel as a traced scalar: different weights must produce
        different trajectories on a world with noisy vegetation."""
        from limo_tpu.pipeline.tuning import grid_search_fused
        pts = grid_search_fused(depth_thres=(0.16,),
                                reprojection_thres=(1.6,),
                                shrubbery_weights=(1.0, 0.2),
                                num_frames=30, landmark_rows=256)
        assert len(pts) == 2
        assert {p.shrubbery_weight for p in pts} == {1.0, 0.2}
        assert all(np.isfinite(p.ate) for p in pts)
        assert pts[0].ate != pts[1].ate
