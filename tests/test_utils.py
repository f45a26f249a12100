"""Aux subsystem tests: checkpoint/resume, map dump, exporters, timers."""

import json
import os

import jax.numpy as jnp
import numpy as np

from limo_tpu.config import LimoConfig
from limo_tpu.geometry.camera import CameraRig
from limo_tpu.utils import (StageTimer, accumulate_map, dump_map,
                            export_landmarks, export_paths, export_planes,
                            load_adjuster, save_adjuster, write_ply)
from limo_tpu.window_manager import FIX_NONE, FIX_POSE, BundleAdjuster

from test_window_manager import make_sequence, project_tracklets, RIG, DT


def build_ba(n_kf=3):
    poses, lms, stamps = make_sequence(n_kf)
    ba = BundleAdjuster(RIG, LimoConfig(), DT)
    for k in range(n_kf):
        tl = project_tracklets(poses[: k + 1], lms, stamps[: k + 1])
        ba.push(stamps[k], tl, poses[k], FIX_POSE if k == 0 else FIX_NONE)
    return ba


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        ba = build_ba()
        p = str(tmp_path / "ckpt.npz")
        save_adjuster(ba, p)
        ba2 = BundleAdjuster(RIG, LimoConfig(), DT)
        load_adjuster(ba2, p)
        assert ba2._kf_order == ba._kf_order
        np.testing.assert_array_equal(ba2._poses, ba._poses)
        np.testing.assert_array_equal(ba2._obs_mask, ba._obs_mask)
        assert ba2._lm_slot == ba._lm_slot
        # resumed adjuster is functional
        ba2.deactivate_keyframes()
        info = ba2.solve()
        assert np.isfinite(float(info.final_cost))

    def test_dump_map(self, tmp_path):
        ba = build_ba()
        p = str(tmp_path / "map.json")
        dump_map(ba, p)
        data = json.load(open(p))
        assert len(data["keyframes"]) == 3
        assert len(data["landmarks"]) > 0


class TestExporters:
    def test_ply_and_paths(self, tmp_path):
        ba = build_ba()
        n = export_landmarks(ba, str(tmp_path / "lms.ply"))
        assert n > 0
        txt = open(tmp_path / "lms.ply").read()
        assert txt.startswith("ply") and f"element vertex {n}" in txt
        export_paths(ba, str(tmp_path / "paths.json"))
        paths = json.load(open(tmp_path / "paths.json"))
        assert len(paths["active"]) == 3
        export_planes(ba, str(tmp_path / "planes.json"))
        planes = json.load(open(tmp_path / "planes.json"))
        assert len(planes) == 3

    def test_accumulate_map(self, tmp_path, rng):
        poses = np.tile(np.eye(4), (3, 1, 1))
        poses[:, 0, 3] = np.arange(3) * 2.0
        clouds = [rng.uniform(-1, 1, (100, 3)) for _ in range(3)]
        n = accumulate_map(poses, clouds, np.eye(4), str(tmp_path / "map.ply"),
                           voxel=0.25)
        assert n > 100  # scans at different offsets accumulate


class TestStageTimer:
    def test_accumulates(self):
        t = StageTimer()
        with t.stage("a"):
            pass
        with t.stage("a"):
            pass
        with t.stage("b"):
            pass
        assert t.counts["a"] == 2 and t.counts["b"] == 1
        assert "a:" in t.report()


class TestColorByIndex:
    """Mirror of get_color(ID, NumColors) (color_by_index_hsv.hpp:29-42)."""

    def test_deterministic_and_distinct(self):
        from limo_tpu.utils.viz import color_by_index_hsv
        ids = np.arange(0, 17)
        c1 = color_by_index_hsv(ids)
        c2 = color_by_index_hsv(ids)
        np.testing.assert_array_equal(c1, c2)
        # id 0 sentinel (reference BGR(123,22,234))
        np.testing.assert_array_equal(c1[0], [234, 22, 123])
        # 16 hue slots distinct
        assert len({tuple(c) for c in c1[1:]}) == 16
        # wraps modulo num_colors: id 17 == id 1
        np.testing.assert_array_equal(color_by_index_hsv([17])[0], c1[1])
        assert c1.min() >= 0 and c1.max() <= 255
