"""Native runtime tests: velodyne reader parity with numpy and the C++
track-table engine parity with the Python TrackletBuilder."""

import os

import numpy as np
import pytest

from limo_tpu.io import native_loader
from limo_tpu.pipeline.tracklets import TrackletBuilder

HAVE_NATIVE = native_loader.get_lib() is not None

pytestmark = pytest.mark.skipif(not HAVE_NATIVE,
                                reason="native library not built")


class TestVelodyne:
    def test_read_matches_numpy(self, tmp_path, rng):
        pts = rng.normal(size=(1234, 4)).astype(np.float32)
        p = tmp_path / "000000.bin"
        pts.tofile(p)
        out = native_loader.read_velodyne(str(p))
        np.testing.assert_array_equal(out, pts)

    def test_batch(self, tmp_path, rng):
        paths = []
        ref = []
        for i in range(5):
            pts = rng.normal(size=(100 + 50 * i, 4)).astype(np.float32)
            p = tmp_path / f"{i:06d}.bin"
            pts.tofile(p)
            paths.append(str(p))
            ref.append(pts)
        out, counts = native_loader.read_velodyne_batch(paths, 512)
        for i in range(5):
            assert counts[i] == ref[i].shape[0]
            np.testing.assert_array_equal(out[i, : counts[i]], ref[i])
            assert (out[i, counts[i]:] == 0).all()


class TestTrackTable:
    def _run_both(self, frames):
        py = TrackletBuilder(max_track_length=10)
        nat = native_loader.NativeTrackTable(max_track_length=10)
        for stamp, uv, pm, d in frames:
            py.push_frame(stamp, uv, pm, d)
            nat.push_frame(stamp, uv, pm, d)
        return py.to_tracklets(), nat.to_tracklets()

    def test_parity_simple(self, rng):
        uv0 = rng.uniform(0, 100, (5, 2))
        uv1 = uv0 + 2.0
        frames = [
            (0.0, uv0, None, None),
            (0.1, uv1, np.arange(5), None),
        ]
        t_py, t_nat = self._run_both(frames)
        assert t_nat.num_tracks == t_py.num_tracks == 5
        assert t_nat.num_stamps == 2
        np.testing.assert_allclose(sorted(t_nat.stamps), sorted(t_py.stamps))
        # same uvd content for matching ids
        for tid in t_py.ids:
            r_py = np.flatnonzero(t_py.ids == tid)[0]
            r_nat = np.flatnonzero(t_nat.ids == tid)[0]
            np.testing.assert_allclose(t_nat.uvd[r_nat, :, :2],
                                       t_py.uvd[r_py, :, :2], atol=1e-5)
            np.testing.assert_array_equal(t_nat.mask[r_nat], t_py.mask[r_py])

    def test_track_continuation_and_birth(self, rng):
        uv0 = rng.uniform(0, 100, (4, 2))
        uv1 = np.vstack([uv0[1:3] + 1.0, rng.uniform(0, 100, (2, 2))])
        pm1 = np.array([1, 2, -1, -1])
        t_py, t_nat = self._run_both([
            (0.0, uv0, None, None), (0.1, uv1, pm1, None)])
        assert t_nat.num_tracks == t_py.num_tracks == 6
        # continued tracks have 2 observations
        assert int((t_nat.mask.sum(1) == 2).sum()) == 2

    def test_depth_passthrough(self, rng):
        uv = rng.uniform(0, 100, (3, 2))
        d = np.array([1.5, -1.0, 3.0])
        _, t_nat = self._run_both([(0.0, uv, None, d)])
        got = np.sort(t_nat.uvd[:, 0, 2])
        np.testing.assert_allclose(got, [-1.0, 1.5, 3.0], atol=1e-6)

    def test_window_gc(self, rng):
        nat = native_loader.NativeTrackTable(max_track_length=3)
        for i in range(6):
            uv = rng.uniform(0, 100, (2, 2))
            nat.push_frame(0.1 * i, uv, None, None)  # all new tracks
        tl = nat.to_tracklets()
        assert tl.num_stamps == 3
        # tracks older than the window were collected
        assert tl.num_tracks == 6  # 2 per frame × last 3 frames
