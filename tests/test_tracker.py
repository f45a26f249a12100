"""Feature tracker tests: detection localization, matching under shift, and
track maintenance — the viso2-equivalent contract
(res/config_feature_matching.yaml)."""

import jax.numpy as jnp
import numpy as np

from limo_tpu.frontend.tracker import (FeatureTracker, TrackerConfig, detect,
                                       match)


def render_dots(dots, H=240, W=320, sigma=1.5):
    """Gaussian blobs at given (u,v) positions on a dark background."""
    img = np.zeros((H, W), np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    for u, v in dots:
        img += np.exp(-((xx - u) ** 2 + (yy - v) ** 2) / (2 * sigma ** 2))
    return np.clip(img, 0, 1)


def checkerboard(H=240, W=320, cell=16):
    yy, xx = np.mgrid[0:H, 0:W]
    return (((yy // cell) + (xx // cell)) % 2).astype(np.float32)


class TestDetect:
    def test_finds_corners(self, rng):
        dots = rng.uniform(30, 200, (40, 2))
        img = render_dots(dots)
        cfg = TrackerConfig(max_features=128)
        f = detect(jnp.asarray(img), cfg)
        n = int(f.valid.sum())
        assert n >= 30, n
        # every strong detection lies near a true dot
        uv = np.asarray(f.uv)[np.asarray(f.valid)]
        d = np.linalg.norm(uv[:, None] - dots[None], axis=-1).min(1)
        assert np.median(d) < 2.0, np.median(d)

    def test_blank_image(self):
        f = detect(jnp.zeros((240, 320), jnp.float32), TrackerConfig())
        assert int(f.valid.sum()) == 0

    def test_nms_separation(self, rng):
        img = checkerboard()
        cfg = TrackerConfig(max_features=256, nms_radius=9)
        f = detect(jnp.asarray(img), cfg)
        uv = np.asarray(f.uv)[np.asarray(f.valid)]
        if uv.shape[0] > 1:
            d = np.linalg.norm(uv[:, None] - uv[None], axis=-1)
            np.fill_diagonal(d, np.inf)
            assert d.min() >= cfg.nms_radius - 1


class TestMatch:
    def test_matches_under_shift(self, rng):
        dots = rng.uniform(40, 180, (50, 2))
        shift = np.array([6.0, 3.0])
        img0 = render_dots(dots)
        img1 = render_dots(dots + shift)
        cfg = TrackerConfig(max_features=128)
        f0 = detect(jnp.asarray(img0), cfg)
        f1 = detect(jnp.asarray(img1), cfg)
        m = match(f1, f0, cfg)
        n = int(m.n_matches)
        assert n >= 25, n
        # matched flows equal the shift
        pm = np.asarray(m.prev_index)
        sel = pm >= 0
        flow = np.asarray(f1.uv)[sel] - np.asarray(f0.uv)[pm[sel]]
        np.testing.assert_allclose(np.median(flow, 0), shift, atol=1.0)

    def test_no_false_matches_on_disjoint(self, rng):
        img0 = render_dots(rng.uniform(30, 100, (20, 2)))
        img1 = render_dots(rng.uniform(150, 290, (20, 2)) % [290, 200] + 10)
        cfg = TrackerConfig(max_features=64)
        f0 = detect(jnp.asarray(img0), cfg)
        f1 = detect(jnp.asarray(img1), cfg)
        m = match(f1, f0, cfg)
        # disjoint dot sets: most "matches" must be rejected
        assert int(m.n_matches) <= 8


class TestFeatureTracker:
    def test_tracks_across_frames(self, rng):
        dots = rng.uniform(40, 180, (40, 2))
        tr = FeatureTracker(TrackerConfig(max_features=128))
        for i in range(5):
            img = render_dots(dots + i * np.array([4.0, 2.0]))
            tr.process(0.1 * i, img)
        tl = tr.tracklets()
        assert tl.num_stamps == 5
        long_tracks = (tl.mask.sum(1) >= 4).sum()
        assert long_tracks >= 20, long_tracks
        # track motion matches the synthetic shift (newest-first stamps)
        row = np.flatnonzero(tl.mask.sum(1) == 5)[0]
        uv = tl.uvd[row, :, :2]
        step = uv[0] - uv[1]  # newest minus previous
        np.testing.assert_allclose(step, [4.0, 2.0], atol=1.0)

    def test_depth_hook(self, rng):
        dots = rng.uniform(40, 180, (20, 2))
        tr = FeatureTracker(TrackerConfig(max_features=64))
        tr.process(0.0, render_dots(dots), depth_fn=lambda uv: np.full(len(uv), 5.0))
        tl = tr.tracklets()
        d = tl.uvd[tl.mask[:, 0], 0, 2]
        assert (d == 5.0).all()
