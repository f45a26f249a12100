"""Semantic label path tests (contract: semantic_labels.launch — dilation
half_kernel 8 + 3×3 ROI sampling; label tables res/outlier_labels.yaml)."""

import jax.numpy as jnp
import numpy as np

from limo_tpu.frontend.semantics import attach_labels, dilate_labels, sample_labels
from limo_tpu.pipeline.tracklets import Tracklets


def make_tracklets(uv):
    n = uv.shape[0]
    uvd = np.zeros((n, 1, 3))
    uvd[:, 0, :2] = uv
    uvd[:, 0, 2] = -1
    return Tracklets(stamps=np.array([0.0]), uvd=uvd, mask=np.ones((n, 1), bool),
                     ids=np.arange(n, dtype=np.int64),
                     age=np.ones(n, np.int32),
                     is_outlier=np.zeros(n, bool),
                     label=np.full(n, -2, np.int32))


class TestDilate:
    def test_outlier_grows(self):
        img = np.full((64, 64), 7, np.int32)      # road everywhere
        img[30:34, 30:34] = 26                    # car blob (outlier class)
        prio = jnp.asarray(img == 26)
        out = np.asarray(dilate_labels(jnp.asarray(img), prio, 8))
        # the car label has grown by the half kernel
        assert out[25, 30] == 26 and out[30, 25] == 26
        assert out[10, 10] == 7                   # far pixels untouched

    def test_no_priority_noop(self):
        img = np.random.default_rng(0).integers(0, 20, (32, 32)).astype(np.int32)
        out = np.asarray(dilate_labels(jnp.asarray(img),
                                       jnp.zeros((32, 32), bool), 8))
        np.testing.assert_array_equal(out, img)


class TestSample:
    def test_majority(self):
        img = np.full((32, 32), 7, np.int32)
        img[10, 10] = 26  # single stray pixel
        lab = np.asarray(sample_labels(jnp.asarray(img),
                                       jnp.asarray([[10.0, 10.0]])))
        assert lab[0] == 7  # 8 of 9 ROI pixels are road


class TestAttach:
    def test_labels_attached(self):
        img = np.full((64, 64), 7, np.int32)
        img[:, 40:] = 21                         # vegetation on the right
        uv = np.array([[10.0, 30.0], [60.0, 30.0]])
        tl = make_tracklets(uv)
        out = attach_labels(tl, img)
        assert out.label[0] == 7
        assert out.label[1] == 21
