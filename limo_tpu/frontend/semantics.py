"""Semantic label attachment — the ``matches_conversion_ros_tool`` +
``image_preproc`` label path.

Reference contract (``launch/semantic_labels.launch:10-36``): the label image
is dilated with half_kernel_size 8 (outlier classes grow to be conservative),
then each feature samples a 3×3 ROI and attaches the label to its track.
Label semantics come from ``res/outlier_labels.yaml``: outliers =
{0,1,2,3,5,24..33,−1} (dynamic objects / sky), shrubbery = {21,22,23},
ground = road-ish classes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..window_manager import (DEFAULT_GROUND_LABELS, DEFAULT_OUTLIER_LABELS,
                              DEFAULT_SHRUBBERY_LABELS)


@partial(jax.jit, static_argnames=("half_kernel",))
def dilate_labels(label_img, priority_mask, half_kernel: int = 8):
    """Grow priority classes (outliers) by a (2k+1)² max-window so features
    near dynamic-object borders inherit the outlier label.

    label_img [H,W] int32; priority_mask [H,W] bool (pixels whose label
    should expand). Returns the dilated label image."""
    k = 2 * half_kernel + 1
    # propagate (priority, label) pairs with a max-reduce on packed keys
    # int32 packing (labels are small class ids): works with or without x64
    packed = jnp.where(priority_mask,
                       (label_img.astype(jnp.int32) + 1) << 1 | 1,
                       jnp.int32(0))
    grown = jax.lax.reduce_window(packed, jnp.int32(0), jax.lax.max,
                                  (k, k), (1, 1), "SAME")
    has = grown > 0
    grown_label = ((grown >> 1) - 1).astype(label_img.dtype)
    return jnp.where(has, grown_label, label_img)


@jax.jit
def sample_labels(label_img, uv):
    """Majority label in the 3×3 ROI around each feature
    (semantic_labels.launch ROI sampling). uv [N,2] pixel coords."""
    H, W = label_img.shape
    iu = jnp.clip(uv[:, 0].astype(jnp.int32), 1, W - 2)
    iv = jnp.clip(uv[:, 1].astype(jnp.int32), 1, H - 2)
    offs = jnp.array([(dx, dy) for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
                     jnp.int32)
    roi = label_img[iv[:, None] + offs[None, :, 1],
                    iu[:, None] + offs[None, :, 0]]          # [N,9]
    # mode of 9 values via pairwise count
    counts = jnp.sum(roi[:, :, None] == roi[:, None, :], -1)
    best = jnp.argmax(counts, -1)
    return jnp.take_along_axis(roi, best[:, None], 1)[:, 0]


def attach_labels(tracklets, label_img: np.ndarray, half_kernel: int = 8,
                  outlier_labels=DEFAULT_OUTLIER_LABELS):
    """Dilate outlier classes, sample per-feature labels at the newest stamp,
    attach to tracks (host wrapper). Returns a new Tracklets."""
    from ..pipeline.tracklets import Tracklets

    li = jnp.asarray(label_img, jnp.int32)
    prio = jnp.isin(li, jnp.asarray(sorted(outlier_labels), jnp.int32))
    dilated = dilate_labels(li, prio, half_kernel)
    m = tracklets.mask[:, 0]
    uv = jnp.asarray(tracklets.uvd[:, 0, :2])
    labels = np.asarray(sample_labels(dilated, uv))
    new_label = tracklets.label.copy()
    new_label[m] = labels[m]
    return Tracklets(stamps=tracklets.stamps, uvd=tracklets.uvd,
                     mask=tracklets.mask, ids=tracklets.ids, age=tracklets.age,
                     is_outlier=tracklets.is_outlier, label=new_label)
