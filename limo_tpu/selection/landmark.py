"""Landmark selection schemes as pure device-side mask functions.

Reference: ``keyframe_bundle_adjustment`` selection stack
(``landmark_selector.hpp:118-253`` 3-phase pattern:
rejection → selection(force-include) → sparsification; union at the end).

TPU re-design: every scheme takes the Window (+ per-landmark features) and
returns boolean masks / category codes over the fixed [L] axis. "Choosing K
of N" becomes masked top-k; "voxel-grid downsampling" becomes a quantize +
sort-based unique; "random shuffle take N" becomes top-k over hashed scores.
No data-dependent shapes anywhere.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import pose as pose_ops
from ..state import Window

# category codes
CAT_NONE = -1
CAT_NEAR = 0
CAT_MIDDLE = 1
CAT_FAR = 2


# ---------------------------------------------------------------------------
# Rejection schemes
# ---------------------------------------------------------------------------

def cheirality_mask(window: Window, rig) -> jnp.ndarray:
    """``LandmarkRejectionSchemeCheirality``
    (landmark_selection_scheme_cheirality.cpp:22-60): a landmark survives iff
    it projects with z>0 in every observing camera of every active keyframe.

    Returns keep-mask [L].
    """
    L, K, C = window.L, window.K, window.C
    # point in camera frame for every (l,k,c)
    p_kf = jax.vmap(lambda p: pose_ops.apply(p, window.lm_pos))(window.poses)  # [K,L,3]
    p_cam = jax.vmap(  # over C
        lambda tcv: jax.vmap(lambda pk: pose_ops.apply(tcv, pk))(p_kf)
    )(rig.T_cam_veh.astype(window.lm_pos.dtype))  # [C,K,L,3]
    z = jnp.moveaxis(p_cam[..., 2], 0, -1)  # [K,L,C] -> want [L,K,C]
    z = jnp.moveaxis(z, 0, 1)
    relevant = window.obs_mask & window.kf_valid[None, :, None]
    bad = relevant & (z <= 0)
    return ~jnp.any(bad, axis=(1, 2))


def dimension_plausibility_mask(window: Window, newest_kf: jnp.ndarray,
                                min_xyz, max_xyz) -> jnp.ndarray:
    """``LandmarkRejectionSchemeDimensionPlausibility``
    (landmark_selection_scheme_dimension_plausibility.hpp:33-76): landmark in
    the newest keyframe's frame must lie inside [min,max] box."""
    p = pose_ops.apply(window.poses[newest_kf], window.lm_pos)
    lo = jnp.asarray(min_xyz, p.dtype)
    hi = jnp.asarray(max_xyz, p.dtype)
    return jnp.all((p >= lo) & (p <= hi), axis=-1)


# ---------------------------------------------------------------------------
# Helpers (landmark_selection_scheme_helpers.cpp)
# ---------------------------------------------------------------------------

def track_lengths(window: Window) -> jnp.ndarray:
    """Number of (valid-keyframe) observations per landmark [L]."""
    m = window.obs_mask & window.kf_valid[None, :, None]
    return jnp.sum(m.astype(jnp.int32), axis=(1, 2))


def landmark_flow(window: Window, kf_a: jnp.ndarray, kf_b: jnp.ndarray) -> jnp.ndarray:
    """Per-landmark flow between two keyframes: max over cameras of pixel
    displacement (``calcFlow``, landmark_selection_scheme_helpers.cpp:14-231
    computes max per-cam mean flow between consecutive keyframes; per-landmark
    it is the feature displacement)."""
    uv_a = window.obs[:, kf_a, :, :2]
    uv_b = window.obs[:, kf_b, :, :2]
    ok = window.obs_mask[:, kf_a, :] & window.obs_mask[:, kf_b, :]
    d = jnp.linalg.norm(uv_a - uv_b, axis=-1)
    return jnp.max(jnp.where(ok, d, 0.0), axis=-1), jnp.any(ok, axis=-1)


def _masked_topk_mask(scores: jnp.ndarray, mask: jnp.ndarray, k: int) -> jnp.ndarray:
    """Boolean mask of the top-k scoring entries among ``mask`` (ties broken
    by index). Fixed-shape replacement for sort-and-take-N."""
    neg = jnp.finfo(scores.dtype).min
    s = jnp.where(mask, scores, neg)
    if k >= scores.shape[0]:
        return mask
    kth = jnp.sort(s)[-k]
    sel = mask & (s >= kth)
    # tie overflow guard: keep at most k by cumulative count
    order = jnp.argsort(-s)
    rank = jnp.zeros_like(order).at[order].set(jnp.arange(s.shape[0]))
    return sel & (rank < k)


def _hash_u32(x: jnp.ndarray) -> jnp.ndarray:
    """Cheap integer hash (xorshift-multiply) for pseudo-random choice."""
    x = x.astype(jnp.uint32)
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


# ---------------------------------------------------------------------------
# Voxel sparsification + categorization (the production scheme)
# ---------------------------------------------------------------------------

class VoxelResult(NamedTuple):
    selected: jnp.ndarray   # [L] bool
    category: jnp.ndarray   # [L] int32 (CAT_*)


def _dist_to_path(points: jnp.ndarray, path: jnp.ndarray, path_valid: jnp.ndarray):
    """Min distance of each point to the polyline through path vertices.

    points [L,3], path [K,3] (positions of active keyframes in the current
    keyframe frame), path_valid [K]. Replaces boost::geometry distance to
    linestring (landmark_selection_scheme_voxel.cpp:96-113).
    """
    a = path[:-1]          # [K-1,3]
    b = path[1:]
    seg_ok = path_valid[:-1] & path_valid[1:]
    ab = b - a
    denom = jnp.maximum(jnp.sum(ab * ab, axis=-1), 1e-12)  # [K-1]
    ap = points[:, None, :] - a[None, :, :]                # [L,K-1,3]
    t = jnp.clip(jnp.sum(ap * ab[None], axis=-1) / denom[None], 0.0, 1.0)
    proj = a[None] + t[..., None] * ab[None]
    d_seg = jnp.linalg.norm(points[:, None, :] - proj, axis=-1)   # [L,K-1]
    d_seg = jnp.where(seg_ok[None], d_seg, jnp.inf)
    # degenerate: single valid vertex → distance to that vertex
    d_vert = jnp.linalg.norm(points[:, None, :] - path[None], axis=-1)
    d_vert = jnp.where(path_valid[None], d_vert, jnp.inf)
    return jnp.minimum(jnp.min(d_seg, axis=1), jnp.min(d_vert, axis=1))


def voxel_scheme(window: Window, newest_kf: jnp.ndarray, candidates: jnp.ndarray,
                 cfg, last_kf=None) -> VoxelResult:
    """``LandmarkSparsificationSchemeVoxel``
    (landmark_selection_scheme_voxel.cpp:37-233):

      1. landmarks → current-keyframe frame; z-passthrough [-20,100]
         (outside ⇒ dropped entirely)
      2. distance-to-trajectory > roi_far ⇒ far bin; else middle candidates
      3. voxel-grid downsample middle candidates (one representative/voxel)
      4. of the survivors, distance < roi_middle ⇒ near bin, else middle bin
      5. caps: near = top flow, middle = pseudo-random, far = longest tracks
    """
    ls = cfg.landmark_selection
    dtype = window.lm_pos.dtype
    cur_pose = window.poses[newest_kf]
    p = pose_ops.apply(cur_pose, window.lm_pos)       # [L,3] current-kf frame

    z_ok = (p[..., 2] >= ls.z_range[0]) & (p[..., 2] <= ls.z_range[1])
    alive = candidates & window.lm_valid & z_ok

    # trajectory path: active keyframe positions in current-kf frame
    kf_pos_origin = jax.vmap(lambda q: pose_ops.translation(pose_ops.inverse(q)))(window.poses)
    path = pose_ops.apply(cur_pose, kf_pos_origin)    # [K,3]
    dist = _dist_to_path(p, path, window.kf_valid)

    # roi_*_xyz[0] as a SCALAR distance-to-path threshold is the reference's
    # actual behavior: getCategorizedSelection passes params_.roi_far_xyz[0]
    # / roi_middle_xyz[0] to filterPipe (landmark_selection_scheme_voxel.cpp
    # :162,:171), a boost::geometry point-to-linestring distance test. The
    # per-axis box filter (filterXYZ, :49-91) exists in that file but has NO
    # caller — y/z ROI components are dead parameters upstream too.
    far_thres = jnp.asarray(ls.roi_far_xyz[0], dtype)
    mid_thres = jnp.asarray(ls.roi_middle_xyz[0], dtype)
    far_mask = alive & (dist >= far_thres)
    mid_cand = alive & (dist < far_thres)

    # --- voxel dedup of middle candidates (fixed-grid hash + sort-unique) ---
    vx = jnp.asarray(ls.voxel_size_xyz, dtype)
    cell = jnp.floor(p / vx).astype(jnp.int32) + 1_000_00  # offset to positive
    # uint32 spatial hash (wraparound is defined): works with or without
    # x64. The low bit is cleared so the all-ones sentinel is unreachable
    # by any real cell (costs 1 of 32 hash bits; collisions stay ~L²/2³¹).
    key = (cell[:, 0].astype(jnp.uint32) * jnp.uint32(73856093)
           ^ cell[:, 1].astype(jnp.uint32) * jnp.uint32(19349663)
           ^ cell[:, 2].astype(jnp.uint32) * jnp.uint32(83492791)) \
        & jnp.uint32(0xFFFFFFFE)
    sentinel = jnp.uint32(0xFFFFFFFF)
    key = jnp.where(mid_cand, key, sentinel)
    order = jnp.argsort(key)
    sorted_key = key[order]
    first = jnp.concatenate([jnp.array([True]),
                             sorted_key[1:] != sorted_key[:-1]])
    rep_sorted = first & (sorted_key != sentinel)
    rep = jnp.zeros_like(mid_cand).at[order].set(rep_sorted)

    near_mask = rep & (dist < mid_thres)
    middle_mask = rep & (dist >= mid_thres)

    # --- caps ---
    if last_kf is None:  # fall back to slot adjacency (time-ordered slots)
        last_kf = jnp.maximum(newest_kf - 1, 0)
    flow, _ = landmark_flow(window, newest_kf, last_kf)
    near_sel = _masked_topk_mask(flow, near_mask, ls.max_number_landmarks_near_bin)
    rand_scores = _hash_u32(jnp.arange(window.L) + window.lm_id).astype(dtype)
    middle_sel = _masked_topk_mask(rand_scores, middle_mask,
                                   ls.max_number_landmarks_middle_bin)
    tl = track_lengths(window).astype(dtype)
    far_sel = _masked_topk_mask(tl, far_mask, ls.max_number_landmarks_far_bin)

    selected = near_sel | middle_sel | far_sel
    category = jnp.full((window.L,), CAT_NONE, jnp.int32)
    category = jnp.where(far_sel, CAT_FAR, category)
    category = jnp.where(middle_sel, CAT_MIDDLE, category)
    category = jnp.where(near_sel, CAT_NEAR, category)
    return VoxelResult(selected=selected, category=category)


# ---------------------------------------------------------------------------
# Observability sparsification (mono fallback scheme)
# ---------------------------------------------------------------------------

def observability_scheme(window: Window, newest_kf: jnp.ndarray,
                         candidates: jnp.ndarray, cfg,
                         bin_bounds=(0.4, 0.2), last_kf=None) -> VoxelResult:
    """``LandmarkSparsificationSchemeObservability``
    (landmark_selection_scheme_observability.cpp:52-169): bin landmarks
    near/middle/far by flow relative to the maximum flow (bounds 0.4/0.2 of
    max); near = biggest flow, middle = pseudo-random, far = longest track."""
    ls = cfg.landmark_selection
    dtype = window.lm_pos.dtype
    alive = candidates & window.lm_valid
    if last_kf is None:
        last_kf = jnp.maximum(newest_kf - 1, 0)
    flow, has_flow = landmark_flow(window, newest_kf, last_kf)
    max_flow = jnp.max(jnp.where(alive & has_flow, flow, 0.0))
    hi = bin_bounds[0] * max_flow
    lo = bin_bounds[1] * max_flow
    near_mask = alive & has_flow & (flow > hi)
    far_mask = alive & (~has_flow | (flow < lo))
    middle_mask = alive & ~near_mask & ~far_mask

    near_sel = _masked_topk_mask(flow, near_mask, ls.max_number_landmarks_near_bin)
    rand_scores = _hash_u32(jnp.arange(window.L) + window.lm_id).astype(dtype)
    middle_sel = _masked_topk_mask(rand_scores, middle_mask,
                                   ls.max_number_landmarks_middle_bin)
    tl = track_lengths(window).astype(dtype)
    far_sel = _masked_topk_mask(tl, far_mask, ls.max_number_landmarks_far_bin)

    selected = near_sel | middle_sel | far_sel
    category = jnp.full((window.L,), CAT_NONE, jnp.int32)
    category = jnp.where(far_sel, CAT_FAR, category)
    category = jnp.where(middle_sel, CAT_MIDDLE, category)
    category = jnp.where(near_sel, CAT_NEAR, category)
    return VoxelResult(selected=selected, category=category)


# ---------------------------------------------------------------------------
# Random sparsification + AddDepth force-include
# ---------------------------------------------------------------------------

def random_scheme(window: Window, candidates: jnp.ndarray, n: int,
                  seed: int = 0) -> jnp.ndarray:
    """``LandmarkSparsificationSchemeRandom``
    (landmark_selection_scheme_random.cpp:13-31): shuffle, take N."""
    scores = _hash_u32(jnp.arange(window.L) + seed).astype(jnp.float32)
    return _masked_topk_mask(scores, candidates & window.lm_valid, n)


def add_depth_scheme(window: Window, selected: jnp.ndarray,
                     comparator_mask: jnp.ndarray, n_per_frame: int,
                     newest_kf=None) -> jnp.ndarray:
    """``LandmarkSelectionSchemeAddDepth``
    (landmark_selection_scheme_add_depth.cpp:16-86): per window frame, ensure
    ``n_per_frame`` landmarks satisfying the comparator (e.g. is_ground_plane
    or has_measured_depth) are selected, preferring smallest distance to the
    keyframe (Sorter). Force-include on top of ``selected``."""
    K = window.K
    dtype = window.lm_pos.dtype
    out = selected
    # distance of each landmark to each keyframe [L,K]
    kf_pos = jax.vmap(lambda q: pose_ops.translation(pose_ops.inverse(q)))(window.poses)
    d = jnp.linalg.norm(window.lm_pos[:, None, :] - kf_pos[None], axis=-1)
    obs_at = jnp.any(window.obs_mask, axis=-1)  # [L,K]
    for k in range(K):
        cand = (window.lm_valid & comparator_mask & obs_at[:, k]
                & window.kf_valid[k])
        # prefer nearest (top-k of negative distance)
        extra = _masked_topk_mask(-d[:, k], cand, n_per_frame)
        out = out | extra
    return out
