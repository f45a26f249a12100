"""Lidar → per-feature depth estimation.

Re-implements the external ``monolidar_fusion``/``tracklets_depth`` component
whose behavior is pinned by the reference's config
(``demo_keyframe_bundle_adjustment_meta/res/mono_lidar_fusion_parameters.yaml``):

  1. project the cloud into the image (cut points behind the camera)
  2. per feature: select neighbor lidar points in a 6×9 px rectangle
     (``pixelarea_search_witdh/height``), minimum 3
  3. histogram-segment neighbor depths (bin 0.3 m) and keep the nearest
     maximal bin — isolates the foreground object
  4. fit a local patch by *triangle size maximization* (pick the 3 segment
     points spanning the largest triangle; planarity + view-ray
     orthogonality checks) — the reference default
     (``do_use_triangle_size_maximation: 1``)
  5. intersect the feature's viewing ray with the patch plane → depth
  6. global threshold [0, 100] m + local threshold vs the segment's depth
     range (relative 0.5)

Ground features instead intersect the RANSAC ground plane
(:mod:`limo_tpu.frontend.groundplane`, spec: z ∈ [−3.5, −1] band, 0.2 m
threshold, 600 iterations, refinement).

TPU design: neighbor search is a fixed pixel-grid bucketing (sort by cell id
+ capped gather from 3×3 cells) — no kd-tree, no dynamic shapes; the
triangle search enumerates all C(K,3) index triples as one vmapped argmax.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from ..utils.eig3 import smallest_eigvec3
from ..utils.precision import highest_matmul
import numpy as np


@dataclass(frozen=True)
class LidarDepthConfig:
    """Mirrors mono_lidar_fusion_parameters.yaml (values cited inline)."""

    search_width: float = 6.0         # pixelarea_search_witdh
    search_height: float = 9.0        # pixelarea_search_height
    min_neighbors: int = 3            # radiusSearch_count_min
    hist_bin_width: float = 0.3       # histogram_segmentation_bin_witdh
    hist_min_count: int = 1           # histogram_segmentation_min_pointcount
    depth_min: float = 0.0            # treshold_depth_min
    depth_max: float = 100.0          # treshold_depth_max
    local_thres_rel: float = 0.5      # treshold_depth_local_value (relative)
    crossnorm_thres: float = 0.1      # triangleplanar_crossnorm_treshold
    viewray_ortho_thres: float = 0.1  # viewray_plane_orthoganality_treshold
    max_neighbors: int = 24           # static cap (rect holds ~8 KITTI points)
    grid_cell_px: int = 8             # bucket grid cell size
    points_per_cell: int = 16         # static per-cell cap
    # ---- neighbor selection mode (neighbor_search_mode: 0 rect / 1 kd-tree
    # radius search; the TPU build uses the same pixel-grid bucketing for
    # both — a radius predicate replaces the kd-tree) -----------------------
    neighbor_mode: str = "rect"       # "rect" | "radius"
    radius_px: float = 10.0           # radiusSearch_radius (px, radius mode)
    # ---- local patch estimator (do_use_triangle_size_maximation default;
    # do_use_PCA alternative with eigenvalue-shape gates) -------------------
    patch_mode: str = "triangle"      # "triangle" | "pca"
    pca_abs_min: float = 0.005        # pca_treshold_3_abs_min
    pca_rel_32_max: float = 15.0      # pca_treshold_3_2_rel_max
    pca_rel_21_min: float = 1.5       # pca_treshold_2_1_rel_min
    # ---- segmentation variant (do_use_histogram_segmentation default;
    # do_use_depth_segmentation region growing, off upstream for runtime) ---
    segmentation_mode: str = "histogram"  # "histogram" | "region_growing"
    rg_thres_gradient_depth: float = 10.0   # depth_segmentation_max_treshold_gradient
    rg_max_neighbor_dist: float = 0.2       # ..._max_neighbor_distance
    rg_max_neighbor_dist_grad: float = 0.02  # ..._max_neighbor_distance_gradient
    rg_max_seed_dist: float = 0.5           # ..._max_neighbor_to_seedpoint_distance
    rg_max_seed_dist_grad: float = 0.05     # ..._to_seedpoint_distance_gradient
    rg_max_points: int = 4                  # depth_segmentation_max_pointcount
    rg_rounds: int = 4                      # static growth iterations


class DepthResult(NamedTuple):
    depth: jnp.ndarray        # [F] estimated depth, -1 invalid
    valid: jnp.ndarray        # [F] bool
    n_neighbors: jnp.ndarray  # [F] int


def _triples(k: int) -> np.ndarray:
    return np.array(list(itertools.combinations(range(k), 3)), np.int32)


def project_cloud(points_cam, focal, principal):
    """Camera-frame cloud → pixel coords + in-front mask
    (``do_use_cut_behind_camera``)."""
    z = points_cam[..., 2]
    front = z > 0.1
    safe_z = jnp.where(front, z, 1.0)
    uv = focal * points_cam[..., :2] / safe_z[..., None] + principal
    return uv, front


@partial(jax.jit, static_argnames=("cfg", "image_size"))
def gather_neighbors(cloud_cam, cloud_valid, uv_feat, focal, principal,
                     image_size, cfg: LidarDepthConfig):
    """For each feature, up to ``max_neighbors`` lidar points whose projection
    falls in the search rectangle. Fixed-shape grid bucketing:
    sort points by pixel-cell id, then gather capped slots from the 3×3
    neighborhood of each feature's cell.

    Returns (pts [F,K,3], uvs [F,K,2], mask [F,K]).
    """
    W, H = image_size
    cell = cfg.grid_cell_px
    gw, gh = (W + cell - 1) // cell, (H + cell - 1) // cell
    n_cells = gw * gh
    P = cloud_cam.shape[0]
    F = uv_feat.shape[0]
    K = cfg.max_neighbors
    PC = cfg.points_per_cell

    uv_pts, front = project_cloud(cloud_cam, focal, principal)
    inside = (front & cloud_valid
              & (uv_pts[:, 0] >= 0) & (uv_pts[:, 0] < W)
              & (uv_pts[:, 1] >= 0) & (uv_pts[:, 1] < H))
    cx = jnp.clip((uv_pts[:, 0] // cell).astype(jnp.int32), 0, gw - 1)
    cy = jnp.clip((uv_pts[:, 1] // cell).astype(jnp.int32), 0, gh - 1)
    cid = jnp.where(inside, cy * gw + cx, n_cells)  # invalid → sentinel cell

    order = jnp.argsort(cid)
    cid_sorted = cid[order]
    # start index of each cell in the sorted array
    starts = jnp.searchsorted(cid_sorted, jnp.arange(n_cells + 1))
    counts = jnp.diff(jnp.concatenate([starts, jnp.array([P])]))[:n_cells]
    starts = starts[:n_cells]

    # feature cell
    fx = jnp.clip((uv_feat[:, 0] // cell).astype(jnp.int32), 0, gw - 1)
    fy = jnp.clip((uv_feat[:, 1] // cell).astype(jnp.int32), 0, gh - 1)

    # neighborhood ring sized so the search region always fits: rect 6×9 px
    # needs 1 ring of 8 px cells; radius mode (10 px) needs 2
    if cfg.neighbor_mode == "radius":
        extent = cfg.radius_px
    else:
        extent = max(cfg.search_width, cfg.search_height) / 2.0
    ring = max(1, int(np.ceil(extent / cell)))
    rng = range(-ring, ring + 1)
    offs = jnp.array([(dx, dy) for dy in rng for dx in rng], jnp.int32)
    NC = offs.shape[0]
    rx = fx[:, None] + offs[None, :, 0]
    ry = fy[:, None] + offs[None, :, 1]
    cell_in = (rx >= 0) & (rx < gw) & (ry >= 0) & (ry < gh)
    ncx = jnp.clip(rx, 0, gw - 1)
    ncy = jnp.clip(ry, 0, gh - 1)
    ncid = ncy * gw + ncx                                  # [F,NC]
    nstart = starts[ncid]                                  # [F,NC]
    # out-of-image cells would alias their clipped neighbor (duplicating its
    # points) — zero their counts instead
    ncount = jnp.where(cell_in, counts[ncid], 0)

    slot = jnp.arange(PC, dtype=jnp.int32)
    idx_sorted = nstart[..., None] + slot                  # [F,NC,PC]
    slot_ok = slot[None, None, :] < ncount[..., None]
    idx_sorted = jnp.clip(idx_sorted, 0, P - 1)
    pt_idx = order[idx_sorted.reshape(F, -1)]              # [F,NC*PC]
    cand_ok = slot_ok.reshape(F, -1)

    cand_uv = uv_pts[pt_idx]                               # [F,NC*PC,2]
    cand_pts = cloud_cam[pt_idx]
    du = jnp.abs(cand_uv[..., 0] - uv_feat[:, None, 0])
    dv = jnp.abs(cand_uv[..., 1] - uv_feat[:, None, 1])
    if cfg.neighbor_mode == "radius":
        in_region = du * du + dv * dv <= cfg.radius_px ** 2
    else:
        in_region = (du <= cfg.search_width / 2) & (dv <= cfg.search_height / 2)
    ok = cand_ok & in_region

    # keep the K nearest (pixel distance) valid candidates
    d2 = jnp.where(ok, du * du + dv * dv, jnp.inf)
    top = jnp.argsort(d2, axis=1)[:, :K]                   # [F,K]
    take = jnp.take_along_axis
    mask = take(ok, top, 1)
    pts = take(cand_pts, top[..., None], 1)
    uvs = take(cand_uv, top[..., None], 1)
    return pts, uvs, mask


def _histogram_segment(depths, mask, cfg: LidarDepthConfig):
    """Nearest local-maximum depth bin among the neighbors.

    The reference returns the nearest *local maximum* of the depth histogram
    (``do_use_histogram_segmentation`` — "reduce depth gaps between multiple
    objects"; min_pointcount 1): the foreground object in front of a denser
    background wins by proximity, not by count. Bin counts come from pairwise
    same-bin comparisons (K² per feature — shape-static, no scatter)."""
    bins = jnp.floor(depths / cfg.hist_bin_width).astype(jnp.int32)
    bins = jnp.where(mask, bins, jnp.int32(-100000))
    same = (bins[..., :, None] == bins[..., None, :]) & mask[..., None, :]
    counts = jnp.sum(same, -1)
    prev = jnp.sum((bins[..., :, None] - 1 == bins[..., None, :])
                   & mask[..., None, :], -1)
    nxt = jnp.sum((bins[..., :, None] + 1 == bins[..., None, :])
                  & mask[..., None, :], -1)
    counts = jnp.where(mask, counts, 0)
    local_max = mask & (counts >= prev) & (counts >= nxt) \
        & (counts >= cfg.hist_min_count)
    # nearest (smallest depth) point whose bin is a local maximum
    d_masked = jnp.where(local_max, depths, jnp.inf)
    best = jnp.argmin(d_masked, -1)
    best_bin = jnp.take_along_axis(bins, best[..., None], -1)[..., 0]
    seg = mask & (bins == best_bin[..., None])
    found = jnp.any(local_max, -1)
    return seg, found


def _triangle_patch(pts, seg, ray, cfg: LidarDepthConfig, triples):
    """Largest-triangle plane through segment points + validity checks.

    Returns (normal [.,3], support point [.,3], ok)."""
    a = pts[..., triples[:, 0], :]
    b = pts[..., triples[:, 1], :]
    c = pts[..., triples[:, 2], :]
    t_ok = (seg[..., triples[:, 0]] & seg[..., triples[:, 1]]
            & seg[..., triples[:, 2]])
    ab, ac = b - a, c - a
    cr = jnp.cross(ab, ac)
    area2 = jnp.linalg.norm(cr, axis=-1)
    # planarity: normalized cross norm (inner-angle quality)
    denom = (jnp.linalg.norm(ab, axis=-1) * jnp.linalg.norm(ac, axis=-1))
    crossnorm = area2 / jnp.maximum(denom, 1e-12)
    planar = crossnorm >= cfg.crossnorm_thres
    score = jnp.where(t_ok & planar, area2, -1.0)
    best = jnp.argmax(score, -1)
    take1 = lambda x: jnp.take_along_axis(
        x, best[..., None, None], -2)[..., 0, :]
    n = take1(cr)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    sup = take1(a)
    found = jnp.take_along_axis(score, best[..., None], -1)[..., 0] > 0
    ortho = jnp.abs(jnp.sum(n * ray, -1)) >= cfg.viewray_ortho_thres
    return n, sup, found & ortho


def eigh3_sym(A):
    """Closed-form symmetric 3×3 eigendecomposition → (eigenvalues
    ascending [...,3], smallest-eigenvalue eigenvector [...,3]).

    Trigonometric eigenvalues (Smith's method) + cross-product null-space
    recovery for the eigenvector. Replaces ``jnp.linalg.eigh`` on the depth
    estimator's plane-fit covariances: the TPU ``eigh`` custom call is an
    iterative Jacobi whose f32 behavior on near-degenerate (planar!)
    covariances differs from CPU LAPACK, and the analytic form is both
    deterministic across backends and cheaper (pure elementwise VPU ops
    instead of a sequential custom call).

    Conditioning caveat: the trigonometric λ_min cancels with relative
    error ~eps·(λ_max/λ_min), so at f32 this is for covariances with
    moderate eigenvalue spread (local patches, ≲1e5) — NOT for the
    RANSAC ground fit (~1e7 spread; measured worse there, see
    frontend/groundplane.fit_plane_lsq)."""
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a11, a12, a22 = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]
    dtype = A.dtype
    q = (a00 + a11 + a22) / 3.0
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    p2 = ((a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1)
    diagish = p2 <= 1e-14 * jnp.maximum(q * q, 1e-30)
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-38))
    b00, b11, b22 = (a00 - q) / p, (a11 - q) / p, (a22 - q) / p
    b01, b02, b12 = a01 / p, a02 / p, a12 / p
    detB = (b00 * (b11 * b22 - b12 * b12)
            - b01 * (b01 * b22 - b12 * b02)
            + b02 * (b01 * b12 - b11 * b02))
    phi = jnp.arccos(jnp.clip(detB / 2.0, -1.0, 1.0)) / 3.0
    l3 = q + 2.0 * p * jnp.cos(phi)                       # largest
    l1 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    l2 = 3.0 * q - l1 - l3
    evals = jnp.stack([l1, l2, l3], -1)

    # null-space of (A − λ1 I): the largest row-pair cross product
    r0 = jnp.stack([a00 - l1, a01, a02], -1)
    r1 = jnp.stack([a01, a11 - l1, a12], -1)
    r2 = jnp.stack([a02, a12, a22 - l1], -1)
    cands = jnp.stack([jnp.cross(r0, r1), jnp.cross(r0, r2),
                       jnp.cross(r1, r2)], -2)            # [...,3,3]
    norms = jnp.linalg.norm(cands, axis=-1)
    oh = jax.nn.one_hot(jnp.argmax(norms, -1), 3, dtype=dtype)
    v = jnp.sum(cands * oh[..., None], -2)
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    # Degenerate fallbacks. Repeated λ1 (all row cross products vanish —
    # A − λ1·I has rank ≤ 1): the eigenspace is the null plane of the
    # largest surviving row r, which is NOT axis-aligned in general
    # (cov ≈ λ·I + n·nᵀ with oblique n), so project a basis vector onto
    # that null space — pick the basis axis LEAST aligned with r̂ so the
    # projection never collapses (|proj|² = 1 − r̂ᵢ² ≥ 2/3). Fully
    # diagonal-ish matrices keep the smallest-diagonal basis vector
    # (advisor r3 finding; non-diagonal repeated-λ case in TestEigh3Sym).
    rows = jnp.stack([r0, r1, r2], -2)                    # [...,3,3]
    rnorm = jnp.linalg.norm(rows, axis=-1)
    roh = jax.nn.one_hot(jnp.argmax(rnorm, -1), 3, dtype=dtype)
    rbig = jnp.sum(rows * roh[..., None], -2)
    rbn = jnp.linalg.norm(rbig, axis=-1, keepdims=True)
    rhat = rbig / jnp.maximum(rbn, 1e-30)
    e_min = jax.nn.one_hot(jnp.argmin(jnp.abs(rhat), -1), 3, dtype=dtype)
    proj = e_min - jnp.sum(e_min * rhat, -1, keepdims=True) * rhat
    pn = jnp.linalg.norm(proj, axis=-1, keepdims=True)
    null_v = jnp.where(rbn > 1e-20, proj / jnp.maximum(pn, 1e-20), e_min)
    diag3 = jnp.stack([a00, a11, a22], -1)
    axis_v = jax.nn.one_hot(jnp.argmin(diag3, -1), 3, dtype=dtype)
    repeated = (vn[..., 0] <= 1e-20)[..., None] & ~diagish[..., None]
    v = jnp.where(diagish[..., None], axis_v,
                  jnp.where(repeated, null_v, v / jnp.maximum(vn, 1e-20)))
    evals = jnp.where(diagish[..., None], jnp.sort(diag3, -1), evals)
    return evals, v


def _pca_patch(pts, seg, ray, cfg: LidarDepthConfig):
    """PCA local patch (``do_use_PCA`` variant): plane through the segment's
    centroid with normal = smallest-eigenvalue direction, gated on the
    eigenvalue shape (λ1 ≤ λ2 ≤ λ3): λ3 ≥ ``pca_treshold_3_abs_min``,
    λ3 ≤ ``pca_treshold_3_2_rel_max``·λ2 (not a line), and
    λ2 ≥ ``pca_treshold_2_1_rel_min``·λ1 (planar, not volumetric).

    Returns (normal, support point, ok) like :func:`_triangle_patch`."""
    segf = seg.astype(pts.dtype)
    n_seg = jnp.sum(segf, -1)
    denom = jnp.maximum(n_seg, 1.0)[..., None]
    c = jnp.sum(pts * segf[..., None], -2) / denom
    dp = (pts - c[..., None, :]) * segf[..., None]
    # backend-deterministic high-relative-accuracy Jacobi (utils/eig3.py);
    # the trig eigh3_sym loses relative accuracy once the eigenvalue spread
    # grows (see groundplane.fit_plane_lsq's history note)
    cov = jnp.einsum("...ki,...kj->...ij", dp, dp) / denom[..., None]
    evals, n = smallest_eigvec3(cov)             # ascending, unit n
    l1, l2, l3 = evals[..., 0], evals[..., 1], evals[..., 2]
    shape_ok = ((l3 >= cfg.pca_abs_min)
                & (l3 <= cfg.pca_rel_32_max * jnp.maximum(l2, 1e-12))
                & (l2 >= cfg.pca_rel_21_min * l1))
    ortho = jnp.abs(jnp.sum(n * ray, -1)) >= cfg.viewray_ortho_thres
    return n, c, (n_seg >= 3) & shape_ok & ortho


def _region_grow_segment(pts, mask, uvs, uv_feat, cfg: LidarDepthConfig):
    """Region-growing depth segmentation (``do_use_depth_segmentation``,
    off by default upstream for runtime): seed at the neighbor closest to the
    feature in the image plane, then grow the selection by 3D proximity with
    depth-scaled thresholds ``thr(d) = base + max(d − gradient_depth, 0)·grad``
    and cap at ``depth_segmentation_max_pointcount`` points nearest the seed.

    The reference's per-lidar-row two-seed bookkeeping collapses here into a
    single pixel-nearest seed — the row structure is KITTI-scanner-specific
    and the growth thresholds dominate the selection. Returns (seg, found)."""
    d2px = jnp.where(mask,
                     jnp.sum((uvs - uv_feat[..., None, :]) ** 2, -1), jnp.inf)
    seed = jnp.argmin(d2px, -1)
    seed_pt = jnp.take_along_axis(pts, seed[..., None, None], -2)[..., 0, :]
    depth = seed_pt[..., 2]
    excess = jnp.maximum(depth - cfg.rg_thres_gradient_depth, 0.0)
    thr_nb = cfg.rg_max_neighbor_dist + excess * cfg.rg_max_neighbor_dist_grad
    thr_seed = cfg.rg_max_seed_dist + excess * cfg.rg_max_seed_dist_grad

    dist_seed = jnp.linalg.norm(pts - seed_pt[..., None, :], axis=-1)
    cand = mask & (dist_seed <= thr_seed[..., None])
    K = pts.shape[-2]
    sel = jax.nn.one_hot(seed, K, dtype=bool) & mask
    pair = jnp.linalg.norm(pts[..., :, None, :] - pts[..., None, :, :],
                           axis=-1)                        # [F,K,K]
    near = pair <= thr_nb[..., None, None]
    for _ in range(cfg.rg_rounds):
        reachable = jnp.any(near & sel[..., None, :], -1)
        sel = sel | (cand & reachable)
    if cfg.rg_max_points > 0:
        # keep the rg_max_points selected points nearest the seed
        rank = jnp.sum(
            (jnp.where(sel, dist_seed, jnp.inf)[..., None, :]
             < jnp.where(sel, dist_seed, jnp.inf)[..., :, None]), -1)
        sel = sel & (rank < cfg.rg_max_points)
    return sel, jnp.any(sel, -1)


@partial(jax.jit, static_argnames=("cfg", "image_size"))
@highest_matmul
def estimate_depths(cloud_cam, cloud_valid, uv_feat, focal, principal,
                    image_size, cfg: LidarDepthConfig = LidarDepthConfig()
                    ) -> DepthResult:
    """Full per-feature depth pipeline (steps 1-6 above).

    cloud_cam [P,3] camera frame, uv_feat [F,2]. Returns depth -1 where no
    valid estimate (reference outlier convention, FeaturePoint d = -1).
    """
    dtype = cloud_cam.dtype
    K = cfg.max_neighbors
    triples = jnp.asarray(_triples(K))

    pts, uvs, mask = gather_neighbors(cloud_cam, cloud_valid, uv_feat, focal,
                                      principal, image_size, cfg)
    n_neigh = jnp.sum(mask, -1)
    enough = n_neigh >= cfg.min_neighbors

    depths = jnp.where(mask, pts[..., 2], 0.0)
    if cfg.segmentation_mode == "region_growing":
        seg, seg_ok = _region_grow_segment(pts, mask, uvs, uv_feat, cfg)
    else:
        seg, seg_ok = _histogram_segment(depths, mask, cfg)

    # viewing ray per feature
    ray = jnp.concatenate([(uv_feat - principal) / focal,
                           jnp.ones((uv_feat.shape[0], 1), dtype)], -1)
    ray = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)

    if cfg.patch_mode == "pca":
        n, sup, tri_ok = _pca_patch(pts, seg, ray, cfg)
    else:
        n, sup, tri_ok = _triangle_patch(pts, seg, ray, cfg, triples)

    # ray ∩ plane: t = (n·sup)/(n·ray); depth = z of intersection
    nr = jnp.sum(n * ray, -1)
    t = jnp.sum(n * sup, -1) / jnp.where(jnp.abs(nr) < 1e-9, 1e-9, nr)
    depth = t * ray[..., 2]

    # fallback when too few points for a triangle but segment exists:
    # mean depth of the segment (reference nearest-point style fallback)
    seg_n = jnp.sum(seg, -1)
    seg_mean = jnp.sum(jnp.where(seg, depths, 0.0), -1) / jnp.maximum(seg_n, 1)
    use_tri = tri_ok & (seg_n >= 3)
    depth = jnp.where(use_tri, depth, seg_mean)

    # thresholds
    glob_ok = (depth >= cfg.depth_min) & (depth <= cfg.depth_max)
    smin = jnp.min(jnp.where(seg, depths, jnp.inf), -1)
    smax = jnp.max(jnp.where(seg, depths, -jnp.inf), -1)
    local_ok = ((depth >= smin * (1.0 - cfg.local_thres_rel))
                & (depth <= smax * (1.0 + cfg.local_thres_rel)))

    valid = enough & seg_ok & glob_ok & local_ok & (seg_n >= 1)
    depth = jnp.where(valid, depth, -1.0)
    return DepthResult(depth=depth, valid=valid, n_neighbors=n_neigh)


@partial(jax.jit, static_argnames=("cfg", "image_size"))
@highest_matmul
def ground_patch_depths(cloud_cam, gp_inlier, uv_feat, plane_normal,
                        plane_dist, focal, principal, image_size,
                        cfg: LidarDepthConfig = LidarDepthConfig()):
    """M-estimator local ground patch depth — the reference's preferred road
    path (``plane_estimator_use_mestimator: 1`` — "best method (evaluated
    with kitti)"): fit a local plane through the RANSAC ground-plane inliers
    near each feature, weighting points by inverse distance to the global
    plane, and intersect the viewing ray.

    cloud_cam [P,3] camera frame; gp_inlier [P] bool (RANSAC inliers,
    transformed to camera frame); plane_normal/plane_dist: the global plane
    in *camera* frame (n·p + d = 0). Returns (depth [F], valid [F]);
    features without enough local inliers fall back to the global plane.
    """
    dtype = cloud_cam.dtype
    pts, _, mask = gather_neighbors(cloud_cam, gp_inlier, uv_feat, focal,
                                    principal, image_size, cfg)
    # inverse-distance-to-plane weights (M-estimator style reweighting)
    d_plane = jnp.abs(pts @ plane_normal + plane_dist)
    w = jnp.where(mask, 1.0 / (d_plane + 0.05), 0.0)

    # weighted local plane per feature
    wsum = jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-9)
    c = jnp.sum(pts * w[..., None], -2) / wsum
    dp = (pts - c[:, None, :]) * w[..., None]
    cov = jnp.einsum("fki,fkj->fij", dp, pts - c[:, None, :])
    _, n_loc = smallest_eigvec3(cov)
    # orient like the global plane
    flip = jnp.sign(jnp.sum(n_loc * plane_normal, -1, keepdims=True) + 1e-12)
    n_loc = n_loc * flip
    d_loc = -jnp.sum(n_loc * c, -1)

    n_neigh = jnp.sum(mask, -1)
    have_local = n_neigh >= cfg.min_neighbors
    n_use = jnp.where(have_local[:, None], n_loc, plane_normal[None])
    d_use = jnp.where(have_local, d_loc, plane_dist)

    ray = jnp.concatenate([(uv_feat - principal) / focal,
                           jnp.ones((uv_feat.shape[0], 1), dtype)], -1)
    ray = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
    nr = jnp.sum(n_use * ray, -1)
    t = -d_use / jnp.where(jnp.abs(nr) < 1e-9, 1e-9, nr)
    depth = t * ray[:, 2]
    valid = (t > 0) & (depth > 0) & (depth <= cfg.depth_max)
    return jnp.where(valid, depth, -1.0), valid


def ground_feature_depths(plane_normal, plane_dist, uv_feat, focal, principal,
                          max_depth: float = 100.0):
    """Depth of road features by intersecting the RANSAC ground plane
    (plane in camera frame: n·p + d = 0)."""
    dtype = uv_feat.dtype
    ray = jnp.concatenate([(uv_feat - principal) / focal,
                           jnp.ones((uv_feat.shape[0], 1), dtype)], -1)
    ray = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
    nr = ray @ plane_normal
    t = -plane_dist / jnp.where(jnp.abs(nr) < 1e-9, 1e-9, nr)
    depth = t * ray[:, 2]
    valid = (t > 0) & (depth > 0) & (depth <= max_depth)
    return jnp.where(valid, depth, -1.0), valid
