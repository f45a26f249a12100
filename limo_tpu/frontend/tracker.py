"""Feature detection, matching and tracking — the viso2-equivalent front end.

The reference clones ``viso_feature_tracking``/``viso2`` at build time
(install_repos.sh); its behavior contract comes from
``res/config_feature_matching.yaml``: NMS neighborhood 9, match bin size 200,
match radius 400, outlier flow tolerance 4, subpixel refinement, max track
length 100.

TPU re-design (everything batched, fixed shapes):
  - corner strength: Shi-Tomasi min-eigenvalue response from Sobel gradients
    (XLA convolutions → MXU)
  - NMS: reduce_window max-pool equality (suppression radius = nms_n)
  - fixed feature count via top-k response
  - descriptors: 8×8 intensity patch + gradient patch, gathered and
    L2-normalized — matching becomes one [N,N] matmul (MXU) instead of
    viso2's sparse SAD loops
  - mutual nearest-neighbor matching gated by pixel radius, with a global
    flow-consistency gate (outlier_flow_tolerance vs median flow)
  - subpixel refinement: 1D parabola fit on the response map

Track maintenance (id bookkeeping) stays on the host in
:class:`limo_tpu.pipeline.tracklets.TrackletBuilder`.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from ..utils.precision import highest_matmul
import numpy as np


@dataclass(frozen=True)
class TrackerConfig:
    max_features: int = 1024
    nms_radius: int = 9            # nms_n (config_feature_matching.yaml:11)
    min_response: float = 1e-4
    match_radius: float = 400.0    # match_radius (yaml:14)
    outlier_flow_tolerance: float = 4.0  # yaml:16
    locality_sigma: float = 100.0  # px; similarity tie-break toward small flow
    patch: int = 8                 # descriptor patch side
    border: int = 12
    subpixel: bool = True          # refinement: 1 (yaml:19)
    # spatial bucketing (viso2 match_binsize, config_feature_matching
    # .yaml:13): detections are capped PER BUCKET before the global top-k,
    # so one high-contrast region (road texture, foliage) cannot starve the
    # rest of the image of features. 0 disables.
    bucket_size: int = 50
    bucket_cap: int = 0            # features per bucket; 0 = auto from k
    # guided matching (fused path): use the geometry-anchored motion
    # prediction while matching is healthy. False = descriptor-only
    # mutual-NN always (A/B knob for the km-drive scale study).
    guided: bool = True
    # assumed depth for depthless features in the guided-match motion
    # prediction (a mid-scene prior; only shapes the search center, never
    # the estimate itself)
    depth_anchor_m: float = 20.0


class Features(NamedTuple):
    uv: jnp.ndarray        # [N,2] (u,v) subpixel
    response: jnp.ndarray  # [N]
    desc: jnp.ndarray      # [N,D] L2-normalized
    valid: jnp.ndarray     # [N] bool


class MatchResult(NamedTuple):
    prev_index: jnp.ndarray  # [N] index into previous Features, -1 = no match
    n_matches: jnp.ndarray


def _sobel(img):
    kx = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], img.dtype) / 8.0
    ky = kx.T
    def conv(k):
        return jax.lax.conv_general_dilated(
            img[None, None], k[None, None], (1, 1), "SAME")[0, 0]
    return conv(kx), conv(ky)


def _box_filter(x, r):
    w = jnp.ones((2 * r + 1, 2 * r + 1), x.dtype)
    return jax.lax.conv_general_dilated(
        x[None, None], w[None, None], (1, 1), "SAME")[0, 0]


@partial(jax.jit, static_argnames=("cfg",))
@highest_matmul
def detect(img, cfg: TrackerConfig = TrackerConfig()) -> Features:
    """Shi-Tomasi corners + NMS + top-k + descriptors on one grayscale image
    [H,W] (float 0..1)."""
    H, W = img.shape
    gx, gy = _sobel(img)
    Ixx = _box_filter(gx * gx, 2)
    Iyy = _box_filter(gy * gy, 2)
    Ixy = _box_filter(gx * gy, 2)
    tr = Ixx + Iyy
    det = Ixx * Iyy - Ixy * Ixy
    # min eigenvalue of the structure tensor
    resp = tr / 2.0 - jnp.sqrt(jnp.maximum((tr / 2.0) ** 2 - det, 0.0))

    r = cfg.nms_radius
    win = (2 * r + 1, 2 * r + 1)
    mx = jax.lax.reduce_window(resp, -jnp.inf, jax.lax.max, win, (1, 1), "SAME")
    cand = (resp >= mx) & (resp > cfg.min_response)
    # strict tie-break on plateaus (e.g. ideal checkerboards): among tied
    # candidates keep only the one with the largest linear index per window
    lin = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    lin_cand = jnp.where(cand, lin, -1)
    lin_mx = jax.lax.reduce_window(lin_cand, jnp.int32(-1), jax.lax.max,
                                   win, (1, 1), "SAME")
    is_peak = cand & (lin_cand == lin_mx)
    # kill borders (descriptor patch support)
    b = cfg.border
    row = jnp.arange(H)[:, None]
    col = jnp.arange(W)[None, :]
    inside = (row >= b) & (row < H - b) & (col >= b) & (col < W - b)
    score2d = jnp.where(is_peak & inside, resp, 0.0)
    score = score2d.reshape(-1)

    k = cfg.max_features
    bs = cfg.bucket_size
    if bs and bs < min(H, W):
        # per-bucket cap, then global top-k over the survivors
        Hp, Wp = -(-H // bs) * bs, -(-W // bs) * bs
        nbh, nbw = Hp // bs, Wp // bs
        cap = cfg.bucket_cap or max(4, (2 * k) // (nbh * nbw))
        cap = min(cap, bs * bs)
        sc = jnp.zeros((Hp, Wp), score2d.dtype).at[:H, :W].set(score2d)
        tiles = sc.reshape(nbh, bs, nbw, bs).transpose(0, 2, 1, 3) \
            .reshape(nbh * nbw, bs * bs)
        tv, ti = jax.lax.top_k(tiles, cap)               # [T,cap]
        trow = (jnp.arange(nbh * nbw, dtype=jnp.int32) // nbw) * bs
        tcol = (jnp.arange(nbh * nbw, dtype=jnp.int32) % nbw) * bs
        py = jnp.clip(trow[:, None] + ti // bs, 0, H - 1)
        px = jnp.clip(tcol[:, None] + ti % bs, 0, W - 1)
        sel_idx = (py * W + px).reshape(-1)
        sel_val = tv.reshape(-1)
        top_val, pos = jax.lax.top_k(sel_val, min(k, sel_val.shape[0]))
        top_idx = sel_idx[pos]
        if top_val.shape[0] < k:  # fewer buckets×cap than k: pad
            pad = k - top_val.shape[0]
            top_val = jnp.concatenate([top_val, jnp.zeros((pad,), top_val.dtype)])
            top_idx = jnp.concatenate([top_idx, jnp.zeros((pad,), top_idx.dtype)])
    else:
        top_val, top_idx = jax.lax.top_k(score, k)
    vv = (top_idx // W).astype(jnp.float32)
    uu = (top_idx % W).astype(jnp.float32)
    valid = top_val > 0

    if cfg.subpixel:
        # 1D parabola in u and v on the response map
        iu = top_idx % W
        iv = top_idx // W
        c = resp.reshape(-1)[top_idx]
        l = resp[iv, jnp.clip(iu - 1, 0, W - 1)]
        rr = resp[iv, jnp.clip(iu + 1, 0, W - 1)]
        du = 0.5 * (l - rr) / jnp.maximum(l - 2 * c + rr, 1e-9)
        u_ = resp[jnp.clip(iv - 1, 0, H - 1), iu]
        d_ = resp[jnp.clip(iv + 1, 0, H - 1), iu]
        dv = 0.5 * (u_ - d_) / jnp.maximum(u_ - 2 * c + d_, 1e-9)
        uu = uu + jnp.clip(du, -0.5, 0.5)
        vv = vv + jnp.clip(dv, -0.5, 0.5)

    # descriptors: patch of intensity + gradients at integer location
    p = cfg.patch
    half = p // 2
    dy, dx = jnp.meshgrid(jnp.arange(-half, half), jnp.arange(-half, half),
                          indexing="ij")

    def patch_at(iy, ix):
        ys = jnp.clip(iy + dy, 0, H - 1)
        xs = jnp.clip(ix + dx, 0, W - 1)
        return jnp.stack([img[ys, xs], gx[ys, xs], gy[ys, xs]], -1).reshape(-1)

    iu = jnp.clip(uu.astype(jnp.int32), 0, W - 1)
    iv = jnp.clip(vv.astype(jnp.int32), 0, H - 1)
    desc = jax.vmap(patch_at)(iv, iu)
    desc = desc - jnp.mean(desc, -1, keepdims=True)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-9)

    return Features(uv=jnp.stack([uu, vv], -1), response=top_val,
                    desc=desc, valid=valid)


def _masked_median(x, mask):
    """Median of the masked entries (0 when the mask is empty) — plain
    jnp.median would propagate the fill values."""
    n = x.shape[0]
    s = jnp.sort(jnp.where(mask, x, jnp.inf))
    cnt = jnp.sum(mask)
    i = jnp.clip((cnt - 1) // 2, 0, n - 1)
    j = jnp.clip(cnt // 2, 0, n - 1)
    return jnp.where(cnt > 0, 0.5 * (s[i] + s[j]), 0.0)


@partial(jax.jit, static_argnames=("cfg",))
def match(cur: Features, prev: Features,
          cfg: TrackerConfig = TrackerConfig(),
          pred_uv=None, pred_known=None) -> MatchResult:
    """Mutual-NN descriptor matching gated by radius + flow consistency.

    Similarity = NCC (descriptor dot product — one MXU matmul). Returns for
    each current feature the index of its previous-frame match or -1.

    pred_uv [N,2]: predicted CURRENT-frame positions of the previous
    features (guided matching — the fused pipeline uses per-track
    flow-constancy prediction). The locality prior biases candidates
    toward the predicted flow instead of zero flow: at highway speeds the
    per-frame flow reaches 80-150 px and a zero-centred prior
    systematically prefers small-flow FALSE matches on self-similar ground
    texture (measured: 19.7% drift at 14 m/s vs 0.9% at 8 m/s before the
    fix). pred_known [N] marks previous features whose prediction is
    informed (an established track): unknown-prediction features get a 4×
    wider locality sigma and no flow gate — a fresh feature must be able
    to START a track on descriptor evidence alone, otherwise a prediction
    glitch starves matching and the tracker cannot recover (the failure
    mode of odometry-coupled prediction: bad pose → bad predictions → no
    matches → worse pose). Defaults: unguided zero-flow prior + global
    median-flow gate (the reference-viso2-like host path).
    """
    guided = pred_uv is not None
    if pred_uv is None:
        pred_uv = prev.uv
    if pred_known is None:
        pred_known = jnp.ones(prev.uv.shape[:1], bool)
    sim = cur.desc @ prev.desc.T                                  # [N,N]
    d2 = jnp.sum((cur.uv[:, None] - pred_uv[None]) ** 2, -1)
    ok = (cur.valid[:, None] & prev.valid[None]
          & (d2 <= cfg.match_radius ** 2))
    # locality prior: repetitive texture (identical-looking features) ties
    # the descriptor similarity; bias near-equal candidates toward the
    # predicted motion so argmax stays stable under parallax
    sigma = jnp.where(pred_known, cfg.locality_sigma,
                      4.0 * cfg.locality_sigma)                   # [N] prev
    sim_adj = jnp.where(ok, sim - d2 / (2.0 * sigma[None, :] ** 2), -2.0)
    best_prev = jnp.argmax(sim_adj, 1)                            # cur → prev
    best_cur = jnp.argmax(sim_adj, 0)                             # prev → cur
    n = cur.uv.shape[0]
    mutual = best_cur[best_prev] == jnp.arange(n)
    score = jnp.take_along_axis(jnp.where(ok, sim, -2.0),
                                best_prev[:, None], 1)[:, 0]
    good = mutual & (score > 0.5) & cur.valid

    # Flow-consistency gate, per mode (all variants measured on rendered
    # drives — see docs/PERF.md matcher study):
    #  - unguided (host path): the viso-like GLOBAL median gate — at the
    #    moderate speeds the host driver serves it is the strictest junk
    #    filter (known-good 1.48% on the 200-frame gate; the local gate
    #    here measured 2.46%);
    #  - guided (fused path): LOCAL neighbourhood gate — the radial flow
    #    field of forward motion carries ~10x legitimate spread, and the
    #    global median amputates exactly the near, translation-carrying
    #    features (19.7% drift at 14 m/s). Neighbourhoods are tight in v
    #    (image row ≈ inverse ground depth — the field's steep gradient
    #    is vertical), looser in u; two iterations so gross outliers do
    #    not poison the field estimate. NO gate at all is not an option:
    #    one locally-inconsistent aliased burst teleported the
    #    motion-only pose by 534 m. The reference's viso2 contract gates
    #    flow PER SPATIAL BUCKET too (match_binsize /
    #    outlier_flow_tolerance, res/config_feature_matching.yaml:13-16).
    flow = cur.uv - prev.uv[best_prev]
    tol = 8.0 * cfg.outlier_flow_tolerance
    if guided:
        du2 = (cur.uv[:, None, 0] - cur.uv[None, :, 0]) ** 2
        dv2 = (cur.uv[:, None, 1] - cur.uv[None, :, 1]) ** 2
        w_loc = jnp.exp(-du2 / (2.0 * 120.0 ** 2)
                        - dv2 / (2.0 * 40.0 ** 2))
        ok_gate = good
        for _ in range(2):
            w = w_loc * ok_gate[None, :]
            wsum = jnp.sum(w, -1, keepdims=True)
            mean_flow = (w @ flow) / jnp.maximum(wsum, 1e-6)
            dev = jnp.linalg.norm(flow - mean_flow, axis=-1)
            ok_gate = good & (dev < tol
                              + 0.5 * jnp.linalg.norm(mean_flow, axis=-1))
        # no gated neighbours at all (bootstrap): keep descriptor matches
        good = jnp.where(jnp.any(ok_gate), ok_gate, good)
    else:
        med = jnp.stack([_masked_median(flow[:, 0], good),
                         _masked_median(flow[:, 1], good)])
        dev = jnp.linalg.norm(flow - med, axis=-1)
        good = good & (dev < tol)

    prev_index = jnp.where(good, best_prev, -1)
    return MatchResult(prev_index=prev_index.astype(jnp.int32),
                       n_matches=jnp.sum(good.astype(jnp.int32)))


_EMPTY_FEATURES_CACHE: dict = {}


def _empty_features(cfg: TrackerConfig) -> Features:
    """Zero-filled Features placeholder (first frame has no prev)."""
    N = cfg.max_features
    D = 3 * cfg.patch * cfg.patch  # intensity + gx + gy per pixel
    return Features(uv=jnp.zeros((N, 2), jnp.float32),
                    response=jnp.zeros((N,), jnp.float32),
                    desc=jnp.zeros((N, D), jnp.float32),
                    valid=jnp.zeros((N,), bool))


@partial(jax.jit, static_argnames=("cfg", "has_prev"))
@highest_matmul
def _detect_and_match(img, prev, cfg: TrackerConfig, has_prev: bool):
    """detect + match fused into one program — one dispatch per frame
    instead of two (each dispatch is a round trip on remote TPU links)."""
    feats = detect(img, cfg)
    if has_prev:
        m = match(feats, prev, cfg)
        return feats, m.prev_index
    return feats, jnp.full((cfg.max_features,), -1, jnp.int32)


class FeatureTracker:
    """Host-side wrapper: detect → match → feed TrackletBuilder."""

    def __init__(self, cfg: TrackerConfig = TrackerConfig(),
                 max_track_length: int = 100):
        from ..pipeline.tracklets import TrackletBuilder
        self.cfg = cfg
        self.builder = TrackletBuilder(max_track_length=max_track_length)
        self._prev: Features | None = None

    def process(self, stamp: float, img: np.ndarray,
                depth_fn=None) -> None:
        """img: [H,W] grayscale float. depth_fn: optional callable
        (uv [N,2] → depths [N]) — the lidar depth hook."""
        has_prev = self._prev is not None
        if has_prev:
            prev = self._prev
        else:
            key = (self.cfg.max_features, self.cfg.patch)
            if key not in _EMPTY_FEATURES_CACHE:
                _EMPTY_FEATURES_CACHE[key] = _empty_features(self.cfg)
            prev = _EMPTY_FEATURES_CACHE[key]
        feats, pm_dev = _detect_and_match(
            jnp.asarray(img, jnp.float32), prev, self.cfg, has_prev)
        # one batched fetch for everything the host loop needs
        uv, valid, prev_match = jax.device_get(
            (feats.uv, feats.valid, pm_dev))
        prev_match = prev_match.astype(np.int64)
        uv_v = uv[valid]
        pm = prev_match[valid]
        # remap prev indices to the previous frame's *valid-compacted* order
        # (previous valid mask cached on host — no extra device fetch)
        if has_prev:
            prev_valid = self._prev_valid_np
            remap = np.full(prev_valid.shape[0], -1, np.int64)
            remap[prev_valid] = np.arange(int(prev_valid.sum()))
            pm = np.where(pm >= 0, remap[np.clip(pm, 0, None)], -1)
        if depth_fn is not None:
            # fixed-shape call (full uv, valid-compact after): a varying
            # feature count would recompile the jitted depth program per
            # frame — measured ~0.5 s/frame over a remote TPU link
            depths = np.asarray(depth_fn(uv))[valid]
        else:
            depths = None
        self.builder.push_frame(stamp, uv_v, pm, depths)
        self._prev = feats
        self._prev_valid_np = valid

    def tracklets(self, window: int | None = None):
        return self.builder.to_tracklets(window)


class MulticamFeatureTracker:
    """Per-camera detection/matching/tracking for a rigid multi-camera rig —
    the reference treats multi-cam as first-class in the core
    (keyframe.cpp:43-59: tracks routed to their observing camera via
    ``landmark_to_cameras``); this is the front-end half: one independent
    tracker per camera (no cross-camera matching — the reference's multi-cam
    tests use the same per-camera track model), merged into one namespaced
    tracklet stream + a track→camera routing map."""

    def __init__(self, num_cameras: int, cfg: TrackerConfig = TrackerConfig(),
                 max_track_length: int = 100, id_stride: int = 1_000_000):
        self.trackers = [FeatureTracker(cfg, max_track_length)
                         for _ in range(num_cameras)]
        self.id_stride = id_stride

    def process(self, stamp: float, images, depth_fns=None) -> None:
        """images: one grayscale [H,W] per camera; depth_fns: optional
        per-camera (uv → depths) hooks (typically lidar on camera 0 only)."""
        for c, tr in enumerate(self.trackers):
            fn = depth_fns[c] if depth_fns else None
            tr.process(stamp, images[c], depth_fn=fn)

    def tracklets(self, window: int | None = None):
        """(merged Tracklets, {global_id: camera}) — feed
        ``process_frame(..., track_camera=...)``."""
        from ..pipeline.tracklets import merge_tracklets
        return merge_tracklets(
            [tr.tracklets(window) for tr in self.trackers],
            id_stride=self.id_stride)
