"""Device-resident sensor→pose pipeline: images + lidar clouds in, poses
out, as ONE compiled ``lax.scan`` program.

This is the fusion VERDICT r3 named as the single highest-leverage missing
piece: the reference runs its whole launch graph online — gamma → viso
tracking → lidar depth → semantic labels → keyframe BA
(``launch/kitti_standalone.launch:10-57``, ``mono_lidar.cpp:88-373``) — and
the repo had two halves that didn't meet: a host-driven ``LimoPipeline``
paying ~10 tunnel round trips per frame (669 ms/frame over a remote link)
and a 141 fps compiled scan path that only accepted pre-made track tensors.
Here the tracker, the device-side track table, the lidar depth front end,
the RANSAC groundplane, the semantic label sampling, AND the scan-odometry
step (5-point prior → motion-only → keyframe gates → push → windowed
trimmed BA) run inside one scan body — O(1) dispatches per frame *chunk*,
zero per-frame host work.

Device-side track table (the piece that kept the front end host-bound):
``TrackletBuilder``'s id bookkeeping becomes a [N]→[L] slot map carried in
the scan state. Per frame:

  1. ``detect`` (Shi-Tomasi + NMS + top-k + descriptors — convs on MXU)
  2. ``match`` vs the previous frame's features (one [N,N] NCC matmul,
     mutual-NN ⇒ the match is INJECTIVE, so inherited slots never collide)
  3. slot inheritance: a matched feature keeps its predecessor's landmark
     slot; unmatched features claim free slots (slots not holding a live
     window landmark and not inherited this frame) via a cumsum ranking —
     sort-based, no scatter
  4. per-feature lidar depth + groundplane (``frontend_depth_plane``)
  5. per-slot (u,v,d)/valid/label channels via ONE one-hot matmul
     ([N,L]×[N,3] — exact because the slot assignment is injective;
     per-landmark one-hot matmuls replace small scatters, the repo's
     standing TPU rule)
  6. the scan-odometry step (:func:`~limo_tpu.pipeline.scan_odometry.
     make_scan_step`) consumes the channels exactly as the track-tensor
     path does — same solver, same selector stack, same 5-point prior.

The host driver (:func:`run_fused`) chunks frames so upload buffers stay
bounded and the one compiled program is reused across chunks; the final
partial chunk is padded by replaying the last frame (padded outputs are
dropped; state is not reused afterwards).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LimoConfig
from ..frontend import tracker as trk
from ..frontend.semantics import dilate_labels, sample_labels
from ..window_manager import DEFAULT_OUTLIER_LABELS
from . import scan_odometry as so
from .full import LimoPipelineConfig, frontend_depth_plane


class FusedState(NamedTuple):
    scan: so.ScanState
    prev_uv: jnp.ndarray        # [N,2] previous frame's features
    prev_desc: jnp.ndarray      # [N,D]
    prev_valid: jnp.ndarray     # [N]
    slot_of_feat: jnp.ndarray   # [N] int32 landmark slot per feature (-1)


class FusedOut(NamedTuple):
    pose: jnp.ndarray           # [7] vehicle←origin per frame
    is_keyframe: jnp.ndarray
    solved: jnp.ndarray
    cost: jnp.ndarray
    n_tracks: jnp.ndarray       # live tracks holding a slot this frame
    n_matches: jnp.ndarray      # feature matches to the previous frame
    n_depth: jnp.ndarray        # features with a valid lidar depth


def init_fused_state(cfg: LimoConfig, pcfg: LimoPipelineConfig,
                     dtype=jnp.float32) -> FusedState:
    N = pcfg.tracker.max_features
    D = 3 * pcfg.tracker.patch * pcfg.tracker.patch
    return FusedState(
        scan=so.init_state(cfg.capacity, dtype, cfg.prior.default_speed),
        prev_uv=jnp.zeros((N, 2), dtype),
        prev_desc=jnp.zeros((N, D), dtype),
        prev_valid=jnp.zeros((N,), bool),
        slot_of_feat=jnp.full((N,), -1, jnp.int32),
    )


def _assign_slots(prev_index, prev_slot_of_feat, feat_valid, lm_valid):
    """Track-table update: inherited slots for matched features, free slots
    for new ones. Sort/cumsum-based — no scatter on the device path.

    Returns slot [N] int32 (-1 = no slot). Injective by construction:
    mutual-NN matching makes ``prev_index`` injective over matches, and
    free slots are assigned by distinct ranks."""
    N = prev_index.shape[0]
    L = lm_valid.shape[0]
    matched = prev_index >= 0
    inh = jnp.where(matched,
                    prev_slot_of_feat[jnp.clip(prev_index, 0, N - 1)], -1)
    inh = jnp.where(feat_valid, inh, -1)
    has_inh = inh >= 0

    # slots in use: live window landmarks + slots inherited this frame
    # (one_hot of -1 is all-zero, so dropped features contribute nothing)
    inh_used = jnp.any(jax.nn.one_hot(inh, L, dtype=jnp.bool_), axis=0)
    used = lm_valid | inh_used
    free = ~used
    free_slots = jnp.argsort(~free)                  # free slot ids first
    n_free = jnp.sum(free.astype(jnp.int32))

    need_new = feat_valid & (~has_inh)
    new_rank = jnp.cumsum(need_new.astype(jnp.int32)) - 1
    new_slot = free_slots[jnp.clip(new_rank, 0, L - 1)].astype(jnp.int32)
    got_new = need_new & (new_rank < n_free)
    return jnp.where(has_inh, inh,
                     jnp.where(got_new, new_slot, -1)).astype(jnp.int32)


def make_fused_step(rig, cfg: LimoConfig, pcfg: LimoPipelineConfig,
                    image_size, with_labels: bool,
                    outlier_labels=DEFAULT_OUTLIER_LABELS):
    """Build ``step(FusedState, frame) -> (FusedState, FusedOut)`` with
    ``frame = (stamp, img_u8 [H,W] uint8, cloud_veh [P,3], cloud_valid [P],
    label_img [H,W] uint8)`` (label_img ignored unless ``with_labels``)."""
    tcfg = pcfg.tracker
    lcfg = pcfg.lidar
    L = cfg.capacity.max_landmarks
    scan_step = so.make_scan_step(rig, cfg)
    out_tab = jnp.asarray(sorted(outlier_labels), jnp.int32)
    inv_gamma = 1.0 / pcfg.gamma

    def step(fst: FusedState, frame):
        # The whole front end runs under a full-f32 matmul pin: bf16 MXU
        # lowering corrupts the Shi-Tomasi responses AND the NCC descriptor
        # similarity matmul (the r3 default-vs-pinned study measured
        # 7.2 % vs 2.45 % drift on this scene; calling trk.match outside
        # _detect_and_match's pin silently lost it here in the first fused
        # build — measured 3.6 % on-chip). The scan step below re-enters
        # its own per-site precision policy (solver_matmul / Schur pins).
        with jax.default_matmul_precision("highest"):
            return _step_inner(fst, frame)

    def _step_inner(fst: FusedState, frame):
        stamp, img_u8, cloud, cloud_valid, label_img = frame
        dtype = fst.prev_uv.dtype

        # ---- 1. gamma normalization (image_preproc nodelet,
        # feature_matching.launch:9-15) --------------------------------
        img = (img_u8.astype(dtype) / 255.0) ** inv_gamma

        # ---- 2. detect + match (viso2-equivalent front end) ----------
        feats = trk.detect(img, tcfg)
        prev = trk.Features(uv=fst.prev_uv,
                            response=jnp.zeros((fst.prev_uv.shape[0],), dtype),
                            desc=fst.prev_desc, valid=fst.prev_valid)
        m = trk.match(feats, prev, tcfg)

        # ---- 3. device-side track table ------------------------------
        slot = _assign_slots(m.prev_index, fst.slot_of_feat, feats.valid,
                             fst.scan.window.lm_valid)
        ok = feats.valid & (slot >= 0)

        # ---- 4. lidar depth + groundplane (one traced block) ---------
        d, plane, plane_ok = frontend_depth_plane(
            cloud, cloud_valid, rig.T_cam_veh[0].astype(dtype), feats.uv,
            rig.focal[0].astype(dtype), rig.principal[0].astype(dtype),
            image_size, lcfg, pcfg.use_groundplane, tuple(pcfg.gp_band))
        hog = cfg.landmark_selection.height_over_ground
        plane = jnp.where(plane_ok, plane,
                          jnp.asarray([0.0, 0.0, 1.0, hog], dtype))

        # ---- 5. semantic labels (dilate + 3×3 ROI sample,
        # semantic_labels.launch:10-36) --------------------------------
        if with_labels:
            li = label_img.astype(jnp.int32)
            prio = jnp.isin(li, out_tab)
            lab_feat = sample_labels(dilate_labels(li, prio), feats.uv)
        else:
            lab_feat = jnp.full((feats.uv.shape[0],), -2, jnp.int32)

        # ---- 6. per-slot channels via ONE one-hot matmul -------------
        # (injective slot assignment ⇒ the sum over N selects exactly one
        # feature per slot; landmark-major layout, no scatter)
        M = jax.nn.one_hot(slot, L, dtype=dtype) * ok[:, None]     # [N,L]
        uvd_feat = jnp.concatenate([feats.uv, d[:, None]], -1)
        uvd_slot = jnp.einsum("nl,nc->lc", M, uvd_feat,
                              precision=jax.lax.Precision.HIGHEST)
        valid_slot = jnp.sum(M, axis=0) > 0.5
        lab_slot = (jnp.round(jnp.einsum(
            "nl,n->l", M, (lab_feat + 2).astype(dtype))).astype(jnp.int32)
            - 2)                                   # empty slots → -2

        # ---- 7. the scan-odometry step (prior → pose-only → gates →
        # push → labels → throttled windowed solve) --------------------
        no_prior = jnp.zeros((7,), dtype).at[0].set(1.0)
        frame2 = (stamp, uvd_slot, valid_slot, lab_slot,
                  jnp.zeros((L,), bool), plane, plane_ok,
                  no_prior, jnp.asarray(False))
        scan2, out = scan_step(fst.scan, frame2)

        fst2 = FusedState(scan=scan2, prev_uv=feats.uv, prev_desc=feats.desc,
                          prev_valid=feats.valid, slot_of_feat=slot)
        return fst2, FusedOut(
            pose=out.pose, is_keyframe=out.is_keyframe, solved=out.solved,
            cost=out.cost,
            n_tracks=jnp.sum(ok.astype(jnp.int32)),
            n_matches=m.n_matches,
            n_depth=jnp.sum((ok & (d > 0)).astype(jnp.int32)))

    return step


_RUNNER_CACHE: dict = {}


def _get_runner(rig, cfg, pcfg, image_size, with_labels):
    """One jitted scan runner per (rig, configs, image size) — a fresh
    ``jax.jit`` wrapper per ``run_fused`` call would miss JAX's trace
    cache and re-pay the full compile on every call (the warm `--repeat`
    measurement over axon depends on this; same lesson as
    make_tuning_runner)."""
    key = (cfg, pcfg, image_size, with_labels,
           np.asarray(rig.focal).tobytes(),
           np.asarray(rig.principal).tobytes(),
           np.asarray(rig.T_cam_veh).tobytes())
    if key not in _RUNNER_CACHE:
        step = make_fused_step(rig, cfg, pcfg, image_size, with_labels)
        _RUNNER_CACHE[key] = jax.jit(
            lambda st, xs: jax.lax.scan(step, st, xs))
    return _RUNNER_CACHE[key]


def pad_clouds(clouds, capacity: int, dtype=np.float32):
    """List of [Ni,3] arrays → ([F,capacity,3], [F,capacity] valid)."""
    F = len(clouds)
    buf = np.zeros((F, capacity, 3), dtype)
    msk = np.zeros((F, capacity), bool)
    for i, c in enumerate(clouds):
        n = min(len(c), capacity)
        buf[i, :n] = np.asarray(c, dtype)[:n, :3]
        msk[i, :n] = True
    return buf, msk


def run_fused(stamps, images_u8, clouds, rig, cfg: LimoConfig,
              pcfg: LimoPipelineConfig, label_images=None,
              chunk: Optional[int] = None, dtype=jnp.float32,
              state: Optional[FusedState] = None):
    """Run a whole image+cloud sequence through the fused device program.

    stamps [F]; images_u8 [F,H,W] uint8; clouds: list of [Ni,3] vehicle-
    frame scans (or a pre-padded [F,P,3] array with ``clouds_valid`` built
    in via :func:`pad_clouds` semantics); label_images [F,H,W] uint8 or
    None. ``chunk`` bounds per-dispatch upload size (default: whole
    sequence as one dispatch). Returns (FusedState, FusedOut [F])."""
    F = len(stamps)
    H, W = images_u8.shape[1:3]
    with_labels = label_images is not None
    if isinstance(clouds, np.ndarray) and clouds.ndim == 3:
        cloud_arr = clouds.astype(np.float32)
        cloud_msk = np.any(cloud_arr != 0.0, -1)
    else:
        cloud_arr, cloud_msk = pad_clouds(clouds, pcfg.cloud_capacity)
    labels = (np.asarray(label_images, np.uint8) if with_labels
              else np.zeros((F, 1, 1), np.uint8))
    if not with_labels:
        labels = np.zeros((F, H, W), np.uint8)

    run = _get_runner(rig, cfg, pcfg, (W, H), with_labels)
    st = state if state is not None else init_fused_state(cfg, pcfg, dtype)

    stamps = np.asarray(stamps, np.float32)
    chunk = F if not chunk else min(chunk, F)
    outs = []
    for lo in range(0, F, chunk):
        hi = min(lo + chunk, F)
        idx = np.arange(lo, hi)
        if hi - lo < chunk:               # pad final chunk: replay last frame
            idx = np.concatenate([idx, np.full(chunk - (hi - lo), hi - 1)])
        xs = (jnp.asarray(stamps[idx]),
              jnp.asarray(images_u8[idx]),
              jnp.asarray(cloud_arr[idx]),
              jnp.asarray(cloud_msk[idx]),
              jnp.asarray(labels[idx]))
        st, out = run(st, xs)
        out = jax.tree_util.tree_map(lambda x: x[: hi - lo], out)
        outs.append(jax.device_get(out))
    out = jax.tree_util.tree_map(lambda *x: np.concatenate(x), *outs)
    return st, FusedOut(*out)


def poses_kitti(out: FusedOut) -> np.ndarray:
    """FusedOut → [F,4,4] KITTI origin←vehicle matrices (numpy host math)."""
    from ..geometry import pose_host
    return pose_host.to_matrix(pose_host.inverse(
        np.asarray(out.pose, np.float64)))
