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
from ..geometry import pose as pose_ops
from ..geometry.camera import backproject
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
    prev_depth: jnp.ndarray     # [N] lidar depth of the previous features
                                # (-1 none) — geometry-anchored match
                                # prediction (vehicle motion × depth)
    prev_matches: jnp.ndarray   # int32 — last frame's match count; the
                                # matcher trusts motion predictions only
                                # while matching is healthy, so one bad
                                # pose cannot lock the tracker into a
                                # starvation loop (descriptor-only
                                # fallback recovers the next frame)


class FusedOut(NamedTuple):
    pose: jnp.ndarray           # [7] vehicle←origin per frame
    is_keyframe: jnp.ndarray
    solved: jnp.ndarray
    cost: jnp.ndarray
    n_tracks: jnp.ndarray       # live tracks holding a slot this frame
    n_matches: jnp.ndarray      # feature matches to the previous frame
    n_depth: jnp.ndarray        # features with a valid lidar depth
    # scan-step diagnostics passed through (SURVEY §5 observability;
    # km_turn_debug.py reads these): motion prior, guarded pose-only
    # result, guard verdict, usable-landmark count
    prior: jnp.ndarray          # [7]
    refined: jnp.ndarray        # [7]
    speed_obs: jnp.ndarray      # lidar range-rate speed observation (m/s)
    n_rate: jnp.ndarray         # int32 — depth-carrying persisting slots
    po_ok: jnp.ndarray          # bool
    n_usable: jnp.ndarray       # int32


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
        prev_depth=jnp.full((N,), -1.0, dtype),
        prev_matches=jnp.asarray(0, jnp.int32),
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
    ``frame = (stamp, uv_f [N,2], desc_f [N,D], valid_f [N], d_f [N],
    lab_f [N], plane [4], plane_ok)`` — the PER-FEATURE channels that
    :func:`make_fused_runner` precomputes in its batched detect / mapped
    depth passes. The step holds only the truly sequential work: guided
    matching, the device track table, per-slot channel build, and the
    scan-odometry step."""
    tcfg = pcfg.tracker
    L = cfg.capacity.max_landmarks
    scan_step = so.make_scan_step(rig, cfg)

    def step(fst: FusedState, frame):
        # full-f32 matmul pin for the matcher (bf16 NCC similarity measured
        # on-chip as a drift regression); the scan step re-enters its own
        # per-site precision policy inside.
        with jax.default_matmul_precision("highest"):
            return _step_inner(fst, frame)

    def _step_inner(fst: FusedState, frame):
        stamp, uv_f, desc_f, valid_f, d_f, lab_f, plane, plane_ok = frame
        dtype = fst.prev_uv.dtype

        # ---- 1. guided matching (geometry-anchored prediction) -------
        # Project every previous feature through the constant-velocity
        # vehicle motion at its lidar depth: a per-feature prediction that
        # follows the RADIAL flow field of forward motion. Design history
        # (all three alternatives measured as km-drive failures):
        #  - zero-flow prior: global median flow gate amputates the near,
        #    translation-carrying features at speed (19.7% @ 14 m/s);
        #  - flow-constancy prediction: self-REINFORCES lattice aliasing
        #    on repetitive texture (16% @ 6 m/s — the wrong flow predicts
        #    itself);
        #  - unconditional motion prediction: couples matching to pose
        #    health; one glitch → garbage predictions → starved matcher
        #    → worse pose (33% @ 14 m/s).
        # The anchor is GEOMETRY (lidar depth — which aliased matches
        # cannot fake) and trust is REVOCABLE: predictions apply only
        # while last frame's matching was healthy, else the matcher falls
        # back to descriptor-only mutual-NN (measured 2.5% outliers) and
        # recovers in one frame.
        f0 = rig.focal[0].astype(dtype)
        pp0 = rig.principal[0].astype(dtype)
        tcv = rig.T_cam_veh[0].astype(dtype)
        d_pred = jnp.where(fst.prev_depth > 0, fst.prev_depth,
                           tcfg.depth_anchor_m)
        p_cam = backproject(fst.prev_uv, d_pred, f0[None], pp0)
        p_cam2 = pose_ops.apply(
            tcv, pose_ops.apply(fst.scan.vel,
                                pose_ops.apply(pose_ops.inverse(tcv),
                                               p_cam)))
        z2 = p_cam2[:, 2]
        motion_pred = jnp.where(
            (z2 > 0.5)[:, None],
            f0 * p_cam2[:, :2] / jnp.maximum(z2, 0.5)[:, None] + pp0,
            fst.prev_uv)
        motion_trusted = (fst.prev_matches >= 30) & (fst.scan.n_kf > 0) \
            & tcfg.guided
        pred_uv = jnp.where(motion_trusted, motion_pred, fst.prev_uv)
        pred_known = (fst.prev_depth > 0) & motion_trusted

        feats = trk.Features(uv=uv_f, response=jnp.zeros((uv_f.shape[0],),
                                                         dtype),
                             desc=desc_f, valid=valid_f)
        prev = trk.Features(uv=fst.prev_uv,
                            response=jnp.zeros((fst.prev_uv.shape[0],), dtype),
                            desc=fst.prev_desc, valid=fst.prev_valid)
        m = trk.match(feats, prev, tcfg, pred_uv=pred_uv,
                      pred_known=pred_known)
        pi = m.prev_index

        # ---- 2. device-side track table ------------------------------
        slot = _assign_slots(pi, fst.slot_of_feat, valid_f,
                             fst.scan.window.lm_valid)
        ok = valid_f & (slot >= 0)

        # ---- 3. per-slot channels via ONE one-hot matmul -------------
        # (injective slot assignment ⇒ the sum over N selects exactly one
        # feature per slot; landmark-major layout, no scatter)
        hog = cfg.landmark_selection.height_over_ground
        plane = jnp.where(plane_ok, plane,
                          jnp.asarray([0.0, 0.0, 1.0, hog], dtype))
        M = jax.nn.one_hot(slot, L, dtype=dtype) * ok[:, None]     # [N,L]
        uvd_feat = jnp.concatenate([uv_f, d_f[:, None]], -1)
        uvd_slot = jnp.einsum("nl,nc->lc", M, uvd_feat,
                              precision=jax.lax.Precision.HIGHEST)
        valid_slot = jnp.sum(M, axis=0) > 0.5
        lab_slot = (jnp.round(jnp.einsum(
            "nl,n->l", M, (lab_f + 2).astype(dtype))).astype(jnp.int32)
            - 2)                                   # empty slots → -2

        # ---- 4. the scan-odometry step (prior → pose-only → gates →
        # push → labels → throttled windowed solve) --------------------
        no_prior = jnp.zeros((7,), dtype).at[0].set(1.0)
        frame2 = (stamp, uvd_slot, valid_slot, lab_slot,
                  jnp.zeros((L,), bool), plane, plane_ok,
                  no_prior, jnp.asarray(False))
        scan2, out = scan_step(fst.scan, frame2)

        fst2 = FusedState(scan=scan2, prev_uv=uv_f, prev_desc=desc_f,
                          prev_valid=valid_f, slot_of_feat=slot,
                          prev_depth=d_f,
                          # int32 pin: under x64 the match-count sum
                          # promotes to int64 and breaks the scan carry
                          prev_matches=m.n_matches.astype(jnp.int32))
        return fst2, FusedOut(
            pose=out.pose, is_keyframe=out.is_keyframe, solved=out.solved,
            cost=out.cost,
            n_tracks=jnp.sum(ok.astype(jnp.int32)),
            n_matches=m.n_matches,
            n_depth=jnp.sum((ok & (d_f > 0)).astype(jnp.int32)),
            prior=out.prior, refined=out.refined,
            speed_obs=out.speed_obs, n_rate=out.n_rate, po_ok=out.po_ok,
            n_usable=out.n_usable)

    return step


def make_fused_runner(rig, cfg: LimoConfig, pcfg: LimoPipelineConfig,
                      image_size, with_labels: bool,
                      outlier_labels=DEFAULT_OUTLIER_LABELS):
    """The chunk runner: three device passes inside ONE jitted program.

      1. batched ``detect`` over the chunk's frames (per-frame independent
         — vmapped convolutions fill the MXU far better than one frame at
         a time);
      2. per-frame lidar depth + groundplane via ``lax.map`` (memory-bound
         RANSAC temporaries stay single-frame-sized);
      3. the sequential scan (:func:`make_fused_step`).

    This structure is ALSO the workaround for a measured XLA:TPU
    scheduling pathology: detect's convolutions co-resident with the
    depth pipeline's big sorts in ONE scan body ran 13× slower than the
    two blocks separately (48 ms vs 3.7 ms/frame; barriers did not help)
    — hoisting detect/depth out of the scan removes the coexistence
    entirely and turns the scan into pure small-tensor sequential work."""
    tcfg = pcfg.tracker
    lcfg = pcfg.lidar
    out_tab = jnp.asarray(sorted(outlier_labels), jnp.int32)
    inv_gamma = 1.0 / pcfg.gamma
    step = make_fused_step(rig, cfg, pcfg, image_size, with_labels,
                           outlier_labels)

    def runner(st: FusedState, xs):
        stamps, imgs_u8, clouds, cloud_valid, label_imgs = xs
        dtype = st.prev_uv.dtype
        with jax.default_matmul_precision("highest"):
            # pass 1: gamma + batched detect (+ label sampling at feature
            # positions — needs only uv, so it lives with detect)
            imgs = (imgs_u8.astype(dtype) / 255.0) ** inv_gamma
            feats = jax.vmap(lambda im: trk.detect(im, tcfg))(imgs)
            if with_labels:
                def lab_one(li_uv):
                    li, uv = li_uv
                    li = li.astype(jnp.int32)
                    return sample_labels(dilate_labels(
                        li, jnp.isin(li, out_tab)), uv)
                lab_f = jax.vmap(lab_one)((label_imgs, feats.uv))
            else:
                lab_f = jnp.full(feats.uv.shape[:2], -2, jnp.int32)

            # pass 2: per-frame lidar front end (sequential lax.map keeps
            # the [P,H] RANSAC temporaries at single-frame footprint)
            tcv = rig.T_cam_veh[0].astype(dtype)
            f0 = rig.focal[0].astype(dtype)
            pp0 = rig.principal[0].astype(dtype)

            def depth_one(args):
                cloud, cv, uv = args
                return frontend_depth_plane(
                    cloud, cv, tcv, uv, f0, pp0, image_size, lcfg,
                    pcfg.use_groundplane, tuple(pcfg.gp_band))

            d_f, planes, planes_ok = jax.lax.map(
                depth_one, (clouds, cloud_valid, feats.uv))

        # pass 3: the sequential scan
        return jax.lax.scan(step, st, (stamps, feats.uv, feats.desc,
                                       feats.valid, d_f, lab_f, planes,
                                       planes_ok))

    return runner


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
        _RUNNER_CACHE[key] = jax.jit(
            make_fused_runner(rig, cfg, pcfg, image_size, with_labels))
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
