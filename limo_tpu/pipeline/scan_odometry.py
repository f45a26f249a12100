"""Whole-sequence odometry as ONE compiled device program (``lax.scan``).

The reference evaluates KITTI sequences serially through a ROS graph, one
frame per callback (``kitti_eval_script.sh``, SURVEY §3.5). This module is
the TPU-native equivalent the survey calls for: the full per-frame pipeline —
constant-velocity prior → motion-only refinement → keyframe gates → push
(depth backprojection / midpoint triangulation) → label flow → connectivity
windowing → windowed trimmed BA with the full selector stack — runs as a
single ``lax.scan`` over frames, so a whole sequence is one XLA program, a
*batch* of sequences is one ``vmap``, and a fleet of sequences shards over a
device mesh on the data axis (§2.13).

The solve path here is the SAME full-fidelity stack as the host-driven
:class:`~limo_tpu.pipeline.odometry` pipeline: cheirality → voxel
sparsification → AddDepth(gp) guarantees → groundplane residual wiring →
scale logic (``selection_for_solve``), per-frame semantic label flow
(``updateLabels`` semantics: outlier labels, shrubbery weights, ground
flags — bundle_adjuster_keyframes.cpp:388-431), and connectivity-based
keyframe deactivation (``deactivateKeyframes`` :907-987) instead of a plain
ring. Tracks arrive as a dense per-frame tensor ``[F, L, 3]`` keyed by
landmark slot (the host maps tracker ids → slots; the synthetic tracker and
the KITTI adapter already produce stable rows).

Reference call stack being compiled here: ``MonoLidar::callbackSubscriber``
(mono_lidar.cpp:88-373) — prior, adjustPoseOnly, KeyframeSelector::select,
push, throttled deactivate+updateLabels+solve — collapsed into one jitted
step per frame.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import pose as pose_ops
from ..geometry import quaternion as quat
from ..geometry.camera import backproject, viewing_ray
from ..geometry.triangulation import triangulate_batch
from ..selection.keyframe import select_keyframe
from ..solver.pose_only import pose_only_step
from ..solver.trimmed import solve_trimmed
from ..state import Window, empty_window
from ..window_manager import (DEFAULT_GROUND_LABELS, DEFAULT_OUTLIER_LABELS,
                              DEFAULT_SHRUBBERY_LABELS, selection_for_solve)


class ScanState(NamedTuple):
    window: Window
    lm_outlier: jnp.ndarray     # [L] label/flag-based rejects (updateLabels)
    sel_mask: jnp.ndarray       # [L] last solve's landmark selection
    newest_slot: jnp.ndarray    # int32 — slot of the newest keyframe
    n_kf: jnp.ndarray           # int32 — keyframes pushed so far
    cur_pose: jnp.ndarray       # [7] latest pose incl. solve corrections
    vel: jnp.ndarray            # [7] frame delta relative(refined_t, out_{t-1})
                                # — anchored at the *corrected* previous pose,
                                # so neither a BA jump nor a bad refined frame
                                # poisons subsequent priors
    last_kf_pose: jnp.ndarray   # [7]
    last_kf_stamp: jnp.ndarray
    last_kf_uv: jnp.ndarray     # [L,2] pixels at the last keyframe
    last_kf_uv_valid: jnp.ndarray  # [L]
    last_solve_stamp: jnp.ndarray
    last_stamp: jnp.ndarray     # previous frame's stamp — per-frame dt for
                                # the speed-derived plausibility budgets
    last_d: jnp.ndarray         # [L] previous frame's per-slot lidar depth
    last_d_valid: jnp.ndarray   # [L] — depth-rate speed observation
    speed: jnp.ndarray          # scalar m/s from the last two keyframes —
                                # scales the 5-point unit translation
                                # (mono_lidar.cpp:168-185; default 13 m/s
                                # before two keyframes exist,
                                # general_helpers.hpp:215)


class FrameOut(NamedTuple):
    pose: jnp.ndarray           # [7] vehicle←origin per frame
    is_keyframe: jnp.ndarray    # bool
    solved: jnp.ndarray         # bool
    cost: jnp.ndarray           # BA cost after the frame (0 when no solve)
    # diagnostics (SURVEY §5 observability): where the frame's pose came
    # from — the motion prior, the motion-only refinement, and whether the
    # refinement passed the plausibility guard / usable-landmark gate
    prior: jnp.ndarray          # [7] motion prior fed to pose-only
    refined: jnp.ndarray        # [7] raw pose-only result (pre-guard;
                                # pair with po_ok — km_turn_debug.py needs
                                # the unguarded value)
    speed_obs: jnp.ndarray      # lidar range-rate speed observation (m/s)
    n_rate: jnp.ndarray         # int32 — depth-carrying persisting slots
    po_ok: jnp.ndarray          # bool — refinement within plausibility
    n_usable: jnp.ndarray       # int32 — landmarks usable for pose-only


def init_state(cap, dtype=jnp.float32, default_speed: float = 13.0
               ) -> ScanState:
    w = empty_window(cap, dtype)
    L = w.L
    p0 = pose_ops.identity(dtype)
    return ScanState(
        window=w,
        lm_outlier=jnp.zeros((L,), bool),
        sel_mask=jnp.zeros((L,), bool),
        newest_slot=jnp.asarray(0, jnp.int32),
        n_kf=jnp.asarray(0, jnp.int32),
        cur_pose=p0,
        vel=p0,
        last_kf_pose=p0,
        last_kf_stamp=jnp.asarray(-1e9, w.stamps.dtype),
        last_kf_uv=jnp.zeros((L, 2), dtype),
        last_kf_uv_valid=jnp.zeros((L,), bool),
        last_solve_stamp=jnp.asarray(-1e9, w.stamps.dtype),
        last_stamp=jnp.asarray(-1e9, w.stamps.dtype),
        last_d=jnp.full((L,), -1.0, dtype),
        last_d_valid=jnp.zeros((L,), bool),
        speed=jnp.asarray(default_speed, dtype),
    )


def _oldest_two(stamps, valid):
    """Slots of the oldest and second-oldest active keyframes."""
    big = jnp.asarray(jnp.inf, stamps.dtype)
    s = jnp.where(valid, stamps, big)
    k0 = jnp.argmin(s)
    s2 = s.at[k0].set(big)
    k1 = jnp.argmin(s2)
    return k0.astype(jnp.int32), k1.astype(jnp.int32)


def _write_slot(stamps, valid):
    """Slot for the next keyframe: any free slot first, else evict the
    oldest active one (its pose was already emitted per frame — the scan
    equivalent of the host allocator's archive-and-reuse)."""
    small = jnp.asarray(-jnp.inf, stamps.dtype)
    return jnp.argmin(jnp.where(valid, stamps, small)).astype(jnp.int32)


def _deactivate(window: Window, newest_slot, cfg) -> Window:
    """``deactivateKeyframes`` (bundle_adjuster_keyframes.cpp:907-987) as a
    pure device function: the newest ``min_window`` keyframes stay active;
    beyond ``max_window`` always deactivated; in between active iff sharing
    ≥ ``min_num_connecting_landmarks`` landmarks with the newest keyframe
    (getCommonLandmarkIds :88-111). Active landmarks shrink to those observed
    in the window (:950-960); fixation reassigned: oldest active → Pose,
    second-oldest → Scale (:962-986)."""
    wc = cfg.window
    K = window.K
    stamps, valid = window.stamps, window.kf_valid
    newer = valid[None, :] & (stamps[None, :] > stamps[:, None])
    rank = jnp.sum(newer.astype(jnp.int32), axis=1)          # 0 = newest
    obs_any = jnp.any(window.obs_mask, axis=-1)              # [L,K]
    common = jnp.sum((obs_any & obs_any[:, newest_slot][:, None]
                      & window.lm_valid[:, None]).astype(jnp.int32), axis=0)
    keep = valid & ((rank < wc.min_size_optimization_window)
                    | ((rank < wc.max_size_optimization_window)
                       & (common >= wc.min_num_connecting_landmarks)))
    obs_mask = window.obs_mask & keep[None, :, None]
    lm_valid = window.lm_valid & jnp.any(obs_mask, axis=(1, 2))
    k0, k1 = _oldest_two(stamps, keep)
    fix_pose = jax.nn.one_hot(k0, K, dtype=jnp.int32).astype(bool) & keep
    fix_scale = jax.nn.one_hot(k1, K, dtype=jnp.int32).astype(bool) & keep
    return window._replace(kf_valid=keep, obs_mask=obs_mask, lm_valid=lm_valid,
                           fix_pose=fix_pose, fix_scale=fix_scale,
                           plane_valid=window.plane_valid & keep)


def _push_keyframe(window: Window, slot, stamp, pose, uvd, valid, plane,
                   plane_ok, rig, cfg):
    """Write a keyframe into ``slot`` (evicting its previous occupant) and
    initialize new landmarks — the device-side ``push``
    (bundle_adjuster_keyframes.cpp:289-329: depth-backproject if any camera
    measured depth, else midpoint triangulation; failures retried on later
    pushes). Also stores the frame's local groundplane estimate into the
    keyframe slot (``Keyframe::local_ground_plane_``).

    Returns (window, fresh [L] — rows whose landmark was initialized by THIS
    push; label-derived per-row state is reset for them so a reused row never
    inherits the previous occupant's labels)."""
    K, L = window.K, window.L
    dtype = window.poses.dtype
    oh = jax.nn.one_hot(slot, K, dtype=dtype)              # [K]
    ohb = oh.astype(bool)

    # evict + write the keyframe slot
    stamps = jnp.where(ohb, stamp, window.stamps)
    poses = jnp.where(ohb[:, None], pose[None, :], window.poses)
    kf_valid = window.kf_valid | ohb
    obs = jnp.where(ohb[None, :, None, None],
                    jnp.where(valid[:, None, None, None],
                              uvd[:, None, None, :], 0.0),
                    window.obs)
    obs_mask = jnp.where(ohb[None, :, None],
                         valid[:, None, None], window.obs_mask)
    planes = jnp.where(ohb[:, None], plane[None, :].astype(dtype),
                       window.planes)
    plane_valid = jnp.where(ohb, plane_ok, window.plane_valid)

    # ---- landmark initialization ------------------------------------
    f = rig.focal[0].astype(dtype)
    pp = rig.principal[0].astype(dtype)
    tcv = rig.T_cam_veh[0].astype(dtype)
    T_origin_veh = pose_ops.inverse(pose)
    T_veh_cam = pose_ops.inverse(tcv)

    # (a) depth backprojection for rows observed with d > 0
    d = uvd[:, 2]
    p_cam = backproject(uvd[:, :2], d, f[None], pp)
    p_origin = pose_ops.apply(T_origin_veh, pose_ops.apply(T_veh_cam, p_cam))
    init_depth = valid & (d > 0) & (~window.lm_valid)

    # (b) midpoint triangulation from all window observations (≥ 2 rays)
    uv_all = obs[:, :, 0, :2]                               # [L,K,2]
    ray_cam = viewing_ray(uv_all, jnp.broadcast_to(f, (L, K)), pp)
    T_origin_cam = jax.vmap(
        lambda p: pose_ops.compose(pose_ops.inverse(p), T_veh_cam))(poses)
    rays_o = jax.vmap(  # over K
        lambda T, r: pose_ops.apply(
            pose_ops.make(T[:4], jnp.zeros(3, dtype)), r),
        in_axes=(0, 1), out_axes=1)(T_origin_cam, ray_cam)  # [L,K,3]
    centers = jnp.broadcast_to(T_origin_cam[None, :, 4:], (L, K, 3))
    rmask = obs_mask[:, :, 0] & kf_valid[None, :]
    tri_pos, tri_ok = triangulate_batch(rays_o, centers, rmask)
    init_tri = tri_ok & (~window.lm_valid) & (~init_depth) \
        & jnp.take(obs_mask[:, :, 0], slot, axis=1)

    lm_pos = jnp.where(init_depth[:, None], p_origin,
                       jnp.where(init_tri[:, None], tri_pos, window.lm_pos))
    lm_valid = window.lm_valid | init_depth | init_tri
    fresh = init_depth | init_tri
    # a freshly initialized row resets per-landmark state (row slots are
    # reused after GC on long drives — the previous occupant's depth flag,
    # label weight, and gp flag must not leak)
    lm_has_depth = jnp.where(fresh, init_depth, window.lm_has_depth) \
        | (lm_valid & valid & (d > 0))
    lm_weight = jnp.where(fresh, jnp.ones((), dtype), window.lm_weight)
    lm_is_gp = jnp.where(fresh, False, window.lm_is_gp)

    # GC: rows with no observation left in the window lose their landmark
    seen = jnp.any(obs_mask[:, :, 0] & kf_valid[None, :], axis=1)
    lm_valid = lm_valid & seen

    # fixation invariant: oldest active = Pose, second oldest = Scale
    k0, k1 = _oldest_two(stamps, kf_valid)
    fix_pose = jax.nn.one_hot(k0, K, dtype=jnp.int32).astype(bool) & kf_valid
    fix_scale = jax.nn.one_hot(k1, K, dtype=jnp.int32).astype(bool) & kf_valid

    return window._replace(
        stamps=stamps, poses=poses, kf_valid=kf_valid,
        fix_pose=fix_pose, fix_scale=fix_scale,
        planes=planes, plane_valid=plane_valid,
        lm_pos=lm_pos, lm_valid=lm_valid, lm_has_depth=lm_has_depth,
        lm_weight=lm_weight, lm_is_gp=lm_is_gp,
        obs=obs, obs_mask=obs_mask), fresh


def make_scan_step(rig, cfg, solve_budget: Optional[int] = None,
                   prior_mode: Optional[str] = None,
                   outlier_labels=DEFAULT_OUTLIER_LABELS,
                   shrubbery_labels=DEFAULT_SHRUBBERY_LABELS,
                   ground_labels=DEFAULT_GROUND_LABELS):
    """Build the per-frame scan step function.

    Returns ``step(state, frame) -> (state, FrameOut)`` with
    ``frame = (stamp, uvd [L,3], valid [L], label [L], flag_outlier [L],
    plane [4], plane_ok, ext_prior [7], ext_prior_ok)``,
    jit/scan/vmap-ready. Use :func:`frame_arrays` to build the per-frame
    channels with reference defaults.

    prior_mode: "essential" (default via cfg.prior.scan_prior_mode — a
    fresh per-frame 5-point essential prior vs the last keyframe, computed
    INSIDE the compiled step from the per-slot track rows; the reference's
    per-frame calcMotion5Point, general_helpers.hpp:103-140),
    "constant_velocity" (the motion-model prior), or "identity".
    """
    del solve_budget  # trim budgets come from cfg (solver/robust sections)
    if prior_mode is None:
        prior_mode = getattr(cfg.prior, "scan_prior_mode", "constant_velocity")
    wcfg = cfg.window
    out_tab = jnp.asarray(sorted(outlier_labels), jnp.int32)
    shrub_tab = jnp.asarray(sorted(shrubbery_labels), jnp.int32)
    ground_tab = jnp.asarray(sorted(ground_labels), jnp.int32)

    def step(st: ScanState, frame):
        (stamp, uvd, valid, label, flag_out, plane, plane_ok,
         ext_prior, ext_prior_ok) = frame
        dtype = st.cur_pose.dtype
        uvd = uvd.astype(dtype)
        pc = cfg.prior

        # Speed-derived per-frame plausibility budget (VERDICT r4 item 4):
        # budget_m = max(floor, factor × max(speed, floor_speed) × dt).
        # The r4 fixed 5 m bound silently BINDS at speed — at 25 m/s
        # (KITTI seq 01) the true per-frame motion is 2.5 m and legitimate
        # corrections exceed 5 m; the reference scales translation budgets
        # by measured speed with no caps (general_helpers.hpp:209-231).
        dt_frame = jnp.clip((stamp - st.last_stamp).astype(dtype),
                            1e-3, 1.0)
        budget_m = jnp.maximum(
            jnp.asarray(pc.guard_floor_m, dtype),
            pc.guard_speed_factor
            * jnp.maximum(st.speed, pc.guard_floor_speed) * dt_frame)
        budget_rad = jnp.asarray(pc.guard_rotation_rad, dtype)

        # Lidar depth-rate speed observation (the high-speed failure mode,
        # docs/PERF.md high-speed section): per-slot lidar depths measure
        # range rate directly — a speed observation IMMUNE to image-space
        # match aliasing. At 25 m/s the per-frame appearance scale change
        # (~20% near field) lets self-similar texture alias matches toward
        # the (short) predicted positions; the aliased field is smooth and
        # plentiful, so every image-space health gate passes while the
        # estimated speed ratchets to zero (measured: est speed 0.2 m/s
        # with 160 'healthy' matches at f225). The lidar range-rate median
        # over persisting depth-carrying slots arbitrates SCALE at every
        # acceptance point below (prior, pose-only, windowed solve, speed
        # state) — which is the mono+lidar thesis itself: metric scale
        # comes from the lidar, not from image matching
        # (monolidar_fusion; mono_lidar.cpp:155-187). Deliberately NOT
        # gated on window.lm_valid: the first cut required it, and the
        # 25 m/s dump showed the dying window killed n_rate exactly when
        # the rescue was needed (prior collapsed to 0.0 at f230-270).
        d_cur = uvd[:, 2]
        both = valid & st.last_d_valid & (d_cur > 0)
        rate = (st.last_d - d_cur) / dt_frame
        plaus = both & (jnp.abs(rate) < 80.0)
        n_rate = jnp.sum(plaus.astype(jnp.int32))
        big = jnp.asarray(jnp.inf, dtype)
        rs = jnp.sort(jnp.where(plaus, rate, big))
        i_med = jnp.clip((n_rate - 1) // 2, 0, rate.shape[0] - 1)
        speed_obs = jnp.maximum(
            0.5 * (rs[i_med] + rs[jnp.clip(n_rate // 2, 0,
                                           rate.shape[0] - 1)]), 0.0)
        lidar_has = n_rate >= pc.lidar_min_rates

        def lidar_agrees(sp):
            # a speed estimate is lidar-consistent when no observation
            # exists, or it sits within the configured band — the floor
            # covers honest per-frame pose-only jitter and the keyframe-
            # averaged-vs-instantaneous lag through decel ramps; the
            # fraction covers turn-geometry cos() loss and median bias
            # from dynamic objects (band choice measured, config.py)
            return (~lidar_has) | (jnp.abs(sp - speed_obs)
                                   <= jnp.maximum(pc.lidar_band_floor_m_s,
                                                  pc.lidar_band_frac
                                                  * speed_obs))

        # ---- 1. prior (mono_lidar.cpp:155-187); an external prior
        # (tf odometry / host 5-point, mono_lidar.cpp:119-150) overrides
        # the internal estimate when provided ------------------------------
        if prior_mode in ("constant_velocity", "essential"):
            # plausibility clamp: a glitched frame must not teleport the
            # prior out of the solver's basin (reference analogue: the
            # prior_speed-scaled 5-point translation, general_helpers.hpp:
            # 209-231, is bounded by construction)
            tv = st.vel[4:]
            tn = jnp.linalg.norm(tv)
            tv = tv * jnp.minimum(1.0, budget_m / jnp.maximum(tn, 1e-9))

            speed_inst = tn / dt_frame
            rescue = lidar_has & (~lidar_agrees(speed_inst))
            # keep the motion direction when it exists; a near-zero vel
            # has no direction — fall back to straight-ahead (T_cur←prev
            # translation for forward motion is −m·e_x)
            fwd = jnp.asarray([-1.0, 0.0, 0.0], dtype)
            dirv = jnp.where(tn > 0.2, tv / jnp.maximum(tn, 1e-9), fwd)
            tv = jnp.where(rescue, dirv * speed_obs * dt_frame, tv)

            wv = quat.qlog(st.vel[:4])
            wn = jnp.linalg.norm(wv)
            wv = wv * jnp.minimum(1.0, budget_rad / jnp.maximum(wn, 1e-9))
            vel = pose_ops.make(quat.qexp(wv), tv)
            prior = pose_ops.normalize(pose_ops.compose(vel, st.cur_pose))
        else:  # "identity" — no motion model
            prior = st.cur_pose
        if prior_mode == "essential":
            # fresh per-frame 5-point vs the last keyframe, from the
            # per-slot track rows (both-valid mask = the reference's
            # getMatches at two stamps, general_helpers.hpp:44-76), unit
            # translation scaled by speed·Δt (getMotionUnscaled :209-231).
            # Falls back to the constant-velocity prior when RANSAC fails
            # (the reference falls back to identity motion :111-124; the
            # motion model is the scan path's strictly better equivalent).
            from ..frontend.essential import (estimate_essential,
                                              motion_prior_unscaled)
            # planar two-fold disambiguation (VERDICT r4 item 6): hand the
            # CV prior's relative rotation — conjugated into the CAMERA
            # frame — to the cheirality vote as a tie-breaker, so the
            # (R,t) fold cannot flip frame-to-frame on vote noise over
            # ground-dominated stretches (the 68 m f100 shock)
            tcv_p = rig.T_cam_veh[0].astype(dtype)
            dv = pose_ops.relative(prior, st.last_kf_pose)
            q_guess_cam = pose_ops.compose(
                tcv_p, pose_ops.compose(dv, pose_ops.inverse(tcv_p)))[:4]
            res = estimate_essential(
                st.last_kf_uv, uvd[:, :2], valid & st.last_kf_uv_valid,
                rig.focal[0].astype(dtype), rig.principal[0].astype(dtype),
                num_hypotheses=getattr(pc, "scan_num_hypotheses", 64),
                thres_px=pc.ransac_thres_px, min_flow_px=pc.min_flow_px,
                q_guess=q_guess_cam)
            dt_kf = jnp.maximum((stamp - st.last_kf_stamp).astype(dtype),
                                1e-3)
            # Scale trust is a FRESHNESS question, not a fixed cap: while
            # keyframes arrive on schedule the measured speed is current
            # and the reference contract applies unchanged (scale by
            # speed·Δt, no caps — general_helpers.hpp:209-231; the r4
            # `min(speed, 5/dt_kf)` cap bound speed to 12.5 m/s at the
            # 0.4 s launch keyframe gap, exactly at odds with the
            # prior_speed tunable). After a GAP (standstill stretch: the
            # last keyframe is seconds old, the cached speed is stale) the
            # displacement is bounded by the budget floor so the resume
            # frame cannot teleport out of the solver's basin.
            kf_period = cfg.keyframe_selection.time_between_keyframes_sec
            fresh = dt_kf <= 2.5 * kf_period
            speed_eff = jnp.where(
                fresh, st.speed,
                jnp.minimum(st.speed, pc.guard_floor_m / dt_kf))
            delta = motion_prior_unscaled(
                res, rig.T_cam_veh[0].astype(dtype), speed_eff, dt_kf)
            ess = pose_ops.normalize(
                pose_ops.compose(delta, st.last_kf_pose))
            prior = jnp.where(res.ok, ess, prior)
        prior = jnp.where(st.n_kf > 0, prior, pose_ops.identity(dtype))
        prior = jnp.where(ext_prior_ok, ext_prior.astype(dtype), prior)

        # ---- 2. motion-only refinement (adjustPoseOnly) ----------------
        lm_mask = st.window.lm_valid & (~st.lm_outlier) \
            & (st.sel_mask | (~jnp.any(st.sel_mask)))
        n_usable = jnp.sum((lm_mask & valid).astype(jnp.int32))
        # Iteration budget follows the reference (<=4, cfg.solver). RotRocc
        # stays OFF here by measured necessity: the round-3 A/B (table in
        # PARITY.md §2.9 and config.py) shows RotRocc diverges on this path
        # (3.3-3.8% drift vs 0.06%) because the constant-velocity prior can
        # start outside the divisor's safe basin, while the host driver —
        # whose prior matches the reference's per-frame 5-point estimate —
        # wins with RotRocc ON and uses it (reference parity).
        po = pose_only_step(prior, st.window.lm_pos, uvd[:, None, :],
                            (valid & lm_mask)[:, None], lm_mask, rig, cfg,
                            max_iters=cfg.solver.pose_only_max_iterations,
                            compensate_rotation=(
                                cfg.solver.scan_pose_only_compensate_rotation),
                            lm_weight=st.window.lm_weight,
                            graduated_init=(
                                cfg.solver.scan_pose_only_graduated_init))
        # plausibility bound on the motion-only refinement (the same
        # speed-derived budget as the prior clamps and the post-solve
        # guard): a pose-only solve on corrupted 2D-3D pairs can report a
        # lower robust cost for a teleported pose; the prior is
        # structurally bounded, so a refinement far from it is evidence of
        # corruption, not information. The bound MUST be on the relative
        # pose (vehicle displacement |Δp| and Δθ), NOT on raw t components
        # of the veh←origin poses: position = −Rᵀt, so a legitimate Δθ
        # rotation fix changes t by 2·sin(Δθ/2)·|p| — at 170 m from origin
        # a 3° sharp-turn correction reads as an 8.8 m "translation" and
        # the raw-t guard rejected EXACTLY the corrections the turn needed
        # (km-drive failure, docs/PERF.md).
        po_speed = jnp.linalg.norm(
            pose_ops.relative(po.pose, st.cur_pose)[4:]) / dt_frame
        po_ok = ((jnp.linalg.norm(pose_ops.relative(po.pose, prior)[4:])
                  < budget_m)
                 & (quat.qangle(po.pose[:4], prior[:4]) < budget_rad)
                 # lidar scale arbitration (high-speed delusion loop): a
                 # refinement whose implied speed contradicts the lidar
                 # range rate is aliased-match evidence, not information —
                 # the 25 m/s collapse ENTERED through accepted pose-only
                 # results at half the true motion (f114: 2.5 m gt →
                 # 1.32 m accepted, comfortably inside the 6 m budget)
                 & lidar_agrees(po_speed))
        refined = jnp.where((st.n_kf >= 1) & (n_usable >= 10) & po_ok,
                            po.pose, prior)
        refined = pose_ops.normalize(refined)

        # ---- 3. keyframe gates (KeyframeSelector) ----------------------
        dec = select_keyframe(uvd[:, :2], st.last_kf_uv,
                              valid & st.last_kf_uv_valid,
                              refined[:4], st.last_kf_pose[:4],
                              stamp, st.last_kf_stamp, cfg)
        take_kf = dec.is_keyframe | (st.n_kf == 0)

        # ---- 4. push (slot write + landmark init + plane) --------------
        slot = _write_slot(st.window.stamps, st.window.kf_valid)
        pushed, fresh = _push_keyframe(
            st.window, slot, stamp, refined, uvd, valid,
            plane.astype(dtype), plane_ok, rig, cfg)
        # Deactivate at PUSH, not only at solve: landmark-row GC must not
        # wait for (and be hostage to) an ACCEPTED solve. At 25 m/s scene
        # turnover between keyframes is near-total, so the landmark union
        # over 20 live keyframes exceeds the L=1536 row pool; with GC tied
        # to the solve cadence (and reverted with rejected solves) the
        # track table starved to n_trk=1 for 15-frame stretches while
        # n_matches stayed ~150 — features matched but no slot was free
        # (25 m/s dump, docs/PERF.md high-speed section). Behavior at
        # solve points is unchanged: run_solve's own _deactivate would
        # have dropped the same low-connectivity keyframes.
        pushed = _deactivate(pushed, slot, cfg)
        window = jax.tree_util.tree_map(
            lambda a, b: jnp.where(take_kf, b, a), st.window, pushed)
        fresh = fresh & take_kf
        newest_slot = jnp.where(take_kf, slot, st.newest_slot)

        # ---- 5. label flow (updateLabels, :388-431) ---------------------
        # sticky per-row semantics applied from this frame's channels;
        # fresh rows dropped their previous occupant's state in the push
        lm_outlier = (st.lm_outlier & (~fresh)) \
            | (valid & (flag_out | jnp.isin(label, out_tab)))
        shrub = valid & jnp.isin(label, shrub_tab)
        ground = valid & jnp.isin(label, ground_tab)
        window = window._replace(
            lm_weight=jnp.where(
                shrub,
                jnp.asarray(cfg.regularization.shrubbery_weight, dtype),
                window.lm_weight),
            lm_is_gp=window.lm_is_gp | ground)

        # ---- 6. throttled windowed solve --------------------------------
        # (deactivateKeyframes → selector stack → trimmed BA, the reference
        # solve cadence: mono_lidar.cpp:243-262)
        do_solve = take_kf & (st.n_kf + 1 >= 3) & (
            stamp - st.last_solve_stamp >= 0.98 * wcfg.time_between_solves_sec)

        def run_solve(operand):
            w, lm_out = operand
            w = _deactivate(w, newest_slot, cfg)
            k0, k1 = _oldest_two(w.stamps, w.kf_valid)
            sel, _cat = selection_for_solve(w, newest_slot, k0, k1, lm_out,
                                            rig, cfg)
            w2, sel2, info = solve_trimmed(w, sel, rig, cfg)
            return w2, sel2.lm_selected, info.final_cost.astype(dtype)

        def no_solve(operand):
            w, _ = operand
            return w, st.sel_mask, jnp.asarray(0.0, dtype)

        solved_window, sel_mask, cost = jax.lax.cond(
            do_solve, run_solve, no_solve, (window, lm_outlier))

        # Post-solve plausibility guard (defensive behavior, SURVEY §5):
        # a windowed BA on a corrupted/under-constrained window can ACCEPT
        # a solution that teleports the newest keyframe (measured: a
        # low-cost solve moved the pose 10.7 m in one 0.1 s frame on a
        # straight km drive and poisoned every following window). The
        # motion-only estimate is trusted to bound the correction: reject
        # the whole solve result if it moves the newest pose further than
        # any plausible BA refinement (the speed-derived budget — same
        # bound as the prior clamps above; the reference's analogue is its
        # disabled recovery/rebuild path, bundle_adjuster_keyframes.cpp:
        # 656-686).
        solved_pose = solved_window.poses[newest_slot]
        # the jump bound is the vehicle DISPLACEMENT |Δp| (relative-pose
        # translation), not raw Δt of veh←origin poses — same frame-
        # dependence trap as the motion-only guard above: far from origin
        # a legitimate heading fix has a huge Δt at near-zero Δp
        jump = jnp.linalg.norm(pose_ops.relative(solved_pose, refined)[4:])
        ang = quat.qangle(solved_pose[:4], refined[:4])
        solved_speed = jnp.linalg.norm(
            pose_ops.relative(solved_pose, st.cur_pose)[4:]) / dt_frame
        # rotation bound matters as much as translation: the measured
        # teleport was a heading flip (position = −Rᵀt, so a rotated pose
        # teleports position even with a small Δt). The lidar term: with
        # the speed state corrupted the translation budget is loose
        # (4·50 m/s·0.1 s = 20 m) and BA solves on sparse poisoned windows
        # teleported the pose WITHIN budget (25 m/s dump, f255:
        # 1.20 m refined → 8.13 m accepted) — the range rate caps scale
        # independent of the (possibly corrupted) speed state
        solve_ok = (~do_solve) | ((jump < budget_m) & (ang < budget_rad)
                                  & lidar_agrees(solved_speed))
        window = jax.tree_util.tree_map(
            lambda a, b: jnp.where(solve_ok, b, a), window, solved_window)
        sel_mask = jnp.where(solve_ok, sel_mask, st.sel_mask)
        do_solve = do_solve & solve_ok

        # pose after a solve: the newest keyframe's optimized pose
        slot_pose = window.poses[newest_slot]
        out_pose = jnp.where(do_solve, slot_pose, refined)

        vel = jnp.where(st.n_kf > 0,
                        pose_ops.normalize(
                            pose_ops.relative(refined, st.cur_pose)),
                        pose_ops.identity(dtype))
        # speed from the last two keyframes (mono_lidar.cpp:168-185) —
        # refreshed at each accepted keyframe, used to scale the next
        # frames' 5-point unit translations
        kf_dt = (stamp - st.last_kf_stamp).astype(dtype)
        sp_new = jnp.linalg.norm(
            pose_ops.relative(out_pose, st.last_kf_pose)[4:]) \
            / jnp.maximum(kf_dt, 1e-3)
        # the speed STATE is lidar-arbitrated too: it scales every budget
        # (prior clamp, plausibility guards, landmark budgets), so a
        # vision-corrupted value self-reinforces — the 25 m/s runaway
        # (accepted 4.1-5.2 m/frame vs 2.5 gt for 120 frames) rode a
        # speed state near 45 m/s that no gate could pull back
        sp_new = jnp.where(lidar_agrees(sp_new), sp_new, speed_obs)
        speed = jnp.where(take_kf & (st.n_kf > 0) & (kf_dt > 1e-6),
                          sp_new, st.speed)
        st2 = ScanState(
            window=window,
            lm_outlier=lm_outlier,
            sel_mask=sel_mask,
            newest_slot=newest_slot,
            n_kf=st.n_kf + take_kf.astype(jnp.int32),
            cur_pose=out_pose,
            vel=vel,
            last_kf_pose=jnp.where(take_kf, out_pose, st.last_kf_pose),
            last_kf_stamp=jnp.where(take_kf, stamp, st.last_kf_stamp),
            last_kf_uv=jnp.where(take_kf, uvd[:, :2], st.last_kf_uv),
            last_kf_uv_valid=jnp.where(take_kf, valid, st.last_kf_uv_valid),
            last_solve_stamp=jnp.where(do_solve, stamp, st.last_solve_stamp),
            last_stamp=stamp,
            last_d=jnp.where(valid & (uvd[:, 2] > 0), uvd[:, 2], -1.0),
            last_d_valid=valid & (uvd[:, 2] > 0),
            speed=speed,
        )
        return st2, FrameOut(pose=out_pose, is_keyframe=take_kf,
                             solved=do_solve, cost=cost,
                             prior=prior, refined=po.pose,
                             speed_obs=speed_obs, n_rate=n_rate,
                             po_ok=po_ok, n_usable=n_usable)

    return step


def _prior_arrays(priors, prior_valid, F, dtype):
    if priors is None:
        p = jnp.zeros((F, 7), dtype).at[:, 0].set(1.0)
        ok = jnp.zeros((F,), bool)
    else:
        p = jnp.asarray(priors, dtype)
        ok = (jnp.ones((F,), bool) if prior_valid is None
              else jnp.asarray(prior_valid))
    return p, ok


def frame_arrays(stamps, uvd_seq, valid_seq, cfg, dtype=jnp.float32,
                 labels=None, outlier_flags=None, planes=None, planes_ok=None,
                 priors=None, prior_valid=None, stamp_dtype=jnp.float32):
    """Assemble the full per-frame channel tuple the scan step consumes.

    Defaults reproduce the reference launch graph when a channel is absent:
    labels −2 (no semantics attached), no outlier flags, a per-frame
    groundplane prior at ``height_over_ground`` below the vehicle origin
    (the reference's plane default when the estimator publishes nothing),
    no external prior."""
    F = len(stamps)
    L = np.asarray(uvd_seq).shape[1]
    lab = (jnp.full((F, L), -2, jnp.int32) if labels is None
           else jnp.asarray(labels, jnp.int32))
    flg = (jnp.zeros((F, L), bool) if outlier_flags is None
           else jnp.asarray(outlier_flags))
    if planes is None:
        hog = cfg.landmark_selection.height_over_ground
        pl = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0, hog], dtype), (F, 4))
        ok = jnp.ones((F,), bool)
    else:
        pl = jnp.asarray(planes, dtype)
        ok = (jnp.ones((F,), bool) if planes_ok is None
              else jnp.asarray(planes_ok))
    p, pok = _prior_arrays(priors, prior_valid, F, dtype)
    return (jnp.asarray(stamps, stamp_dtype), jnp.asarray(uvd_seq, dtype),
            jnp.asarray(valid_seq), lab, flg, pl, ok, p, pok)


def run_sequence(stamps, uvd_seq, valid_seq, rig, cfg, priors=None,
                 prior_valid=None, dtype=jnp.float32, labels=None,
                 outlier_flags=None, planes=None, planes_ok=None):
    """Run a whole sequence through the scan program.

    stamps [F], uvd_seq [F,L,3], valid_seq [F,L] with L equal to the
    landmark capacity (cfg.capacity.max_landmarks). ``priors`` [F,7]
    optionally injects external pose priors (the reference's tf-odometry /
    5-point path); ``labels`` [F,L] per-row semantic labels; ``planes``
    [F,4] per-frame groundplane estimates in the vehicle frame.
    Returns (final ScanState, FrameOut with frame axis).
    """
    st = init_state(cfg.capacity, dtype, cfg.prior.default_speed)
    step = make_scan_step(rig, cfg)
    run = jax.jit(lambda st, xs: jax.lax.scan(step, st, xs))
    xs = frame_arrays(stamps, uvd_seq, valid_seq, cfg, dtype, labels,
                      outlier_flags, planes, planes_ok, priors, prior_valid,
                      stamp_dtype=st.window.stamps.dtype)
    return run(st, xs)


def _batched_run(stamps_b, uvd_b, valid_b, rig, cfg, priors_b,
                 prior_valid_b, dtype, labels_b=None, outlier_flags_b=None,
                 planes_b=None, planes_ok_b=None, vmap_chunk=None):
    """Shared assembly for run_batch/run_fleet: (batched runner, args).

    ``vmap_chunk`` bounds the width of the vmapped group: the batch is
    processed as ``lax.map`` over ⌈B/chunk⌉ groups of ``vmap_chunk``
    vmapped sequences (B must divide evenly; callers pad). Under vmap the
    per-frame ``solve_trimmed`` while_loop runs batch-max iterations for
    the WHOLE group and ``lax.cond`` lowers to both-branch selects, so
    each batch slot pays the batch's worst case. On-chip A/B
    (``scripts/b2_vmap_chunk.py``, r4): the worst-case penalty is real
    per-slot (4.7→5.8 ms/frame-slot at B=1→2) but the AGGREGATE still
    wins (211→348→439 fps at B=1/2/4, plain vmap) because the
    latency-bound solve leaves the chip idle for other lanes to fill;
    chunking serializes groups and LOSES aggregate everywhere measured
    (chunk=1: 216-218 fps flat). The r3 "B=2 regression" (7.4 vs 8.4 fps)
    was per-call RPC wall over the tunnel, not device behavior — PERF.md
    has the table. Default ``None`` (plain vmap) is right for throughput;
    chunk only when per-sequence latency must not degrade with batch."""
    B, F = stamps_b.shape[0], stamps_b.shape[1]
    L = np.asarray(uvd_b).shape[2]
    st = init_state(cfg.capacity, dtype, cfg.prior.default_speed)
    st_b = jax.tree_util.tree_map(lambda x: jnp.stack([x] * B), st)
    step = make_scan_step(rig, cfg)

    def one(st, xs):
        return jax.lax.scan(step, st, xs)

    lab_b = (jnp.full((B, F, L), -2, jnp.int32) if labels_b is None
             else jnp.asarray(labels_b, jnp.int32))
    flg_b = (jnp.zeros((B, F, L), bool) if outlier_flags_b is None
             else jnp.asarray(outlier_flags_b))
    if planes_b is None:
        hog = cfg.landmark_selection.height_over_ground
        pl_b = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0, hog], dtype),
                                (B, F, 4))
        pok_b = jnp.ones((B, F), bool)
    else:
        pl_b = jnp.asarray(planes_b, dtype)
        pok_b = (jnp.ones((B, F), bool) if planes_ok_b is None
                 else jnp.asarray(planes_ok_b))
    if priors_b is None:
        p_b = jnp.zeros((B, F, 7), dtype).at[..., 0].set(1.0)
        ok_b = jnp.zeros((B, F), bool)
    else:
        p_b = jnp.asarray(priors_b, dtype)
        ok_b = (jnp.ones((B, F), bool) if prior_valid_b is None
                else jnp.asarray(prior_valid_b))
    xs = (jnp.asarray(stamps_b, st.window.stamps.dtype),
          jnp.asarray(uvd_b, dtype), jnp.asarray(valid_b),
          lab_b, flg_b, pl_b, pok_b, p_b, ok_b)
    if vmap_chunk is not None and vmap_chunk < B:
        assert B % vmap_chunk == 0, (B, vmap_chunk)
        G = B // vmap_chunk
        vone = jax.vmap(one)

        def grouped(st_b, xs_b):
            st_g = jax.tree_util.tree_map(
                lambda x: x.reshape((G, vmap_chunk) + x.shape[1:]), st_b)
            xs_g = jax.tree_util.tree_map(
                lambda x: x.reshape((G, vmap_chunk) + x.shape[1:]), xs_b)
            out = jax.lax.map(lambda a: vone(*a), (st_g, xs_g))
            return jax.tree_util.tree_map(
                lambda x: x.reshape((B,) + x.shape[2:]), out)

        return jax.jit(grouped), (st_b, xs)
    return jax.jit(jax.vmap(one)), (st_b, xs)


def run_batch(stamps_b, uvd_b, valid_b, rig, cfg, priors_b=None,
              prior_valid_b=None, dtype=jnp.float32, labels_b=None,
              outlier_flags_b=None, planes_b=None, planes_ok_b=None,
              vmap_chunk=None):
    """vmapped multi-sequence run: leading batch axis on every input —
    the reference's serial per-sequence eval loop as one device program.
    ``vmap_chunk`` (divisor of B) serializes the batch into vmapped groups
    of that width — see :func:`_batched_run` for when that wins."""
    run, args = _batched_run(stamps_b, uvd_b, valid_b, rig, cfg,
                             priors_b, prior_valid_b, dtype, labels_b,
                             outlier_flags_b, planes_b, planes_ok_b,
                             vmap_chunk=vmap_chunk)
    return run(*args)


def run_fleet(mesh, stamps_b, uvd_b, valid_b, rig, cfg, priors_b=None,
              prior_valid_b=None, dtype=jnp.float32, labels_b=None,
              outlier_flags_b=None, planes_b=None, planes_ok_b=None):
    """Sequence fleet sharded over the mesh's ``data`` axis — the TPU
    equivalent of the reference's serial per-sequence KITTI eval loop
    (kitti_eval_script.sh:54-115, SURVEY §3.5: "all 11 sequences as one
    sharded computation"). The leading batch axis is split across devices
    (GSPMD; pure data parallelism, no cross-sequence collectives), so
    B sequences on D chips cost one sequence's wall time.

    The batch is padded up to a multiple of the data-axis size; padded
    rows replay sequence 0 and are dropped from the returned outputs.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    B = stamps_b.shape[0]
    data = mesh.shape["data"]
    pad = (-B) % data
    if pad:
        rep = lambda x: (None if x is None else
                         np.concatenate([x, np.repeat(np.asarray(x)[:1],
                                                      pad, axis=0)]))
        stamps_b, uvd_b, valid_b = rep(stamps_b), rep(uvd_b), rep(valid_b)
        priors_b, prior_valid_b = rep(priors_b), rep(prior_valid_b)
        labels_b, outlier_flags_b = rep(labels_b), rep(outlier_flags_b)
        planes_b, planes_ok_b = rep(planes_b), rep(planes_ok_b)
    run, args = _batched_run(stamps_b, uvd_b, valid_b, rig, cfg,
                             priors_b, prior_valid_b, dtype, labels_b,
                             outlier_flags_b, planes_b, planes_ok_b)
    args = jax.device_put(args, NamedSharding(mesh, P("data")))
    final, outs = run(*args)
    if pad:
        final = jax.tree_util.tree_map(lambda x: x[:B], final)
        outs = jax.tree_util.tree_map(lambda x: x[:B], outs)
    return final, outs


def make_tuning_runner(rig, cfg):
    """Build the vmapped tuning-scan runner ONCE.

    Grid rows are ``(depth_thres, reprojection_thres)`` or
    ``(depth_thres, reprojection_thres, shrubbery_weight)`` — the full
    reference sweep (``res/tune_parameters_kitti.py:3-17``); shrubbery flows
    through the scan step's label channel as a traced weight.

    The returned jitted callable is reused across equal-shape grid chunks —
    a fresh ``jax.jit`` wrapper per chunk would miss JAX's trace/lowering
    caches and re-pay the full compile every call. Dtype follows the state /
    data arrays the caller passes in.
    """
    import dataclasses

    def one(params, st, xs):
        reg = cfg.regularization
        if params.shape[0] >= 3:
            reg = dataclasses.replace(reg, shrubbery_weight=params[2])
        tcfg = dataclasses.replace(
            cfg,
            robust=dataclasses.replace(cfg.robust, depth_thres=params[0],
                                       reprojection_thres=params[1]),
            regularization=reg)
        step = make_scan_step(rig, tcfg)
        return jax.lax.scan(step, st, xs)

    return jax.jit(jax.vmap(one, in_axes=(0, 0, None)))


# Empirical device limit (see docs/WIDE_VMAP_FAULT.md): wide vmapped scan
# programs fault the TPU when the compiled program's generated-code size
# crosses ~75 MiB (width sweep on v5e: 48-wide/73.5 MiB runs, 64-wide/
# 78.4 MiB faults; temp/arg/output HBM are far below capacity at both).
CODE_SIZE_BUDGET_MIB = 68.0


def _code_size_mib(compiled) -> float:
    return compiled.memory_analysis().generated_code_size_in_bytes / 2 ** 20


def run_tuning_grid(stamps, uvd_seq, valid_seq, rig, cfg, grid,
                    dtype=jnp.float32, max_chunk=None,
                    labels=None, outlier_flags=None, planes=None,
                    planes_ok=None):
    """Every tuning grid point as one row of ONE vmapped device program.

    The reference's parameter search replays the full dataset once per grid
    point (``res/tune_parameters_kitti.py:3-17`` × ``kitti_eval_script.sh``
    — hours per sweep). Here the robust loss scales (and optionally the
    shrubbery weight) are *traced* scalars: ``grid [G,2]`` rows are
    ``(depth_thres, reprojection_thres)``, ``grid [G,3]`` adds
    ``shrubbery_weight``, and the whole sweep over the SAME sequence
    (broadcast, not copied per point) is one compile + one dispatch. Pallas
    assembly bakes the scales in as kernel constants, so this path
    automatically falls back to the scatter-free einsum assembly (see
    ``ba_core``'s ``static_thres`` gate).

    ``max_chunk`` bounds the vmap width: the grid is split into *balanced*
    equal chunks (last one padded by repeating row 0) that all reuse the one
    compiled runner. Wide vmapped scans fault the device once the compiled
    program's generated code crosses ~75 MiB (measured width sweep:
    docs/WIDE_VMAP_FAULT.md); ``max_chunk="auto"`` derives the chunk width
    from that mechanism — compile the candidate width, read the generated
    code size from XLA's memory analysis, halve until it fits the
    ``CODE_SIZE_BUDGET_MIB`` budget (compiles are cached, so the surviving
    probe IS the runner used). An int keeps the manual override.

    Returns (final ScanState [G,...], FrameOut [G,F,...]) — numpy leaves
    when chunked, device arrays otherwise.
    """
    grid = np.asarray(grid, np.float64)
    G = grid.shape[0]
    st = init_state(cfg.capacity, dtype, cfg.prior.default_speed)
    run = make_tuning_runner(rig, cfg)
    data = frame_arrays(stamps, uvd_seq, valid_seq, cfg, dtype, labels,
                        outlier_flags, planes, planes_ok,
                        stamp_dtype=st.window.stamps.dtype)

    def batch_args(rows):
        st_b = jax.tree_util.tree_map(
            lambda x: jnp.stack([x] * rows.shape[0]), st)
        return jnp.asarray(rows, dtype), st_b, data

    def run_rows(rows):
        return run(*batch_args(rows))

    if max_chunk == "auto":
        if jax.default_backend() == "tpu":
            # probe the BALANCED width that would actually run (so the
            # surviving probe compile is reused as the runner), starting
            # from 32 (measured 54 MiB — comfortably inside the budget)
            cand = min(G, 32)
            while True:
                n_c = -(-G // cand)
                chunk = -(-G // n_c)
                probe = run.lower(*batch_args(grid[:chunk])).compile()
                if _code_size_mib(probe) <= CODE_SIZE_BUDGET_MIB or chunk == 1:
                    # width 1 is the floor: accept it even over budget so the
                    # probe compile is validated AND warm (reused as runner)
                    max_chunk = chunk
                    break
                cand = max(1, chunk // 2)
        else:
            max_chunk = None  # CPU/interpret: no device code-size ceiling

    if max_chunk is None or G <= max_chunk:
        return run_rows(grid)

    n_chunks = -(-G // max_chunk)
    chunk = -(-G // n_chunks)                    # balanced: ceil(G/n_chunks)
    pad = n_chunks * chunk - G
    gpad = np.concatenate([grid, np.repeat(grid[:1], pad, axis=0)])
    finals, outs = [], []
    for i in range(0, len(gpad), chunk):
        f, o = run_rows(gpad[i:i + chunk])
        jax.block_until_ready(o.pose)
        finals.append(jax.device_get(f))
        outs.append(jax.device_get(o))
    cat = lambda xs: np.concatenate(xs)[:G]
    return (jax.tree_util.tree_map(lambda *x: cat(x), *finals),
            jax.tree_util.tree_map(lambda *x: cat(x), *outs))


def poses_kitti(frame_out: FrameOut) -> np.ndarray:
    """FrameOut → [F,4,4] KITTI origin←vehicle matrices.

    Host-side numpy (``pose_host``): callers loop this over fleet/grid rows,
    and eager jnp per row costs device round trips (CLAUDE.md host rules)."""
    from ..geometry import pose_host
    return pose_host.to_matrix(pose_host.inverse(
        np.asarray(frame_out.pose, np.float64)))
