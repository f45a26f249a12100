"""Whole-sequence odometry as ONE compiled device program (``lax.scan``).

The reference evaluates KITTI sequences serially through a ROS graph, one
frame per callback (``kitti_eval_script.sh``, SURVEY §3.5). This module is
the TPU-native equivalent the survey calls for: the full per-frame pipeline —
constant-velocity prior → motion-only refinement → keyframe gates → push
(depth backprojection / midpoint triangulation) → windowed trimmed BA — runs
as a single ``lax.scan`` over frames, so a whole sequence is one XLA
program, a *batch* of sequences is one ``vmap``, and a fleet of sequences
shards over a device mesh on the data axis (§2.13).

Differences from the host-driven :class:`~limo_tpu.pipeline.odometry`
pipeline (which stays the full-fidelity path):

- tracks arrive as a dense per-frame tensor ``[F, L, 3]`` keyed by landmark
  slot (the host maps tracker ids → slots; the synthetic tracker and the
  KITTI adapter already produce stable rows);
- keyframe slots form a ring buffer (oldest evicted) instead of the
  connectivity-based deactivation; fixation (oldest = Pose, second = Scale)
  is recomputed from stamps each push — same invariant as
  ``deactivateKeyframes`` (bundle_adjuster_keyframes.cpp:962-986);
- landmark selection inside the scan solve is cheirality + validity
  (the voxel/observability sparsification stacks run in the host pipeline).

Reference call stack being compiled here: ``MonoLidar::callbackSubscriber``
(mono_lidar.cpp:88-373) — prior, adjustPoseOnly, KeyframeSelector::select,
push, throttled solve — collapsed into one jitted step per frame.
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
from ..selection.landmark import cheirality_mask
from ..solver.pose_only import pose_only_step
from ..solver.trimmed import solve_trimmed
from ..state import Selection, Window, empty_window


class ScanState(NamedTuple):
    window: Window
    sel_mask: jnp.ndarray       # [L] last solve's landmark selection
    ring_next: jnp.ndarray      # int32 — next keyframe slot to overwrite
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


class FrameOut(NamedTuple):
    pose: jnp.ndarray           # [7] vehicle←origin per frame
    is_keyframe: jnp.ndarray    # bool
    solved: jnp.ndarray         # bool
    cost: jnp.ndarray           # BA cost after the frame (0 when no solve)


def init_state(cap, dtype=jnp.float32) -> ScanState:
    w = empty_window(cap, dtype)
    L = w.L
    p0 = pose_ops.identity(dtype)
    return ScanState(
        window=w,
        sel_mask=jnp.zeros((L,), bool),
        ring_next=jnp.asarray(0, jnp.int32),
        n_kf=jnp.asarray(0, jnp.int32),
        cur_pose=p0,
        vel=p0,
        last_kf_pose=p0,
        last_kf_stamp=jnp.asarray(-1e9, w.stamps.dtype),
        last_kf_uv=jnp.zeros((L, 2), dtype),
        last_kf_uv_valid=jnp.zeros((L,), bool),
        last_solve_stamp=jnp.asarray(-1e9, w.stamps.dtype),
    )


def _oldest_two(stamps, valid):
    """Slots of the oldest and second-oldest active keyframes."""
    big = jnp.asarray(jnp.inf, stamps.dtype)
    s = jnp.where(valid, stamps, big)
    k0 = jnp.argmin(s)
    s2 = s.at[k0].set(big)
    k1 = jnp.argmin(s2)
    return k0.astype(jnp.int32), k1.astype(jnp.int32)


def _push_keyframe(window: Window, slot, stamp, pose, uvd, valid, rig, cfg):
    """Write a keyframe into ``slot`` (ring eviction) and initialize new
    landmarks — the device-side ``push`` (bundle_adjuster_keyframes.cpp:
    289-329: depth-backproject if any camera measured depth, else midpoint
    triangulation; failures retried on later pushes)."""
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
    # a freshly initialized row resets lm_has_depth (row slots are reused
    # after GC on long drives — the previous occupant's flag must not leak)
    lm_has_depth = jnp.where(init_depth | init_tri, init_depth,
                             window.lm_has_depth) \
        | (lm_valid & valid & (d > 0))

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
        lm_pos=lm_pos, lm_valid=lm_valid, lm_has_depth=lm_has_depth,
        obs=obs, obs_mask=obs_mask), (k0, k1)


def make_scan_step(rig, cfg, solve_budget: Optional[int] = None,
                   prior_mode: str = "constant_velocity"):
    """Build the per-frame scan step function.

    Returns ``step(state, frame) -> (state, FrameOut)`` with
    ``frame = (stamp, uvd [L,3], valid [L])``, jit/scan/vmap-ready.
    """
    del solve_budget  # trim budgets come from cfg (solver/robust sections)
    wcfg = cfg.window

    def step(st: ScanState, frame):
        stamp, uvd, valid, ext_prior, ext_prior_ok = frame
        dtype = st.cur_pose.dtype
        uvd = uvd.astype(dtype)

        # ---- 1. prior (constant velocity; mono_lidar.cpp:155-187);
        # an external prior (tf odometry / host 5-point, mono_lidar.cpp:
        # 119-150) overrides the motion model when provided ----------------
        if prior_mode == "constant_velocity":
            # plausibility clamp: a glitched frame must not teleport the
            # prior out of the solver's basin (reference analogue: the
            # prior_speed-scaled 5-point translation, general_helpers.hpp:
            # 209-231, is bounded by construction)
            tv = st.vel[4:]
            tn = jnp.linalg.norm(tv)
            tv = tv * jnp.minimum(1.0, 5.0 / jnp.maximum(tn, 1e-9))
            wv = quat.qlog(st.vel[:4])
            wn = jnp.linalg.norm(wv)
            wv = wv * jnp.minimum(1.0, 0.15 / jnp.maximum(wn, 1e-9))
            vel = pose_ops.make(quat.qexp(wv), tv)
            prior = pose_ops.normalize(pose_ops.compose(vel, st.cur_pose))
        else:  # "identity" — no motion model
            prior = st.cur_pose
        prior = jnp.where(st.n_kf > 0, prior, pose_ops.identity(dtype))
        prior = jnp.where(ext_prior_ok, ext_prior.astype(dtype), prior)

        # ---- 2. motion-only refinement (adjustPoseOnly) ----------------
        lm_mask = st.window.lm_valid & (st.sel_mask | (~jnp.any(st.sel_mask)))
        n_usable = jnp.sum((lm_mask & valid).astype(jnp.int32))
        # plain reprojection here: the RotRocc divisor rewards large
        # rotations (cost → 0 as the rotation-only error grows), which an
        # 8-iteration LM from a several-meter prior can exploit; the
        # reference stays in the safe basin only because its prior is a
        # fresh per-frame 5-point estimate and it runs ≤4 iterations
        po = pose_only_step(prior, st.window.lm_pos, uvd[:, None, :],
                            (valid & lm_mask)[:, None], lm_mask, rig, cfg,
                            max_iters=8, compensate_rotation=False)
        refined = jnp.where((st.n_kf >= 1) & (n_usable >= 10), po.pose, prior)
        refined = pose_ops.normalize(refined)

        # ---- 3. keyframe gates (KeyframeSelector) ----------------------
        dec = select_keyframe(uvd[:, :2], st.last_kf_uv,
                              valid & st.last_kf_uv_valid,
                              refined[:4], st.last_kf_pose[:4],
                              stamp, st.last_kf_stamp, cfg)
        take_kf = dec.is_keyframe | (st.n_kf == 0)

        # ---- 4. push (ring write + landmark init) ----------------------
        pushed, (k0, k1) = _push_keyframe(
            st.window, st.ring_next, stamp, refined, uvd, valid, rig, cfg)
        window = jax.tree_util.tree_map(
            lambda a, b: jnp.where(take_kf, b, a), st.window, pushed)

        # ---- 5. throttled windowed solve -------------------------------
        do_solve = take_kf & (st.n_kf + 1 >= 3) & (
            stamp - st.last_solve_stamp >= 0.98 * wcfg.time_between_solves_sec)

        def run_solve(w):
            keep = cheirality_mask(w, rig) & w.lm_valid
            ok0, ok1 = _oldest_two(w.stamps, w.kf_valid)
            target = jnp.linalg.norm(w.poses[ok1, 4:] - w.poses[ok0, 4:])
            n_depth = jnp.sum((w.obs_mask[:, :, 0] & (w.obs[:, :, 0, 2] > 0)
                               & keep[:, None]).astype(jnp.int32))
            # observed scale (many depth residuals) → weak pin, else hard pin
            # (solve() scale logic, bundle_adjuster_keyframes.cpp:703-728)
            scale_w = jnp.where(n_depth >= 30,
                                1000.0 / jnp.maximum(n_depth, 1).astype(dtype),
                                1000.0)
            L = w.L
            sel = Selection(
                lm_selected=keep,
                gp_kf=jnp.zeros((L,), jnp.int32),
                gp_weight=jnp.zeros((L,), dtype),
                scale_kf0=ok0, scale_kf1=ok1,
                scale_target=target.astype(dtype),
                scale_weight=scale_w.astype(dtype),
                plane_dist_fixed=jnp.asarray(True),
            )
            w2, sel2, info = solve_trimmed(w, sel, rig, cfg)
            return w2, sel2.lm_selected, info.final_cost.astype(dtype)

        def no_solve(w):
            return w, st.sel_mask, jnp.asarray(0.0, dtype)

        window, sel_mask, cost = jax.lax.cond(do_solve, run_solve, no_solve,
                                              window)

        # pose after a solve: the newest keyframe's optimized pose
        slot_pose = window.poses[st.ring_next]
        out_pose = jnp.where(do_solve, slot_pose, refined)

        vel = jnp.where(st.n_kf > 0,
                        pose_ops.normalize(
                            pose_ops.relative(refined, st.cur_pose)),
                        pose_ops.identity(dtype))
        st2 = ScanState(
            window=window,
            sel_mask=sel_mask,
            ring_next=jnp.where(take_kf,
                                (st.ring_next + 1) % window.K, st.ring_next),
            n_kf=st.n_kf + take_kf.astype(jnp.int32),
            cur_pose=out_pose,
            vel=vel,
            last_kf_pose=jnp.where(take_kf, out_pose, st.last_kf_pose),
            last_kf_stamp=jnp.where(take_kf, stamp, st.last_kf_stamp),
            last_kf_uv=jnp.where(take_kf, uvd[:, :2], st.last_kf_uv),
            last_kf_uv_valid=jnp.where(take_kf, valid, st.last_kf_uv_valid),
            last_solve_stamp=jnp.where(do_solve, stamp, st.last_solve_stamp),
        )
        return st2, FrameOut(pose=out_pose, is_keyframe=take_kf,
                             solved=do_solve, cost=cost)

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


def run_sequence(stamps, uvd_seq, valid_seq, rig, cfg, priors=None,
                 prior_valid=None, dtype=jnp.float32):
    """Run a whole sequence through the scan program.

    stamps [F], uvd_seq [F,L,3], valid_seq [F,L] with L equal to the
    landmark capacity (cfg.capacity.max_landmarks). ``priors`` [F,7]
    optionally injects external pose priors (the reference's tf-odometry /
    5-point path). Returns (final ScanState, FrameOut with frame axis).
    """
    st = init_state(cfg.capacity, dtype)
    step = make_scan_step(rig, cfg)
    run = jax.jit(lambda st, xs: jax.lax.scan(step, st, xs))
    F = len(stamps)
    p, ok = _prior_arrays(priors, prior_valid, F, dtype)
    return run(st, (jnp.asarray(stamps, st.window.stamps.dtype),
                    jnp.asarray(uvd_seq, dtype),
                    jnp.asarray(valid_seq), p, ok))


def _batched_run(stamps_b, uvd_b, valid_b, rig, cfg, priors_b,
                 prior_valid_b, dtype):
    """Shared assembly for run_batch/run_fleet: (vmapped runner, args)."""
    B, F = stamps_b.shape[0], stamps_b.shape[1]
    st = init_state(cfg.capacity, dtype)
    st_b = jax.tree_util.tree_map(lambda x: jnp.stack([x] * B), st)
    step = make_scan_step(rig, cfg)

    def one(st, stamps, uvd, valid, p, ok):
        return jax.lax.scan(step, st, (stamps, uvd, valid, p, ok))

    if priors_b is None:
        p_b = jnp.zeros((B, F, 7), dtype).at[..., 0].set(1.0)
        ok_b = jnp.zeros((B, F), bool)
    else:
        p_b = jnp.asarray(priors_b, dtype)
        ok_b = (jnp.ones((B, F), bool) if prior_valid_b is None
                else jnp.asarray(prior_valid_b))
    args = (st_b,
            jnp.asarray(stamps_b, st.window.stamps.dtype),
            jnp.asarray(uvd_b, dtype), jnp.asarray(valid_b), p_b, ok_b)
    return jax.jit(jax.vmap(one)), args


def run_batch(stamps_b, uvd_b, valid_b, rig, cfg, priors_b=None,
              prior_valid_b=None, dtype=jnp.float32):
    """vmapped multi-sequence run: leading batch axis on every input —
    the reference's serial per-sequence eval loop as one device program."""
    run, args = _batched_run(stamps_b, uvd_b, valid_b, rig, cfg,
                             priors_b, prior_valid_b, dtype)
    return run(*args)


def run_fleet(mesh, stamps_b, uvd_b, valid_b, rig, cfg, priors_b=None,
              prior_valid_b=None, dtype=jnp.float32):
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
        rep = lambda x: np.concatenate([x, np.repeat(x[:1], pad, axis=0)])
        stamps_b, uvd_b, valid_b = rep(np.asarray(stamps_b)), \
            rep(np.asarray(uvd_b)), rep(np.asarray(valid_b))
        if priors_b is not None:
            priors_b = rep(np.asarray(priors_b))
            if prior_valid_b is not None:
                prior_valid_b = rep(np.asarray(prior_valid_b))
    run, args = _batched_run(stamps_b, uvd_b, valid_b, rig, cfg,
                             priors_b, prior_valid_b, dtype)
    args = jax.device_put(args, NamedSharding(mesh, P("data")))
    final, outs = run(*args)
    if pad:
        final = jax.tree_util.tree_map(lambda x: x[:B], final)
        outs = jax.tree_util.tree_map(lambda x: x[:B], outs)
    return final, outs


def make_tuning_runner(rig, cfg, dtype=jnp.float32):
    """Build the vmapped tuning-scan runner ONCE.

    The returned jitted callable is reused across equal-shape grid chunks —
    a fresh ``jax.jit`` wrapper per chunk would miss JAX's trace/lowering
    caches and re-pay the full compile every call.
    """
    import dataclasses

    def one(params, st, stamps, uvd, valid, p, ok):
        tcfg = dataclasses.replace(cfg, robust=dataclasses.replace(
            cfg.robust, depth_thres=params[0],
            reprojection_thres=params[1]))
        step = make_scan_step(rig, tcfg)
        return jax.lax.scan(step, st, (stamps, uvd, valid, p, ok))

    return jax.jit(jax.vmap(one,
                            in_axes=(0, 0, None, None, None, None, None)))


def run_tuning_grid(stamps, uvd_seq, valid_seq, rig, cfg, grid,
                    dtype=jnp.float32, max_chunk: Optional[int] = None):
    """Every tuning grid point as one row of ONE vmapped device program.

    The reference's parameter search replays the full dataset once per grid
    point (``res/tune_parameters_kitti.py:3-17`` × ``kitti_eval_script.sh``
    — hours per sweep). Here the robust loss scales are *traced* scalars:
    ``grid [G,2]`` rows are ``(depth_thres, reprojection_thres)`` and the
    whole sweep over the SAME sequence (broadcast, not copied per point) is
    one compile + one dispatch. Pallas assembly bakes the scales in as
    kernel constants, so this path automatically falls back to the
    scatter-free einsum assembly (see ``ba_core``'s ``static_thres`` gate).

    ``max_chunk`` (optional) bounds the vmap width: the grid is split into
    *balanced* equal chunks (last one padded by repeating row 0) that all
    reuse the one compiled runner — a ~100-wide vmapped scan was observed
    to fault the device over the remote link, and unbalanced 32-padding
    would waste up to a chunk of redundant replays.

    Returns (final ScanState [G,...], FrameOut [G,F,...]) — numpy leaves
    when chunked, device arrays otherwise.
    """
    grid = np.asarray(grid, np.float64)
    G = grid.shape[0]
    F = len(stamps)
    st = init_state(cfg.capacity, dtype)
    run = make_tuning_runner(rig, cfg, dtype)
    p, ok = _prior_arrays(None, None, F, dtype)
    data = (jnp.asarray(stamps, st.window.stamps.dtype),
            jnp.asarray(uvd_seq, dtype), jnp.asarray(valid_seq), p, ok)

    def run_rows(rows):
        st_b = jax.tree_util.tree_map(
            lambda x: jnp.stack([x] * rows.shape[0]), st)
        return run(jnp.asarray(rows, dtype), st_b, *data)

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
