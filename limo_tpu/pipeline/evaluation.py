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
                            cfg: Optional[LimoPipelineConfig] = None
                            ) -> SequenceReport:
    """Run the full pipeline on a KITTI odometry sequence directory and dump
    the trajectory in KITTI format (reference dump: mono_lidar.cpp:275-300)."""
    seq = kitti.KittiSequence.open(seq_dir, gt_poses)
    calib = seq.calib
    # camera extrinsics: vehicle frame = cam0 frame ⇒ identity; velodyne →
    # cam via Tr (KITTI convention)
    rig = CameraRig.single(calib.focal, calib.principal[0], calib.principal[1])
    pipe = LimoPipeline(rig, cfg)
    n = len(seq) if max_frames is None else min(max_frames, len(seq))
    Tr = calib.Tr_cam_velo
    t0 = time.time()
    for i in range(n):
        img = seq.load_image(i)
        velo = seq.load_velodyne(i)
        # velodyne → cam0 (= vehicle) frame
        cloud = (velo[:, :3] @ Tr[:3, :3].T) + Tr[:3, 3]
        pipe.process(seq.times[i], img, cloud)
    dt = time.time() - t0
    est = pipe.poses_kitti()
    kitti.write_poses(out_poses, est)
    ate = float("nan")
    drift = {"t_err_percent": float("nan"), "r_err_deg_per_m": float("nan"),
             "num_segments": 0}
    if seq.poses_gt is not None:
        ate = ate_rmse(seq.poses_gt, est)
        drift = kitti_drift(seq.poses_gt, est)
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


def batch_evaluate_synthetic(num_sequences: int = 4, **kw) -> List[SequenceReport]:
    """Sequential host loop over sequences (the sharded batch evaluator in
    parallel/ covers the device-parallel path)."""
    return [evaluate_synthetic_sequence(seed=s, **kw)
            for s in range(num_sequences)]


def main():  # pragma: no cover — manual entry
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--seq", help="KITTI sequence dir (sequences/NN)")
    p.add_argument("--gt", help="ground-truth poses file")
    p.add_argument("--out", default="/tmp/poses_out.txt")
    p.add_argument("--frames", type=int, default=None)
    args = p.parse_args()
    if args.seq:
        rep = evaluate_kitti_sequence(args.seq, args.out, args.gt, args.frames)
    else:
        rep = evaluate_synthetic_sequence(out_poses=args.out)
    print(rep.to_json())


if __name__ == "__main__":  # pragma: no cover
    main()
