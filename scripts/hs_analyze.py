"""Decompose the high-speed (25 m/s) translation failure from a km_dump npz:
per-frame motion length of GT vs PRIOR vs RAW POSE-ONLY vs ACCEPTED pose,
plus the gate states (po_ok, n_usable, n_matches) — answers WHERE in the
prior -> pose-only -> accept chain the short-motion delusion enters
(VERDICT r4 item 4; docs/PERF.md high-speed section)."""
import sys

import numpy as np

d = np.load(sys.argv[1] if len(sys.argv) > 1 else "/tmp/hs25.npz")
est, gt = d["est"], d["gt"]                    # [F,4,4] origin<-vehicle
F = est.shape[0]


def rel_len(T):
    dT = np.einsum("fij,fjk->fik", np.linalg.inv(T[:-1]), T[1:])
    return np.linalg.norm(dT[:, :3, 3], axis=1)


def quat_pose_to_mat(p):
    # [.,7] wxyz + t  (veh<-origin)  ->  [.,4,4] origin<-vehicle
    w, x, y, z = p[:, 0], p[:, 1], p[:, 2], p[:, 3]
    R = np.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], -1).reshape(-1, 3, 3)
    T = np.tile(np.eye(4), (p.shape[0], 1, 1))
    T[:, :3, :3] = R
    T[:, :3, 3] = p[:, 4:]
    return np.linalg.inv(T)                    # origin<-vehicle


tg = rel_len(gt)
te = rel_len(est)
prior = quat_pose_to_mat(d["prior"])           # prior pose per frame
refined = quat_pose_to_mat(d["refined"])       # raw pose-only result
# motion implied by prior/refined at frame f relative to accepted f-1
tp = np.linalg.norm(np.einsum("fij,fjk->fik", np.linalg.inv(est[:-1]),
                              prior[1:])[:, :3, 3], axis=1)
tr = np.linalg.norm(np.einsum("fij,fjk->fik", np.linalg.inv(est[:-1]),
                              refined[1:])[:, :3, 3], axis=1)

po_ok = np.asarray(d["po_ok"], bool)
n_us = np.asarray(d["n_usable"])
n_tr = np.asarray(d["n_tracks"]) if "n_tracks" in d else np.zeros(F)
kf = np.asarray(d["is_keyframe"], bool)

print(f"{'f':>4s} {'gt_m':>6s} {'prior':>6s} {'po_raw':>7s} {'acc':>6s} "
      f"{'ok':>3s} {'n_us':>5s} {'n_trk':>5s} {'kf':>3s}")
step = max(F // 80, 1)
rows = list(range(0, F - 1, step))
# densify around the first collapse (ratio < 0.7 while gt moving)
mov = tg > 0.5
bad = np.where(mov & (te / np.maximum(tg, 1e-9) < 0.7))[0]
if bad.size:
    f0 = bad[0]
    rows = sorted(set(rows) | set(range(max(f0 - 10, 0),
                                        min(f0 + 30, F - 1))))
    print(f"# first collapse at f{f0}")
for f in rows:
    print(f"{f:4d} {tg[f]:6.2f} {tp[f]:6.2f} {tr[f]:7.2f} {te[f]:6.2f} "
          f"{int(po_ok[f + 1]):3d} {int(n_us[f + 1]):5d} "
          f"{int(n_tr[f + 1]):5d} {int(kf[f + 1]):3d}")

r = te / np.maximum(tg, 1e-9)
print(f"\nmoving frames: ratio mean {r[mov].mean():.3f} "
      f"median {np.median(r[mov]):.3f} min {r[mov].min():.3f}")
print(f"po_ok rate {po_ok.mean():.3f}  n_usable mean {n_us.mean():.1f}  "
      f"n_tracks mean {n_tr.mean():.1f}")
err = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=1)
print(f"ATE mean {err.mean():.2f} max {err.max():.2f} final {err[-1]:.2f}")
