"""Per-frame zoom on km_dump.npz phases: what the prior, pose-only, and
solve each contributed to the per-frame translation deficit."""
import sys

import numpy as np

d = np.load(sys.argv[1] if len(sys.argv) > 1 else "/tmp/km_dump.npz")
est, gt = d["est"], d["gt"]
pose = d["pose"]          # [F,7] veh<-origin (wxyz t)
prior = d["prior"]
refined = d["refined"]

def qmat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])

def pos_of(p):     # veh<-origin: position = -R^T t
    return np.array([-qmat(q).T @ t for q, t in zip(p[:, :4], p[:, 4:])])

pe = pos_of(pose)
pp = pos_of(prior)
pr = pos_of(refined)
pg = gt[:, :3, 3]

lo, hi = (int(sys.argv[2]), int(sys.argv[3])) if len(sys.argv) > 3 else (335, 400)
print("f    |dgt| |dpose| |dprior| |drefined|  r_pose r_prior r_ref  "
      "po kf sv nuse nm")
for i in range(lo, hi):
    dgt = np.linalg.norm(pg[i + 1] - pg[i])
    dpo = np.linalg.norm(pe[i + 1] - pe[i])
    dpr = np.linalg.norm(pp[i + 1] - pe[i])    # prior step from last pose
    drf = np.linalg.norm(pr[i + 1] - pe[i])    # pose-only step from last pose
    r = lambda x: x / max(dgt, 1e-9)
    print(f"{i:4d} {dgt:6.3f} {dpo:6.3f} {dpr:7.3f} {drf:8.3f}   "
          f"{r(dpo):6.3f} {r(dpr):6.3f} {r(drf):6.3f}  "
          f"{int(d['po_ok'][i + 1])}  {int(d['is_keyframe'][i + 1])}  "
          f"{int(d['solved'][i + 1])} {int(d['n_usable'][i + 1]):4d} "
          f"{int(d['n_matches'][i + 1]):3d}")
