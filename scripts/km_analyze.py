"""Offline decomposition of the km-drive translation error from km_dump.npz:
separates SCALE error from heading error per event-timeline phase
(VERDICT r4 item 1: 5.66% translation with only 0.011 deg/m rotation)."""
import sys

import numpy as np

d = np.load(sys.argv[1] if len(sys.argv) > 1 else "/tmp/km_dump.npz")
est, gt = d["est"], d["gt"]          # [F,4,4] origin<-vehicle
F = est.shape[0]
still = tuple(d["still"])
sp = d["speed_profile"] if d["speed_profile"].size else None

# per-frame relative motions
def rel(T):
    return np.einsum("fij,fjk->fik", np.linalg.inv(T[:-1]), T[1:])

de, dg = rel(est), rel(gt)
te = np.linalg.norm(de[:, :3, 3], axis=1)
tg = np.linalg.norm(dg[:, :3, 3], axis=1)
moving = tg > 0.05
ratio = np.where(moving, te / np.maximum(tg, 1e-9), 1.0)

def ang_deg(R):
    return np.degrees(np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1)))

rot_err = np.array([ang_deg(np.linalg.inv(de[i, :3, :3]) @ dg[i, :3, :3])
                    for i in range(F - 1)])
yaw_g = np.array([ang_deg(dg[i, :3, :3]) for i in range(F - 1)])

phases = {
    "ramp 0-50": (0, 50),
    "cruise 50-340": (50, 340),
    "turn1 345-385": (345, 385),
    "decel 380-400": (380, 400),
    "still 400-460": (400, 460),
    "accel 460-490": (460, 490),
    "cruise 490-740": (490, 740),
    "turn2 745-785": (745, 785),
    "cruise 785-999": (785, 999),
}
print(f"{'phase':16s} {'mean_ratio':>10s} {'med_ratio':>10s} "
      f"{'rot_err/fr':>10s} {'gt_rot/fr':>9s} {'cum_scale_m':>11s}")
for name, (a, b) in phases.items():
    m = moving[a:b]
    if m.sum() == 0:
        print(f"{name:16s} {'—':>10s}")
        continue
    r = ratio[a:b][m]
    # cumulative along-path length error contributed by this phase
    cum = np.sum(te[a:b][m] - tg[a:b][m])
    print(f"{name:16s} {r.mean():10.4f} {np.median(r):10.4f} "
          f"{rot_err[a:b][m].mean():10.3f} {yaw_g[a:b][m].mean():9.3f} "
          f"{cum:11.2f}")

# total path lengths
print(f"\npath gt {tg.sum():.1f} m est {te.sum():.1f} m "
      f"(scale {te.sum()/tg.sum():.4f})")
# absolute position error at phase boundaries
err = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=1)
for name, (a, b) in phases.items():
    print(f"err at f{b:4d} ({name:14s}): {err[min(b, F-1)]:8.2f} m")

# heading error over time (project onto ground plane)
fwd_e = est[:, :3, 2] if abs(est[10, 2, 2]) > 0.5 else est[:, :3, 0]
# drive direction from consecutive positions
def headings(T):
    p = T[:, :3, 3]
    dp = np.diff(p, axis=0)
    return np.arctan2(dp[:, 1], dp[:, 0])
he, hg = headings(est), headings(gt)
dh = np.degrees(np.unwrap(he - hg))
for f in (100, 300, 340, 390, 470, 600, 740, 790, 900, 998):
    if moving[f]:
        print(f"heading err at f{f}: {dh[f]:7.2f} deg   pos err {err[f]:7.2f} m"
              f"  ratio {ratio[f]:.4f}")

# diagnostics channels
for ch in ("n_usable", "n_matches", "n_tracks", "n_depth", "po_ok",
           "is_keyframe", "solved"):
    if ch in d:
        v = np.asarray(d[ch], float)
        print(f"{ch:12s} min {v.min():6.1f} mean {v.mean():8.2f} "
              f"turn1 {v[345:385].mean():8.2f} accel {v[460:490].mean():8.2f} "
              f"turn2 {v[745:785].mean():8.2f}")
