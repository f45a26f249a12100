"""Selection scheme tests mirroring the reference's selector tests
(keyframe_bundle_adjustment.cpp: KeyframeSelector time scheme :613-647,
LandmarkSelector random/cheirality/observability :649-742, voxel scheme
counts + categories :1278-1338)."""

import jax
import jax.numpy as jnp
import numpy as np

from limo_tpu.config import default_config
from limo_tpu.geometry import pose as pose_ops
from limo_tpu.geometry import quaternion as quat
from limo_tpu.geometry.camera import CameraRig
from limo_tpu.selection import (
    CAT_FAR, CAT_MIDDLE, CAT_NEAR, add_depth_scheme, cheirality_mask,
    dimension_plausibility_mask, random_scheme, select_keyframe,
    observability_scheme, track_lengths, voxel_scheme,
)
from limo_tpu.state import empty_window

DT = jnp.float64
RIG = CameraRig.single(600.0, 300.0, 200.0, dtype=DT)


def simple_window(n_kf=3, n_lm=50, rng=None, z0=10.0):
    cfg = default_config()
    w = empty_window(cfg.capacity, DT)
    K, L, C = w.K, w.L, w.C
    lms = rng.uniform(-1, 1, (n_lm, 3)) * np.array([5.0, 3.0, 3.0]) + np.array([0, 0, z0])
    poses = np.tile(np.array([1.0, 0, 0, 0, 0, 0, 0]), (K, 1))
    for k in range(1, n_kf):
        poses[k, 6] = -1.0 * k  # move along -z (backwards) so lms stay ahead
    obs = np.zeros((L, K, C, 3))
    msk = np.zeros((L, K, C), bool)
    for k in range(n_kf):
        pc = np.asarray(pose_ops.apply(jnp.asarray(poses[k], DT), jnp.asarray(lms, DT)))
        uv = 600 * pc[:, :2] / pc[:, 2:3] + np.array([300.0, 200.0])
        obs[:n_lm, k, 0, :2] = uv
        obs[:n_lm, k, 0, 2] = -1
        msk[:n_lm, k, 0] = True
    w = w._replace(
        stamps=w.stamps.at[:n_kf].set(jnp.arange(n_kf, dtype=w.stamps.dtype) * 0.4),
        poses=jnp.asarray(poses, DT),
        kf_valid=w.kf_valid.at[:n_kf].set(True),
        lm_pos=jnp.asarray(np.concatenate([lms, np.zeros((L - n_lm, 3))]), DT),
        lm_valid=w.lm_valid.at[:n_lm].set(True),
        lm_id=w.lm_id.at[:n_lm].set(jnp.arange(n_lm, dtype=jnp.int32)),
        obs=jnp.asarray(obs, DT),
        obs_mask=jnp.asarray(msk),
    )
    return w, cfg


class TestKeyframeSelection:
    """Mirror of KeyframeSelector time-scheme test (:613-647)."""

    def _decide(self, dt, angle, flow, cfg, n_matches=30):
        uv_last = jnp.zeros((n_matches, 2), DT)
        uv_new = uv_last + flow / np.sqrt(2.0)
        mask = jnp.ones((n_matches,), bool)
        q_last = quat.qidentity(DT)
        q_new = quat.qexp(jnp.array([0.0, 0.0, angle / 2.0], DT))
        return select_keyframe(uv_new, uv_last, mask, q_new, q_last,
                               jnp.asarray(dt, DT), jnp.asarray(0.0, DT), cfg)

    def test_time_sparsification(self):
        cfg = default_config()
        d = self._decide(0.5, 0.0, 20.0, cfg)   # > 0.4 s → keyframe
        assert bool(d.is_keyframe) and bool(d.sparsified)
        d = self._decide(0.3, 0.0, 20.0, cfg)   # too soon, no rotation
        assert not bool(d.is_keyframe)

    def test_rotation_forces_selection(self):
        cfg = default_config()
        d = self._decide(0.1, 0.1, 20.0, cfg)   # big rotation → select anyway
        assert bool(d.is_keyframe) and bool(d.selected)

    def test_standstill_rejected(self):
        cfg = default_config()
        d = self._decide(1.0, 0.0, 0.5, cfg)    # flow below min → reject
        assert not bool(d.is_keyframe) and bool(d.rejected)


class TestCheirality:
    def test_keeps_in_front(self, rng):
        w, cfg = simple_window(rng=rng)
        keep = cheirality_mask(w, RIG)
        assert bool(keep[w.lm_valid & (track_lengths(w) > 0)].all())

    def test_rejects_behind(self, rng):
        w, cfg = simple_window(rng=rng)
        # move a landmark behind every camera
        lm_pos = np.array(w.lm_pos)
        lm_pos[3] = [0.0, 0.0, -50.0]
        w = w._replace(lm_pos=jnp.asarray(lm_pos, DT))
        keep = cheirality_mask(w, RIG)
        assert not bool(keep[3])
        assert bool(keep[4])


class TestDimensionPlausibility:
    def test_box(self, rng):
        w, cfg = simple_window(rng=rng)
        keep = dimension_plausibility_mask(w, jnp.asarray(2, jnp.int32),
                                           (-100, -100, 0), (100, 100, 100))
        # all landmarks are in front (z>0 rel. to kf 2)
        assert bool(keep[:50].all())
        keep2 = dimension_plausibility_mask(w, jnp.asarray(2, jnp.int32),
                                            (-100, -100, 0), (100, 100, 5.0))
        # z relative to kf2 is ~12-15 ⇒ all out
        assert not bool(keep2[:50].any())


class TestRandomScheme:
    def test_takes_n(self, rng):
        w, cfg = simple_window(n_lm=100, rng=rng)
        sel = random_scheme(w, w.lm_valid, 30)
        assert int(sel.sum()) == 30
        sel_all = random_scheme(w, w.lm_valid, 1000)
        assert int(sel_all.sum()) == 100  # capped by candidates


class TestVoxelScheme:
    """Mirror of the voxel scheme counts/categories test (:1278-1338)."""

    def test_categories_and_caps(self, rng):
        w, cfg = simple_window(n_kf=3, n_lm=200, rng=rng, z0=8.0)
        # add a far cluster (70 m ahead) and scatter offset cluster
        lm_pos = np.array(w.lm_pos)
        lm_pos[150:200] = rng.uniform(-1, 1, (50, 3)) * np.array([3, 3, 3]) \
            + np.array([0, 0, 80.0])
        w = w._replace(lm_pos=jnp.asarray(lm_pos, DT))
        res = voxel_scheme(w, jnp.asarray(2, jnp.int32), w.lm_valid, cfg)
        cats = np.asarray(res.category)
        sel = np.asarray(res.selected)
        # near cluster is within roi_middle of the trajectory; far cluster
        # is > 40 m from the path
        assert (cats[:150][sel[:150]] == CAT_NEAR).all()
        assert (cats[150:200][sel[150:200]] == CAT_FAR).all()
        assert sel.sum() > 0
        ls = cfg.landmark_selection
        assert (cats == CAT_NEAR).sum() <= ls.max_number_landmarks_near_bin
        assert (cats == CAT_FAR).sum() <= ls.max_number_landmarks_far_bin

    def test_z_passthrough_drops(self, rng):
        w, cfg = simple_window(n_lm=50, rng=rng)
        lm_pos = np.array(w.lm_pos)
        lm_pos[0] = [0.0, 0.0, 500.0]   # beyond z passthrough (z>100 rel cur kf)
        w = w._replace(lm_pos=jnp.asarray(lm_pos, DT))
        res = voxel_scheme(w, jnp.asarray(2, jnp.int32), w.lm_valid, cfg)
        assert not bool(res.selected[0])

    def test_voxel_dedup(self, rng):
        # landmarks piled into the same voxel → only one representative
        w, cfg = simple_window(n_lm=30, rng=rng)
        lm_pos = np.array(w.lm_pos)
        lm_pos[:30] = np.array([1.0, 1.0, 12.0]) + rng.uniform(0, 0.05, (30, 3))
        w = w._replace(lm_pos=jnp.asarray(lm_pos, DT))
        res = voxel_scheme(w, jnp.asarray(2, jnp.int32), w.lm_valid, cfg)
        assert int(res.selected[:30].sum()) <= 2  # 1-2 voxels worth


class TestObservability:
    def test_bins_by_flow(self, rng):
        w, cfg = simple_window(n_kf=3, n_lm=100, rng=rng)
        res = observability_scheme(w, jnp.asarray(2, jnp.int32), w.lm_valid, cfg)
        sel = np.asarray(res.selected)
        cats = np.asarray(res.category)
        assert sel.sum() > 0
        assert set(np.unique(cats[sel])) <= {CAT_NEAR, CAT_MIDDLE, CAT_FAR}


class TestAddDepth:
    def test_force_include(self, rng):
        w, cfg = simple_window(n_lm=100, rng=rng)
        comparator = w.lm_valid & (jnp.arange(w.L) < 20)  # "gp" landmarks
        none_selected = jnp.zeros((w.L,), bool)
        out = add_depth_scheme(w, none_selected, comparator, 10)
        assert int(out.sum()) >= 10
        assert bool(out[np.asarray(comparator)].any())
        assert not bool(out[~np.asarray(comparator)].any())


class TestKeyframeBatchSelect:
    """Candidate-frame-SET selection (keyframe_selector.cpp:107-133):
    burst ingest must sparsify WITHIN the batch (time gap against both the
    buffer and frames accepted earlier in the batch), veto standstill
    frames, and force-keep sharp rotations."""

    def _cfg(self):
        from limo_tpu.config import LimoConfig
        return LimoConfig()

    def _frames(self, n, dt, flow_px, yaw_step=0.0):
        import numpy as np
        from limo_tpu.geometry import quaternion as quat
        R = 8
        base = np.tile(np.linspace(40, 260, R)[:, None], (1, 2))
        stamps = jnp.asarray(np.arange(n) * dt, jnp.float32)
        uvs = jnp.asarray(np.stack([base + i * flow_px for i in range(n)]),
                          jnp.float32)
        valid = jnp.ones((n, R), bool)
        qs = []
        q = quat.qidentity(jnp.float32)
        for i in range(n):
            qs.append(q)
            q = quat.qmul(quat.qfrom_axis_angle(
                jnp.array([0.0, 0.0, 1.0], jnp.float32),
                jnp.asarray(yaw_step, jnp.float32)), q)
        return stamps, uvs, valid, jnp.stack(qs)

    def _select(self, stamps, uvs, valid, qs, cfg, has_last=False):
        from limo_tpu.selection import select_keyframes
        R = uvs.shape[1]
        return np.asarray(select_keyframes(
            stamps, uvs, valid, qs,
            uvs[0], valid[0], qs[0], jnp.asarray(-1.0, jnp.float32),
            jnp.asarray(has_last), cfg))

    def test_burst_time_sparsification(self):
        # 10 frames 0.1 s apart, plenty of flow: only every 0.4 s survives
        cfg = self._cfg()
        stamps, uvs, valid, qs = self._frames(10, dt=0.1, flow_px=8.0)
        acc = self._select(stamps, uvs, valid, qs, cfg)
        # first frame always kept; then the 0.4 s spacing rule in-batch
        kept = np.flatnonzero(acc)
        assert acc[0]
        assert np.all(np.diff(stamps[kept]) > cfg.keyframe_selection
                      .time_between_keyframes_sec)
        assert 2 <= len(kept) <= 3, kept

    def test_standstill_vetoes_whole_burst(self):
        cfg = self._cfg()
        stamps, uvs, valid, qs = self._frames(6, dt=0.5, flow_px=0.2)
        acc = self._select(stamps, uvs, valid, qs, cfg, has_last=True)
        assert not acc.any(), acc

    def test_rotation_forces_keep_inside_burst(self):
        cfg = self._cfg()
        stamps, uvs, valid, qs = self._frames(5, dt=0.05, flow_px=8.0,
                                              yaw_step=0.05)
        acc = self._select(stamps, uvs, valid, qs, cfg, has_last=True)
        # frame 0 duplicates the buffer keyframe (zero flow, zero rotation)
        # and is standstill-vetoed; every later frame rotates i*0.05 rad
        # > 0.03 critical → kept despite the 0.05 s spacing being far below
        # the 0.4 s sparsification gap
        assert not acc[0]
        assert acc[1:].all(), acc
