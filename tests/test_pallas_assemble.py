"""The fused Pallas assembly kernel must reproduce the einsum path exactly
(same residuals, IRLS weights, and reduced blocks). Runs in interpreter mode
on CPU; the compiled path is exercised on real TPU by bench/verify drives."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from limo_tpu.config import default_config
from limo_tpu.geometry import quaternion as quat
from limo_tpu.geometry.camera import CameraRig
from limo_tpu.solver.ba_core import _obs_system
from limo_tpu.solver.pallas_assemble import TL, assemble_obs_pallas
from limo_tpu.state import Selection

from test_solver import build_window, default_selection, make_gt_poses, make_landmarks

F32 = jnp.float32


def reference_blocks(window, sel, rig, cfg):
    """Obs-only blocks via the production einsum path."""
    r, repr_ok, depth_ok, row_w, Jp, Jl, cost = _obs_system(
        window, sel, rig, cfg, compensate_rotation=False, with_jacobians=True)
    Jp_w = Jp * row_w[..., None]
    Jl_w = Jl * row_w[..., None]
    U = jnp.einsum("lkcri,lkcrj->kij", Jp_w, Jp)
    b_pose = -jnp.einsum("lkcri,lkcr->ki", Jp_w, r)
    V = jnp.einsum("lkcri,lkcrj->lij", Jl_w, Jl)
    b_l = -jnp.einsum("lkcri,lkcr->li", Jl_w, r)
    W = jnp.einsum("lkcri,lkcrj->lkij", Jp_w, Jl)
    return U, b_pose, V, b_l, W, cost


def pallas_inputs(window, sel, rig, cfg):
    K, L, C = window.K, window.L, window.C
    obs_t = jnp.asarray(window.obs, F32).transpose(1, 2, 3, 0).reshape(K * C * 3, L)
    lm_active = window.lm_valid & sel.lm_selected
    base = (window.obs_mask & lm_active[:, None, None]
            & window.kf_valid[None, :, None])
    repr_base = jnp.asarray(base, F32).transpose(1, 2, 0).reshape(K * C, L)
    depth_base = jnp.asarray(
        base & (window.obs[..., 2] > 0) & window.lm_has_depth[:, None, None],
        F32).transpose(1, 2, 0).reshape(K * C, L)
    lm_t = jnp.asarray(window.lm_pos, F32).T
    wlm = jnp.asarray(window.lm_weight, F32)[None, :]
    R_kf = quat.qto_matrix(quat.qnormalize(jnp.asarray(window.poses[:, :4], F32)))
    pose_mats = jnp.concatenate([R_kf.reshape(K, 9),
                                 jnp.asarray(window.poses[:, 4:], F32)], -1)
    R_cv = quat.qto_matrix(quat.qnormalize(jnp.asarray(rig.T_cam_veh[:, :4], F32)))
    cam_mats = jnp.concatenate([
        R_cv.reshape(C, 9), jnp.asarray(rig.T_cam_veh[:, 4:], F32),
        jnp.asarray(rig.focal, F32)[:, None],
        jnp.asarray(rig.principal, F32)], -1)
    return obs_t, repr_base, depth_base, lm_t, wlm, pose_mats, cam_mats


class TestPallasAssemble:
    @pytest.mark.parametrize("with_depth", [False, True])
    def test_matches_einsum_path(self, rng, with_depth):
        gt = make_gt_poses()
        lms = make_landmarks(rng, n=120)
        w, cfg = build_window(gt, lms, RIG_F32 := None or __import__(
            "test_solver").RIG, pose_noise=(0.01, 0.1), lm_noise=0.2,
            pixel_noise=0.5, rng=rng, with_depth=with_depth)
        rig = __import__("test_solver").RIG
        # single precision window (kernel is f32)
        w = w._replace(**{f: jnp.asarray(getattr(w, f), F32)
                          for f in ("poses", "planes", "lm_pos", "lm_weight", "obs")})
        rig32 = CameraRig(focal=jnp.asarray(rig.focal, F32),
                          principal=jnp.asarray(rig.principal, F32),
                          T_cam_veh=jnp.asarray(rig.T_cam_veh, F32))
        sel = default_selection(w)
        assert w.L % TL == 0

        U_r, bp_r, V_r, bl_r, W_r, cost_r = reference_blocks(w, sel, rig32, cfg)
        ins = pallas_inputs(w, sel, rig32, cfg)
        out = assemble_obs_pallas(*ins, K=w.K, C=w.C,
                                  a2r=cfg.robust.reprojection_thres ** 2,
                                  a2d=cfg.robust.depth_thres ** 2,
                                  interpret=True)

        np.testing.assert_allclose(out.V, V_r, rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(out.b_l, bl_r, rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(out.W, W_r, rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(out.U, U_r, rtol=2e-3, atol=0.1)
        np.testing.assert_allclose(out.b_pose, bp_r, rtol=2e-3, atol=0.1)
        np.testing.assert_allclose(float(out.cost), float(cost_r), rtol=1e-4)

    def test_matches_einsum_two_cameras(self, rng):
        """C=2 rig through the kernel (multicam windows feed the same fused
        assembly; the W cross blocks accumulate over cameras in registers —
        a read-modify-write on the output ref fails Mosaic layout
        inference, found on the real chip with the 2-cam driver)."""
        from limo_tpu.config import CapacityConfig, LimoConfig
        from limo_tpu.geometry import pose as pose_ops
        from limo_tpu.state import empty_window

        cfg = LimoConfig(capacity=CapacityConfig(
            max_keyframes=6, max_landmarks=512, max_cameras=2))
        w = empty_window(cfg.capacity, F32)
        K, L, C = w.K, w.L, w.C
        t0 = pose_ops.identity(F32)
        t1 = jnp.asarray([1.0, 0, 0, 0, -0.5, 0.0, 0.0], F32)
        rig = CameraRig(focal=jnp.asarray([600.0, 600.0], F32),
                        principal=jnp.asarray([[300.0, 200.0]] * 2, F32),
                        T_cam_veh=jnp.stack([t0, t1]))
        L_used, K_used = 300, 5
        lms = rng.uniform(-1, 1, (L_used, 3)) * np.array([12.0, 7.0, 5.0]) \
            + np.array([0, 0, 28.0])
        poses = np.tile(np.array([1.0, 0, 0, 0, 0, 0, 0]), (K, 1))
        for k in range(1, K_used):
            poses[k, 4:] = poses[k - 1, 4:] + np.array([-0.5, 0.0, -1.4])
        obs = np.zeros((L, K, C, 3))
        obs[..., 2] = -1.0
        msk = np.zeros((L, K, C), bool)
        for k in range(K_used):
            for c in range(2):
                # all rotations are identity here: p_cam = lm + t_k + t_cv
                tcv = np.asarray(rig.T_cam_veh[c], np.float64)
                pc = lms + poses[k, 4:] + tcv[4:]
                uv = 600.0 * pc[:, :2] / pc[:, 2:] + np.array([300.0, 200.0])
                obs[:L_used, k, c, :2] = uv + rng.normal(0, 0.5, uv.shape)
                if c == 0:
                    obs[:L_used, k, c, 2] = pc[:, 2] + rng.normal(
                        0, 0.05, L_used)
                msk[:L_used, k, c] = True
        w = w._replace(
            poses=jnp.asarray(poses, F32),
            kf_valid=w.kf_valid.at[:K_used].set(True),
            fix_pose=w.fix_pose.at[0].set(True),
            lm_pos=jnp.asarray(
                np.pad(lms + rng.normal(0, 0.2, lms.shape),
                       ((0, L - L_used), (0, 0))), F32),
            lm_valid=w.lm_valid.at[:L_used].set(True),
            lm_has_depth=w.lm_has_depth.at[:L_used].set(True),
            obs=jnp.asarray(obs, F32), obs_mask=jnp.asarray(msk))
        sel = default_selection(w)

        U_r, bp_r, V_r, bl_r, W_r, cost_r = reference_blocks(w, sel, rig, cfg)
        ins = pallas_inputs(w, sel, rig, cfg)
        out = assemble_obs_pallas(*ins, K=K, C=C,
                                  a2r=cfg.robust.reprojection_thres ** 2,
                                  a2d=cfg.robust.depth_thres ** 2,
                                  interpret=True)
        np.testing.assert_allclose(out.V, V_r, rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(out.b_l, bl_r, rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(out.W, W_r, rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(out.U, U_r, rtol=2e-3, atol=0.1)
        np.testing.assert_allclose(out.b_pose, bp_r, rtol=2e-3, atol=0.1)
        np.testing.assert_allclose(float(out.cost), float(cost_r), rtol=1e-4)

    def test_cost_kernel_matches_einsum(self, rng):
        """The cost-only kernel (LM accept/reject fast path) must agree
        with the einsum forward cost — compute_cost dispatches on the
        assembly plan, so any drift between the two would corrupt the
        accept decisions mid-solve."""
        import dataclasses
        import sys
        sys.path.insert(0, "/root/repo")
        from __graft_entry__ import _make_problem
        from limo_tpu.solver.ba_core import assembly_plan, compute_cost

        w, sel, rig, cfg = _make_problem(5, 256, 5, 200, jnp.float32, seed=3)
        cfg_i = cfg.replace(solver=dataclasses.replace(
            cfg.solver, pallas_interpret=True))
        cfg_e = cfg.replace(solver=dataclasses.replace(
            cfg.solver, use_pallas_assembly=False))
        assert assembly_plan(w.L, jnp.float32, cfg_i).startswith("pallas")
        c_k = jax.jit(lambda a, b: compute_cost(a, b, rig, cfg_i))(w, sel)
        c_e = jax.jit(lambda a, b: compute_cost(a, b, rig, cfg_e))(w, sel)
        np.testing.assert_allclose(float(c_k), float(c_e), rtol=2e-5)
