"""Fused Pallas TPU kernel for BA normal-equation assembly.

The XLA einsum path materializes per-observation jacobian tensors
([L,K,C,3,6] etc. — ~20 MB per LM iteration); measurement shows the solve is
HBM-bandwidth-bound (batching windows does not raise throughput). This
kernel computes residuals, IRLS weights, and the analytic jacobians
(closed forms of :mod:`limo_tpu.solver.analytic`) *in registers* and writes
only the reduced blocks:

    V  [L,3,3]  landmark Hessian blocks          (output, lane-major)
    b_l[L,3]
    W  [L,K,6,3] pose↔landmark cross blocks
    U  [K,6,6]  pose blocks        (per-tile partials, summed outside)
    b_pose [K,6]
    cost scalar (robust, per-tile partials)

Layout: landmarks ride the TPU lane dimension ([X, L] arrays, L lane-aligned
to 128; tiles of TL landmarks per grid step), keyframe/camera constants sit
in SMEM, and the K·C loops are unrolled Python loops of vector ops — pure
VPU work with zero gather/scatter.

Measured on one TPU v5e chip (12 kf × 800 lm window): full trimmed solve
20.8 ms → 8.0 ms (2.6×) vs the einsum assembly, identical trim decisions,
final poses within f32 accumulation-order noise (≤3 mm). Wired into
``assemble`` behind ``SolverConfig.use_pallas_assembly`` (default on;
auto-gated to TPU backend + f32 + no rotation compensation).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUB = 8
TL = 512  # landmarks per grid step (4 sublanes × 128 lanes per vector op)


class ObsBlocks(NamedTuple):
    V: jnp.ndarray        # [L,3,3]
    b_l: jnp.ndarray      # [L,3]
    W: jnp.ndarray        # [L,K,6,3]
    U: jnp.ndarray        # [K,6,6]
    b_pose: jnp.ndarray   # [K,6]
    cost: jnp.ndarray     # scalar


def _cost_kernel(K, C, a2r, a2d, tl,
                 pose_ref, cam_ref,
                 obs_ref, repr_base_ref, depth_base_ref, lm_ref, wlm_ref,
                 cost_ref):
    """Cost-only variant of :func:`_kernel`: residuals + robust cost, no
    jacobian/Hessian accumulation. The LM loop evaluates the candidate
    cost once per iteration (accept/reject) and the trim rounds once more;
    running that forward pass through the fused kernel instead of the
    einsum grid removes the largest non-assembly cost of each iteration."""
    shp = (tl // LANE, LANE)
    f32 = jnp.float32

    def vec(ref, row):
        return ref[row].reshape(shp)

    x0, x1, x2 = vec(lm_ref, 0), vec(lm_ref, 1), vec(lm_ref, 2)
    w_lm = vec(wlm_ref, 0)
    cost_acc = jnp.zeros(shp, f32)

    for k in range(K):
        R = [[pose_ref[k, 3 * i + j] for j in range(3)] for i in range(3)]
        t = [pose_ref[k, 9 + i] for i in range(3)]
        y = [R[i][0] * x0 + R[i][1] * x1 + R[i][2] * x2 for i in range(3)]
        pv = [y[i] + t[i] for i in range(3)]
        for c in range(C):
            A = [[cam_ref[c, 3 * i + j] for j in range(3)] for i in range(3)]
            tc = [cam_ref[c, 9 + i] for i in range(3)]
            fl = cam_ref[c, 12]
            cx = cam_ref[c, 13]
            cy = cam_ref[c, 14]
            p = [A[i][0] * pv[0] + A[i][1] * pv[1] + A[i][2] * pv[2] + tc[i]
                 for i in range(3)]
            z = p[2]
            proj_ok = jnp.abs(z) >= 0.01
            inv_z = 1.0 / jnp.where(proj_ok, z, 1.0)
            row = k * C + c
            ou = vec(obs_ref, 3 * row + 0)
            ov = vec(obs_ref, 3 * row + 1)
            od = vec(obs_ref, 3 * row + 2)
            m_repr = vec(repr_base_ref, row) * proj_ok.astype(f32)
            m_depth = vec(depth_base_ref, row) * (z > 0.0).astype(f32)
            r_u = fl * p[0] * inv_z + cx - ou
            r_v = fl * p[1] * inv_z + cy - ov
            r_d = z - od
            s_repr = r_u * r_u + r_v * r_v
            s_dep = r_d * r_d
            cost_acc = cost_acc + 0.5 * w_lm * (
                m_repr * a2r * jnp.log1p(s_repr / a2r)
                + m_depth * a2d * jnp.log1p(s_dep / a2d))

    for r in range(8):
        cost_ref[0, r] = (jnp.sum(cost_acc, axis=0) if r == 0
                          else jnp.zeros((LANE,), f32))


@partial(jax.jit, static_argnames=("K", "C", "a2r", "a2d", "interpret", "tl"))
def cost_obs_pallas(obs_t, repr_base, depth_base, lm_t, wlm,
                    pose_mats, cam_mats, K: int, C: int,
                    a2r: float, a2d: float,
                    interpret: bool = False, tl: int = TL) -> jnp.ndarray:
    """Robust observation cost only (same inputs as
    :func:`assemble_obs_pallas`); returns the scalar cost."""
    L = obs_t.shape[1]
    assert L % tl == 0 and tl % LANE == 0, (L, tl)
    grid = (L // tl,)
    kern = partial(_cost_kernel, K, C, a2r, a2d, tl)
    lane_spec = lambda rows: pl.BlockSpec((rows, tl), lambda i: (0, i),
                                          memory_space=pltpu.VMEM)
    cost_p = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((K, 12), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((C, 15), lambda i: (0, 0), memory_space=pltpu.SMEM),
            lane_spec(K * C * 3),
            lane_spec(K * C),
            lane_spec(K * C),
            lane_spec(3),
            lane_spec(1),
        ],
        out_specs=pl.BlockSpec((1, 8, LANE), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid[0], 8, LANE), jnp.float32),
        interpret=interpret,
    )(pose_mats, cam_mats, obs_t, repr_base, depth_base, lm_t, wlm)
    return jnp.sum(cost_p[:, 0, :])


def _kernel(K, C, a2r, a2d, tl,
            pose_ref, cam_ref,
            obs_ref, repr_base_ref, depth_base_ref, lm_ref, wlm_ref,
            V_ref, bl_ref, W_ref, U_ref, bp_ref, cost_ref):
    """One grid step processes ``tl`` landmarks (packed [tl//LANE, LANE])."""
    shp = (tl // LANE, LANE)
    f32 = jnp.float32

    def vec(ref, row):
        return ref[row].reshape(shp)

    x0, x1, x2 = vec(lm_ref, 0), vec(lm_ref, 1), vec(lm_ref, 2)
    w_lm = vec(wlm_ref, 0)

    # accumulators (vectors over landmarks)
    Vacc = [[jnp.zeros(shp, f32) for _ in range(3)] for _ in range(3)]
    blacc = [jnp.zeros(shp, f32) for _ in range(3)]
    cost_acc = jnp.zeros(shp, f32)

    for k in range(K):
        # pose constants (scalars)
        R = [[pose_ref[k, 3 * i + j] for j in range(3)] for i in range(3)]
        t = [pose_ref[k, 9 + i] for i in range(3)]
        # y = R x (vectors)
        y = [R[i][0] * x0 + R[i][1] * x1 + R[i][2] * x2 for i in range(3)]
        pv = [y[i] + t[i] for i in range(3)]

        Uacc = [[jnp.zeros(shp, f32) for _ in range(6)] for _ in range(6)]
        bpacc = [jnp.zeros(shp, f32) for _ in range(6)]
        # W cross blocks accumulate in registers across cameras — a
        # read-modify-write on W_ref would need a (shp)→1D reshape of the
        # loaded row, which Mosaic's layout inference rejects for C ≥ 2
        Wacc = [[jnp.zeros(shp, f32) for _ in range(3)] for _ in range(6)]

        for c in range(C):
            A = [[cam_ref[c, 3 * i + j] for j in range(3)] for i in range(3)]
            tc = [cam_ref[c, 9 + i] for i in range(3)]
            fl = cam_ref[c, 12]
            cx = cam_ref[c, 13]
            cy = cam_ref[c, 14]
            # AR = A @ R (scalars)
            AR = [[sum(A[i][m] * R[m][j] for m in range(3)) for j in range(3)]
                  for i in range(3)]
            # p_cam = A pv + tc
            p = [A[i][0] * pv[0] + A[i][1] * pv[1] + A[i][2] * pv[2] + tc[i]
                 for i in range(3)]
            z = p[2]
            proj_ok = jnp.abs(z) >= 0.01
            inv_z = 1.0 / jnp.where(proj_ok, z, 1.0)
            xz = p[0] * inv_z
            yz = p[1] * inv_z
            fz = fl * inv_z

            row = k * C + c
            ou = vec(obs_ref, 3 * row + 0)
            ov = vec(obs_ref, 3 * row + 1)
            od = vec(obs_ref, 3 * row + 2)
            m_repr = vec(repr_base_ref, row) * proj_ok.astype(f32)
            # depth rows need z > 0 (cheirality), matching ba_core's einsum path
            m_depth = vec(depth_base_ref, row) * (z > 0.0).astype(f32)

            r_u = fl * xz + cx - ou
            r_v = fl * yz + cy - ov
            r_d = z - od

            s_repr = r_u * r_u + r_v * r_v
            s_dep = r_d * r_d
            w_r = m_repr * w_lm / (1.0 + s_repr / a2r)
            w_d = m_depth * w_lm / (1.0 + s_dep / a2d)

            cost_acc = cost_acc + 0.5 * w_lm * (
                m_repr * a2r * jnp.log1p(s_repr / a2r)
                + m_depth * a2d * jnp.log1p(s_dep / a2d))

            # M = A @ skew(y):  M[i][j] column vectors
            M = [[A[i][1] * y[2] - A[i][2] * y[1],
                  -A[i][0] * y[2] + A[i][2] * y[0],
                  A[i][0] * y[1] - A[i][1] * y[0]] for i in range(3)]
            # dp columns: j<3 → −2 M[i][j] (vectors); j>=3 → A[i][j−3] (scalars)
            # Jacobian rows (6 pose cols then 3 landmark cols):
            Jp_u, Jp_v, Jp_d = [], [], []
            for j in range(3):
                d0 = -2.0 * M[0][j]
                d1 = -2.0 * M[1][j]
                d2 = -2.0 * M[2][j]
                Jp_u.append(fz * (d0 - xz * d2))
                Jp_v.append(fz * (d1 - yz * d2))
                Jp_d.append(d2)
            for j in range(3):
                Jp_u.append(fz * (A[0][j] - xz * A[2][j]))
                Jp_v.append(fz * (A[1][j] - yz * A[2][j]))
                Jp_d.append(A[2][j] * jnp.ones(shp, f32))
            Jl_u = [fz * (AR[0][a] - xz * AR[2][a]) for a in range(3)]
            Jl_v = [fz * (AR[1][a] - yz * AR[2][a]) for a in range(3)]
            Jl_d = [AR[2][a] * jnp.ones(shp, f32) for a in range(3)]

            # accumulate V, b_l (landmark blocks)
            for a in range(3):
                for b in range(a, 3):
                    acc = (w_r * (Jl_u[a] * Jl_u[b] + Jl_v[a] * Jl_v[b])
                           + w_d * Jl_d[a] * Jl_d[b])
                    Vacc[a][b] = Vacc[a][b] + acc
                blacc[a] = blacc[a] - (w_r * (Jl_u[a] * r_u + Jl_v[a] * r_v)
                                       + w_d * Jl_d[a] * r_d)

            # accumulate U, b_pose for this keyframe
            for pcol in range(6):
                for q in range(pcol, 6):
                    Uacc[pcol][q] = Uacc[pcol][q] + (
                        w_r * (Jp_u[pcol] * Jp_u[q] + Jp_v[pcol] * Jp_v[q])
                        + w_d * Jp_d[pcol] * Jp_d[q])
                bpacc[pcol] = bpacc[pcol] - (
                    w_r * (Jp_u[pcol] * r_u + Jp_v[pcol] * r_v)
                    + w_d * Jp_d[pcol] * r_d)
                # W cross blocks (register accumulation over cameras)
                for a in range(3):
                    wv = (w_r * (Jp_u[pcol] * Jl_u[a] + Jp_v[pcol] * Jl_v[a])
                          + w_d * Jp_d[pcol] * Jl_d[a])
                    Wacc[pcol][a] = Wacc[pcol][a] + wv

        for pcol in range(6):
            for a in range(3):
                W_ref[k * 18 + pcol * 3 + a] = Wacc[pcol][a].reshape(-1)

        # U/b_pose: lanes carry LANE partial sums the host reduces
        # (Mosaic has no scalar packing)
        for pcol in range(6):
            for q in range(6):
                src = Uacc[pcol][q] if q >= pcol else Uacc[q][pcol]
                U_ref[0, k * 36 + pcol * 6 + q] = jnp.sum(src, axis=0)
            bp_ref[0, k * 6 + pcol] = jnp.sum(bpacc[pcol], axis=0)

    # write landmark-major outputs
    for a in range(3):
        for b in range(3):
            src = Vacc[a][b] if b >= a else Vacc[b][a]
            V_ref[a * 3 + b] = src.reshape(-1)
        bl_ref[a] = blacc[a].reshape(-1)
    for r in range(8):
        cost_ref[0, r] = (jnp.sum(cost_acc, axis=0) if r == 0
                          else jnp.zeros((LANE,), f32))


@partial(jax.jit, static_argnames=("K", "C", "a2r", "a2d", "interpret", "tl"))
def assemble_obs_pallas(obs_t, repr_base, depth_base, lm_t, wlm,
                        pose_mats, cam_mats, K: int, C: int,
                        a2r: float, a2d: float,
                        interpret: bool = False, tl: int = TL) -> ObsBlocks:
    """obs_t [K*C*3, L]; repr/depth_base [K*C, L] f32 0/1; lm_t [3,L];
    wlm [1,L]; pose_mats [K,12] (R row-major + t); cam_mats [C,15]
    (R_cv + t_cv + f,cx,cy). L must be a multiple of ``tl`` (the landmark
    tile per grid step — 512 for the full-speed single-chip layout; smaller
    128-multiples let landmark-sharded shard_map shards keep the kernel)."""
    L = obs_t.shape[1]
    assert L % tl == 0 and tl % LANE == 0, (L, tl)
    grid = (L // tl,)

    kern = partial(_kernel, K, C, a2r, a2d, tl)
    out_shapes = (
        jax.ShapeDtypeStruct((9, L), jnp.float32),        # V
        jax.ShapeDtypeStruct((3, L), jnp.float32),        # b_l
        jax.ShapeDtypeStruct((K * 18, L), jnp.float32),   # W
        jax.ShapeDtypeStruct((grid[0], K * 36, LANE), jnp.float32),
        jax.ShapeDtypeStruct((grid[0], K * 6, LANE), jnp.float32),
        jax.ShapeDtypeStruct((grid[0], 8, LANE), jnp.float32),
    )
    lane_spec = lambda rows: pl.BlockSpec((rows, tl), lambda i: (0, i),
                                          memory_space=pltpu.VMEM)
    out_specs = (
        lane_spec(9), lane_spec(3), lane_spec(K * 18),
        pl.BlockSpec((1, K * 36, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, K * 6, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    )
    in_specs = [
        pl.BlockSpec((K, 12), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((C, 15), lambda i: (0, 0), memory_space=pltpu.SMEM),
        lane_spec(K * C * 3),
        lane_spec(K * C),
        lane_spec(K * C),
        lane_spec(3),
        lane_spec(1),
    ]
    V_t, bl_t, W_t, U_p, bp_p, cost_p = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(pose_mats, cam_mats, obs_t, repr_base, depth_base, lm_t, wlm)

    V = V_t.T.reshape(L, 3, 3)
    b_l = bl_t.T
    W = W_t.T.reshape(L, K, 6, 3)
    U = jnp.sum(U_p, axis=(0, 2)).reshape(K, 6, 6)
    b_pose = jnp.sum(bp_p, axis=(0, 2)).reshape(K, 6)
    cost = jnp.sum(cost_p[:, 0, :])
    return ObsBlocks(V=V, b_l=b_l, W=W, U=U, b_pose=b_pose, cost=cost)
