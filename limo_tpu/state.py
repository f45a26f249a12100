"""Window state — the fixed-shape pytree that replaces the reference's
pointer-graph of Keyframe/Landmark maps.

The reference keeps ``std::map<KeyframeId, Keyframe>`` +
``std::map<LandmarkId, Landmark>`` + per-keyframe measurement maps
(``keyframe.hpp:171-196``, ``bundle_adjuster_keyframes.hpp:216-260``) and
rebuilds a ceres::Problem every solve. The TPU engine instead keeps one
struct-of-arrays pytree with static capacities and validity masks; every
"scheme" is a pure function producing masks/weights, and the solver consumes
the pytree directly.

Layout is landmark-major (``obs[L,K,C,3]``) so landmark-axis sharding across
devices splits observations, Schur blocks, and trimming scores evenly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .config import CapacityConfig


class Window(NamedTuple):
    """Sliding optimization window. K keyframe slots, L landmark slots,
    C cameras. All arrays fixed-shape; masks define validity.

    Poses are keyframe ← origin (world-to-body), 7-vectors (quat wxyz, t xyz).
    Planes are local groundplanes per keyframe: (nx, ny, nz, d) with
    n·p + d = 0 for points p on the plane in keyframe coordinates
    (``definitions.hpp:27-34``); ``plane_valid`` False reproduces the
    reference's ``distance = -max ⇒ disabled`` convention.
    Observations are (u, v, d) with d < 0 ⇒ no measured depth
    (``matches_msg_types/feature_point.hpp``).
    """

    # keyframes --------------------------------------------------------
    stamps: jnp.ndarray        # [K] f64 seconds
    poses: jnp.ndarray         # [K,7]
    kf_valid: jnp.ndarray      # [K] bool — slot holds an active keyframe
    fix_pose: jnp.ndarray      # [K] bool — FixationStatus::Pose
    fix_scale: jnp.ndarray     # [K] bool — FixationStatus::Scale
    planes: jnp.ndarray        # [K,4]
    plane_valid: jnp.ndarray   # [K] bool
    # landmarks --------------------------------------------------------
    lm_pos: jnp.ndarray        # [L,3] in origin frame
    lm_valid: jnp.ndarray      # [L] bool
    lm_weight: jnp.ndarray     # [L] label-derived weight (shrubbery 0.9 ...)
    lm_has_depth: jnp.ndarray  # [L] bool
    lm_is_gp: jnp.ndarray      # [L] bool
    lm_id: jnp.ndarray         # [L] int32 global track id (-1 = empty slot)
    # observations -----------------------------------------------------
    obs: jnp.ndarray           # [L,K,C,3] (u,v,d)
    obs_mask: jnp.ndarray      # [L,K,C] bool

    @property
    def K(self) -> int:
        return self.poses.shape[0]

    @property
    def L(self) -> int:
        return self.lm_pos.shape[0]

    @property
    def C(self) -> int:
        return self.obs.shape[2]


def empty_window(cap: CapacityConfig, dtype=jnp.float32) -> Window:
    K, L, C = cap.max_keyframes, cap.max_landmarks, cap.max_cameras
    pose0 = jnp.zeros((K, 7), dtype).at[:, 0].set(1.0)
    plane0 = jnp.zeros((K, 4), dtype).at[:, 2].set(1.0)
    return Window(
        stamps=jnp.zeros((K,), jnp.float64 if dtype == jnp.float64 else jnp.float32),
        poses=pose0,
        kf_valid=jnp.zeros((K,), bool),
        fix_pose=jnp.zeros((K,), bool),
        fix_scale=jnp.zeros((K,), bool),
        planes=plane0,
        plane_valid=jnp.zeros((K,), bool),
        lm_pos=jnp.zeros((L, 3), dtype),
        lm_valid=jnp.zeros((L,), bool),
        lm_weight=jnp.ones((L,), dtype),
        lm_has_depth=jnp.zeros((L,), bool),
        lm_is_gp=jnp.zeros((L,), bool),
        lm_id=jnp.full((L,), -1, jnp.int32),
        obs=jnp.zeros((L, K, C, 3), dtype),
        obs_mask=jnp.zeros((L, K, C), bool),
    )


class Selection(NamedTuple):
    """Output of the landmark selector + solve-time wiring, consumed by the
    BA solver. Replaces the reference's selected_landmark_ids_ +
    addGroundPlaneResiduals / addScaleRegularization bookkeeping."""

    lm_selected: jnp.ndarray   # [L] bool — participate in this solve
    gp_kf: jnp.ndarray         # [L] int32 — keyframe owning this gp landmark's
                               # height residual (nearest active kf w/ plane)
    gp_weight: jnp.ndarray     # [L] weight*(1 - d/25); 0 ⇒ no gp residual
    # scale regularization (two oldest active keyframes)
    scale_kf0: jnp.ndarray     # int32
    scale_kf1: jnp.ndarray     # int32
    scale_target: jnp.ndarray  # current ‖t1−t0‖ to pin
    scale_weight: jnp.ndarray  # 0 ⇒ disabled
    plane_dist_fixed: jnp.ndarray  # bool — fix plane distances (few depth res)


def numpy_window(w: Window) -> Window:
    """Device → host copy for host-side bookkeeping."""
    return Window(*[np.asarray(x) for x in w])
