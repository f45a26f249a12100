"""Keyframe selection schemes.

Reference: ``keyframe_selector.{hpp,cpp}`` — three scheme lists (rejection,
selection, sparsification) applied in order; a frame becomes a keyframe iff
(selected ∨ sparsification-passed) ∧ ¬rejected
(``keyframe_selector.cpp:107-133``).

These run per incoming frame on scalars/small arrays — pure jnp functions a
caller can fold into the per-frame jitted step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import quaternion as quat


class KeyframeDecision(NamedTuple):
    is_keyframe: jnp.ndarray   # bool
    rejected: jnp.ndarray      # bool (standstill)
    selected: jnp.ndarray      # bool (forced, e.g. curve)
    sparsified: jnp.ndarray    # bool (time-based keep)


def mean_flow(uv_new, uv_last, match_mask):
    """Mean pixel displacement of shared tracks between the candidate frame
    and the last keyframe (``KeyframeRejectionSchemeFlow``,
    keyframe_rejection_scheme_flow.cpp:9-66 — name says median, reference
    computes the mean; we reproduce the mean)."""
    d = jnp.linalg.norm(uv_new - uv_last, axis=-1)
    n = jnp.maximum(jnp.sum(match_mask), 1)
    return jnp.sum(jnp.where(match_mask, d, 0.0)) / n, jnp.sum(match_mask)


def select_keyframe(uv_new, uv_last_kf, match_mask,
                    q_new, q_last_kf,
                    ts_new, ts_last_kf, cfg) -> KeyframeDecision:
    """Apply flow-rejection, pose-difference selection, and time
    sparsification in the reference's union/veto combination."""
    ks = cfg.keyframe_selection
    flow, n_matches = mean_flow(uv_new, uv_last_kf, match_mask)
    # reject on standstill; with no matches the scheme cannot judge → keep
    rejected = (n_matches > 0) & (flow < ks.min_median_flow)
    angle = quat.qangle(q_new, q_last_kf)
    selected = angle > ks.critical_quaternion_difference
    sparsified = (ts_new - ts_last_kf) > ks.time_between_keyframes_sec
    is_kf = (selected | sparsified) & (~rejected)
    return KeyframeDecision(is_keyframe=is_kf, rejected=rejected,
                            selected=selected, sparsified=sparsified)


def select_keyframes(stamps, uvs, valid, quats,
                     uv_last_kf, valid_last_kf, q_last_kf, ts_last_kf,
                     has_last_kf, cfg) -> jnp.ndarray:
    """Candidate-frame-SET selection — ``KeyframeSelector::select`` over a
    frame list (keyframe_selector.cpp:107-133), for burst ingest.

    The reference tests every scheme against BOTH the already-selected
    buffer and the frames accepted earlier in this batch (applyRejection/
    applySelectionScheme's ``isUsable(frame, buffer) ... isUsable(frame,
    selected_keyframes)``): rejection and sparsification must pass against
    both sets, selection passes if either set demands the frame. Here that
    is a ``lax.scan`` over candidates carrying the last accepted frame.

    stamps [F], uvs [F,R,2] (track-row-aligned across frames), valid [F,R],
    quats [F,4]; ``uv_last_kf``/``valid_last_kf``/``q_last_kf``/
    ``ts_last_kf`` describe the newest already-selected keyframe and
    ``has_last_kf`` whether one exists. Returns accepted [F] bool.
    """
    ks = cfg.keyframe_selection
    big_neg = jnp.asarray(-1e30, stamps.dtype)

    def decide(ts, uv, v, q, uv_ref, v_ref, q_ref, ts_ref):
        flow, n = mean_flow(uv, uv_ref, v & v_ref)
        rejected = (n > 0) & (flow < ks.min_median_flow)
        selected = quat.qangle(q, q_ref) > ks.critical_quaternion_difference
        sparsified = (ts - ts_ref) > ks.time_between_keyframes_sec
        return rejected, selected, sparsified

    def step(carry, frame):
        uv_s, v_s, q_s, ts_s, has_s = carry
        ts, uv, v, q = frame
        rej_b, sel_b, sp_b = decide(ts, uv, v, q, uv_last_kf,
                                    valid_last_kf, q_last_kf,
                                    jnp.where(has_last_kf, ts_last_kf,
                                              big_neg))
        rej_s, sel_s, sp_s = decide(ts, uv, v, q, uv_s, v_s, q_s,
                                    jnp.where(has_s, ts_s, big_neg))
        rej_b = rej_b & has_last_kf
        rej_s = rej_s & has_s
        rejected = rej_b | rej_s                 # usable vs BOTH sets
        selected = (sel_b & has_last_kf) | (sel_s & has_s) \
            | ((~has_last_kf) & (~has_s))        # very first frame: keep
        sparsified = sp_b & sp_s                 # time gap vs BOTH sets
        accept = (selected | sparsified) & (~rejected)
        uv_s = jnp.where(accept, uv, uv_s)
        v_s = jnp.where(accept, v, v_s)
        q_s = jnp.where(accept, q, q_s)
        ts_s = jnp.where(accept, ts, ts_s)
        has_s = has_s | accept
        return (uv_s, v_s, q_s, ts_s, has_s), accept

    carry0 = (jnp.zeros_like(uvs[0]), jnp.zeros_like(valid[0]),
              quat.qidentity(quats.dtype), big_neg, jnp.asarray(False))
    _, accepted = jax.lax.scan(step, carry0, (stamps, uvs, valid, quats))
    return accepted
