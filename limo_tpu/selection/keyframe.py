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

    The reference runs THREE independent passes over the candidate list,
    each with its OWN accumulator of frames accepted by that pass
    (``applyRejectionScheme``/``applySelectionScheme``,
    keyframe_selector.cpp:34-88): rejection accumulates every non-rejected
    frame, selection accumulates selection-pass keeps, sparsification
    accumulates sparsification-pass keeps; every scheme compares against
    the newest-timestamp frame of the buffer AND of its pass accumulator
    (usable vs both for rejection/sparsification, vs either for
    selection). The final set is (selected ∨ sparsified) ∧ ¬rejected.
    A single shared "last accepted" carry — the pre-r4 implementation —
    lets a rotation-selected keep reset the sparsification time base,
    which the reference's separate passes never do (advisor r3 finding);
    here each pass carries its own reference state in one fused scan.

    (``eraseRejected``'s per-pass-id key mismatch in the reference is a
    bookkeeping bug, not intent — the intended per-frame combination
    above is what the single-frame ``select_keyframe`` also implements.)

    stamps [F], uvs [F,R,2] (track-row-aligned across frames), valid [F,R],
    quats [F,4]; ``uv_last_kf``/``valid_last_kf``/``q_last_kf``/
    ``ts_last_kf`` describe the newest already-selected keyframe and
    ``has_last_kf`` whether one exists. Returns accepted [F] bool.
    """
    ks = cfg.keyframe_selection

    def step(carry, frame):
        (uv_r, v_r, has_r), (q_s, has_s), (ts_p, has_p) = carry
        ts, uv, v, q = frame

        # --- rejection pass (flow): usable vs buffer AND vs the newest
        # non-rejected frame of this batch; empty set → usable -------------
        flow_b, n_b = mean_flow(uv, uv_last_kf, v & valid_last_kf)
        flow_r, n_r = mean_flow(uv, uv_r, v & v_r)
        rej_b = has_last_kf & (n_b > 0) & (flow_b < ks.min_median_flow)
        rej_r = has_r & (n_r > 0) & (flow_r < ks.min_median_flow)
        rejected = rej_b | rej_r
        keep_r = ~rejected
        uv_r = jnp.where(keep_r, uv, uv_r)
        v_r = jnp.where(keep_r, v, v_r)
        has_r = has_r | keep_r

        # --- selection pass (pose angle): usable vs EITHER set; empty
        # set → not usable (scheme_pose.cpp:22-24). The very first frame
        # (no buffer, empty accumulators) is accepted via sparsification.
        sel_b = has_last_kf & (quat.qangle(q, q_last_kf)
                               > ks.critical_quaternion_difference)
        sel_s = has_s & (quat.qangle(q, q_s)
                         > ks.critical_quaternion_difference)
        selected = sel_b | sel_s
        q_s = jnp.where(selected, q, q_s)
        has_s = has_s | selected

        # --- sparsification pass (time): usable vs buffer AND vs the
        # newest sparsification-pass keep; empty set → usable -------------
        sp_b = (~has_last_kf) | ((ts - ts_last_kf)
                                 > ks.time_between_keyframes_sec)
        sp_p = (~has_p) | ((ts - ts_p) > ks.time_between_keyframes_sec)
        sparsified = sp_b & sp_p
        ts_p = jnp.where(sparsified, ts, ts_p)
        has_p = has_p | sparsified

        accept = (selected | sparsified) & (~rejected)
        return ((uv_r, v_r, has_r), (q_s, has_s), (ts_p, has_p)), accept

    false = jnp.asarray(False)
    carry0 = ((jnp.zeros_like(uvs[0]), jnp.zeros_like(valid[0]), false),
              (quat.qidentity(quats.dtype), false),
              (jnp.zeros_like(stamps[0]), false))
    _, accepted = jax.lax.scan(step, carry0, (stamps, uvs, valid, quats))
    return accepted
