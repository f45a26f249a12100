"""Robust losses and trimmed-least-squares primitives.

Replaces ``robust_optimization`` (trimmers: ``internal/trimmer_fix.hpp``,
``internal/trimmer_quantile.hpp``) and the Ceres loss functions used by the
reference (Cauchy for depth/reprojection, Huber for groundplane height —
``bundle_adjuster_keyframes.cpp:564-627,517-562``).

TPU design: losses enter the solver as IRLS weights ``sqrt(rho'(s))`` applied
to whitened residuals; trimming is a *mask update* over residual groups
(group = landmark), never a shape change.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# Robust loss weights (IRLS).  For a residual block r with squared norm
# s = ||r||^2 and loss rho(s), the Triggs/IRLS reweighting multiplies the
# whitened residual/jacobian by sqrt(rho'(s)).
# --------------------------------------------------------------------------

def cauchy_weight(sq_norm, scale):
    """rho(s) = a^2 log(1 + s/a^2)  ⇒  rho'(s) = 1 / (1 + s/a^2)."""
    a2 = scale * scale
    return 1.0 / (1.0 + sq_norm / a2)


def huber_weight(sq_norm, delta):
    """Ceres HuberLoss(a): rho(s) = s for s<=a^2 else 2a√s − a^2
    ⇒ rho'(s) = min(1, a/√s)."""
    a = delta
    r = jnp.sqrt(jnp.maximum(sq_norm, 1e-20))
    return jnp.minimum(1.0, a / r)


def trivial_weight(sq_norm, scale=None):
    return jnp.ones_like(sq_norm)


LOSSES = {"cauchy": cauchy_weight, "huber": huber_weight, "trivial": trivial_weight}


# --------------------------------------------------------------------------
# Trimmers.  Inputs are per-group scalar scores (the reference uses the max
# residual norm over the group's residual blocks, robust_solving.cpp:67-91)
# plus a validity mask; output is the *outlier* mask.
# --------------------------------------------------------------------------

def trim_fixed(scores, valid, threshold):
    """``TrimmerFix`` (trimmer_fix.hpp:36-47): score > threshold ⇒ outlier."""
    return valid & (scores > threshold)


def trim_quantile(scores, valid, quantile, axis_name=None):
    """``TrimmerQuantile`` (trimmer_quantile.hpp:44-67): nth_element at
    floor(N*quantile) of the *valid* scores; everything strictly above the
    pivot value is an outlier (q=0.9 ⇒ top ~10% rejected).

    Masked, fixed-shape: invalid entries are pushed to +inf and excluded.
    Inside a ``shard_map`` over a landmark-sharded mesh axis, pass
    ``axis_name``: the pivot is computed from the all-gathered global scores
    (one small ``all_gather`` of [L] floats) and applied to the local shard.
    """
    if axis_name is None:
        g_scores, g_valid = scores, valid
    else:
        g_scores = jax.lax.all_gather(scores, axis_name).reshape(-1)
        g_valid = jax.lax.all_gather(valid, axis_name).reshape(-1)
    n_valid = jnp.sum(g_valid)
    big = jnp.asarray(jnp.inf, scores.dtype)
    masked = jnp.where(g_valid, g_scores, big)
    sorted_scores = jnp.sort(masked)
    # reference: std::nth_element(begin, begin + quantile*size, end) then the
    # pivot *value* partitions; index = floor(q * n_valid), clipped.
    idx = jnp.clip((quantile * n_valid.astype(scores.dtype)).astype(jnp.int32),
                   0, g_scores.shape[0] - 1)
    pivot = sorted_scores[idx]
    return valid & (scores > pivot)


def residuals_to_remove(scores, valid, trimmer_type, trimmer_param,
                        min_groups: int):
    """``getResidualsToRemove`` (robust_solving.cpp:100-125): skip trimming
    entirely when fewer than ``min_groups`` valid groups exist."""
    if trimmer_type == "fixed":
        out = trim_fixed(scores, valid, trimmer_param)
    elif trimmer_type == "quantile":
        out = trim_quantile(scores, valid, trimmer_param)
    else:
        raise ValueError(f"unknown trimmer {trimmer_type}")
    enough = jnp.sum(valid) >= min_groups
    return out & enough
