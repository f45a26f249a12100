"""Matmul-precision pinning for the solver's numeric core.

XLA:TPU lowers f32 dot/einsum to bf16×bf16 MXU passes by DEFAULT — fine for
descriptor similarity scores, catastrophic where near-exact cancellation
happens. Measured on the real chip (2-camera mono-scale window, round 2):
ATE 6.8 m with default matmul precision vs 0.32 m with float32
accumulation — identical code, identical dtype.

Round-3 on-chip attribution (12 kf × 800 lm trimmed solve, bench problem):
wrapping the ENTIRE solve at "highest" costs 29% throughput (98 vs 138
solves/s; "high"/bf16_3x is no cheaper at this size). The cancellation
that actually needs f32 is the Schur complement S = H − W·V⁻¹·Wᵀ (and its
dense solve): on weakly constrained dims (mono scale) H and the correction
agree to many digits. So precision is now pinned per-site:

- ``solver/lm.solve_normal_equations`` always runs its contractions at
  "highest" (internal context — inner context wins over any outer level);
- the fused Pallas assembly computes the normal equations in exact f32 VPU
  arithmetic (no MXU passes at all);
- everything else in the windowed solve traces at the *global* level below
  (default: "default" = fastest), giving 130+ solves/s with the 2-cam
  accuracy preserved (round-3 on-chip drive in PERF.md);
- ``highest_matmul`` (always-highest) still guards the 5-point minimal
  solver and the 6-dof pose-only step — tiny systems where precision is
  free and conditioning is hostile.

The level participates in jax's jit cache key, so switching at runtime is
safe (it just retraces).
"""

from __future__ import annotations

import functools
import os

import jax

_VALID = ("default", "high", "highest")
_precision = os.environ.get("LIMO_MATMUL_PRECISION", "default")
if _precision not in _VALID:
    raise ValueError(f"LIMO_MATMUL_PRECISION must be one of {_VALID}, "
                     f"got {_precision!r}")


def set_solver_matmul_precision(level: str) -> None:
    """Override the global solver matmul precision ("default" | "high" |
    "highest"). Takes effect on the next trace of a solver entry point.
    The Schur solve stays at "highest" regardless (see module docstring)."""
    global _precision
    if level not in _VALID:
        raise ValueError(f"level must be one of {_VALID}, got {level!r}")
    _precision = level


def get_solver_matmul_precision() -> str:
    return _precision


def solver_matmul(fn):
    """Decorate a solver entry point to trace its dots/einsums at the
    configured global level (the Schur solve re-pins itself to "highest"
    inside)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision(_precision):
            return fn(*args, **kwargs)

    return wrapped


def highest_matmul(fn):
    """Decorate a (jit-traceable) function to trace all dots/einsums inside
    it at full float32 accumulation precision on TPU — for small,
    conditioning-hostile kernels (5-point solver, 6-dof pose-only)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
