"""Matmul-precision pinning for the solver's numeric core.

XLA:TPU lowers f32 dot/einsum to bf16×bf16 MXU passes by DEFAULT — fine for
descriptor similarity scores, catastrophic for normal-equation assembly and
Schur solves in precision-critical configurations. Measured on the real
chip (2-camera mono-scale window, round 2): ATE 6.8 m with default matmul
precision vs 0.32 m with float32 accumulation — identical code, identical
dtype. Single-camera lidar-anchored runs masked the issue (depth residuals
dominate conditioning).

``highest_matmul`` wraps a function body in
``jax.default_matmul_precision("highest")`` — a TRACE-time context, so one
wrapper on each solver entry point covers every contraction traced inside
it (assembly einsums, Schur reduction, dense solves, autodiff transposes)
with zero effect on code elsewhere (tracker NCC stays on the fast path).
"""

from __future__ import annotations

import functools

import jax


def highest_matmul(fn):
    """Decorate a (jit-traceable) function to trace all dots/einsums inside
    it at float32 accumulation precision on TPU."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
