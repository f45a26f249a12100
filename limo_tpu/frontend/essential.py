"""Batched essential-matrix motion prior.

Reference: ``general_helpers.hpp:103-140`` (``calcMotion5Point``): OpenCV
``findEssentialMat`` (5-point RANSAC, prob 0.999, thres 1 px) +
``recoverPose``, with a 3 px mean-flow standstill gate, then translation
rescaled by prior speed × Δt (``getMotionUnscaled`` :209-231).

TPU re-design: RANSAC as a *fixed-hypothesis-count* batched kernel — H
minimal samples drawn with a counter-based hash, one vmapped minimal solve,
Sampson-distance scoring of all N correspondences against all candidate
models in one einsum, argmax inlier count, then a cheirality vote over the
4 (R,t) decompositions. No data-dependent control flow; everything jits.

Two minimal solvers:

- ``method="5point"`` (default, the reference's Nistér-class solver): the
  TRUE minimal problem. Per 5-point sample the epipolar nullspace is
  4-dimensional (E = x·B0 + y·B1 + z·B2 + B3); the 10 cubic constraints
  (det E = 0 and 2·E·Eᵀ·E − tr(E·Eᵀ)·E = 0) restrict (x, y, z) to ≤ 10
  solutions. TPU-friendly formulation (no nonsymmetric eigensolver, which
  XLA:TPU lacks): group the 10 equations by their 10 (x,y)-monomials into a
  10×10 matrix M(z) polynomial in z (degree ≤ 3 per entry); solvability
  requires det M(z) = 0, a degree-10 polynomial recovered by evaluating
  batched 10×10 determinants at Chebyshev nodes and fitting in the
  Chebyshev basis; real roots come from a fixed grid + bisection; (x, y)
  back-substitute as the least-squares null vector of M(z_root). All steps
  are fixed-shape, vmapped over hypotheses. The constraint→coefficient map
  is extracted numerically through a precomputed inverse Vandermonde over
  20 fixed sample points (exact for cubics), avoiding hand-expanded
  symbolic coefficient tables.
- ``method="8point"``: the weighted DLT solve on 8-point samples — cheaper,
  but rank-degenerate on planar scenes (the dominant-groundplane KITTI
  failure mode the 5-point exists for).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import pose as pose_ops
from ..utils.precision import highest_matmul
from ..geometry import quaternion as quat

# ---------------------------------------------------------------------------
# 5-point solver constants (host numpy, computed once at import)
# ---------------------------------------------------------------------------

# (x,y)-monomials in the order [x³, x²y, xy², y³, x², xy, y², x, y, 1];
# each full monomial (px,py,pz) has total degree ≤ 3
_XY_MONOS = [(3, 0), (2, 1), (1, 2), (0, 3), (2, 0), (1, 1), (0, 2),
             (1, 0), (0, 1), (0, 0)]
_MONOS20 = [(px, py, pz) for (px, py) in _XY_MONOS
            for pz in range(0, 4 - px - py)]
assert len(_MONOS20) == 20

# sample points for numeric coefficient extraction (seed chosen for
# Vandermonde conditioning ≈ 64)
_P20 = np.random.default_rng(392).uniform(-1, 1, (20, 3))
_VAND_INV = np.linalg.inv(np.array(
    [[x ** px * y ** py * z ** pz for (px, py, pz) in _MONOS20]
     for (x, y, z) in _P20]))                               # [20,20]
# monomial → (z-degree, xy-monomial index) embedding tensor [20,4,10]
_EMBED = np.zeros((20, 4, 10))
for _m, (_px, _py, _pz) in enumerate(_MONOS20):
    _EMBED[_m, _pz, _XY_MONOS.index((_px, _py))] = 1.0

# det-polynomial recovery: degree-10 in z, fit in Chebyshev basis over
# [-_ZMAX, _ZMAX] from _NS node evaluations; roots located on a fixed grid.
#
# KNOWN SOLUTION-LOSS MODES (per minimal sample — RANSAC amortizes these,
# so tune num_hypotheses with the per-sample miss rate in mind):
#  - real roots with |z| > _ZMAX are never seen (the grid stops there);
#  - even-multiplicity roots touch zero without a sign change on the grid
#    and are skipped by the bisection seeding;
#  - solutions whose E has vanishing B3 coefficient are unrepresentable in
#    the E = xB0 + yB1 + zB2 + B3 pinning and are dropped.
_ZMAX = 6.0
_NS = 24
_NG = 257
_DEG = 10


def _cheb_design(z_over_zmax: np.ndarray, deg: int) -> np.ndarray:
    T = [np.ones_like(z_over_zmax), z_over_zmax]
    for _ in range(deg - 1):
        T.append(2.0 * z_over_zmax * T[-1] - T[-2])
    return np.stack(T[:deg + 1], axis=-1)


_ZNODES = np.cos(np.pi * (np.arange(_NS) + 0.5) / _NS) * _ZMAX
_CHEB_FIT = np.linalg.pinv(_cheb_design(_ZNODES / _ZMAX, _DEG))  # [11,_NS]
_ZGRID = np.linspace(-_ZMAX, _ZMAX, _NG)
_CHEB_GRID = _cheb_design(_ZGRID / _ZMAX, _DEG)                  # [_NG,11]


class EssentialResult(NamedTuple):
    q: jnp.ndarray            # [4] rotation cam0→cam1 (wxyz)
    t: jnp.ndarray            # [3] unit translation
    inliers: jnp.ndarray      # [N] bool
    n_inliers: jnp.ndarray    # int
    ok: jnp.ndarray           # bool — enough flow + enough inliers


def _hash2(i, j):
    x = (i * jnp.uint32(0x9E3779B9)) ^ (j * jnp.uint32(0x85EBCA6B))
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


def _eight_point(x0, x1, w):
    """Weighted 8-point estimate of E from normalized coords.

    x0,x1: [M,2] normalized image coords; w: [M] 0/1 sample weights.
    Returns E [3,3] with essential singular-value structure enforced.
    """
    u0, v0 = x0[:, 0], x0[:, 1]
    u1, v1 = x1[:, 0], x1[:, 1]
    # epipolar constraint x1ᵀ E x0 = 0 rows
    A = jnp.stack([u1 * u0, u1 * v0, u1, v1 * u0, v1 * v0, v1, u0, v0,
                   jnp.ones_like(u0)], axis=-1)
    A = A * w[:, None]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    E = Vt[-1].reshape(3, 3)
    U, S, Vt2 = jnp.linalg.svd(E)
    s = (S[0] + S[1]) / 2.0
    E = U @ jnp.diag(jnp.array([s, s, 0.0], E.dtype)) @ Vt2
    return E


def _sampson_sq(E, x0, x1):
    """Squared Sampson distance of correspondences to the epipolar geometry."""
    ones = jnp.ones(x0.shape[:-1] + (1,), x0.dtype)
    p0 = jnp.concatenate([x0, ones], -1)
    p1 = jnp.concatenate([x1, ones], -1)
    Ex0 = p0 @ E.T      # [N,3]
    Etx1 = p1 @ E       # [N,3]
    num = jnp.sum(p1 * Ex0, -1) ** 2
    den = Ex0[:, 0] ** 2 + Ex0[:, 1] ** 2 + Etx1[:, 0] ** 2 + Etx1[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


def _epipolar_rows(x0, x1):
    """Rows of the DLT system x1ᵀ E x0 = 0 for normalized coords [M,2]."""
    u0, v0 = x0[:, 0], x0[:, 1]
    u1, v1 = x1[:, 0], x1[:, 1]
    return jnp.stack([u1 * u0, u1 * v0, u1, v1 * u0, v1 * v0, v1, u0, v0,
                      jnp.ones_like(u0)], axis=-1)


def _essential_constraints(E):
    """The 10 cubic constraints a valid essential matrix satisfies:
    det(E) = 0 and 2·E·Eᵀ·E − tr(E·Eᵀ)·E = 0 (Nistér 2004, eq. 4-5)."""
    EEt = E @ E.T
    T = 2.0 * (EEt @ E) - jnp.trace(EEt) * E
    return jnp.concatenate([jnp.linalg.det(E)[None], T.reshape(9)])


def _cheb_eval(coefs, z_over_zmax):
    """Evaluate a Chebyshev series (Clenshaw) at scalar/array arguments."""
    b1 = jnp.zeros_like(z_over_zmax)
    b2 = jnp.zeros_like(z_over_zmax)
    for c in coefs[:0:-1]:
        b1, b2 = 2.0 * z_over_zmax * b1 - b2 + c, b1
    return z_over_zmax * b1 - b2 + coefs[0]


def _five_point_one(x0s, x1s, dtype):
    """All essential-matrix solutions of ONE 5-point minimal sample.

    x0s, x1s: [5,2] normalized coords. Returns (Es [10,3,3], valid [10]).
    See the module docstring for the method: nullspace → M(z) → det-poly
    via Chebyshev fit of batched determinants → grid+bisection roots →
    least-squares null vector for (x, y).
    """
    A = _epipolar_rows(x0s, x1s)                         # [5,9]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    basis = Vt[5:9].reshape(4, 3, 3)                     # B0,B1,B2,B3

    # constraint polynomials via numeric evaluation at the 20 fixed points
    pts = jnp.asarray(_P20, dtype)                       # [20,3]
    Es = (pts[:, 0, None, None] * basis[0] + pts[:, 1, None, None] * basis[1]
          + pts[:, 2, None, None] * basis[2] + basis[3])
    Q = jax.vmap(_essential_constraints)(Es)             # [20 pts, 10 eqs]
    C = jnp.asarray(_VAND_INV, dtype) @ Q                # [20 monos, 10 eqs]
    # M(z) = Mc[0] + z·Mc[1] + z²·Mc[2] + z³·Mc[3], rows = equations,
    # columns = (x,y)-monomials
    Mc = jnp.einsum("me,mzk->zek", C, jnp.asarray(_EMBED, dtype))

    # det M(z) at the Chebyshev nodes → degree-10 Chebyshev fit
    zs = jnp.asarray(_ZNODES, dtype)
    Ms = (Mc[0][None] + zs[:, None, None] * Mc[1]
          + (zs ** 2)[:, None, None] * Mc[2]
          + (zs ** 3)[:, None, None] * Mc[3])            # [S,10,10]
    dets = jnp.linalg.det(Ms)
    dets = dets / jnp.maximum(jnp.max(jnp.abs(dets)), 1e-30)
    coefs = jnp.asarray(_CHEB_FIT, dtype) @ dets         # [11]

    # real roots: grid sign changes + bisection (fixed shapes throughout)
    g = jnp.asarray(_CHEB_GRID, dtype) @ coefs           # [_NG]
    change = g[:-1] * g[1:] < 0                          # [_NG-1]
    idx = jnp.argsort(~change)[:10]                      # first ≤10 brackets
    valid = change[idx]
    zg = jnp.asarray(_ZGRID, dtype)
    lo, hi = zg[idx], zg[idx + 1]
    flo = _cheb_eval(coefs, lo / _ZMAX)

    # rolled bisection (lax.fori_loop, not an unrolled Python loop): this
    # runs inside the compiled scan step when the per-frame 5-point prior
    # is on, and 45 unrolled Clenshaw evaluations per hypothesis inflate
    # the scan program's generated code (the ~75 MiB device fault budget,
    # docs/WIDE_VMAP_FAULT.md)
    def _bisect(_, carry):
        lo, hi, flo = carry
        mid = 0.5 * (lo + hi)
        fm = _cheb_eval(coefs, mid / _ZMAX)
        left = flo * fm <= 0
        return (jnp.where(left, lo, mid), jnp.where(left, mid, hi),
                jnp.where(left, flo, fm))

    lo, hi, flo = jax.lax.fori_loop(0, 45, _bisect, (lo, hi, flo))
    roots = 0.5 * (lo + hi)                              # [10]

    # back-substitute (x, y): least-squares null vector of M(z_root) with
    # the constant monomial pinned to 1 (monomial order: x³ x²y xy² y³ x²
    # xy y² x y 1 → x = m[7], y = m[8])
    def xy_of(z):
        M = Mc[0] + z * Mc[1] + z * z * Mc[2] + z ** 3 * Mc[3]
        A1 = M[:, :9]
        b = -M[:, 9]
        G = A1.T @ A1
        u = jnp.linalg.solve(G + 1e-10 * jnp.trace(G) * jnp.eye(9, dtype=dtype),
                             A1.T @ b)
        return u[7], u[8]

    xs, ys = jax.vmap(xy_of)(roots)
    E_roots = (xs[:, None, None] * basis[0] + ys[:, None, None] * basis[1]
               + roots[:, None, None] * basis[2] + basis[3][None])
    E_roots = E_roots / jnp.maximum(
        jnp.linalg.norm(E_roots, axis=(1, 2), keepdims=True), 1e-12)
    return E_roots, valid


def _decompose(E):
    """Four (R, t) candidates from E (Hartley-Zisserman)."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    return jnp.stack([R1, R1, R2, R2]), jnp.stack([t, -t, t, -t])


def _cheirality_depths(R, t, x0, x1):
    """Midpoint-free two-view depth signs for candidate (R,t): returns
    (z0, z1) per correspondence via the linear triangulation along rays."""
    f0 = jnp.concatenate([x0, jnp.ones(x0.shape[:-1] + (1,), x0.dtype)], -1)
    f1 = jnp.concatenate([x1, jnp.ones(x1.shape[:-1] + (1,), x1.dtype)], -1)
    Rf0 = f0 @ R.T
    # solve for depths: z1 * f1 = z0 * R f0 + t  → 2-unknown LS per point
    a = Rf0
    b = -f1
    # normal equations of [a b] [z0 z1]ᵀ = -t
    aa = jnp.sum(a * a, -1)
    ab = jnp.sum(a * b, -1)
    bb = jnp.sum(b * b, -1)
    at = jnp.sum(a * (-t), -1)
    bt = jnp.sum(b * (-t), -1)
    det = aa * bb - ab * ab
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    z0 = (at * bb - ab * bt) / det
    z1 = (aa * bt - ab * at) / det
    return z0, z1


@highest_matmul
def estimate_essential(uv0, uv1, match_mask, focal, principal,
                       num_hypotheses: int = 256,
                       thres_px: float = 1.0,
                       min_flow_px: float = 3.0,
                       seed: int = 0,
                       method: str = "5point",
                       q_guess=None,
                       vote_margin: float = 0.8) -> EssentialResult:
    """Full motion-prior estimate from matched pixel coordinates.

    uv0, uv1: [N,2] matched points in frames 0 (older) and 1 (newer);
    returns the motion of frame1 relative to frame0 as (q, t) such that
    ``x_cam1 = R x_cam0 + t`` (OpenCV recoverPose convention).

    method="5point" (default — the reference's findEssentialMat contract,
    general_helpers.hpp:103-140) runs the true minimal solver, which stays
    well-posed on planar scenes; "8point" is the cheaper DLT variant
    (degenerate when all correspondences are coplanar).

    q_guess (optional [4] wxyz, CAMERA frame): rotation prior for the
    recoverPose step. On a dominant-plane scene the essential matrix has a
    TWO-FOLD (R, t) ambiguity (the twisted pair both triangulate most
    correspondences in front of both cameras), and the pure cheirality
    vote — which the reference's ``recoverPose`` also uses — can flip
    between the folds frame to frame on vote noise (measured: a 68 m pose
    shock at f100 of the km drive, docs/PERF.md). With a guess, candidates
    whose vote is within ``vote_margin`` of the best form the AMBIGUOUS
    set and the member closest in rotation to the guess wins; a candidate
    that truly dominates the vote is never overridden (margin gate). The
    reference has no externally-supplied guess — its callers accept the
    flip risk (general_helpers.hpp:103-140); the scan path supplies the
    constant-velocity rotation, which is exactly the hysteresis that kills
    the intermittent fold flips.
    """
    dtype = uv0.dtype
    N = uv0.shape[0]
    H = num_hypotheses
    x0 = (uv0 - principal) / focal
    x1 = (uv1 - principal) / focal
    norm_thres_sq = (thres_px / focal) ** 2

    # standstill gate (general_helpers.hpp:111-124)
    flow = jnp.linalg.norm(uv1 - uv0, axis=-1)
    nm = jnp.maximum(jnp.sum(match_mask), 1)
    mean_flow = jnp.sum(jnp.where(match_mask, flow, 0.0)) / nm
    moving = mean_flow >= min_flow_px

    # --- draw H minimal samples of valid correspondences -------------------
    sample_size = 5 if method == "5point" else 8
    hyp = jnp.arange(H, dtype=jnp.uint32)
    pick = jnp.arange(sample_size, dtype=jnp.uint32)
    # map hash → index among valid matches via modular indexing of the
    # compacted valid list (stable fixed-shape gather)
    valid_idx = jnp.argsort(~match_mask)  # valid entries first
    n_valid = jnp.sum(match_mask).astype(jnp.uint32)
    r = _hash2(hyp[:, None] + jnp.uint32(seed * 7919), pick[None, :])
    sample = valid_idx[(r % jnp.maximum(n_valid, 1)).astype(jnp.int32)]

    if method == "5point":
        Es, ok_h = jax.vmap(
            lambda s: _five_point_one(x0[s], x1[s], dtype))(sample)
        Es = Es.reshape(-1, 3, 3)                        # [H*10,3,3]
        cand_ok = ok_h.reshape(-1)
    elif method == "8point":
        Es = jax.vmap(
            lambda s: _eight_point(x0[s], x1[s], jnp.ones(8, dtype)))(sample)
        cand_ok = jnp.ones((H,), bool)
    else:
        raise ValueError(f"unknown essential method {method!r}")

    # --- score all candidate models ----------------------------------------
    d = jax.vmap(lambda E: _sampson_sq(E, x0, x1))(Es)  # [cands,N]
    inl = (d < norm_thres_sq) & match_mask[None, :] & cand_ok[:, None]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    E = Es[best]

    if method == "5point":
        # the minimal model already satisfies the essential manifold; a DLT
        # re-solve on inliers would RE-degenerate on planar scenes, so keep
        # the RANSAC winner (OpenCV findEssentialMat does the same)
        d_ref = _sampson_sq(E, x0, x1)
        inliers = (d_ref < norm_thres_sq) & match_mask
    else:
        # refine on the best inlier set (one weighted 8-point re-solve)
        w_in = inl[best].astype(dtype)
        E = _eight_point(x0, x1, w_in)
        d_ref = _sampson_sq(E, x0, x1)
        inliers = (d_ref < norm_thres_sq) & match_mask

    # --- recoverPose: cheirality vote over 4 decompositions ----------------
    Rs, ts = _decompose(E)

    def vote(R, t):
        z0, z1 = _cheirality_depths(R, t, x0, x1)
        return jnp.sum(((z0 > 0) & (z1 > 0) & inliers).astype(jnp.int32))

    votes = jax.vmap(vote)(Rs, ts)
    if q_guess is None:
        k = jnp.argmax(votes)
    else:
        qs = jax.vmap(quat.qfrom_matrix)(Rs)
        ang = jax.vmap(lambda qq: quat.qangle(qq, q_guess))(qs)
        vmax = jnp.max(votes)
        ambiguous = votes.astype(dtype) >= vote_margin * vmax.astype(dtype)
        k = jnp.argmin(jnp.where(ambiguous, ang, jnp.inf))
    R, t = Rs[k], ts[k]
    q = quat.qfrom_matrix(R)

    n_in = jnp.sum(inliers.astype(jnp.int32))
    # counts[best] > 0 gates on candidate validity: if every RANSAC
    # candidate failed (cand_ok all False — degenerate/too-few matches),
    # argmax picks index 0 whose E is garbage; the refined inlier count can
    # then be nonzero by accident, so require the *voted* winner to have
    # had at least one cand_ok-masked inlier.
    ok = moving & (n_in >= 8) & (counts[best] > 0)
    # standstill → identity motion (reference fallback :111-124)
    q = jnp.where(ok, q, quat.qidentity(dtype))
    t = jnp.where(ok, t, jnp.zeros(3, dtype))
    return EssentialResult(q=q, t=t, inliers=inliers & ok, n_inliers=n_in, ok=ok)


def motion_prior_unscaled(result: EssentialResult, T_cam_veh,
                          speed: float, dt: float):
    """``getMotionUnscaled`` (general_helpers.hpp:209-231): scale the unit
    translation by speed·Δt and conjugate camera motion into the vehicle
    frame. Returns pose delta T_cur_prev (vehicle frame, cur←prev)."""
    scale = speed * dt
    motion_cam = pose_ops.make(result.q, result.t * scale)
    Tcv = T_cam_veh
    Tvc = pose_ops.inverse(Tcv)
    return pose_ops.compose(Tvc, pose_ops.compose(motion_cam, Tcv))
