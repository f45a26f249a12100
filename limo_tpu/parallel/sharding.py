"""Multi-chip sharding of the windowed BA engine.

The reference is single-process (SURVEY §2.13: 3 Ceres threads, no
distributed execution). The TPU-native scaling model replaces it:

- **data axis**: many sequences / windows batched and sharded across hosts
  (the reference's serial per-sequence eval loop becomes one sharded batch).
- **model axis**: the landmark dimension of each window. Everything in the
  normal-equation assembly reduces over L (V blocks, W·V⁻¹·Wᵀ Schur
  correction, trim scores), so landmark-sharded execution needs exactly one
  ``psum`` of the [P,P] Schur system per LM iteration — that reduction rides
  ICI. The reduced pose system (P ≈ 200) is replicated, like Ceres'
  dense-solve after Schur elimination.

Implementation: GSPMD via ``jit`` + ``NamedSharding`` input constraints —
XLA inserts the collectives. Explicit shard_map/pallas ring variants are the
round-2 optimization path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..state import Selection, Window

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_devices: Optional[int] = None, data: Optional[int] = None
              ) -> Mesh:
    """Mesh over (data, model). With no hints: put at most 2 on data and the
    rest on model (landmark sharding is the primary within-window axis)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if data is None:
        data = 2 if n % 2 == 0 and n >= 4 else 1
    model = n // data
    arr = np.array(devs[: data * model]).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def window_pspecs(batched: bool) -> Window:
    """PartitionSpecs for a (batched) Window: landmark-major arrays shard
    over MODEL_AXIS, keyframe arrays replicate, batch dim over DATA_AXIS."""
    b = (DATA_AXIS,) if batched else ()

    def s(*spec):
        return P(*b, *spec)

    return Window(
        stamps=s(None), poses=s(None, None), kf_valid=s(None),
        fix_pose=s(None), fix_scale=s(None), planes=s(None, None),
        plane_valid=s(None),
        lm_pos=s(MODEL_AXIS, None), lm_valid=s(MODEL_AXIS),
        lm_weight=s(MODEL_AXIS), lm_has_depth=s(MODEL_AXIS),
        lm_is_gp=s(MODEL_AXIS), lm_id=s(MODEL_AXIS),
        obs=s(MODEL_AXIS, None, None, None), obs_mask=s(MODEL_AXIS, None, None),
    )


def selection_pspecs(batched: bool) -> Selection:
    b = (DATA_AXIS,) if batched else ()

    def s(*spec):
        return P(*b, *spec)

    return Selection(
        lm_selected=s(MODEL_AXIS), gp_kf=s(MODEL_AXIS), gp_weight=s(MODEL_AXIS),
        scale_kf0=s(), scale_kf1=s(), scale_target=s(), scale_weight=s(),
        plane_dist_fixed=s(),
    )


def _specs_to_shardings(tree, mesh: Mesh):
    return jax.tree_util.tree_map(lambda spec: NamedSharding(mesh, spec),
                                  tree, is_leaf=lambda x: isinstance(x, P))


def window_shardings(mesh: Mesh, batched: bool) -> Window:
    return _specs_to_shardings(window_pspecs(batched), mesh)


def selection_shardings(mesh: Mesh, batched: bool) -> Selection:
    return _specs_to_shardings(selection_pspecs(batched), mesh)


def make_sharded_solver(mesh: Mesh, rig, cfg, batched: bool = True):
    """jit-compiled trimmed solve with landmark/model + window/data sharding.

    batched=True expects a leading batch axis on every Window/Selection leaf
    (one window per sequence) and maps the solve over it.

    One code path for ANY sharding: this routes through the
    ``shard_map`` solver so the fused Pallas assembly kernel stays active
    on every landmark shard (per-shard L is static inside shard_map, so the
    kernel tiles 512/256/128 apply). The previous GSPMD entry silently fell
    back to the 2.6×-slower einsum assembly whenever the landmark axis was
    partitioned (round-2 verdict item 4).
    """
    return make_shard_map_solver(mesh, rig, cfg, batched=batched)


def make_shard_map_solver(mesh: Mesh, rig, cfg, batched: bool = False):
    """Trimmed solve with *explicit* collectives via ``shard_map``.

    Unlike :func:`make_sharded_solver` (GSPMD — XLA chooses collective
    placement), this splits the landmark axis over MODEL_AXIS by hand and the
    solver emits exactly the collectives the algorithm needs:

    - one ``psum`` of the reduced (H_pp, b_p, cost) per assembly,
    - one ``psum`` of the Schur correction per LM iteration,
    - one ``all_gather`` of the [L] trim scores per trim round,
    - ``psum``-ed family counts for the min-residual-groups guards.

    The reduced pose solve (P ≈ 200) runs replicated on every shard — the
    same division of labor Ceres uses after DENSE_SCHUR elimination, with
    ICI collectives standing in for shared memory (SURVEY §2.13). With
    ``batched=True`` a leading window batch axis is additionally split over
    DATA_AXIS and vmapped within each shard.
    """
    from ..solver.trimmed import solve_trimmed as _solve

    # Unlike the GSPMD solver, the Pallas assembly kernel RUNS here: inside
    # shard_map the per-shard landmark count is static (L/model), so the
    # kernel executes on each shard as-is whenever that count is 128-aligned
    # (ba_core picks a 512/256/128 tile; falls back to einsum otherwise).
    # Keep windows' landmark capacity a multiple of 128×model to stay on
    # the fast path.

    w_spec = window_pspecs(batched)
    s_spec = selection_pspecs(batched)

    def local_solve(window, sel):
        return _solve(window, sel, rig, cfg, axis_name=MODEL_AXIS)

    if batched:
        # lax.map, NOT vmap, over the per-shard window batch: a vmapped
        # solve runs the while_loop max-iterations across the whole batch
        # with both lax.cond branches selected (measured slower than
        # single-stream, CLAUDE.md), and the vmapped loop body is what
        # sent XLA's algebraic simplifier into its circular-rewrite loop
        # on the SPMD program (MULTICHIP_r02 warning — gone with map).
        # Sequential per-shard solves let each exit at its own convergence.
        def fn(windows, sels):
            return jax.lax.map(lambda ws: local_solve(*ws), (windows, sels))
    else:
        fn = local_solve

    from ..solver.trimmed import SolveInfo
    # every SolveInfo leaf is replicated over MODEL (batch dim over DATA);
    # trailing dims of the trace arrays replicate (spec shorter than rank)
    info_elem = P(DATA_AXIS) if batched else P()
    out_info = SolveInfo(*([info_elem] * len(SolveInfo._fields)))
    if hasattr(jax, "shard_map"):          # jax >= 0.8
        sharded = jax.shard_map(fn, mesh=mesh,
                                in_specs=(w_spec, s_spec),
                                out_specs=(w_spec, s_spec, out_info),
                                check_vma=False)
    else:
        from jax.experimental.shard_map import shard_map
        sharded = shard_map(fn, mesh=mesh,
                            in_specs=(w_spec, s_spec),
                            out_specs=(w_spec, s_spec, out_info),
                            check_rep=False)
    return jax.jit(sharded)


def device_put_window(window: Window, mesh: Mesh, batched: bool = False) -> Window:
    return jax.device_put(window, window_shardings(mesh, batched))


def device_put_selection(sel: Selection, mesh: Mesh, batched: bool = False) -> Selection:
    return jax.device_put(sel, selection_shardings(mesh, batched))
