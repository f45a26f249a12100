"""Multi-host execution helpers.

The reference is strictly single-process (3 Ceres threads; SURVEY §2.13), so
this layer has no upstream analogue — it is what makes the TPU engine scale
past one host (BASELINE: "measured at 1 chip, 1 host, and N≥2 hosts"). The
layout follows the standard recipe:

- the **model** (landmark-shard) axis stays inside one host's ICI domain —
  the per-LM-iteration ``psum`` of the reduced pose system must ride ICI;
- the **data** (window/sequence-batch) axis spans hosts over DCN — sequences
  are independent (zero cross-sequence collectives; scan_odometry.run_fleet),
  so DCN latency never sits on the solver's critical path.

Single-process usage is a no-op: every helper degrades gracefully so the
same driver script runs on a laptop CPU mesh, one TPU host, or a pod slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Bring up jax.distributed when running multi-process; no-op (returns
    False) when the arguments are absent and no cluster environment is
    detected. Safe to call unconditionally at driver start."""
    if coordinator_address is None and num_processes is None:
        # on TPU pods jax.distributed can auto-detect; only attempt when a
        # cluster env is present so CPU/single-host runs stay silent
        import os
        if not (os.environ.get("COORDINATOR_ADDRESS")
                or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")):
            return False
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return True
    except RuntimeError as e:
        # tolerate ONLY double-initialization; a failed pod bring-up must
        # not silently degrade into N independent single-process jobs
        if "already" in str(e).lower():
            return jax.process_count() > 1
        raise


def global_mesh(data: Optional[int] = None, model: Optional[int] = None,
                devices: Optional[Sequence] = None) -> Mesh:
    """('data', 'model') mesh over ALL processes' devices, laid out so the
    model axis is contiguous within a host (ICI) and the data axis strides
    across hosts (DCN). Defaults: model = devices-per-host (capped at the
    total), data = the rest."""
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if model is None:
        model = min(jax.local_device_count(), n) if data is None \
            else max(n // data, 1)
    if data is None:
        data = max(n // model, 1)
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devs).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def process_local_batch(global_batch_size: int) -> tuple:
    """(start, stop, padded_total) rows of the global fleet batch this
    process should load. ``make_array_from_process_local_data`` needs every
    process to contribute an equally-sized shard, so the batch is padded up
    to ``padded_total = ceil(B / processes) * processes``; rows with index
    ≥ B are padding — load any valid row (e.g. replay row ``i % B``) and
    drop those outputs, as :func:`~limo_tpu.pipeline.scan_odometry.run_fleet`
    does for the device axis."""
    pc, pid = jax.process_count(), jax.process_index()
    per = -(-global_batch_size // pc)  # ceil
    return pid * per, (pid + 1) * per, per * pc


def pad_rows(x, total: int):
    """Pad a leading-batch-axis array up to ``total`` rows by replaying
    row 0 (companion to :func:`process_local_batch`)."""
    x = np.asarray(x)
    if x.shape[0] >= total:
        return x
    return np.concatenate([x, np.repeat(x[:1], total - x.shape[0], axis=0)])


def host_local_to_global(local_arrays, mesh: Mesh, axis: str = "data"):
    """Assemble per-host batch shards into global arrays sharded on
    ``axis`` (jax.make_array_from_process_local_data). In a single-process
    run this is just a sharded device_put. Every leaf must carry the batch
    as its leading dimension."""
    sharding = NamedSharding(mesh, P(axis))

    def one(x):
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(one, local_arrays)
