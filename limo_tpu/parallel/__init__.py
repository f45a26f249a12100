from .multihost import (global_mesh, host_local_to_global, initialize,
                        pad_rows, process_local_batch)
from .sharding import (
    DATA_AXIS, MODEL_AXIS, device_put_selection, device_put_window,
    make_mesh, make_shard_map_solver, make_sharded_solver,
    selection_shardings, window_shardings,
)

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "device_put_selection", "device_put_window",
    "global_mesh", "host_local_to_global", "initialize", "make_mesh",
    "make_shard_map_solver", "make_sharded_solver", "pad_rows", "process_local_batch",
    "selection_shardings", "window_shardings",
]
