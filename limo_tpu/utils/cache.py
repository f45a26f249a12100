"""Persistent XLA compilation cache.

Under the axon TPU tunnel a full ``solve_trimmed`` program takes minutes to
compile remotely; the persistent cache makes that a once-per-machine cost.
Call ``enable_compilation_cache()`` at the top of any driver/bench entry.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(path: str | None = None) -> str:
    import jax

    path = path or os.environ.get("LIMO_TPU_CACHE_DIR", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        # persist even trivial entries: eager-dispatch op compiles dominate
        # host-loop drives (each costs a remote RPC under the axon tunnel;
        # ~60 ms each on the 2-core CPU box) and only ever hit the cache if
        # they are written
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    return path
