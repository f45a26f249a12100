"""Worker for the 2-process multi-host CPU simulation test."""
import os, sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)

import numpy as np
import jax.numpy as jnp
from limo_tpu.parallel import (global_mesh, host_local_to_global,
                               pad_rows, process_local_batch)

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc, len(jax.devices())
assert jax.local_device_count() == 4

mesh = global_mesh(data=nproc, model=4)

# global batch of 3 rows over 2 processes -> padded to 4, 2 rows each
B = 3
s, e, total = process_local_batch(B)
rows = np.arange(total, dtype=np.float32) % B          # padded replay
local = (rows[:, None] * np.ones((1, 8), np.float32))[s:e]
g = host_local_to_global(local, mesh)
assert g.shape == (total, 8), g.shape

# a cross-host collective over the global mesh
from jax.sharding import NamedSharding, PartitionSpec as P
summed = jax.jit(lambda x: jnp.sum(x[:, 0]),
                 out_shardings=NamedSharding(mesh, P()))(g)
expect = float(np.sum(rows))
got = float(summed)
assert abs(got - expect) < 1e-6, (got, expect)
print(f"proc {pid}: global sum ok ({got})", flush=True)
