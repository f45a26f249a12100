"""Run the km rendered drive and dump EVERYTHING (est, gt, diagnostics) to
an npz for offline decomposition of the translation error (VERDICT r4 item 1)."""
import os
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from limo_tpu.pipeline import fused as fu
from limo_tpu.pipeline.evaluation import (evaluate_rendered_long_drive,
                                          make_km_rendered_world)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/km_dump.npz"
# optional world overrides: key=value pairs (floats/bools) after the path
kw = {}
for arg in sys.argv[3:]:
    k, v = arg.split("=")
    kw[k] = (v == "True") if v in ("True", "False") else float(v)
rep, out, still = evaluate_rendered_long_drive(num_frames=N, chunk=64,
                                               world_kw=kw or None)
world, _ = make_km_rendered_world(N, **kw)
est = fu.poses_kitti(out)
gt = world.kitti_gt()
fields = {}
for name in out.__dataclass_fields__ if hasattr(out, "__dataclass_fields__") \
        else out._fields:
    v = getattr(out, name)
    try:
        fields[name] = np.asarray(v)
    except Exception:
        pass
np.savez(out_path, est=est, gt=gt, still=np.array(still),
         speed_profile=np.asarray(world.speed_profile)
         if getattr(world, "speed_profile", None) is not None else np.zeros(0),
         **fields)
print(rep.to_json())
print("still", still, "saved", out_path, flush=True)
