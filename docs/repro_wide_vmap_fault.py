"""Minimal repro for the wide-vmap TPU device fault (docs/WIDE_VMAP_FAULT.md).

Usage: python docs/repro_wide_vmap_fault.py WIDTH [FRAMES]
Compiles a WIDTH-wide vmapped whole-sequence scan, prints XLA memory
analysis (incl. generated code size), then executes — faults the device
with UNAVAILABLE once generated code crosses ~75 MiB (width >= ~64 for the
full-fidelity program on a v5e)."""
import sys, time
sys.path.insert(0, "/root/repo")
WIDTH = int(sys.argv[1])
F = int(sys.argv[2]) if len(sys.argv) > 2 else 100
from limo_tpu.utils import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp, numpy as np
from limo_tpu.config import CapacityConfig, LimoConfig
from limo_tpu.geometry.camera import CameraRig
from limo_tpu.pipeline import scan_odometry as so
from limo_tpu.pipeline.synthetic import dense_tracks, make_world

R = 512
cfg = LimoConfig(capacity=CapacityConfig(
    max_keyframes=12, max_landmarks=R, max_cameras=1))
world = make_world(num_frames=F, speed=8.0, yaw_rate=0.015,
                   n_landmarks=300, n_ground=80, seed=2)
stamps, uvd, valid = dense_tracks(world, R, with_depth=True, seed=7)
rig = CameraRig.single(world.focal, world.principal[0], world.principal[1],
                       T_cam_veh=world.T_cam_veh)
run = so.make_tuning_runner(rig, cfg)
st = so.init_state(cfg.capacity, jnp.float32)
data = so.frame_arrays(stamps, uvd, valid, cfg, jnp.float32)
grid = np.stack([np.linspace(0.10, 0.19, WIDTH),
                 np.linspace(1.0, 2.0, WIDTH)], -1)
st_b = jax.tree_util.tree_map(lambda x: jnp.stack([x] * WIDTH), st)
args = (jnp.asarray(grid, jnp.float32), st_b, data)
print(f"width={WIDTH} compiling...", flush=True)
t0 = time.time()
lowered = run.lower(*args)
compiled = lowered.compile()
tc = time.time() - t0
ma = compiled.memory_analysis()
print(f"width={WIDTH} F={F} compile={tc:.0f}s "
      f"argMiB={ma.argument_size_in_bytes/2**20:.0f} "
      f"outMiB={ma.output_size_in_bytes/2**20:.0f} "
      f"tempMiB={ma.temp_size_in_bytes/2**20:.0f} "
      f"codeMiB={ma.generated_code_size_in_bytes/2**20:.1f}", flush=True)
print(f"width={WIDTH} compiling...", flush=True)
t0 = time.time()
out = compiled(*args)
jax.block_until_ready(out[1].pose)
print(f"width={WIDTH} OK exec={time.time()-t0:.1f}s", flush=True)
