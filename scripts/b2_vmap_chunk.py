"""On-chip A/B for the run_batch B=2 regression (VERDICT r3 weak #5):
plain vmap vs vmap_chunk=1 (lax.map over single-sequence groups).

Run on the axon TPU session: python scripts/b2_vmap_chunk.py
"""
import sys
import time

sys.path.insert(0, ".")


def main():
    from limo_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from limo_tpu.config import CapacityConfig, LimoConfig
    from limo_tpu.geometry.camera import CameraRig
    from limo_tpu.pipeline import scan_odometry as so
    from limo_tpu.pipeline.synthetic import dense_tracks, make_world

    R = 512
    world = make_world(num_frames=120, n_landmarks=400, n_ground=100,
                       seed=3)
    cfg = LimoConfig(capacity=CapacityConfig(
        max_keyframes=12, max_landmarks=R, max_cameras=1))
    rig = CameraRig(
        focal=jnp.asarray([world.focal], jnp.float32),
        principal=jnp.asarray([world.principal], jnp.float32),
        T_cam_veh=jnp.asarray([world.T_cam_veh], jnp.float32))
    stamps, uvd, valid = dense_tracks(world, R, with_depth=True, seed=4)
    F = len(stamps)

    for B in (1, 2, 4):
        for chunk in (None, 1, 2):
            if chunk is not None and (chunk >= B or B % chunk):
                continue
            sb = np.stack([stamps] * B)
            ub = np.stack([uvd] * B)
            vb = np.stack([valid] * B)
            run, args = so._batched_run(sb, ub, vb, rig, cfg, None, None,
                                        jnp.float32, vmap_chunk=chunk)
            t0 = time.time()
            _, out = run(*args)
            jax.block_until_ready(out.pose)
            compile_s = time.time() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                _, out = run(*args)
                jax.block_until_ready(out.pose)
                best = min(best, time.time() - t0)
            fps = B * F / best
            print(f"B={B} chunk={chunk}: {fps:.1f} fps aggregate "
                  f"({best/F*1e3:.1f} ms/frame-slot, compile {compile_s:.0f}s)",
                  flush=True)


if __name__ == "__main__":
    main()
