"""A/B: scan-path RotRocc ON vs OFF now that the scan step uses the
per-frame 5-point essential prior (VERDICT r3 item 3)."""
import os
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import dataclasses
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from limo_tpu.pipeline.evaluation import evaluate_long_drive, _long_drive_config

for rotrocc in (False, True):
    for prior in ("essential", "constant_velocity"):
        cfg = _long_drive_config(768)
        cfg = dataclasses.replace(
            cfg,
            solver=dataclasses.replace(
                cfg.solver, scan_pose_only_compensate_rotation=rotrocc),
            prior=dataclasses.replace(cfg.prior, scan_prior_mode=prior),
        )
        rep = evaluate_long_drive(num_frames=300, cfg=cfg, seed=0)
        print(f"rotrocc={rotrocc} prior={prior}: {rep.to_json()}", flush=True)
