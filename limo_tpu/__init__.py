"""limo_tpu — a TPU-native LIMO-class lidar-monocular visual odometry engine.

Built from scratch in JAX (XLA / Pallas / pjit) with the capabilities of
johannes-graeter/limo: feature tracking, lidar depth extraction, groundplane
scale constraints, keyframe/landmark selection scheduling, and robust
sliding-window keyframe bundle adjustment with trimmed losses — re-architected
as batched, masked, fixed-shape device computations.
"""

from . import geometry

__version__ = "0.1.0"
