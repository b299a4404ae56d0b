"""rgbd360_tpu — a TPU-native spherical RGB-D SLAM framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the rgbd360
reference pipeline (omnidirectional 8-sensor RGB-D acquisition, calibration,
spherical frame assembly, dense photometric+depth registration, plane-based
registration, keyframe odometry, loop closure and pose-graph SLAM).

Layer map (mirrors reference include/ layering, see SURVEY.md §1):
  io/        host-side readers/writers (.bin frames, CLAMS models, calib text)
  ops/       pure-functional jit/vmap-friendly device ops (the hot paths)
  core/      OO facade mirroring the reference public API
             (Frame360, RegisterPhotoICP, RegisterRGBD360, Map360, ...)
  parallel/  multi-chip sharding (mesh helpers, batched pair registration)
  apps/      CLI applications mirroring the reference executables
"""

__version__ = "0.1.0"

from rgbd360_tpu.config import GlobalParams, default_params  # noqa: F401
