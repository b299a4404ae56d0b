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

import os as _os


def _host_cache_tag() -> str:
    """Short signature of this host's CPU feature set.

    The persistent cache stores AOT-compiled XLA:CPU executables; loading one
    compiled on a host with different CPU features emits
    "machine-feature-mismatch ... could lead to execution errors such as
    SIGILL" and risks exactly that. Keying the cache directory by
    (machine, /proc/cpuinfo flags) hash means entries never cross
    heterogeneous hosts; TPU entries are host-independent but isolating them
    per host costs only one re-compile per host."""
    import hashlib
    import platform

    sig = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    sig += " " + line.split(":", 1)[1].strip()
                    break
    except OSError:
        pass
    return hashlib.md5(sig.encode()).hexdigest()[:10]


def _setup_compilation_cache() -> None:
    """Persistent XLA compile cache: first-run compiles over the axon tunnel
    cost 10-30 s per kernel and occasionally minutes; cache them across
    processes. Disable with RGBD360_NO_COMPILE_CACHE=1."""
    if _os.environ.get("RGBD360_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        base = _os.environ.get(
            "RGBD360_COMPILE_CACHE", _os.path.expanduser("~/.cache/jax_rgbd360")
        )
        jax.config.update(
            "jax_compilation_cache_dir", _os.path.join(base, _host_cache_tag())
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_setup_compilation_cache()

from rgbd360_tpu.config import GlobalParams, default_params  # noqa: F401
