"""Shared CLI plumbing for the application layer."""

from __future__ import annotations

import os

import numpy as np

from rgbd360_tpu.io.calib import Calib360

DEFAULT_DATA_ROOT = os.environ.get("RGBD360_REFERENCE", "/root/reference")


def load_calib(root: str = None) -> Calib360:
    return Calib360.load(root or DEFAULT_DATA_ROOT)


def default_matcher_config(root: str = None) -> str:
    root = root or DEFAULT_DATA_ROOT
    return os.path.join(root, "config_files", "configLocaliser_sphericalOdometry.ini")


def rot_offset() -> np.ndarray:
    """157.5 deg sphere-vs-cloud frame offset (OdometryRGBD360.cpp:137-139)."""
    a = np.deg2rad(157.5)
    m = np.eye(4, dtype=np.float64)
    m[1, 1] = m[2, 2] = np.cos(a)
    m[1, 2] = np.sin(a)
    m[2, 1] = -np.sin(a)
    return m


def sequence_files(path: str, first: int, sample: int):
    """Yield (frame_number, file) over sphere_images_%d.bin like the apps'
    fexists loop (OdometryRGBD360.cpp:130-141)."""
    n = first
    while True:
        f = os.path.join(path, f"sphere_images_{n}.bin")
        if not os.path.exists(f):
            return
        yield n, f
        n += sample


def sequence_frames(calib, path: str, first: int, sample: int,
                    defer_device: bool = False):
    """Yield (frame_number, built Frame360) over a dataset, with disk IO +
    archive parsing of upcoming frames prefetched on native C++ threads when
    the toolchain allows (io/native_loader.py) so it overlaps device compute;
    falls back to the synchronous Python reader otherwise.

    defer_device=True yields raw-only frames (no undistort/stitch dispatch):
    planes_pipeline then runs the whole per-frame device pipeline as ONE
    fused program (Frame360.build_device_fused) — the SLAM-loop
    configuration; leave False for consumers that read sphere images without
    the planes pipeline."""
    from rgbd360_tpu.core.frame360 import Frame360
    from rgbd360_tpu.io.native_loader import iter_frames

    numbered = list(sequence_files(path, first, sample))
    raws = iter_frames([f for _, f in numbered])
    for (frame_no, _), raw in zip(numbered, raws):
        frame = Frame360(calib, frame_no)
        frame.set_raw(raw)
        if defer_device:
            # explicit marker: planes_pipeline routes ONLY frames tagged here
            # through the fused device program (undistort+stitch+stats in one
            # dispatch). Attribute sniffing (depth_raw_mm set, sphere_rgb
            # unset) would also match rawlog-style frames whose depth must
            # NOT be CLAMS-undistorted (io/load_rawlog.py).
            frame._deferred_build = True
        else:
            frame.undistort()
            frame.stitch_spherical_image()
        yield frame_no, frame
