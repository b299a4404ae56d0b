"""Build/pack/run helpers for the standalone C++ oracle.

The oracle (tools/cpp_oracle/photoicp_oracle.cpp) is an independently written
C++ implementation of the reference's spherical metric path
(reference include/RegisterPhotoICP.h:2545-3228, :4519-4784) used to gate the
Python transcriptions (tests/ref_impl.py, tests/golden_ref.py) against real,
compiled C++ — see PARITY_AUDIT.md for why.
"""

from __future__ import annotations

import os
import struct
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_HERE, "cpp_oracle", "photoicp_oracle.cpp")
BIN = os.path.join(_HERE, "cpp_oracle", "photoicp_oracle")

MAGIC = 0x52503630

DEFAULT_PARAMS = (0.3, 6.0, 6.0 / 255.0, 0.2, 0.01, 0.01)


def build(force: bool = False) -> str:
    """Compile the oracle with g++ -O2; returns the binary path."""
    if force or not os.path.exists(BIN) or os.path.getmtime(BIN) < os.path.getmtime(SRC):
        subprocess.run(
            ["g++", "-O2", "-std=c++14", "-o", BIN, SRC],
            check=True,
            capture_output=True,
        )
    return BIN


def _write_preamble(
    f,
    mode: int,
    method: int = 0,
    n: int = 0,
    use_double: bool = False,
    apply_seam_mask: bool = False,
    params=DEFAULT_PARAMS,
    pose: np.ndarray = None,
) -> None:
    """The stream preamble every oracle mode shares (main() reads it once:
    magic/mode/method/n/use_double/do_mask header, 6 params, 4x4 f32 pose).
    One writer so a header change can't desynchronize a subset of modes."""
    f.write(
        struct.pack(
            "<6i", MAGIC, mode, method, n, 1 if use_double else 0, 1 if apply_seam_mask else 0
        )
    )
    f.write(struct.pack("<6d", *params))
    f.write(
        np.ascontiguousarray(
            np.eye(4, dtype=np.float32) if pose is None else np.asarray(pose, np.float32)
        ).reshape(16).tobytes()
    )


def pack(
    path: str,
    levels: list,
    pose: np.ndarray,
    mode: int = 0,
    method: int = 2,
    use_double: bool = False,
    apply_seam_mask: bool = False,
    params=DEFAULT_PARAMS,
    k_full=None,
    pinhole_level: int = 0,
    n_levels: int = None,
    thres_outliers: float = 0.3,
    cam_rt: np.ndarray = None,
) -> None:
    """Write the oracle's input stream.

    ``levels``: list of dicts with keys gray_src, depth_src, gray_trg,
    depth_trg, gray_trg_gx, gray_trg_gy, depth_trg_gx, depth_trg_gy
    (ref_impl's level layout). For mode 1 pass them coarsest-first.

    Modes: 0 = spherical single sweep, 1 = spherical GN align,
    2 = pinhole single sweep (pass ``k_full`` as the full-resolution 3x3
    camera matrix and ``pinhole_level`` as the pyramid level),
    4 = full-chain spherical align: pass ONE raw full-res level (gradient
    slots ignored — zeros are fine) and ``n_levels`` as the pyramid depth
    the oracle builds itself (pyrDown / valid-mean range / Jaimez
    gradients / seam masks re-derived in C++),
    8/9 = sequential Occ1/Occ2 spherical error sweep (``thres_outliers`` =
    the Occ2 depth-outlier gate, alignFrames360 sets 0.3),
    10 = robot-frame pinhole sweep (``k_full``/``pinhole_level`` as mode 2
    plus ``cam_rt`` = the 4x4 camera-on-rig extrinsic).
    """
    with open(path, "wb") as f:
        _write_preamble(
            f,
            mode,
            method=method,
            n=len(levels) if n_levels is None else n_levels,
            use_double=use_double,
            apply_seam_mask=apply_seam_mask,
            params=params,
            pose=pose,
        )
        if mode in (2, 10):
            k = np.asarray(k_full, np.float64)
            f.write(struct.pack("<4d", k[0, 0], k[1, 1], k[0, 2], k[1, 2]))
            f.write(struct.pack("<i", pinhole_level))
        if mode == 10:
            f.write(
                np.ascontiguousarray(np.asarray(cam_rt, np.float32))
                .reshape(16).tobytes()
            )
        if mode in (8, 9):
            f.write(struct.pack("<d", float(thres_outliers)))
        keys = (
            "gray_src",
            "depth_src",
            "gray_trg",
            "depth_trg",
            "gray_trg_gx",
            "gray_trg_gy",
            "depth_trg_gx",
            "depth_trg_gy",
        )
        for lv in levels:
            h, w = np.asarray(lv["gray_src"]).shape
            f.write(struct.pack("<2i", h, w))
            for k in keys:
                arr = np.ascontiguousarray(np.asarray(lv[k], np.float32))
                assert arr.shape == (h, w), (k, arr.shape)
                f.write(arr.tobytes())


def run_stitch(
    rgb: np.ndarray,        # (8, h, w, 3) u8 BGR
    depth_mm: np.ndarray,   # (8, h, w) u16 DISTORTED depth (the reference
    #                          stitches pre-undistortion depth)
    rt_inv: np.ndarray,     # (8, 4, 4) f32
    k: np.ndarray,          # (3, 3) camera matrix
    sphere_shape,           # (sph_h, sph_w)
    workdir: str = "/tmp",
) -> tuple:
    """Mode-6 stitch oracle: returns (gray_u8 (sph_h,sph_w), depth_u16)."""
    n, h, w = depth_mm.shape
    sph_h, sph_w = sphere_shape
    # pid-unique names: concurrent callers sharing the default /tmp workdir
    # (pytest-xdist, a manual run next to the suite) must not read each
    # other's byte-valid streams — that would silently gate against the
    # wrong data.
    path = os.path.join(workdir, f"stitch_in.{os.getpid()}.bin")
    out_path = os.path.join(workdir, f"stitch_out.{os.getpid()}.bin")
    with open(path, "wb") as f:
        _write_preamble(f, 6, n=n)
        kk = np.asarray(k, np.float64)
        f.write(struct.pack("<4d", kk[0, 0], kk[1, 1], kk[0, 2], kk[1, 2]))
        f.write(struct.pack("<4i", h, w, sph_h, sph_w))
        for s in range(n):
            f.write(np.ascontiguousarray(rt_inv[s], np.float32).tobytes())
            f.write(np.ascontiguousarray(rgb[s], np.uint8).tobytes())
            f.write(np.ascontiguousarray(depth_mm[s], np.uint16).tobytes())
    subprocess.run([build(), path, out_path], check=True, capture_output=True)
    raw = open(out_path, "rb").read()
    npix = sph_h * sph_w
    gray = np.frombuffer(raw[:npix], np.uint8).reshape(sph_h, sph_w)
    depth = np.frombuffer(raw[npix:npix * 3], np.uint16).reshape(sph_h, sph_w)
    return gray, depth


def run_clams(model, depth_m: np.ndarray, workdir: str = "/tmp") -> np.ndarray:
    """Mode-7 CLAMS undistort oracle: `model` is io/clams.DepthDistortionModel
    (multipliers/counts (ny, nx, nbins)), `depth_m` an (h, w) f32 metres
    image; returns the corrected f32 image."""
    h, w = depth_m.shape
    ny, nx, nbins = model.multipliers.shape
    path = os.path.join(workdir, f"clams_in.{os.getpid()}.bin")
    out_path = os.path.join(workdir, f"clams_out.{os.getpid()}.bin")
    with open(path, "wb") as f:
        _write_preamble(f, 7, n=1)
        f.write(struct.pack("<7i", h, w, model.bin_width, model.bin_height, nx, ny, nbins))
        f.write(struct.pack("<d", float(model.bin_depth)))
        f.write(np.ascontiguousarray(model.multipliers, np.float32).tobytes())
        f.write(np.ascontiguousarray(model.counts, np.float32).tobytes())
        f.write(np.ascontiguousarray(depth_m, np.float32).tobytes())
    subprocess.run([build(), path, out_path], check=True, capture_output=True)
    return np.frombuffer(open(out_path, "rb").read(), np.float32).reshape(h, w)


def run(input_path: str, binary: str = None) -> dict:
    """Run the oracle (or an alternate build of it) and parse its stdout."""
    out = subprocess.run(
        [binary or build(), input_path], check=True, capture_output=True, text=True
    ).stdout
    res: dict = {"levels": []}
    for line in out.splitlines():
        parts = line.split()
        if not parts:
            continue
        key = parts[0]
        if key == "error":
            res["error"] = float(parts[1])
        elif key == "nvalid":
            res["nvalid"] = int(parts[1])
        elif key == "nvisible":
            res["nvisible"] = int(parts[1])
        elif key == "perr2":
            res["perr2"] = float(parts[1])
        elif key == "nphoto":
            res["nphoto"] = int(parts[1])
        elif key == "derr2":
            res["derr2"] = float(parts[1])
        elif key == "ndepth":
            res["ndepth"] = int(parts[1])
        elif key == "H":
            vals = list(map(float, parts[1:]))
            H = np.zeros((6, 6))
            k = 0
            for a in range(6):
                for b in range(a, 6):
                    H[a, b] = H[b, a] = vals[k]
                    k += 1
            res["H"] = H
        elif key == "g":
            res["g"] = np.array(list(map(float, parts[1:])))
        elif key == "SSO":
            res["sso"] = float(parts[1])
        elif key == "level":
            res["levels"].append(
                dict(level=int(parts[1]), iters=int(parts[3]), error=float(parts[5]))
            )
        elif key == "pose":
            res["pose"] = np.array(list(map(float, parts[1:]))).reshape(4, 4)
        elif key == "illposed":
            res["illposed"] = int(parts[2])
    return res


def sweep_at(levels, pose, method=2, use_double=True, workdir="/tmp") -> dict:
    """Convenience: single-sweep oracle run on one level."""
    path = os.path.join(workdir, "oracle_in.bin")
    pack(path, levels, pose, mode=0, method=method, use_double=use_double)
    return run(path)
