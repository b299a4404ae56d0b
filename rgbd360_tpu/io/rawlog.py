"""MRPT rawlog reader/writer — the subset LoadRawlog consumes.

The reference's LoadRawlog (Visualization/LoadRawlog.cpp:94-231) opens a
gzipped MRPT rawlog and pulls CObservation3DRangeScan records tagged
RGBD1..RGBD4 (plus an ignored LASER scan). This module implements that
container natively:

* **Container framing** (exact MRPT CStream::WriteObject wire format): each
  object is `uint8 (len(classname) | 0x80)`, the classname bytes, an `int8`
  serialization version, the class payload, and a `0x88` end flag; a .rawlog
  file is a gzip stream of consecutive objects.
* **Payload layouts**: MRPT payloads carry no length prefix — a reader must
  understand every field to find the record boundary. The layouts below
  (CObservation3DRangeScan, CMatrix, CImage, CPose3D) follow the reference-era
  MRPT-1.x field order for the fields LoadRawlog touches (rangeImage,
  intensityImage, sensorPose, sensorLabel, timestamp — LoadRawlog.cpp:247-283);
  sub-features the app never exercises (JPEG-compressed CImage payloads,
  points3D vectors, confidence images, externally-stored images) are refused
  with a clear error instead of mis-parsed, and stream versions whose layout
  is not implemented are refused by _guard_version (no length prefix = no
  safe skip). The READER is gated against an independently hand-assembled
  byte fixture (tests/golden/minimal_v6.rawlog, built by
  tests/make_rawlog_fixture.py without this module's writer) in addition to
  round-trips against the writer. Outstanding: no archive written by real
  MRPT exists in this image (no sources, no egress), so byte-level fidelity
  against genuine MRPT output remains ungated — a real sample would close it.

Primitive encodings (MRPT CStream): little-endian scalars; strings are
`uint32 length` + raw bytes; timestamps are `uint64` (100 ns ticks).
"""

from __future__ import annotations

import gzip
import struct
from dataclasses import dataclass, field
from typing import BinaryIO, Iterator, List, Optional

import numpy as np

END_FLAG = 0x88
_NAME_LEN_MASK = 0x80


# ---------------------------------------------------------------------------
# primitive stream helpers
# ---------------------------------------------------------------------------


def _read(f: BinaryIO, n: int) -> bytes:
    b = f.read(n)
    if len(b) != n:
        raise EOFError("truncated rawlog stream")
    return b


def _read_fmt(f: BinaryIO, fmt: str):
    return struct.unpack("<" + fmt, _read(f, struct.calcsize("<" + fmt)))


def _write_fmt(f: BinaryIO, fmt: str, *vals) -> None:
    f.write(struct.pack("<" + fmt, *vals))


def _read_string(f: BinaryIO) -> str:
    (n,) = _read_fmt(f, "I")
    if n > 1 << 20:
        raise ValueError(f"implausible string length {n} — corrupt stream")
    return _read(f, n).decode("latin-1")


def _write_string(f: BinaryIO, s: str) -> None:
    b = s.encode("latin-1")
    _write_fmt(f, "I", len(b))
    f.write(b)


def _read_header(f: BinaryIO):
    """Object header: (classname, version). Returns None at clean EOF."""
    lead = f.read(1)
    if not lead:
        return None
    n = lead[0]
    if not n & _NAME_LEN_MASK:
        raise ValueError(f"bad object header byte 0x{n:02x} (expected 0x80 flag)")
    name = _read(f, n & ~_NAME_LEN_MASK).decode("ascii")
    (version,) = _read_fmt(f, "b")
    return name, version


def _write_header(f: BinaryIO, classname: str, version: int) -> None:
    b = classname.encode("ascii")
    f.write(bytes([len(b) | _NAME_LEN_MASK]))
    f.write(b)
    _write_fmt(f, "b", version)


def _expect_end(f: BinaryIO, classname: str) -> None:
    (flag,) = _read_fmt(f, "B")
    if flag != END_FLAG:
        raise ValueError(
            f"{classname}: end flag 0x{flag:02x} != 0x88 — field-layout mismatch"
        )


# ---------------------------------------------------------------------------
# nested serializable payloads
# ---------------------------------------------------------------------------


def _guard_version(name: str, version: int, implemented) -> None:
    """MRPT payloads carry no length prefix, so a version whose layout we
    do not know CANNOT be skipped or guessed at — fail loudly with the
    version so the mismatch is diagnosable (version-tolerance guard)."""
    if version not in implemented:
        raise ValueError(
            f"{name} stream version {version}: only version(s) "
            f"{sorted(implemented)} layouts are implemented — a different "
            f"version's field layout would be silently misparsed"
        )


def _read_pose3d(f: BinaryIO) -> np.ndarray:
    name, version = _read_header(f)
    if name != "CPose3D":
        raise ValueError(f"expected CPose3D, got {name}")
    _guard_version(name, version, {1})
    # 3x4 [R|t] row-major f64 (the homogeneous-coordinates representation of
    # the reference-era CPose3D stream)
    vals = _read_fmt(f, "12d")
    _expect_end(f, name)
    pose = np.eye(4)
    pose[:3, :] = np.asarray(vals).reshape(3, 4)
    return pose


def _write_pose3d(f: BinaryIO, pose: np.ndarray) -> None:
    _write_header(f, "CPose3D", 1)
    _write_fmt(f, "12d", *np.asarray(pose, np.float64)[:3, :].ravel())
    _write_fmt(f, "B", END_FLAG)


def _read_cmatrix(f: BinaryIO) -> np.ndarray:
    name, version = _read_header(f)
    if name not in ("CMatrix", "CMatrixF"):
        raise ValueError(f"expected CMatrix, got {name}")
    _guard_version(name, version, {0})
    rows, cols = _read_fmt(f, "II")
    if rows * cols > 1 << 26:
        raise ValueError(f"implausible matrix {rows}x{cols}")
    data = np.frombuffer(_read(f, 4 * rows * cols), np.dtype("<f4"))
    _expect_end(f, name)
    return data.reshape(rows, cols).copy()


def _write_cmatrix(f: BinaryIO, m: np.ndarray) -> None:
    _write_header(f, "CMatrix", 0)
    m = np.asarray(m, np.float32)
    _write_fmt(f, "II", m.shape[0], m.shape[1])
    f.write(m.astype("<f4").tobytes())
    _write_fmt(f, "B", END_FLAG)


def _read_cimage(f: BinaryIO) -> np.ndarray:
    name, version = _read_header(f)
    if name != "CImage":
        raise ValueError(f"expected CImage, got {name}")
    _guard_version(name, version, {9})
    (external,) = _read_fmt(f, "B")
    if external:
        raise ValueError("externally-stored CImage not supported")
    (fmt,) = _read_fmt(f, "B")  # 0 = raw BGR, 1 = compressed (refused)
    if fmt != 0:
        raise ValueError("compressed CImage payloads not supported")
    width, height, channels, top_left = _read_fmt(f, "iiiB")
    if not (0 < width <= 1 << 14 and 0 < height <= 1 << 14 and channels in (1, 3)):
        raise ValueError(f"implausible CImage {width}x{height}x{channels}")
    data = np.frombuffer(_read(f, width * height * channels), np.uint8)
    _expect_end(f, name)
    img = data.reshape(height, width, channels).copy()
    return img[..., 0] if channels == 1 else img


def _write_cimage(f: BinaryIO, img: np.ndarray) -> None:
    _write_header(f, "CImage", 9)
    img = np.asarray(img, np.uint8)
    if img.ndim == 2:
        img = img[..., None]
    _write_fmt(f, "BB", 0, 0)  # in-stream, raw
    _write_fmt(f, "iiiB", img.shape[1], img.shape[0], img.shape[2], 1)
    f.write(img.tobytes())
    _write_fmt(f, "B", END_FLAG)


# ---------------------------------------------------------------------------
# observations
# ---------------------------------------------------------------------------


@dataclass
class Obs3DRangeScan:
    """CObservation3DRangeScan — one RGB-D capture inside a rawlog
    (the fields LoadRawlog.cpp:247-283 consumes)."""

    sensor_label: str = ""
    timestamp: int = 0  # MRPT TTimeStamp (uint64 100-ns ticks)
    sensor_pose: np.ndarray = field(default_factory=lambda: np.eye(4))
    range_image: Optional[np.ndarray] = None  # (H,W) f32 metres
    intensity_image: Optional[np.ndarray] = None  # (H,W,3) u8 BGR
    max_range: float = 5.0
    std_error: float = 0.01


@dataclass
class Obs2DRangeScan:
    """CObservation2DRangeScan — planar LIDAR scan (LoadRawlog.cpp:219-222
    only captures the pointer; fields kept minimal)."""

    sensor_label: str = "LASER"
    timestamp: int = 0
    ranges: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float32))
    aperture: float = float(np.pi)


def _read_obs3d(f: BinaryIO) -> Obs3DRangeScan:
    obs = Obs3DRangeScan()
    (obs.max_range,) = _read_fmt(f, "f")
    obs.sensor_pose = _read_pose3d(f)
    (has_points,) = _read_fmt(f, "B")
    if has_points:
        raise ValueError("points3D payloads not supported (rangeImage rawlogs only)")
    (has_range,) = _read_fmt(f, "B")
    if has_range:
        obs.range_image = _read_cmatrix(f)
    (has_intensity,) = _read_fmt(f, "B")
    if has_intensity:
        obs.intensity_image = _read_cimage(f)
    (has_confidence,) = _read_fmt(f, "B")
    if has_confidence:
        raise ValueError("confidenceImage payloads not supported")
    (obs.std_error,) = _read_fmt(f, "f")
    (obs.timestamp,) = _read_fmt(f, "Q")
    obs.sensor_label = _read_string(f)
    return obs


def _write_obs3d(f: BinaryIO, obs: Obs3DRangeScan) -> None:
    _write_fmt(f, "f", obs.max_range)
    _write_pose3d(f, obs.sensor_pose)
    _write_fmt(f, "B", 0)
    _write_fmt(f, "B", obs.range_image is not None)
    if obs.range_image is not None:
        _write_cmatrix(f, obs.range_image)
    _write_fmt(f, "B", obs.intensity_image is not None)
    if obs.intensity_image is not None:
        _write_cimage(f, obs.intensity_image)
    _write_fmt(f, "B", 0)
    _write_fmt(f, "f", obs.std_error)
    _write_fmt(f, "Q", obs.timestamp)
    _write_string(f, obs.sensor_label)


def _read_obs2d(f: BinaryIO) -> Obs2DRangeScan:
    obs = Obs2DRangeScan()
    (obs.aperture,) = _read_fmt(f, "f")
    (n,) = _read_fmt(f, "I")
    if n > 1 << 20:
        raise ValueError(f"implausible scan length {n}")
    obs.ranges = np.frombuffer(_read(f, 4 * n), np.dtype("<f4")).copy()
    (obs.timestamp,) = _read_fmt(f, "Q")
    obs.sensor_label = _read_string(f)
    return obs


def _write_obs2d(f: BinaryIO, obs: Obs2DRangeScan) -> None:
    _write_fmt(f, "f", obs.aperture)
    _write_fmt(f, "I", len(obs.ranges))
    f.write(np.asarray(obs.ranges, "<f4").tobytes())
    _write_fmt(f, "Q", obs.timestamp)
    _write_string(f, obs.sensor_label)


_READERS = {
    "CObservation3DRangeScan": (_read_obs3d, {6}),
    "CObservation2DRangeScan": (_read_obs2d, {7}),
}


# ---------------------------------------------------------------------------
# rawlog container
# ---------------------------------------------------------------------------


def read_rawlog(path: str) -> Iterator[object]:
    """Yield observations from a rawlog (format #2: a gzip stream of
    observation objects — LoadRawlog.cpp:182-228 expects exactly this and
    throws on action/sensory-frame pairs)."""
    with gzip.open(path, "rb") as f:
        while True:
            try:
                header = _read_header(f)
            except EOFError:
                return
            if header is None:
                return
            name, version = header
            reader, versions = _READERS.get(name, (None, None))
            if reader is None:
                # no length prefix: an unknown class cannot be skipped
                raise ValueError(f"unsupported rawlog object class {name!r}")
            _guard_version(name, version, versions)
            obs = reader(f)
            _expect_end(f, name)
            yield obs


def write_rawlog(path: str, observations: List[object]) -> None:
    """Write observations as a rawlog-format-#2 gzip stream."""
    with gzip.open(path, "wb") as f:
        for obs in observations:
            if isinstance(obs, Obs3DRangeScan):
                _write_header(f, "CObservation3DRangeScan", 6)
                _write_obs3d(f, obs)
            elif isinstance(obs, Obs2DRangeScan):
                _write_header(f, "CObservation2DRangeScan", 7)
                _write_obs2d(f, obs)
            else:
                raise TypeError(f"cannot serialize {type(obs).__name__}")
            _write_fmt(f, "B", END_FLAG)
