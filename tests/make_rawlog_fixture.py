"""Standalone byte-level generator for tests/golden/minimal_v6.rawlog.

Deliberately does NOT import rgbd360_tpu.io.rawlog: every byte below is
emitted by hand with struct.pack from the MRPT CStream wire format as
independently documented here, so the reader in io/rawlog.py is gated
against a fixture its own writer never touched (VERDICT r2 #5 / advisor
medium finding).

Wire format (MRPT 1.x CStream::WriteObject):
  uint8  (len(classname) | 0x80)
  bytes  classname
  int8   serialization version
  ...    class payload (no length prefix)
  uint8  0x88 end flag
A .rawlog "format #2" file is a gzip stream of consecutive objects.

Payloads assembled here (MRPT-1.x field order):
  CPose3D v2            x y z qr qx qy qz as 7 f64 (CPose3DQuat components)
  CMatrixD / CMatrix v0 rows u32, cols u32, raw f64/f32 data
  TCamera v2            focalLengthMeters f64, dist[5] f64, intrinsics as a
                        nested CMatrixD 3x3, nrows u32, ncols u32
  CImage v9             externalStorage u8, hasColor u8; color raw form is
                        -width i32, -height i32, H rows of W*3 BGR bytes;
                        color JPEG form is nBytes i32 + the encoded blob
  CObservation3DRangeScan v6
                        maxRange f32, sensorPose, hasPoints3D u8,
                        hasRangeImage u8 [CMatrix], hasIntensityImage u8
                        [CImage], hasConfidenceImage u8, cameraParams
                        TCamera, cameraParamsIntensity TCamera,
                        relativePoseIntensityWRTDepth CPose3D, stdError f32,
                        timestamp u64, sensorLabel str, 2x (externalStored
                        u8 + file str), range_is_depth u8,
                        intensityImageChannel i8
  CObservation2DRangeScan v7
                        aperture f32, rightToLeft u8, maxRange f32,
                        sensorPose, N u32, scan f32*N, validRange u8*N,
                        stdError f32, timestamp u64, beamAperture f64,
                        sensorLabel str, deltaPitch f64, hasIntensity u8

INDEPENDENCE CAVEAT (recorded per the VERDICT's fallback clause): the MRPT
sources are not present in this image and there is no network egress, so
the field layouts cannot be cited to MRPT source lines or validated against
an MRPT-written archive; this generator re-derives the layout from the
format documentation rather than from io/rawlog.py's code, which removes
shared-code bugs but not shared-understanding bugs. A real MRPT-written
sample remains the outstanding gate (io/rawlog.py docstring).

Run: python tests/make_rawlog_fixture.py
"""

import gzip
import os
import struct

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "golden", "minimal_v6.rawlog")


def obj(classname: str, version: int, payload: bytes) -> bytes:
    return (
        struct.pack("<B", len(classname) | 0x80)
        + classname.encode()
        + struct.pack("<b", version)
        + payload
        + b"\x88"
    )


def pose3d(x, y, z, qr=1.0, qx=0.0, qy=0.0, qz=0.0) -> bytes:
    return obj("CPose3D", 2, struct.pack("<7d", x, y, z, qr, qx, qy, qz))


def cmatrix(rows, cols, values) -> bytes:
    return obj(
        "CMatrix", 0,
        struct.pack("<II", rows, cols) + np.asarray(values, "<f4").tobytes(),
    )


def cmatrix_d(rows, cols, values) -> bytes:
    return obj(
        "CMatrixD", 0,
        struct.pack("<II", rows, cols) + np.asarray(values, "<f8").tobytes(),
    )


def tcamera(fx, fy, cx, cy, nrows, ncols) -> bytes:
    k = [fx, 0.0, cx, 0.0, fy, cy, 0.0, 0.0, 1.0]
    return obj(
        "TCamera", 2,
        struct.pack("<d", 0.002)  # focalLengthMeters
        + struct.pack("<5d", 0.1, -0.05, 0.001, -0.002, 0.01)  # dist k1..k3
        + cmatrix_d(3, 3, k)
        + struct.pack("<II", nrows, ncols),
    )


def cimage_raw(bgr: np.ndarray) -> bytes:
    h, w, _ = bgr.shape
    return obj(
        "CImage", 9,
        struct.pack("<BB", 0, 1)  # in-stream, color
        + struct.pack("<ii", -w, -h)  # negative sizes = raw BGR rows
        + bgr.tobytes(),
    )


def cimage_jpeg(bgr: np.ndarray) -> bytes:
    import cv2

    ok, blob = cv2.imencode(".jpg", bgr, [cv2.IMWRITE_JPEG_QUALITY, 98])
    assert ok
    return obj(
        "CImage", 9,
        struct.pack("<BB", 0, 1) + struct.pack("<i", blob.size) + blob.tobytes(),
    )


def mrpt_string(s: str) -> bytes:
    return struct.pack("<I", len(s)) + s.encode()


def obs3d(label, timestamp, pose_bytes, depth, rgb_image_bytes) -> bytes:
    h, w = depth.shape
    payload = (
        struct.pack("<f", 5.0)  # maxRange
        + pose_bytes  # sensorPose
        + struct.pack("<B", 0)  # hasPoints3D = false
        + struct.pack("<B", 1)  # hasRangeImage = true
        + cmatrix(h, w, depth)
        + struct.pack("<B", 1)  # hasIntensityImage = true
        + rgb_image_bytes
        + struct.pack("<B", 0)  # hasConfidenceImage = false
        + tcamera(525.0 * w / 640, 525.0 * w / 640, w / 2, h / 2, h, w)
        + tcamera(520.0, 521.0, w / 2, h / 2, h, w)  # cameraParamsIntensity
        + pose3d(-0.025, 0.0, 0.0)  # relativePoseIntensityWRTDepth
        + struct.pack("<f", 0.01)  # stdError
        + struct.pack("<Q", timestamp)  # TTimeStamp, 100ns ticks
        + mrpt_string(label)
        + struct.pack("<B", 0) + mrpt_string("")  # points3D external
        + struct.pack("<B", 0) + mrpt_string("")  # rangeImage external
        + struct.pack("<B", 1)  # range_is_depth
        + struct.pack("<b", 0)  # intensityImageChannel = visible
    )
    return obj("CObservation3DRangeScan", 6, payload)


def obs2d(label, timestamp, ranges) -> bytes:
    n = len(ranges)
    payload = (
        struct.pack("<fBf", float(np.pi), 1, 80.0)  # aperture, rightToLeft, maxRange
        + pose3d(0.0, 0.0, 0.3)
        + struct.pack("<I", n)
        + np.asarray(ranges, "<f4").tobytes()
        + bytes([1] * n)  # validRange
        + struct.pack("<f", 0.01)  # stdError
        + struct.pack("<Q", timestamp)
        + struct.pack("<d", 0.0)  # beamAperture
        + mrpt_string(label)
        + struct.pack("<d", 0.0)  # deltaPitch
        + struct.pack("<B", 0)  # hasIntensity = false
    )
    return obj("CObservation2DRangeScan", 7, payload)


def main():
    rng = np.random.default_rng(42)
    h, w = 6, 8
    depth1 = (1.0 + 0.1 * np.arange(h * w).reshape(h, w)).astype(np.float32)
    rgb1 = rng.integers(0, 255, (h, w, 3), np.uint8)
    depth2 = (2.0 + 0.05 * np.arange(h * w).reshape(h, w)).astype(np.float32)
    # smooth image so the JPEG decode gate can use a tight tolerance
    yy, xx = np.mgrid[0:h, 0:w]
    rgb2 = np.stack(
        [128 + 10 * xx, 100 + 8 * yy, 90 + 5 * (xx + yy)], axis=-1
    ).astype(np.uint8)

    blob = (
        obs3d("RGBD1", 129999999990000000, pose3d(0, 0, 0), depth1, cimage_raw(rgb1))
        + obs2d("LASER", 129999999990000001, [1.5, 2.5, 3.5])
        + obs3d(
            "RGBD2",
            129999999990000002,
            pose3d(0.5, -0.25, 1.5),
            depth2,
            cimage_jpeg(rgb2),
        )
    )
    with gzip.open(OUT, "wb") as f:
        f.write(blob)
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)")


if __name__ == "__main__":
    main()
