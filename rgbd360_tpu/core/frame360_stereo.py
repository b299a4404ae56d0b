"""Frame360Stereo — spherical frames from a stereo panorama device
(reference include/Frame360_stereo.h): the RGB panorama arrives as a PNG and
the float depth panorama as a raw binary (u16 height, u16 width header then
height*width f32 values stored transposed, :268-315). The spherical cloud
uses the same backprojection convention as Frame360.
"""

from __future__ import annotations

import struct

import jax.numpy as jnp
import numpy as np

from rgbd360_tpu.core.frame360 import Frame360
from rgbd360_tpu.io.calib import Calib360
from rgbd360_tpu.ops.image import gray_f32


def read_stereo_depth(path: str) -> np.ndarray:
    """Raw stereo depth panorama: [u16 h][u16 w][h*w f32 column-major]
    (reference Frame360_stereo.h:268-305) -> (h, w) f32 metres."""
    with open(path, "rb") as f:
        buf = f.read()
    h, w = struct.unpack("<HH", buf[:4])
    data = np.frombuffer(buf[4 : 4 + h * w * 4], np.float32)
    # stored as (w, h) then transposed by the reference
    return data.reshape(w, h).T.copy()


def write_stereo_depth(path: str, depth_m: np.ndarray) -> None:
    h, w = depth_m.shape
    with open(path, "wb") as f:
        f.write(struct.pack("<HH", h, w))
        f.write(np.ascontiguousarray(depth_m.T, np.float32).tobytes())


class Frame360Stereo(Frame360):
    """Frame360 whose panorama comes directly from files instead of the
    8-sensor stitcher."""

    def __init__(self, calib: Calib360 = None, frame_id: int = 0):
        super().__init__(calib or Calib360(), frame_id)

    def load_depth(self, path: str) -> None:
        depth_m = read_stereo_depth(path)
        self.sphere_depth_mm = jnp.asarray(
            np.clip(depth_m * 1000.0, 0, 65535).astype(np.uint16)
        )

    def load_rgb(self, path: str) -> None:
        from PIL import Image

        rgb = np.asarray(Image.open(path).convert("RGB"))
        self.sphere_rgb = jnp.asarray(rgb[..., ::-1])  # keep BGR convention
        self.sphere_gray = gray_f32(self.sphere_rgb)

    def build_stereo(self, rgb_png: str, depth_bin: str) -> "Frame360Stereo":
        self.load_rgb(rgb_png)
        self.load_depth(depth_bin)
        return self

    def build_sphere_cloud(self, start_phi: int = 166, max_depth: float = 15.0):
        """The stereo variant's own spherical backprojection (reference
        Frame360_stereo.h:454-517): a different convention from Frame360 —
        phi = (row + start_phi) * step - pi/2, theta = col * step - pi,
        x = sin(theta) cos(phi) d, y = sin(phi) d, z = cos(theta) cos(phi) d,
        valid depth in (0, 15) m, invalid points NaN. One vectorized op."""
        depth_m = np.asarray(self.sphere_depth_mm, np.float32) * 1e-3
        h, w = depth_m.shape
        step = 2.0 * np.pi / w
        phi = (np.arange(h, dtype=np.float32) + start_phi) * step - np.pi / 2
        theta = np.arange(w, dtype=np.float32) * step - np.pi
        cos_phi, sin_phi = np.cos(phi)[:, None], np.sin(phi)[:, None]
        sin_th, cos_th = np.sin(theta)[None, :], np.cos(theta)[None, :]
        valid = (depth_m > 0.0) & (depth_m < max_depth)
        d = np.where(valid, depth_m, np.nan)
        xyz = np.stack(
            [sin_th * cos_phi * d, sin_phi * d, cos_th * cos_phi * d], axis=-1
        )
        rgb = np.asarray(self.sphere_rgb)[..., ::-1]  # BGR -> RGB
        self.sphere_cloud = (xyz.reshape(-1, 3), rgb.reshape(-1, 3))
        return self.sphere_cloud
