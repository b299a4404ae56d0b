"""RegisterPhotoICP — OO facade over the dense aligner, mirroring the
reference public API (include/RegisterPhotoICP.h:480-4800: setSourceFrame,
setTargetFrame, alignFrames360, getOptimalPose, getHessian, getGradient,
calcEntropy, SSO, avPhotoResidual, avDepthResidual).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from rgbd360_tpu.ops import photoicp

PHOTO_CONSISTENCY = photoicp.PHOTO_CONSISTENCY
DEPTH_CONSISTENCY = photoicp.DEPTH_CONSISTENCY
PHOTO_DEPTH = photoicp.PHOTO_DEPTH


class RegisterPhotoICP:
    def __init__(self, n_pyr_levels: int = 4):
        self.n_pyr_levels = n_pyr_levels
        self.min_depth = photoicp.MIN_DEPTH
        self.max_depth = photoicp.MAX_DEPTH
        self._src = None  # pyramid tuples
        self._trg = None
        self._result: Optional[photoicp.AlignResult] = None

    # -- reference API --------------------------------------------------------
    def set_num_pyr(self, n: int) -> None:
        self.n_pyr_levels = n
        self._src = self._trg = None

    @staticmethod
    def _to_gray_depth(rgb_bgr_u8, depth):
        from rgbd360_tpu.ops.image import gray_f32

        gray = gray_f32(jnp.asarray(rgb_bgr_u8))
        depth = jnp.asarray(depth)
        if depth.dtype == jnp.uint16:  # millimetres -> metres (buildPyramidRange)
            depth = depth.astype(jnp.float32) * 0.001
        return gray, depth.astype(jnp.float32)

    def set_source_frame(self, rgb_bgr_u8, depth) -> None:
        gray, depth_m = self._to_gray_depth(rgb_bgr_u8, depth)
        self._src = photoicp.build_pyramid_set_jit(
            gray, depth_m, self.n_pyr_levels, is_target=False, sphere_seam_mask=True
        )

    def set_target_frame(self, rgb_bgr_u8, depth) -> None:
        gray, depth_m = self._to_gray_depth(rgb_bgr_u8, depth)
        self._trg = photoicp.build_pyramid_set_jit(
            gray, depth_m, self.n_pyr_levels, is_target=True, sphere_seam_mask=True
        )

    def align_frames360(
        self,
        pose_guess: Optional[np.ndarray] = None,
        method: int = PHOTO_CONSISTENCY,
        occlusion: int = 0,
        full_coverage: bool = False,
    ) -> np.ndarray:
        """occlusion: 0 plain, 1 z-buffered (Occ1), 2 +dynamic-occlusion (Occ2),
        mirroring the reference parameter (RegisterPhotoICP.h:4519).
        full_coverage: banded re-gather inside every GN sweep — for
        large-motion callers (LC refinement, relocalization verify)."""
        assert self._src is not None and self._trg is not None, "set frames first"
        guess = jnp.asarray(pose_guess if pose_guess is not None else np.eye(4, dtype=np.float32))
        from rgbd360_tpu.utils.timing import stage

        with stage(
            "Dense alignment 360",
            sync=lambda: np.asarray(self._result.pose) if self._result else None,
        ):
            self._result = photoicp.align_frames360_jit(
                self._src, self._trg, guess, method, occlusion=occlusion,
                full_coverage=full_coverage,
            )
        return self.get_optimal_pose()

    def prewarm(
        self,
        method: int = PHOTO_DEPTH,
        occlusion: int = 0,
        full_coverage: bool = False,
        background: bool = True,
    ):
        """Force trace + compile (or cached-executable load) of the
        pyramid-build and alignment programs for the standard 320x1920
        panorama, on a daemon thread by default. Over the axon tunnel the
        first real alignment otherwise blocks ~30-45 s on compile/load
        (PERF.md); streaming apps call this at startup so that cost overlaps
        the first frames' plane-stack warmup instead of stalling the first
        keyframe. Best-effort: failures surface on the real call."""

        def _go():
            try:
                gray = jnp.zeros((320, 1920), jnp.float32)
                depth = jnp.full((320, 1920), 2.0, jnp.float32)
                src = photoicp.build_pyramid_set_jit(
                    gray, depth, self.n_pyr_levels, is_target=False, sphere_seam_mask=True
                )
                trg = photoicp.build_pyramid_set_jit(
                    gray, depth, self.n_pyr_levels, is_target=True, sphere_seam_mask=True
                )
                res = photoicp.align_frames360_jit(
                    src, trg, jnp.eye(4), method, occlusion=occlusion,
                    full_coverage=full_coverage,
                )
                np.asarray(res.pose)  # force completion (axon: block_until_ready lies)
            except Exception:
                pass

        if background:
            import threading

            t = threading.Thread(target=_go, daemon=True, name="photoicp-prewarm")
            t.start()
            return t
        _go()
        return None

    # -- accessors -------------------------------------------------------------
    @property
    def result(self) -> photoicp.AlignResult:
        assert self._result is not None, "align first"
        return self._result

    def get_optimal_pose(self) -> np.ndarray:
        return np.asarray(self.result.pose)

    def get_hessian(self) -> np.ndarray:
        return np.asarray(self.result.hessian)

    def get_gradient(self) -> np.ndarray:
        return np.asarray(self.result.gradient)

    def calc_entropy(self) -> float:
        return float(photoicp.calc_entropy(self.result.hessian))

    @property
    def sso(self) -> float:
        return float(self.result.sso)

    @property
    def av_photo_residual(self) -> float:
        return float(self.result.av_photo_residual)

    @property
    def av_depth_residual(self) -> float:
        return float(self.result.av_depth_residual)

    @property
    def ill_posed(self) -> bool:
        return bool(np.asarray(self.result.ill_posed))

    @property
    def num_iterations(self) -> np.ndarray:
        return np.asarray(self.result.num_iterations)
