"""Shared synthetic scene: a textured box room ray-cast through the real
8-sensor rig (pinhole K + shipped extrinsics), fed through the real
stitch + plane-extraction pipeline. Plane-rich (6 large faces), so it
exercises PbMap registration and loop closure at the reference's UNSOFTENED
gates, which the plane-poor bundled office pair cannot reach."""

import numpy as np

# asymmetric wall distances: a square room is 90-degree rotation symmetric,
# which lets the planar PbMap matcher pick a yaw-flipped assignment
DEFAULT_BOX = (-1.5, 1.5, -2.2, 3.4, -3.0, 2.4)


def raycast_room_sensor(rt, w=320, h=240, box=DEFAULT_BOX, obstacles=()):
    """Ray-cast the box interior through one pinhole sensor at rig pose rt.
    `obstacles`: optional axis-aligned boxes (same (x0,x1,y0,y1,z0,z1)
    tuples) INSIDE the room — rays hit their exterior faces, occluding the
    walls behind (nearest hit wins). Occluders make distant viewpoints see
    genuinely different plane sets, which the empty box does not (every
    wall is visible from everywhere, so keyframe/LC gates never trip).
    Returns (rgb (h,w,3) u8 BGR, depth_mm (h,w) u16)."""
    from rgbd360_tpu.io.calib import qvga_camera_matrix

    K = qvga_camera_matrix()
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    u, v = np.meshgrid(np.arange(w), np.arange(h))
    d_cam = np.stack([(u - cx) / fx, (v - cy) / fy, np.ones_like(u, float)], -1)
    R, t = rt[:3, :3].astype(np.float64), rt[:3, 3].astype(np.float64)
    d_world = d_cam @ R.T
    o = t

    best_s = np.full((h, w), np.inf)
    face_id = np.full((h, w), -1)
    hit_pt = np.zeros((h, w, 3))
    fid = 0
    for bx in (box,) + tuple(obstacles):
        x0, x1, y0, y1, z0, z1 = bx
        bounds = [(0, x0), (0, x1), (1, y0), (1, y1), (2, z0), (2, z1)]
        for ax, val in bounds:
            da = d_world[..., ax]
            with np.errstate(divide="ignore", invalid="ignore"):
                s = (val - o[ax]) / da
            p = o + s[..., None] * d_world
            inside = np.ones((h, w), bool)
            for ax2, (lo, hi) in zip((0, 1, 2), ((x0, x1), (y0, y1), (z0, z1))):
                if ax2 == ax:
                    continue
                inside &= (p[..., ax2] >= lo - 1e-9) & (p[..., ax2] <= hi + 1e-9)
            ok = (s > 0.05) & inside & (s < best_s)
            best_s = np.where(ok, s, best_s)
            face_id = np.where(ok, fid, face_id)
            hit_pt = np.where(ok[..., None], p, hit_pt)
            fid += 1

    depth_m = best_s * d_cam[..., 2]  # z-depth (d_cam z == 1)
    depth_mm = np.clip(np.nan_to_num(depth_m) * 1000.0, 0, 60000).astype(np.uint16)
    a = hit_pt[..., (0, 1)].sum(-1)
    b = hit_pt[..., (1, 2)].sum(-1)
    gray = (
        120
        + 60 * np.sin(3.0 * a + face_id)
        + 50 * np.cos(4.0 * b + 2.0 * face_id)
        + 15 * np.sin(11.0 * a)
    ).clip(0, 255)
    # distinct saturated tint per face (BGR): a purely grayscale room puts
    # every plane in the hue histogram's low-saturation bin, so the PbMap
    # matcher's hue constraint cannot veto the box's 180-degree-yaw
    # wall-swap assignment and PLANAR_3DoF tracking can lock onto a flipped
    # pose (observed: a 9-degree-apart pair registered as a 171-degree
    # flip). Colored walls — like any real scene — make the histograms
    # discriminative.
    _FACE_TINT = np.array(
        [
            [1.0, 0.35, 0.35],  # x0: blue-ish
            [0.35, 1.0, 0.35],  # x1: green-ish
            [0.35, 0.35, 1.0],  # y0: red-ish
            [0.3, 0.85, 1.0],   # y1: orange-ish
            [1.0, 0.85, 0.3],   # z0: cyan-ish
            [0.85, 0.3, 1.0],   # z1: magenta-ish
        ]
    )
    tint = _FACE_TINT[np.maximum(face_id, 0) % 6]  # (h, w, 3); obstacle faces cycle
    rgb = (gray[..., None] * tint).clip(0, 255).astype(np.uint8)
    return rgb, depth_mm


def room_frame(calib, rel_pose=None, frame_id=0):
    """Frame360 of the room viewed from rig pose rel_pose, through the real
    pipeline (stitch + plane extraction); CLAMS undistortion is skipped
    (synthetic depth is exact)."""
    import jax.numpy as jnp

    from rgbd360_tpu.core.frame360 import Frame360

    rel_pose = np.eye(4) if rel_pose is None else rel_pose
    rgbs, depths = [], []
    for s in range(8):
        rt = rel_pose.astype(np.float64) @ calib.Rt[s].astype(np.float64)
        rgb, depth = raycast_room_sensor(rt)
        rgbs.append(rgb)
        depths.append(depth)
    f = Frame360(calib, frame_id)
    f.rgb = jnp.asarray(np.stack(rgbs))
    f.depth_raw_mm = jnp.asarray(np.stack(depths))
    f.depth_undistorted_m = f.depth_raw_mm.astype(jnp.float32) * 0.001
    f.stitch_spherical_image()
    f.get_planes()
    return f
