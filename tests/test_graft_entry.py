"""The driver entry points must compile and run (single-chip fn + 8-device mesh)."""

import sys

sys.path.insert(0, "/root/repo")


def test_dryrun_multichip_8():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles_tiny():
    """entry() returns full-panorama args (compile-checked by the driver on
    TPU); here just check the fn traces on a tiny analogue."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__

    fn, args = __graft_entry__.entry()
    assert args[0].shape == (320, 1920)
    gray, depth = __graft_entry__._synthetic_pair(32, 192)

    def small_fn(gs, ds, gt, dt, pose):
        from rgbd360_tpu.ops import photoicp

        src = photoicp.build_pyramid_set(gs, ds, 3, is_target=False, sphere_seam_mask=True)
        trg = photoicp.build_pyramid_set(gt, dt, 3, is_target=True, sphere_seam_mask=True)
        res = photoicp.align_frames360(src, trg, pose, photoicp.PHOTO_DEPTH)
        return res.pose

    out = jax.jit(small_fn)(gray, depth, gray, depth, jnp.eye(4))
    np.testing.assert_allclose(np.asarray(out), np.eye(4), atol=1e-6)
