"""End-to-end smoke runs of the flagship CLI apps.

The unit suites gate the underlying math; these run the actual app mains —
argument wiring, the planes_pipeline integration, artifact writing — on a
tiny synthetic loop (tools/make_synthetic_sequence.py) and the bundled
reference pair. App-layer regressions (a dropped SSO entry, a broken
pipeline hookup, a missing artifact) surface here, not in production runs.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"))


@pytest.fixture(scope="module")
def synthetic_seq(tmp_path_factory):
    """A 6-frame synthetic loop dataset shared by the SLAM app runs."""
    from tools.make_synthetic_sequence import main as gen

    d = str(tmp_path_factory.mktemp("room_seq"))
    assert gen(["--out", d, "--frames", "6", "--radius", "0.8"]) == 0
    return d


def test_kf_sphere_slam_app_end_to_end(synthetic_seq, tmp_path, capsys):
    """KFsphere_SLAM app: keyframe selection over the synthetic loop, with
    the one-frame-lookahead plane pipeline, writing every artifact."""
    from rgbd360_tpu.apps.kf_sphere_slam import main as slam_main

    out = str(tmp_path / "out")
    assert slam_main([synthetic_seq, "--out", out]) == 0
    text = capsys.readouterr().out
    assert "first_keyframe" in text
    assert "keyframe" in text  # at least one promotion beyond the first
    for artifact in (
        "map.html", "pose_graph.g2o", "trajectory_kf_slam.txt",
        "trajectory_optimized.txt",
    ):
        assert os.path.exists(os.path.join(out, artifact)), artifact
    # the trajectory stays inside the synthetic room (sanity on pose scale);
    # format: one 4x4 pose per 4 lines (utils/viz.save_trajectory)
    rows = np.loadtxt(os.path.join(out, "trajectory_kf_slam.txt"))
    poses = rows.reshape(-1, 4, 4)
    assert np.all(np.abs(poses[:, :3, 3]) < 5.0)


def test_sphere_graph_slam_app_end_to_end(synthetic_seq, tmp_path, capsys):
    """SphereGraphSLAM app: PbMap tracking + dense refinement + LC drain
    over the synthetic loop, synchronous loop-closure mode."""
    from rgbd360_tpu.apps.sphere_graph_slam import main as slam_main

    out = str(tmp_path / "out")
    assert slam_main([synthetic_seq, "--out", out]) == 0
    text = capsys.readouterr().out
    assert "tracked" in text or "RELOCALIZED" in text
    for artifact in ("map.html", "pose_graph.g2o", "trajectory_slam.txt"):
        assert os.path.exists(os.path.join(out, artifact)), artifact


def test_register_pair_app_on_bundled_samples(tmp_path, capsys):
    """RegisterPairRGBD360 app on the two bundled reference frames: the
    reported translation must land in the golden basin."""
    ref = "/root/reference/samples"
    if not os.path.exists(os.path.join(ref, "sphere_images_1.bin")):
        pytest.skip("bundled samples not present")
    from rgbd360_tpu.apps.register_pair import main as pair_main

    out = str(tmp_path / "out")
    rc = pair_main(
        [
            os.path.join(ref, "sphere_images_1.bin"),
            os.path.join(ref, "sphere_images_10.bin"),
            "--out", out,
        ]
    )
    assert rc == 0
    text = capsys.readouterr().out
    assert "pose" in text.lower() or "t|" in text or "translation" in text.lower()
