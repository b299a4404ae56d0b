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

# repo root, so `from tools...` imports resolve regardless of invocation cwd
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    # at least one promotion beyond the first: promoted frames print the
    # ": keyframe" / ": keyframe+lc" status (never a substring of the
    # ": first_keyframe" line or the "N keyframes" summary)
    assert ": keyframe" in text
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


def test_kf_odometry_app_end_to_end(synthetic_seq, tmp_path, capsys):
    """OdometryKeyFrame360 app: keyframe tracking with the motion gates and
    the documented rotation-promotion deviation."""
    from rgbd360_tpu.apps.kf_odometry import main as kf_main

    out = str(tmp_path / "out")
    assert kf_main([synthetic_seq, "--out", out]) == 0
    assert os.path.exists(os.path.join(out, "trajectory_kf.txt"))
    rows = np.loadtxt(os.path.join(out, "trajectory_kf.txt"))
    assert np.all(np.abs(rows.reshape(-1, 4, 4)[:, :3, 3]) < 5.0)


def test_loader_apps_on_synthetic(synthetic_seq, tmp_path):
    """LoadSphere + LoadSequence: the viewer/converter apps dump panoramas,
    clouds and a voxelized sequence cloud from the synthetic dataset."""
    from rgbd360_tpu.apps.load_sequence import main as seq_main
    from rgbd360_tpu.apps.load_sphere import main as sphere_main

    out1 = str(tmp_path / "sphere")
    frame = os.path.join(synthetic_seq, "sphere_images_1.bin")
    assert sphere_main([frame, "--out", out1, "--planes"]) == 0
    assert any(f.endswith(".png") for f in os.listdir(out1))
    out2 = str(tmp_path / "seq")
    assert seq_main(
        [synthetic_seq, "--out", out2, "--max-frames", "2", "--voxel", "0.1"]
    ) == 0
    assert any(f.endswith((".ply", ".pcd")) for f in os.listdir(out2))


def test_calibration_apps_on_synthetic(synthetic_seq, tmp_path, capsys):
    """GetControlPlanes + EvalCalibration + VisualizeCalibration on the
    synthetic frames (the shipped Rt is ground truth for the ray-caster, so
    the evaluation must report small adjacent-sensor discrepancies)."""
    from rgbd360_tpu.apps.eval_calibration import main as eval_main
    from rgbd360_tpu.apps.get_control_planes import main as gcp_main
    from rgbd360_tpu.apps.visualize_calibration import main as viz_main

    out = str(tmp_path / "cp")
    assert gcp_main(
        [synthetic_seq, "--out", out, "--max-frames", "2"]
    ) == 0
    assert os.listdir(out)
    assert eval_main([synthetic_seq, "--max-frames", "2"]) == 0
    assert "depth" in capsys.readouterr().out.lower()
    out_v = str(tmp_path / "viz")
    frame = os.path.join(synthetic_seq, "sphere_images_1.bin")
    assert viz_main([frame, "--out", out_v]) == 0
    assert os.listdir(out_v)


def test_online_calibration_app_on_synthetic(synthetic_seq, capsys):
    """OnlineCalibration: accumulate control planes over the synthetic
    frames and report the refined extrinsics' consistency."""
    from rgbd360_tpu.apps.online_calibration import main as ocal_main

    assert ocal_main([synthetic_seq, "--max-frames", "2"]) == 0
    assert capsys.readouterr().out.strip()


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


def test_grabber_app_synthetic_and_replay(tmp_path):
    """RGBD360_Grabber: record a synthetic stream to the reference .bin
    wire format, then re-record it through the replay source."""
    from rgbd360_tpu.apps.grabber import main as grab_main

    out1 = str(tmp_path / "rec")
    assert grab_main(["--out", out1, "--synthetic", "3"]) == 0
    bins = [f for f in os.listdir(out1) if f.endswith(".bin")]
    assert len(bins) == 3
    out2 = str(tmp_path / "replay")
    assert grab_main(["--out", out2, "--replay", out1, "--max-frames", "2"]) == 0
    assert len([f for f in os.listdir(out2) if f.endswith(".bin")]) == 2


def test_odometry_app_end_to_end(synthetic_seq, tmp_path, capsys):
    """OdometryRGBD360: frame-to-frame dense odometry over the synthetic
    loop, with the max_translation_odometry rejection gate armed."""
    from rgbd360_tpu.apps.odometry import main as odo_main

    out = str(tmp_path / "out")
    assert odo_main([synthetic_seq, "--out", out]) == 0
    text = capsys.readouterr().out
    assert "avDepth" in text
    rows = np.loadtxt(os.path.join(out, "trajectory.txt"))
    poses = rows.reshape(-1, 4, 4)
    assert len(poses) >= 2  # at least one pair accepted
    assert np.all(np.abs(poses[:, :3, 3]) < 5.0)


def test_labelize_app_end_to_end(synthetic_seq, tmp_path, capsys):
    """Labelize/LabelizeRGBD360: label first-frame planes, propagate via
    PbMap registration across the sequence, dump labels.json."""
    from rgbd360_tpu.apps.labelize import main as label_main

    out = str(tmp_path / "out")
    assert label_main(
        [synthetic_seq, "--labels", "0=wall,1=floor", "--out", out]
    ) == 0
    text = capsys.readouterr().out
    assert "planes labeled" in text
    assert os.path.exists(os.path.join(out, "labels.json"))


def test_pair_calibrator_app_online_mode(synthetic_seq, capsys):
    """PairCalibrator online mode: accumulate pair 0-1 control planes over
    the synthetic frames and report the Rt estimate."""
    from rgbd360_tpu.apps.pair_calibrator import main as pc_main

    rc = pc_main(["--dataset", synthetic_seq, "--pair", "0", "1", "--max-frames", "3"])
    text = capsys.readouterr().out
    assert "correspondences for pair 0-1" in text
    assert rc == 0 and "Rt estimate" in text


def test_methods_register_app_on_synthetic_pair(synthetic_seq, capsys):
    """Eval_RegisterMethods: every registration method (PbMap, dense sphere
    plain + Occ1, point-to-plane ICP, 8-camera robot-frame) runs on one
    synthetic pair and the cross-method agreement summary prints."""
    from rgbd360_tpu.apps.methods_register import main as mr_main

    f1 = os.path.join(synthetic_seq, "sphere_images_1.bin")
    f2 = os.path.join(synthetic_seq, "sphere_images_2.bin")
    assert mr_main([f1, f2]) == 0
    text = capsys.readouterr().out
    assert "max deviation from mean translation" in text
    assert "Dense Photo+Depth" in text
