"""bench.py sanity-gate tests — the fine-level blind spot (VERDICT r3 #2).

The denormal-flush incident (PERF.md "The honest landscape") proved a perf
"win" can come from silently computing less. bench.sanity_check therefore
pins the FULL iteration signature on the kernel path, gates a two-sided
error band, and the tests below prove the rails actually fire — including
the deliberate regression VERDICT demands: a finest-level (L0) cap of 3
iterations on a real alignment must flip sane to False even though the
coarse-prefix gate of round 3 would have passed it.
"""

import functools
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

from rgbd360_tpu.ops import photoicp  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "pair_1_10.npz")


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden npz not generated (tools/make_golden.py)")
    return np.load(GOLDEN)


def _check(golden, iters, err=None, pose=None, kernel_path=True):
    return bench.sanity_check(
        golden["free_pose"] if pose is None else pose,
        float(golden["free_error"]) if err is None else err,
        False,
        iters,
        golden=golden,
        kernel_path=kernel_path,
    )


def test_golden_free_run_passes(golden):
    ok, reasons = _check(golden, golden["free_iters"])
    assert ok, reasons


def test_flush_era_signature_fails(golden):
    # the round-2/3 corrupted landscape ([4,10,9,4,2]) passed every pose
    # gate; the signature rail must reject it on both paths
    for kp in (True, False):
        ok, reasons = _check(golden, [4, 10, 9, 4, 2], kernel_path=kp)
        assert not ok and any("signature" in r for r in reasons)


def test_finest_flat_spot_is_fallback_only(golden):
    # (0,7,10,10,3) is a legitimate all-XLA basin (PERF.md) but NOT a
    # kernel-path outcome — on the bench configuration it must fail
    ok_kernel, reasons = _check(golden, [0, 7, 10, 10, 3], kernel_path=True)
    assert not ok_kernel and any("signature" in r for r in reasons)
    ok_fallback, reasons = _check(golden, [0, 7, 10, 10, 3], kernel_path=False)
    assert ok_fallback, reasons


def test_thinned_error_fails_two_sided_band(golden):
    # a term-set-thinning artifact lowers the error metric itself — the
    # round-3 one-sided (upper) bound was blind to this direction
    ok, reasons = _check(golden, golden["free_iters"], err=float(golden["free_error"]) - 1.0)
    assert not ok and any("band" in r for r in reasons)
    ok, reasons = _check(golden, golden["free_iters"], err=float(golden["free_error"]) + 1.0)
    assert not ok and any("band" in r for r in reasons)


def test_inverted_pose_fails_vector_gate(golden):
    inv = np.linalg.inv(golden["free_pose"])
    ok, reasons = _check(golden, golden["free_iters"], pose=inv)
    assert not ok and any("golden basin" in r for r in reasons)


def test_injected_finest_early_stop_flips_sane(golden, monkeypatch):
    """The proof VERDICT r3 #2 demands: run the REAL aligner with L0 capped
    at 3 iterations (everything else untouched) and feed the result through
    the bench gate exactly as bench.main does — it must come out not-sane.

    Note (0,7,10,10,3) would have passed round 3's coarse-prefix gate AND
    can satisfy the pose gates (it is a legitimate flat-spot basin on the
    all-XLA path) — only the full-signature kernel-path rail catches it.
    """
    full_h = int(golden["gray_src_u8"].shape[0])
    orig = photoicp.align_level_sphere

    def capped(level, pose0, method, *args, **kw):
        if level.gray_src.shape[0] == full_h:
            kw["max_iters"] = 3
        return orig(level, pose0, method, *args, **kw)

    monkeypatch.setattr(photoicp, "align_level_sphere", capped)

    gray_src = jnp.asarray(golden["gray_src_u8"].astype(np.float32) / 255.0)
    gray_trg = jnp.asarray(golden["gray_trg_u8"].astype(np.float32) / 255.0)
    depth_src = jnp.asarray(golden["depth_src_mm"].astype(np.float32) * 0.001)
    depth_trg = jnp.asarray(golden["depth_trg_mm"].astype(np.float32) * 0.001)
    n = int(golden["n_levels"])

    # a FRESH jit object: the module-level align_spheres_jit may hold a
    # cached trace of the unpatched align_level_sphere
    @functools.partial(jax.jit, static_argnames=("method", "n_levels"))
    def run(gs, ds, gt, dt, method, n_levels):
        src = photoicp.build_pyramid_set(gs, ds, n_levels, is_target=False, sphere_seam_mask=True)
        trg = photoicp.build_pyramid_set(gt, dt, n_levels, is_target=True, sphere_seam_mask=True)
        return photoicp.align_frames360(src, trg, jnp.eye(4), method)

    res = run(gray_src, depth_src, gray_trg, depth_trg, photoicp.PHOTO_DEPTH, n)
    iters = np.asarray(res.num_iterations)
    assert int(iters[-1]) <= 3, "injection did not take"
    assert tuple(int(x) for x in iters[:3]) == (0, 7, 10), (
        "coarse prefix unexpectedly moved — the injection must isolate L0"
    )
    ok, reasons = bench.sanity_check(
        np.asarray(res.pose),
        float(np.asarray(res.error)),
        bool(np.asarray(res.ill_posed)),
        iters,
        golden=golden,
        kernel_path=True,  # the bench (TPU) configuration
    )
    assert not ok, "injected L0 early stop passed the bench gate"
    assert any("signature" in r for r in reasons), reasons


def test_watchdog_fires_on_hang(capsys):
    """A mid-run tunnel flap blocks a device transfer forever; the watchdog
    must emit the standard failure JSON line and hard-exit with the
    RETRYABLE code (a flap is worth a fresh-process retry) so the driver's
    capture never hangs."""
    import json
    import threading

    fired = threading.Event()
    codes = []
    bench._start_watchdog(0.05, _exit=lambda code: (codes.append(code), fired.set()))
    assert fired.wait(5.0), "watchdog did not fire on timeout"
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["sane"] is False and out["value"] == 0.0
    assert "watchdog" in out["error"]
    assert codes == [bench.RETRYABLE_EXIT]


def test_watchdog_silent_on_completion(capsys):
    import time

    done = bench._start_watchdog(0.1, _exit=lambda code: (_ for _ in ()).throw(SystemExit))
    done.set()
    time.sleep(0.3)
    assert capsys.readouterr().out.strip() == ""


# --- measurement retry orchestration (_run_attempts) -----------------------
# A mid-run tunnel flap poisons the in-process TPU client (observed
# 2026-08-19: FAILED_PRECONDITION on every op after a flap), so bench.py
# runs the measurement in a subprocess and retries the whole process. The
# policy lives in bench._run_attempts with injectable callables.


def _lines(capsys):
    return [l for l in capsys.readouterr().out.splitlines() if l.strip()]


def test_retry_success_first_try(capsys):
    code = bench._run_attempts(
        lambda: ('{"metric": "m", "value": 1.0}', 0),
        lambda: (True, ""),
        attempts=2,
        _sleep=lambda s: None,
    )
    assert code == 0
    assert _lines(capsys) == ['{"metric": "m", "value": 1.0}']


def test_retry_after_flap_then_success(capsys):
    calls = {"n": 0}

    def run_once():
        calls["n"] += 1
        if calls["n"] == 1:
            return None, bench.RETRYABLE_EXIT  # process died, no JSON
        return ('{"metric": "m", "value": 2.0}', 0)

    code = bench._run_attempts(run_once, lambda: (True, ""), attempts=2, _sleep=lambda s: None)
    assert code == 0 and calls["n"] == 2
    assert _lines(capsys) == ['{"metric": "m", "value": 2.0}']


def test_sanity_failure_is_not_retried(capsys):
    """Exit 1 with a JSON line is deterministic semantics (a failed sanity
    rail), never a flap — re-rolling it would be dishonest."""
    calls = {"n": 0}

    def run_once():
        calls["n"] += 1
        return ('{"metric": "m", "sane": false}', 1)

    code = bench._run_attempts(run_once, lambda: (True, ""), attempts=3, _sleep=lambda s: None)
    assert code == 1 and calls["n"] == 1


def test_all_attempts_dead_reports_failure(capsys):
    import json

    code = bench._run_attempts(
        lambda: (None, bench.RETRYABLE_EXIT),
        lambda: (True, ""),
        attempts=2,
        _sleep=lambda s: None,
    )
    assert code == 1
    out = json.loads(_lines(capsys)[-1])
    assert out["sane"] is False and "attempts" in out["error"]


def test_reprobe_failure_short_circuits(capsys):
    """If the tunnel is still down between attempts, report that instead of
    burning another full watchdog budget."""
    import json

    calls = {"n": 0}

    def run_once():
        calls["n"] += 1
        return None, bench.RETRYABLE_EXIT

    code = bench._run_attempts(
        run_once, lambda: (False, "still down"), attempts=3, _sleep=lambda s: None
    )
    assert code == 1 and calls["n"] == 1
    out = json.loads(_lines(capsys)[-1])
    assert "still down" in out["error"]


def test_extract_json_line_picks_last_metric_dict():
    stdout = "\n".join(
        [
            "# noise",
            '{"metric": "m", "value": 1.0}',
            "WARNING: something",
            '{"not_metric": 1}',
            '{"metric": "m", "value": 2.0}',
            "trailing noise",
        ]
    )
    assert bench._extract_json_line(stdout) == '{"metric": "m", "value": 2.0}'
    assert bench._extract_json_line("no json here\n") is None
