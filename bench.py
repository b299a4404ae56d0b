"""Benchmark: spherical Photo+ICP pair registrations per second on one chip.

Measures the headline metric from BASELINE.json: dense photometric+depth
coarse-to-fine registration of the two bundled sample panoramas at full
1920x320 resolution, 5 pyramid levels, PHOTO_DEPTH. Pairs are batched with
vmap to fill the chip (the DP unit of SURVEY.md §2.3); throughput is
batch*iters/wall. Prints ONE json line.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_PAIRS_PER_SEC = 50.0  # north-star target (BASELINE.md)
REFERENCE_ROOT = os.environ.get("RGBD360_REFERENCE", "/root/reference")

# Known-legitimate FULL iteration signatures (coarse->fine) on the bundled
# pair under the reference stopping rule (maxIters 10, tol_residual 1e-3,
# tol_update 1e-4 — RegisterPhotoICP.h:4593-4611). Recorded with a CPU
# cross-check (PERF.md "The honest landscape"); recalibrate only the same way.
#   - Mosaic kernel path (TPU, the bench configuration): (0,7,10,10,10) —
#     also the CPU f32/f64 golden free run (tests/golden/pair_1_10.npz).
#   - XLA full-coverage fallback path: the exact chain can stop the finest
#     level early in a legitimate flat spot — (0,7,10,10,3) observed all-XLA
#     on TPU, (0,7,10,10,1) on one CPU configuration.
# The round-2/3 denormal flush corrupted the coarse prefix first
# ([4,10,9,...]), but a kernel-path artifact could equally early-stop ONLY
# the finest level — where the time goes — so on the kernel path the whole
# signature is pinned, not just the coarse prefix (VERDICT r3 weak #2).
KERNEL_PATH_SIGNATURES = {(0, 7, 10, 10, 10)}
FALLBACK_SIGNATURES = {(0, 7, 10, 10, 10), (0, 7, 10, 10, 3), (0, 7, 10, 10, 1)}

# Two-sided exact-finest-error band around the golden free run: known-good
# basins span 2.408-3.1 around golden 2.866 (PERF.md "Accuracy note"), so
# [g-0.6, g+0.35] covers every legitimate basin. The UPPER bound catches
# divergence; the LOWER bound catches term-set thinning — the denormal flush
# made the error metric itself smaller by silently dropping residual terms.
GOLDEN_ERR_BAND = (-0.6, 0.35)


def sanity_check(pose, error, ill_posed, num_iterations, golden=None, kernel_path=True):
    """Decide whether a bench result is a faithful registration.

    Pure host-side logic, importable by tests (tests/test_bench_gate.py
    proves an injected finest-level early stop flips it to False).

    pose: (4,4) np.ndarray; error: float (finest-level exact error);
    num_iterations: length-5 sequence coarse->fine; golden: the loaded
    pair_1_10.npz (or None when the fixture is absent); kernel_path: whether
    the Mosaic warp kernel drove the L0-L2 levels (the TPU bench config).
    Returns (ok, reasons) where reasons names every failed rail.
    """
    reasons = []
    t_norm = float(np.linalg.norm(np.asarray(pose)[:3, 3]))
    if not (0.01 < t_norm < 2.0):
        reasons.append(f"translation norm {t_norm:.4f} outside (0.01, 2.0)")
    if bool(np.asarray(ill_posed).any()):
        reasons.append("ill-posed system reported")
    if golden is not None:
        t_diff = float(np.linalg.norm(np.asarray(pose)[:3, 3] - golden["free_pose"][:3, 3]))
        if not t_diff < 0.1:
            reasons.append(f"translation vector {t_diff:.4f} m from golden basin (limit 0.1)")
        g_err = float(golden["free_error"])
        lo, hi = g_err + GOLDEN_ERR_BAND[0], g_err + GOLDEN_ERR_BAND[1]
        if not (lo < float(error) < hi):
            reasons.append(
                f"finest-level error {float(error):.4f} outside two-sided band "
                f"({lo:.3f}, {hi:.3f}) — too low means thinned term set, "
                f"too high means divergence"
            )
    sig = tuple(int(x) for x in np.asarray(num_iterations).reshape(-1))
    allowed = KERNEL_PATH_SIGNATURES if kernel_path else FALLBACK_SIGNATURES
    if sig not in allowed:
        reasons.append(
            f"iteration signature {sig} not in the CPU-cross-checked set "
            f"{sorted(allowed)} ({'kernel' if kernel_path else 'fallback'} path) "
            "— a perf win must not come from computing less"
        )
    return (not reasons), reasons


# Exit code the inner measurement process uses for "the run died under it —
# a fresh process may succeed" (tunnel flap mid-run, watchdog fire). The
# outer orchestrator retries ONLY this code: sanity failures (exit 1) are
# semantics, not flaps, and re-rolling them would be dishonest.
RETRYABLE_EXIT = 3


def _failure_line(detail: str) -> str:
    return json.dumps(
        {
            "metric": "sphere_photoicp_pairs_per_sec",
            "value": 0.0,
            "unit": "pairs/s",
            "vs_baseline": 0.0,
            "sane": False,
            "error": detail,
        }
    )


def _start_watchdog(seconds: float, _exit=None):
    """Bound the whole measurement against a tunnel flap MID-run.

    The probe only proves the tunnel was up at t=0; axon has been observed
    to drop mid-session (tools/tpu_session_r4d.sh exists because it did),
    and a device transfer on a dead tunnel blocks forever — which would
    hang the driver's bench capture instead of recording an honest failure.
    A daemon thread waits on an Event; if the run hasn't signalled
    completion in `seconds`, it prints the standard failure JSON line and
    hard-exits (the blocked transfer can't be interrupted in-process).

    Returns the Event to .set() on completion. `_exit` is injectable for
    tests (tests/test_bench_gate.py::test_watchdog_*)."""
    import threading

    done = threading.Event()
    exit_fn = _exit if _exit is not None else os._exit

    def _fire():
        if not done.wait(seconds):
            print(
                _failure_line(
                    f"watchdog: measurement did not complete within "
                    f"{seconds:.0f} s after a successful probe — "
                    "axon tunnel likely dropped mid-run"
                ),
                flush=True,
            )
            exit_fn(RETRYABLE_EXIT)

    threading.Thread(target=_fire, daemon=True, name="bench-watchdog").start()
    return done


def _bench_force_cpu() -> bool:
    """BENCH_FORCE_CPU=1 deliberately benches the CPU backend (implies
    BENCH_ALLOW_CPU): the sanctioned drive during axon outages, and the
    plumbing smoke in CI. NOTE the JAX_PLATFORMS env var does NOT work on
    this machine even for fresh processes (the environment pre-imports jax;
    verified 2026-08-19) — only jax.config.update('jax_platforms', ...)
    before the first device op takes effect, which is what this knob does."""
    return os.environ.get("BENCH_FORCE_CPU", "").strip().lower() not in ("", "0", "false", "no")


def _force_cpu_stmt() -> str:
    return "jax.config.update('jax_platforms','cpu');" if _bench_force_cpu() else ""


def _probe_device(timeout_s: float = 240.0):
    """The axon tunnel can be down for hours (CLAUDE.md); a trivial op that
    never completes would otherwise hang the whole bench silently. Probe in
    a subprocess (device handles can't be interrupted reliably in-process).

    Returns (ok, detail). The probe must land on an ACCELERATOR backend: if
    the device plugin fails fast, jax silently falls back to CPU with
    returncode 0, and a CPU run must never be published as the TPU headline
    (set BENCH_ALLOW_CPU=1 to bench the CPU backend deliberately). Probe
    stderr is surfaced so a fast failure isn't mislabeled a tunnel outage."""
    import subprocess

    code = (
        "import numpy as np, jax, jax.numpy as jnp;"
        + _force_cpu_stmt()
        + "np.asarray(jnp.zeros(2) + 1.0);"
        "print('BACKEND=' + jax.default_backend())"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s, capture_output=True, text=True
        )
    except subprocess.TimeoutExpired:
        return False, "probe timeout (axon tunnel outage) — no measurement taken"
    if proc.returncode != 0:
        tail = (proc.stderr or "").strip().splitlines()[-3:]
        detail = " | ".join(tail) if tail else f"no stderr, returncode {proc.returncode}"
        return False, "probe failed: " + detail
    backend = ""
    for line in (proc.stdout or "").splitlines():
        if line.startswith("BACKEND="):
            backend = line[len("BACKEND="):].strip()
    allow_cpu = (
        os.environ.get("BENCH_ALLOW_CPU", "").strip().lower() not in ("", "0", "false", "no")
    ) or _bench_force_cpu()
    if backend == "cpu" and not allow_cpu:
        return False, (
            "probe ran on the CPU fallback backend — refusing to publish a "
            "CPU run as the TPU headline (BENCH_ALLOW_CPU=1 overrides)"
        )
    return True, backend


def _probe_phase():
    """Probe with retries through a tunnel flap: the axon outages sometimes
    clear within minutes, and the driver benches once per round — a retry is
    cheap insurance against publishing a 0.0 for a transient blip. An honest
    outage still reports as one after the retries. Returns (ok, detail)."""
    retries = int(os.environ.get("BENCH_PROBE_RETRIES", "2"))
    for attempt in range(retries + 1):
        probe_ok, probe_detail = _probe_device()
        if probe_ok or attempt == retries:
            break
        # Only timeouts match the tunnel-flap rationale; a CPU-fallback
        # refusal or a fast plugin crash is deterministic — retrying it just
        # adds dead minutes to every bench in that failure mode.
        if not probe_detail.startswith("probe timeout"):
            break
        print(
            f"# probe attempt {attempt + 1}/{retries + 1} failed "
            f"({probe_detail}); retrying in 120 s",
            file=sys.stderr,
        )
        time.sleep(120)
    return probe_ok, probe_detail


def _inner_main():
    # The whole measurement runs in THIS dedicated process (spawned by main()
    # below): after a tunnel flap the in-process TPU client is poisoned
    # (every later op returns FAILED_PRECONDITION), so recovery must be a
    # fresh process — the outer orchestrator retries on RETRYABLE_EXIT.
    #
    # Watchdog: from here on every step can block forever if the tunnel
    # drops mid-run (frame build, compiles, the timed transfers). Default
    # budget: cold compiles are 10-30 s each and "occasionally minutes"
    # (CLAUDE.md), so 1800 s covers a fully cold cache with margin while
    # still bounding the driver's capture.
    # Deterministic preconditions (bad env values, missing sample files)
    # fail BEFORE the watchdog with a non-retryable exit: retrying them just
    # burns a reprobe + a full measurement process on a failure that can
    # never succeed.
    try:
        int(os.environ.get("BENCH_BATCH", "8"))
        int(os.environ.get("BENCH_ITERS", "10"))
        for rel in ("samples/sphere_images_1.bin", "samples/sphere_images_10.bin"):
            p = os.path.join(REFERENCE_ROOT, rel)
            if not os.path.exists(p):
                raise FileNotFoundError(p)
    except (ValueError, FileNotFoundError) as e:
        print(_failure_line(f"bad bench preconditions: {type(e).__name__}: {e}"), flush=True)
        return 1

    watchdog_done = _start_watchdog(float(os.environ.get("BENCH_WATCHDOG_S", "1800")))
    try:
        out, ok = _measure()
    except Exception as e:  # noqa: BLE001 — a crash past the precondition
        # gate is a dead device run (the observed flap class surfaces as
        # jax.errors.JaxRuntimeError, but grpc/tunnel deaths have shown
        # several faces) — worth one fresh-process retry
        print(_failure_line(f"measurement crashed: {type(e).__name__}: {e}"), flush=True)
        return RETRYABLE_EXIT
    watchdog_done.set()
    print(json.dumps(out))
    return 0 if ok else 1


def _measure():
    """Build the frames, run the timed chained alignment, sanity-check.
    Returns (result_dict, sane). Raises on a mid-run tunnel flap."""
    import jax
    import jax.numpy as jnp

    if _bench_force_cpu():
        jax.config.update("jax_platforms", "cpu")

    # persistent compile cache: first-run XLA compiles over the device tunnel
    # are slow (tens of seconds) and occasionally much slower
    # the persistent compile cache (host-feature-keyed dir + min-compile-time)
    # is configured by the package import below — a literal dir here would
    # bypass the keying and reintroduce the cross-host AOT SIGILL hazard

    from rgbd360_tpu.io.calib import Calib360
    from rgbd360_tpu.core.frame360 import Frame360
    from rgbd360_tpu.ops import photoicp
    from rgbd360_tpu.parallel.batch import align_batch

    calib = Calib360.load(REFERENCE_ROOT)
    f_trg = Frame360(calib, 0).build(os.path.join(REFERENCE_ROOT, "samples/sphere_images_1.bin"))
    f_src = Frame360(calib, 1).build(os.path.join(REFERENCE_ROOT, "samples/sphere_images_10.bin"))

    # batch 8 default since the round-4 on-chip sweep: 55.21 pairs/s vs
    # 53.68 at batch 4 (same session, K=4) — the round-2/3 batch-8 VMEM
    # cliff no longer exists at VR=2 + dual-anchored exact-final (the
    # per-pair L0 sweep costs 1.19 vs 1.14 ms; fixed per-align costs
    # amortize over 8 pairs). Batch 6 remains anomalous (38.99) — avoid.
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))

    def rep(x):
        return jnp.broadcast_to(x, (batch,) + x.shape).copy() if batch > 1 else x[None]

    gray_src = rep(f_src.sphere_gray)
    depth_src = rep(f_src.sphere_depth_mm.astype(jnp.float32) * 0.001)
    gray_trg = rep(f_trg.sphere_gray)
    depth_trg = rep(f_trg.sphere_depth_mm.astype(jnp.float32) * 0.001)
    poses = jnp.broadcast_to(jnp.eye(4), (batch, 4, 4))

    # Timing methodology: on the experimental axon platform
    # jax.block_until_ready does not reliably synchronize, so K chained
    # alignments run inside ONE jit (value-preserving data dependency between
    # iterations prevents any elision) and a host transfer of the result
    # forces completion. RPC floor is measured and subtracted.
    from functools import partial

    # The inter-iteration dependency must be non-foldable: 0*x would be
    # constant-folded and the loop body hoisted (LICM), so perturb the pose
    # guess translation by eps*error (~3e-7 m — workload-neutral but live).
    # keep as a HOST np array: jnp.asarray here would closure-capture a
    # device-resident constant whose value lowering fetches back over the
    # axon tunnel behind the eager queue — the 40-270 s stall class
    # (CLAUDE.md; tests/test_lint.py polices the same pattern in-package)
    eps_mask = np.zeros((4, 4), np.float32)
    eps_mask[:3, 3] = 1e-7

    @partial(jax.jit, static_argnames=("k",))
    def bench_k(gs, ds, gt, dt, poses0, k):
        def body(_, carry):
            p, acc = carry
            res = align_batch(gs, ds, gt, dt, p)
            p = poses0 + res.error[:, None, None] * eps_mask
            return p, acc + res.error
        _, acc = jax.lax.fori_loop(0, k, body, (poses0, jnp.zeros(gs.shape[0])))
        return acc

    last_res = align_batch(gray_src, depth_src, gray_trg, depth_trg, poses)
    # warmup + compile (forced by host transfer)
    np.asarray(bench_k(gray_src, depth_src, gray_trg, depth_trg, poses, iters))

    # RPC floor: trivial computation + same-size transfer (warm the op first —
    # its initial dispatch includes a compile that would dwarf the floor)
    np.asarray(jnp.zeros(batch) + 1.0)
    t0 = time.perf_counter()
    np.asarray(jnp.zeros(batch) + 1.0)
    rpc_floor = time.perf_counter() - t0

    t0 = time.perf_counter()
    np.asarray(bench_k(gray_src, depth_src, gray_trg, depth_trg, poses, iters))
    dt = max(time.perf_counter() - t0 - rpc_floor, 1e-9)
    pairs_per_sec = batch * iters / dt
    res = last_res

    # sanity: the result must be a real registration, not a no-op; it must
    # land in the golden basin with a faithful error (two-sided band); and
    # the FULL iteration signature must be a CPU-cross-checked legitimate
    # one — the denormal-flush lesson (PERF.md "The honest landscape"):
    # gate what the next artifact would corrupt first, and never let a
    # perf headline pass by computing less.
    pose = np.asarray(res.pose[0])
    t_norm = float(np.linalg.norm(pose[:3, 3]))
    err = float(np.asarray(res.error[0]))
    ill = bool(np.asarray(res.ill_posed).any())
    golden_path = os.path.join(os.path.dirname(__file__), "tests", "golden", "pair_1_10.npz")
    golden = np.load(golden_path) if os.path.exists(golden_path) else None

    ok, reasons = sanity_check(
        pose, err, ill, np.asarray(res.num_iterations[0]),
        golden=golden,
        kernel_path=photoicp._use_warp_kernel(gray_src.shape[-2:]),
    )

    out = {
        "metric": "sphere_photoicp_pairs_per_sec",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 2),
        "batch": batch,
        "translation_norm_m": round(t_norm, 4),
        "sane": ok,
    }
    if reasons:
        out["sanity_failures"] = reasons
    return out, ok


def _extract_json_line(stdout: str):
    """Last stdout line that parses as the bench JSON dict, or None."""
    for line in reversed((stdout or "").splitlines()):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            obj = json.loads(line)
        except ValueError:
            continue
        if isinstance(obj, dict) and obj.get("metric"):
            return line
    return None


def _run_attempts(run_once, reprobe, attempts, sleep_s=60.0, _print=print, _sleep=time.sleep):
    """Measurement orchestration (unit-tested in tests/test_bench_gate.py).

    run_once() -> (json_line_or_None, returncode). Retries ONLY on
    RETRYABLE_EXIT or a missing JSON line (a flap-killed process); a sanity
    failure (exit 1 with a JSON line) is deterministic semantics and is
    published as-is. Between attempts the tunnel is re-probed — if it's
    still down, report that honestly rather than burning another watchdog
    budget. Exactly one JSON line reaches stdout."""
    last_line = None
    for attempt in range(attempts):
        line, code = run_once()
        if line is not None and code != RETRYABLE_EXIT:
            _print(line)
            return code
        last_line = line or last_line
        if attempt == attempts - 1:
            break
        print(
            f"# measurement attempt {attempt + 1}/{attempts} died "
            f"(retryable); re-probing in {sleep_s:.0f} s",
            file=sys.stderr,
        )
        _sleep(sleep_s)
        probe_ok, probe_detail = reprobe()
        if not probe_ok:
            _print(_failure_line(f"tunnel down after a mid-run flap: {probe_detail}"))
            return 1
    _print(last_line or _failure_line(f"measurement died on all {attempts} attempts"))
    return 1


def main():
    if "--inner" in sys.argv:
        return _inner_main()

    probe_ok, probe_detail = _probe_phase()
    if not probe_ok:
        print(_failure_line(probe_detail))
        return 1

    import subprocess

    # Subprocess budget: the inner watchdog fires at BENCH_WATCHDOG_S and
    # prints its own failure line; the outer timeout is a backstop for the
    # watchdog thread itself dying with the process wedged.
    budget = float(os.environ.get("BENCH_WATCHDOG_S", "1800")) + 180.0

    def run_once():
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--inner"],
                timeout=budget,
                capture_output=True,
                text=True,
            )
        except subprocess.TimeoutExpired:
            return None, RETRYABLE_EXIT
        if proc.stderr:
            sys.stderr.write(proc.stderr)  # surface inner diagnostics
        return _extract_json_line(proc.stdout), proc.returncode

    return _run_attempts(
        run_once,
        _probe_phase,
        attempts=int(os.environ.get("BENCH_ATTEMPTS", "2")),
    )


if __name__ == "__main__":
    sys.exit(main())
