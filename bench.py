"""Benchmark: full-pipeline VO throughput at KITTI resolution, PRODUCTION
gates, photoreal textured imagery.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

PRIMARY figure (the JSON "value"): frames/s of the complete pipeline —
on-device ray-cast world render + fused FAST+Harris+BRIEF extraction +
projection-seeded pyramidal LK + robust pose GN + device-side keyframe
merge + async windowed Schur BA — over a >=400-frame, >=8 s timed window
at the UNMODIFIED production config (reference gates min_ba_inliers=100 /
min_flow_inliers=2, src/LoopHandler.cc:144,151). Round-3 verdict items
closed here: the timed window is long enough that a single compile stall
or GC pause cannot move the headline double-digit percent; the
production-gate textured figure IS the primary and records first; the
stamps-world softened-gate figure of rounds 1-3 is demoted to a secondary
field for cross-round continuity.

`vs_baseline` is against the MEASURED reference rate: the reference
publishes no numbers (its README is a to-do list), so
`native/refbench/refbench.cc` re-implements its per-frame hot loops
faithfully (per-pixel scalar FAST re-deriving the Bresenham circle through
std::set, reference src/FastDetector.cc:277-369; per-bit popcount Hamming,
src/BriefDescriptor.cc:139-160) plus the exact cv::calcOpticalFlowPyrLK
call (src/LoopHandler.cc:372-375), timed on the reference's own real KITTI
frame. Result: 310.9 ms/frame = 3.22 fps steady state, recorded in
native/refbench/BASELINE_MEASURED.json (method: BASELINE.md). The
comparison is conservative in our disfavor: the reference number excludes
its imread disk I/O, while the primary figure here INCLUDES rendering the
imagery on the same chip.

Scoring guards (a fast-but-wrong pipeline scores 0):
  * accuracy: raw tracking ATE_sim3 < 0.5 map-units over the ~320-unit
    route (established level 0.18-0.25; guard at ~2x, vs the route length
    it is ~0.15% — the round-3 4,000-frame longrun ran at 0.16%);
  * kernel parity: tools/selfcheck.py must pass on this backend; a
    timeout/crash is retried once and then counts as NON-scoring
    (round-3 advisor: a hung parity check must not default to "pass").

Operational hardening (round-2/3 postmortems):
  * the primary figure is measured FIRST; everything after (refine,
    stamps secondary, selfcheck) is bounded and cannot lose it;
  * known stale chip holders (tools/devserver.py instances, identified by
    their pidfiles — never by pattern) are killed by exact PID at startup;
  * the kernel-parity selfcheck runs in a SUBPROCESS with a hard timeout,
    so a hung check degrades to a recorded non-scoring status instead of
    eating the run;
  * a watchdog thread heartbeats the current stage to stderr every 20 s;
  * compile-time note: the persistent JAX_COMPILATION_CACHE_DIR below
    covers CPU/TPU-direct backends but NOT the axon tunnel's
    remote-compile path — a driver-cold axon run pays ~2-6 min of
    compiles before the timed loop. Frontend.precompile() pins every
    steady-state program (including the redo variant) into the warmup
    phase so none of it can land inside the timed window.
"""

import glob
import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))

# persistent compile cache for THIS process and all children — must be in
# the environment before anything imports jax
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_HERE, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

_T0 = time.perf_counter()
_STAGE = {"name": "startup"}


def _log(msg: str) -> None:
    print(f"[bench +{time.perf_counter() - _T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _set_stage(name: str) -> None:
    _STAGE["name"] = name
    _log(f"stage: {name}")


def _start_heartbeat() -> None:
    def beat():
        while True:
            time.sleep(20)
            _log(f"alive (stage={_STAGE['name']})")

    threading.Thread(target=beat, daemon=True, name="bench-heartbeat").start()


def _kill_stale_holders() -> None:
    """Kill leftover tools/devserver.py processes by EXACT pid (from their
    own pidfiles) — a warm one holds the single tunneled TPU chip and makes
    every fresh process hang at backend init with zero diagnostics."""
    import signal

    pidfiles = glob.glob("/tmp/*/_devserver.pid") + \
        glob.glob(os.path.join(_HERE, "**", "_devserver.pid"), recursive=True)
    for pf in pidfiles:
        try:
            pid = int(open(pf).read().split()[0])
        except (OSError, ValueError, IndexError):
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmdline = f.read().decode("utf-8", "replace")
        except OSError:
            continue  # already gone
        if "devserver" not in cmdline:
            continue  # pid recycled by an unrelated process: leave it alone
        _log(f"killing stale devserver pid={pid} (pidfile {pf})")
        try:
            os.kill(pid, signal.SIGTERM)
            for _ in range(20):
                time.sleep(0.1)
                if not os.path.exists(f"/proc/{pid}"):
                    break
            else:
                os.kill(pid, signal.SIGKILL)
        except OSError:
            pass
        try:
            os.remove(pf)
        except OSError:
            pass


def _ref_fps() -> float:
    path = os.path.join(_HERE, "native", "refbench", "BASELINE_MEASURED.json")
    try:
        with open(path) as f:
            return float(json.load(f)["ref_style_fps"])
    except Exception:
        return 3.216  # last measured value (see BASELINE.md)


def _run_selfcheck(timeout_s: float = 300.0) -> str:
    """Kernel-parity selfcheck in a subprocess with a hard timeout and ONE
    retry (round-3 advisor: "timeout"/"error" must not score).

    Returns "pass" | "fail" | "timeout" | "error:<...>". JSON details land
    in SELFCHECK.json. A subprocess (not in-process) so a hung check can be
    killed positively — the chip frees on child exit and this process
    attaches afterwards."""
    if os.environ.get("BENCH_SKIP_SELFCHECK"):
        return "skipped"
    out_path = os.path.join(_HERE, "SELFCHECK.json")
    cmd = [sys.executable, os.path.join(_HERE, "tools", "selfcheck.py")]

    def one(timeout):
        proc = None
        try:
            with open(out_path, "w") as f:
                proc = subprocess.Popen(cmd, stdout=f, stderr=sys.stderr,
                                        cwd=_HERE)
                rc = proc.wait(timeout=timeout)
            return "pass" if rc == 0 else "fail"
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait()
            return "timeout"
        except Exception as e:  # missing interpreter etc.
            if proc is not None:
                proc.kill()
                proc.wait()
            return f"error:{type(e).__name__}"

    status = one(timeout_s)
    if status not in ("pass", "fail"):
        _log(f"selfcheck {status}: retrying once with a longer timeout")
        status = one(timeout_s * 1.5)
    return status


def _stamps_secondary(jax, out: dict) -> None:
    """Secondary figure: the rounds-1-3 stamps-world workload (synthetic
    corridor, softened gates min_ba_inliers=20 — the 1,200 seeded
    landmarks decay below the production gate near the route's end, which
    the continuously-replenished textured world does not suffer). Kept for
    cross-round comparability; never affects the primary value."""
    from ya_vo_tpu.config import VOConfig, TrackConfig, FeatureConfig
    from ya_vo_tpu.tracking.frontend import Frontend
    from ya_vo_tpu.utils import synthetic
    from ya_vo_tpu.viz import evaluation

    H, W = 376, 1241
    n = 40
    imgs, poses_gt, lms, cam = synthetic.render_sequence(
        n_frames=n, n_landmarks=1200, height=H, width=W,
        step=0.5, yaw_rate=0.002, seed=11, corridor=True)
    import dataclasses

    cfg = VOConfig(
        image_height=H, image_width=W,
        features=FeatureConfig(max_keypoints=2048),
        tracking=TrackConfig(min_ba_inliers=20, min_flow_inliers=5),
    )
    # rounds 1-4 ran this workload with the async backend; pin it so the
    # continuity figure keeps measuring the same configuration after the
    # round-5 production default flipped to synchronous BA
    cfg = dataclasses.replace(
        cfg, ba=dataclasses.replace(cfg.ba, asynchronous=True))
    fe = Frontend(cfg, cam)
    for img in imgs[:6]:
        fe.process(img)
    fe.precompile()
    t0 = time.perf_counter()
    fe.run(imgs[6:])
    jax.effects_barrier()
    dt = time.perf_counter() - t0
    ate = evaluation.ate_rmse(
        np.stack(fe.trajectory), np.linalg.inv(poses_gt), with_scale=True)
    out["stamps_fps"] = round((n - 6) / dt, 2)
    out["stamps_ate_m"] = round(float(ate), 4)
    _log(f"stamps secondary: {out['stamps_fps']} frames/s, "
         f"ate_sim3={ate:.4f} (softened gates, rounds-1-3 workload)")


def main():
    _start_heartbeat()
    _set_stage("kill-stale-holders")
    _kill_stale_holders()

    _set_stage("jax-init")
    import jax

    from ya_vo_tpu.config import VOConfig
    from ya_vo_tpu.tracking.frontend import Frontend
    from ya_vo_tpu.utils.scene import TexturedSequence
    from ya_vo_tpu.viz import evaluation

    _log(f"backend={jax.default_backend()} devices={len(jax.devices())}")

    # ---------------- PRIMARY: textured world, production config --------
    # Weather-proof protocol (round-4 verdict): the tunnel's 2x run-to-run
    # variance (docs/PERF.md) means ONE timed window records weather, not
    # the code. So: (a) the timed window runs BENCH_REPS times (default 3)
    # and the HEADLINE is the MEDIAN, with min/max recorded as error bars;
    # (b) a tunnel-independent DEVICE throughput figure is recorded
    # alongside (Frontend.device_throughput_probe: 200 chained fused-step
    # dispatches, one terminal block — latency and weather amortize out).
    _set_stage("primary-build-world")
    N = 410
    WARM = 8
    REPS = max(1, int(os.environ.get("BENCH_REPS", "3")))
    seq = TexturedSequence(n_frames=N, seed=5)
    cfg = VOConfig()   # UNMODIFIED production defaults — reference gates
    gt_cw = np.linalg.inv(seq.poses[:N])

    # isolate steady-state render throughput (dispatch 12, block once)
    f0 = seq.frame(0)
    f0.block_until_ready()
    t0 = time.perf_counter()
    rend = [seq.frame(f) for f in range(1, 13)]
    jax.block_until_ready(rend)
    render_ms = (time.perf_counter() - t0) / 12 * 1e3

    fps_reps, ate_reps, resets_reps, discard_reps = [], [], [], []
    fe = None
    probe = {}
    for rep in range(REPS):
        _set_stage(f"primary-warmup-compile-rep{rep}")
        fe = Frontend(cfg, seq.cam)
        for f in range(WARM):
            fe.process(np.asarray(jax.device_get(seq.frame(f))))
        fe.precompile()   # incl. the redo/step_pre variant — see docstring

        _set_stage(f"primary-timed-loop-rep{rep}")
        t0 = time.perf_counter()
        fe.run((seq.frame(f) for f in range(WARM, N)), pipelined=True)
        jax.effects_barrier()
        dt = time.perf_counter() - t0
        fps_reps.append((N - WARM) / dt)

        est = np.stack(fe.trajectory)
        ate = float(evaluation.ate_rmse(est, gt_cw, with_scale=True))
        ate_reps.append(ate)
        resets_reps.append(fe.n_resets)
        discard_reps.append(fe.n_ba_discarded)
        _log(f"rep {rep}: {fps_reps[-1]:.2f} frames/s incl on-device "
             f"render ({dt:.1f} s / {N - WARM} frames), ate_sim3={ate:.4f},"
             f" resets={fe.n_resets}, ba_runs={fe.n_ba_runs}, "
             f"ba_discarded={fe.n_ba_discarded}")
        if rep == 0:
            _set_stage("device-throughput-probe")
            try:
                probe = fe.device_throughput_probe(rend[:4], n_steps=200)
                _log(f"device throughput: {probe['fps_device']} steps/s "
                     f"({probe['device_step_ms']} ms/step, tunnel-"
                     f"independent)")
            except Exception as e:
                _log(f"device probe skipped: {type(e).__name__}: {e}")

    fps = float(np.median(fps_reps))
    ate_raw = float(np.median(ate_reps))
    _log(f"PRIMARY (median of {REPS}): {fps:.2f} frames/s "
         f"[{min(fps_reps):.2f}, {max(fps_reps):.2f}], "
         f"ate_sim3={ate_raw:.4f}, render={render_ms:.1f} ms/frame "
         f"(production gates)")

    out = {
        "metric": "vo_pipeline_fps_kitti_res_production",
        "value": 0.0,              # filled after guards
        "unit": "frames/s",
        "vs_baseline": 0.0,
        "reps": REPS,
        "fps_reps": [round(x, 2) for x in fps_reps],
        "fps_min": round(min(fps_reps), 2),
        "fps_max": round(max(fps_reps), 2),
        "timed_frames": N - WARM,
        "render_ms_per_frame": round(render_ms, 1),
        "ate_raw_m": round(ate_raw, 4),
        "ate_reps": [round(x, 4) for x in ate_reps],
        "resets": int(max(resets_reps)),
        "resets_reps": resets_reps,
        "ba_discarded_reps": discard_reps,
        "production_gates": True,
    }
    out.update(probe)

    # ---------------- bounded extras (cannot lose the primary) ----------
    _set_stage("offline-refine")
    try:
        from ya_vo_tpu.ba.global_refine import global_refine
        traj = global_refine(fe)
        ate_ref = evaluation.ate_rmse(traj, gt_cw, with_scale=True)
        out["ate_refined_m"] = round(float(ate_ref), 4)
    except Exception as e:
        _log(f"offline refine skipped: {type(e).__name__}: {e}")

    if time.perf_counter() - _T0 < 600:
        _set_stage("stamps-secondary")
        try:
            _stamps_secondary(jax, out)
        except Exception as e:
            _log(f"stamps secondary skipped: {type(e).__name__}: {e}")
    else:
        _log("stamps secondary skipped (time budget)")

    _set_stage("selfcheck-subprocess")
    del fe, seq, rend, f0   # free the chip's HBM for the child process
    selfcheck_status = _run_selfcheck()
    out["selfcheck"] = selfcheck_status
    _log(f"kernel selfcheck: {selfcheck_status} (details in SELFCHECK.json)")

    # guards: see module docstring. A SKIPPED selfcheck (BENCH_SKIP_SELFCHECK
    # dev knob) must not masquerade as a fully guarded figure (round-4
    # advisor): only a real "pass" scores. Dev runs still see the fps in the
    # stderr log and the non-value fields.
    ok = (float(ate_raw) < 0.5) and selfcheck_status == "pass"
    out["value"] = round(fps if ok else 0.0, 3)
    out["vs_baseline"] = round((fps if ok else 0.0) / _ref_fps(), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
