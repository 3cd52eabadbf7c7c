"""Benchmark: steady-state VO tracking throughput at KITTI resolution.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The workload is the full per-frame tracking path (fused FAST+Harris+BRIEF
extraction, projection-seeded pyramidal LK, robust pose-only GN) on
synthetic 1241x376 frames — the same shapes as KITTI seq 00. The reference
publishes no numbers (BASELINE.md: its README is a to-do list); its
per-frame chrono prints put hand-rolled FAST alone at hundreds of ms on CPU
(reference src/FastDetector.cc:289-338 re-derives the Bresenham circle per
pixel through std::set). `vs_baseline` is measured against REF_FPS_EST — a
DELIBERATELY GENEROUS 10 frames/s estimate for the full reference pipeline
on CPU — until a real side-by-side run exists.
"""

import json
import sys
import time

import numpy as np

REF_FPS_EST = 10.0


def main():
    import jax
    # persistent compile cache: repeated runs (and the driver's fresh
    # processes) skip recompilation
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from ya_vo_tpu.tracking.frontend import Frontend
    from ya_vo_tpu.config import (VOConfig, TrackConfig, FeatureConfig,
                                  BAConfig)
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
        # backend BA on its own thread (the reference's two-thread split,
        # src/main.cc:11-12, done for frontend+backend instead of viz)
        ba=BAConfig(asynchronous=True),
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
    ok = ate < 1.0  # guard against divergence, not noise

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
        "vs_baseline": round((fps if ok else 0.0) / REF_FPS_EST, 3),
    }))


if __name__ == "__main__":
    main()
