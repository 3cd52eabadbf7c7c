"""Distributed-BA scaling harness.

Measures wall-clock per GN iteration of the landmark-sharded window BA
(parallel/dist_ba.py) across mesh sizes, reporting scaling efficiency
(BASELINE.json config #5: "map blocks sharded across hosts, distributed BA
via collectives"). Runs on whatever devices are visible — the virtual
8-device CPU mesh in tests, real chips on a pod slice; the same code path
covers both (mesh + shard_map + psum ride ICI on hardware).

Usage:
    python -m ya_vo_tpu.parallel.scaling_bench [L] [W]
"""

from __future__ import annotations

import time
from typing import Dict, List

import numpy as np


def build_problem(L: int, W: int, seed: int = 0):
    import jax.numpy as jnp

    from ya_vo_tpu.parallel.dist_ba import DistBAProblem
    from ya_vo_tpu.utils import synthetic

    cam = synthetic.kitti_camera()
    lms = synthetic.random_landmarks(L, seed=seed)
    poses = synthetic.forward_trajectory(W, step=0.5)
    uv, vis = synthetic.project_tracks(lms, poses, cam, 376, 1241, margin=5)
    rng = np.random.default_rng(seed + 1)
    lms_pert = lms + rng.normal(0, 0.05, lms.shape).astype(np.float32)
    return cam, DistBAProblem(
        poses=jnp.asarray(poses),
        landmarks=jnp.asarray(lms_pert),
        lm_valid=jnp.ones(L, bool),
        obs_uv=jnp.asarray(np.transpose(uv, (1, 0, 2)).astype(np.float32)),
        obs_valid=jnp.asarray(np.transpose(vis, (1, 0))),
    )


def measure(L: int = 16384, W: int = 8, iters: int = 4,
            device_counts=None, repeats: int = 3) -> List[Dict]:
    import jax

    from ya_vo_tpu.parallel import dist_ba, mesh as mesh_lib

    n_dev = len(jax.devices())
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]

    cam, prob = build_problem(L, W)
    rows = []
    base = None
    for d in device_counts:
        mesh = mesh_lib.landmark_mesh(d)
        solve = dist_ba.make_dist_solver(mesh, cam, iters=iters)
        out = solve(prob)
        jax.block_until_ready(out[0])  # compile + warm
        t0 = time.perf_counter()
        for _ in range(repeats):
            out = solve(prob)
        jax.block_until_ready(out[0])
        dt = (time.perf_counter() - t0) / repeats / iters
        if base is None:
            base = dt
        rows.append({
            "devices": d,
            "ms_per_gn_iter": round(dt * 1e3, 3),
            "speedup": round(base / dt, 3),
            "efficiency": round(base / dt / d, 3),
        })
    return rows


if __name__ == "__main__":
    import json
    import sys

    L = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    for row in measure(L, W):
        print(json.dumps(row))
