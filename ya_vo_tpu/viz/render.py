"""Static trajectory / map rendering.

Covers the observable output of the reference's Pangolin viewer (reference:
src/viz.cc — camera frustum trail + sparse landmark cloud, see
misc/kitti01.png and misc/mapping.png) without an interactive GL window:
matplotlib top-down (x-z) renders of the estimated trajectory, optional
ground truth overlay, and the landmark cloud. Headless-safe (Agg).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def plot_trajectory(
    est_wc: np.ndarray,
    gt_cw: Optional[np.ndarray] = None,
    landmarks: Optional[np.ndarray] = None,
    out_path: str = "trajectory.png",
    title: str = "trajectory (top-down)",
) -> str:
    """Render top-down trajectory; returns out_path."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ya_vo_tpu.viz.evaluation import positions_from_poses

    fig, ax = plt.subplots(figsize=(8, 8))
    pos = positions_from_poses(np.asarray(est_wc))
    ax.plot(pos[:, 0], pos[:, 2], "-", lw=1.5, label="estimate")
    ax.plot(pos[0, 0], pos[0, 2], "o", ms=6)
    if gt_cw is not None:
        g = np.asarray(gt_cw)[:, :3, 3]
        ax.plot(g[:, 0], g[:, 2], "--", lw=1.0, label="ground truth")
    if landmarks is not None and len(landmarks):
        lm = np.asarray(landmarks)
        ax.scatter(lm[:, 0], lm[:, 2], s=1, alpha=0.25, label="landmarks")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_title(title)
    ax.axis("equal")
    ax.legend(loc="best")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def draw_keypoints(img: np.ndarray, uv: np.ndarray,
                   out_path: str = "keypoints.png") -> str:
    """Debug overlay of detected keypoints on a frame (the reference's
    cv::imshow feature overlay, src/viz.cc:81-94 / putPixel debug path)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(12, 4))
    ax.imshow(img, cmap="gray")
    if len(uv):
        ax.scatter(uv[:, 0], uv[:, 1], s=6, c="lime", marker="+")
    ax.set_axis_off()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path
