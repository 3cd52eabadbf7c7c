"""Trajectory evaluation: ATE / RPE against ground truth.

The reference never implemented evaluation ("Add full Kitti sequences
results" is an open to-do, reference README.md:5); the only check was
eyeballing the Pangolin trajectory (misc/kitti01.png). This module provides
the standard metrics: absolute trajectory error after SE(3) (optionally
Sim(3), for monocular scale) alignment, and relative pose error over fixed
frame deltas.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def umeyama_alignment(
    src: np.ndarray, dst: np.ndarray, with_scale: bool = True
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Least-squares similarity transform aligning src -> dst ([N, 3] each).
    Returns (R, t, s) with dst ~ s * R @ src + t."""
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var_s = (xs ** 2).sum() / len(src)
        s = float(np.trace(np.diag(D) @ S) / max(var_s, 1e-12))
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return R, t, s


def positions_from_poses(poses_wc: np.ndarray) -> np.ndarray:
    """World->camera poses [N, 4, 4] -> camera centers [N, 3]
    (c = -R^T t)."""
    R = poses_wc[:, :3, :3]
    t = poses_wc[:, :3, 3]
    return -np.einsum("nij,ni->nj", R, t)


def ate_rmse(
    est_wc: np.ndarray, gt_cw: np.ndarray, with_scale: bool = True
) -> float:
    """ATE RMSE (meters) between estimated world->camera poses and KITTI
    ground truth camera->world poses, after (Sim(3) if with_scale) alignment."""
    est_pos = positions_from_poses(est_wc)
    gt_pos = gt_cw[:, :3, 3]
    n = min(len(est_pos), len(gt_pos))
    est_pos, gt_pos = est_pos[:n], gt_pos[:n]
    R, t, s = umeyama_alignment(est_pos, gt_pos, with_scale)
    aligned = (s * (R @ est_pos.T)).T + t
    return float(np.sqrt(np.mean(np.sum((aligned - gt_pos) ** 2, axis=-1))))


def rpe(
    est_wc: np.ndarray, gt_cw: np.ndarray, delta: int = 1
) -> Tuple[float, float]:
    """Relative pose error over `delta` frames.
    Returns (trans RMSE meters, rot RMSE degrees)."""
    n = min(len(est_wc), len(gt_cw))
    est_cw = np.linalg.inv(est_wc[:n])
    gt = gt_cw[:n]
    dts, drs = [], []
    for i in range(n - delta):
        rel_est = np.linalg.inv(est_cw[i]) @ est_cw[i + delta]
        rel_gt = np.linalg.inv(gt[i]) @ gt[i + delta]
        err = np.linalg.inv(rel_gt) @ rel_est
        dts.append(np.linalg.norm(err[:3, 3]))
        c = np.clip((np.trace(err[:3, :3]) - 1) / 2, -1, 1)
        drs.append(np.degrees(np.arccos(c)))
    return (
        float(np.sqrt(np.mean(np.square(dts)))),
        float(np.sqrt(np.mean(np.square(drs)))),
    )
