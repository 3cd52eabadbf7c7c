"""Scale-aware trajectory evaluation (round-1 VERDICT weak #4 / item 8).

The reference never evaluated at all ("Add full Kitti sequences results" is
an open to-do, reference README.md:5). These tests pin the semantics of the
monocular-aware metrics on trajectories with KNOWN injected errors: a
global scale offset (which Sim(3) ATE must hide and SE(3) ATE must show),
a mid-route scale jump (which scale_drift must catch), and accumulating
translation noise (which the KITTI segment metric must price per meter).
"""

import numpy as np
import pytest

from ya_vo_tpu.viz import evaluation


def _route_cw(n=400, step=0.5, yaw_rate=0.004):
    """Ground-truth camera->world poses along a gently curving route."""
    poses = np.zeros((n, 4, 4))
    yaw = np.cumsum(np.full(n, yaw_rate))
    pos = np.cumsum(
        np.stack([np.sin(yaw), np.zeros(n), np.cos(yaw)], -1) * step, axis=0)
    for i in range(n):
        c, s = np.cos(yaw[i]), np.sin(yaw[i])
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        poses[i, :3, :3] = R
        poses[i, :3, 3] = pos[i]
        poses[i, 3, 3] = 1.0
    return poses


def _to_wc(poses_cw, scale=1.0):
    """World->camera estimates from cw ground truth, translations scaled."""
    p = poses_cw.copy()
    p[:, :3, 3] *= scale
    return np.linalg.inv(p)


class TestSim3Scale:
    def test_recovers_injected_scale(self):
        gt = _route_cw()
        est = _to_wc(gt, scale=0.25)  # estimate runs at 1/4 metric scale
        s = evaluation.sim3_scale(est, gt)
        assert s == pytest.approx(4.0, rel=1e-6)

    def test_ate_se3_shows_what_sim3_hides(self):
        gt = _route_cw()
        est = _to_wc(gt, scale=0.5)
        assert evaluation.ate_rmse(est, gt, with_scale=True) < 1e-6
        assert evaluation.ate_rmse(est, gt, with_scale=False) > 1.0


class TestRpeScaleAligned:
    def test_scaled_copy_has_zero_rpe(self):
        gt = _route_cw()
        est = _to_wc(gt, scale=0.3)
        t, r = evaluation.rpe(est, gt, delta=5)
        assert t < 1e-6 and r < 1e-6

    def test_unaligned_rpe_sees_the_bootstrap_unit(self):
        gt = _route_cw()
        est = _to_wc(gt, scale=0.3)
        t, _ = evaluation.rpe(est, gt, delta=5, align_scale=False)
        assert t > 1.0  # 0.7 * 2.5m step * sqrt stuff — clearly nonzero


class TestScaleDrift:
    def test_consistent_scale_is_zero_drift(self):
        gt = _route_cw()
        est = _to_wc(gt, scale=0.3)
        d = evaluation.scale_drift(est, gt)
        assert d["n_pairs"] > 0
        assert d["rms_log"] < 1e-6

    def test_mid_route_scale_jump_is_caught(self):
        gt = _route_cw(n=400)
        p = gt.copy()
        # second half walks at half the step length: a reset-style scale break
        steps = np.diff(p[:, :3, 3], axis=0)
        steps[200:] *= 0.5
        p[1:, :3, 3] = p[0, :3, 3] + np.cumsum(steps, axis=0)
        est = np.linalg.inv(p)
        d = evaluation.scale_drift(est, gt)
        # both halves sit ~ +/- 30% off the compromise global scale
        assert d["rms_log"] > 0.2
        assert d["max_abs_log"] > 0.2

    def test_standstill_pairs_are_skipped(self):
        gt = np.tile(np.eye(4), (50, 1, 1))
        d = evaluation.scale_drift(np.linalg.inv(gt), gt)
        assert d["n_pairs"] == 0 and d["rms_log"] == 0.0


class TestKittiSegments:
    def test_perfect_trajectory_scores_zero(self):
        gt = _route_cw(n=600)  # ~300 m of path
        est = _to_wc(gt, scale=2.0)
        t_pct, r_dpm, n = evaluation.kitti_segment_errors(
            est, gt, lengths=(100.0, 200.0))
        assert n > 0
        assert t_pct == pytest.approx(0.0, abs=1e-6)
        assert r_dpm == pytest.approx(0.0, abs=1e-9)

    def test_route_shorter_than_segments_reports_none(self):
        gt = _route_cw(n=50)  # 25 m
        t_pct, _, n = evaluation.kitti_segment_errors(
            _to_wc(gt), gt, lengths=(100.0,))
        assert n == 0 and np.isnan(t_pct)

    def test_noise_prices_in(self):
        rng = np.random.default_rng(3)
        gt = _route_cw(n=600)
        p = gt.copy()
        # 2% per-step translation noise, accumulated
        steps = np.diff(p[:, :3, 3], axis=0)
        steps += rng.normal(scale=0.02 * np.linalg.norm(steps, axis=-1,
                                                        keepdims=True),
                            size=steps.shape)
        p[1:, :3, 3] = p[0, :3, 3] + np.cumsum(steps, axis=0)
        t_pct, _, n = evaluation.kitti_segment_errors(
            np.linalg.inv(p), gt, lengths=(100.0, 200.0))
        assert n > 0
        assert 0.01 < t_pct < 10.0
