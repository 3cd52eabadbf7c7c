"""Unit tests for the async-BA apply gates in Frontend._apply_ba_result:
staleness discard + slow-host backoff (round-2 advisor finding: a host
whose solves outlive max_stale_keyframes discarded EVERY result and
silently never applied refinement) and the divergence gate's running-median
step reference (the instantaneous step collapses to ~0 when the camera is
stationary, discarding healthy corrections exactly while stopped)."""

import dataclasses

import numpy as np
import pytest

from ya_vo_tpu.config import VOConfig, BAConfig
from ya_vo_tpu.tracking.frontend import Frontend
from ya_vo_tpu.utils import synthetic


@pytest.fixture()
def fe():
    cfg = VOConfig(ba=BAConfig(asynchronous=False, distributed="off"))
    fe = Frontend(cfg, synthetic.kitti_camera())
    # a tiny map window so _apply_ba_result has something to write into
    lms = synthetic.random_landmarks(32, seed=0)
    ids = fe.map.add_landmarks(lms, np.ones(32, bool))
    poses = synthetic.forward_trajectory(3, step=0.5)
    O = fe.map.max_obs_per_kf
    for w in range(3):
        uv = np.zeros((O, 2), np.float32)
        lm = np.full(O, -1, np.int32)
        ok = np.zeros(O, bool)
        lm[:32] = ids
        ok[:32] = True
        fe.map.insert_keyframe(w, poses[w], uv, lm, ok)
    fe.last_pose = poses[-1].copy()
    return fe


def _apply(fe, *, n_stale_extra=0, corr_t=0.0):
    """Drive one _apply_ba_result with a snapshot `n_stale_extra` keyframes
    stale and a translation-only correction of norm `corr_t`."""
    slots = np.array([0, 1, 2])
    used = np.arange(32)
    anchor_old = fe.map.kf_pose[2].copy()
    new_poses = fe.map.kf_pose[:3].copy()
    new_poses[2][:3, 3] += [corr_t, 0, 0]
    new_lms = fe.map.landmark_pos[used].copy()
    kf_stamp_snap = fe.map.kf_stamp_counter - n_stale_extra
    lm_stamp_snap = fe.map.lm_stamp_counter
    before = fe.n_ba_runs
    fe._apply_ba_result(new_poses, new_lms, slots, used, 3, anchor_old,
                        1.0, kf_stamp_snap=kf_stamp_snap,
                        lm_stamp_snap=lm_stamp_snap)
    return fe.n_ba_runs > before  # applied?


def test_fresh_result_applies(fe):
    assert _apply(fe)
    assert fe.n_ba_discarded == 0


def test_stale_result_discarded(fe):
    limit = fe.cfg.ba.max_stale_keyframes
    assert not _apply(fe, n_stale_extra=limit + 1)
    assert fe.n_ba_discarded == 1


def test_slow_host_backoff_widens_staleness_window(fe):
    """Three consecutive staleness discards must WIDEN the window so the
    next equally-stale result applies (late refinement beats none)."""
    limit = fe.cfg.ba.max_stale_keyframes
    for _ in range(3):
        assert not _apply(fe, n_stale_extra=limit + 1)
    assert fe._stale_relax > 0
    # same staleness now inside the widened window -> applies
    assert _apply(fe, n_stale_extra=limit + 1)


def test_applied_results_shrink_the_relaxation(fe):
    fe._stale_relax = 3
    assert _apply(fe)
    assert fe._stale_relax == 2


def test_divergence_gate_uses_median_step_when_stationary(fe):
    """Camera stopped (instantaneous step ~0) but recent median step 0.5:
    a half-step correction is healthy drift and must still apply."""
    fe.rel_motion = np.eye(4, dtype=np.float32)  # stationary NOW
    fe._recent_steps.extend([0.5] * 10)          # ...but was moving
    ok = _apply(fe, corr_t=0.25 * fe.cfg.ba.max_correction_steps)
    assert ok, "healthy correction discarded while stationary"


def test_divergence_gate_still_rejects_teleports(fe):
    fe.rel_motion = np.eye(4, dtype=np.float32)
    fe._recent_steps.extend([0.5] * 10)
    ok = _apply(fe, corr_t=10.0 * fe.cfg.ba.max_correction_steps)
    assert not ok
    assert fe.n_ba_discarded == 1
