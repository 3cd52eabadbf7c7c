"""Map lifecycle: landmark slot recycling, keyframe eviction, and long-run
survival under bounded capacity.

The reference recycles landmarks implicitly through shared_ptr/weak_ptr
expiry (reference: include/MapPoint.hpp:10-28) and never bounds keyframes;
round 1's MapStore was append-only and silently returned -1 at capacity.
These tests pin the explicit lifecycle that full-length sequences (KITTI 00
= 4,541 frames) require.
"""

from __future__ import annotations

import numpy as np

from ya_vo_tpu.worldmap.mapstore import MapStore


def _pts(n, seed=0):
    return np.random.default_rng(seed).normal(size=(n, 3)).astype(np.float32)


def test_recycle_reuses_dead_slots_and_scrubs_observations():
    m = MapStore(max_landmarks=64, max_keyframes=8, max_obs_per_kf=32)
    idx = m.add_landmarks(_pts(40), np.ones(40, bool))
    assert (idx >= 0).all() and m.n_landmarks == 40

    # keyframe observing landmarks 0..9
    obs_lm = np.full(32, -1, np.int32)
    obs_lm[:10] = idx[:10]
    k = m.insert_keyframe(0, np.eye(4), np.zeros((32, 2)), obs_lm,
                          obs_lm >= 0)
    assert m.kf_obs_valid[k, :10].all()

    # kill 0..9 and recycle; their keyframe obs must be scrubbed
    m.kill_landmarks(idx[:10])
    n = m.recycle_dead()
    assert n == 10
    assert not m.kf_obs_valid[k, :10].any()

    # new landmarks reuse the freed slots (no high-water growth)
    idx2 = m.add_landmarks(_pts(10, 1), np.ones(10, bool))
    assert (idx2 >= 0).all()
    assert m.n_landmarks == 40
    assert set(idx2.tolist()) == set(idx[:10].tolist())
    # stamps distinguish the new tenants from the old ones
    assert (m.landmark_stamp[idx2] >= 40).all()


def test_recycle_respects_protected_slots():
    m = MapStore(max_landmarks=16, max_keyframes=4, max_obs_per_kf=8)
    idx = m.add_landmarks(_pts(8), np.ones(8, bool))
    m.kill_landmarks(idx[:4])
    n = m.recycle_dead(protected=idx[:2])
    assert n == 2  # slots 2,3 reclaimed; 0,1 protected
    assert set(m._free) == {2, 3}


def test_capacity_exhaustion_is_loud_not_silent(caplog):
    import logging

    m = MapStore(max_landmarks=8, max_keyframes=4, max_obs_per_kf=8)
    with caplog.at_level(logging.WARNING, logger="ya_vo_tpu.map"):
        idx = m.add_landmarks(_pts(12), np.ones(12, bool))
    assert (idx >= 0).sum() == 8 and (idx < 0).sum() == 4
    assert m.n_dropped_landmarks == 4
    assert any("capacity exhausted" in r.message for r in caplog.records)


def test_retire_out_of_window_frees_unreachable_landmarks():
    """Landmarks observed only by keyframes that left the BA window (and
    not in the live track table) must be retired on capacity pressure —
    the append-only alternative fills a 16k map after ~55 keyframes and
    starves replenishment for the rest of a full-length sequence."""
    m = MapStore(max_landmarks=64, max_keyframes=8, max_obs_per_kf=8)
    idx = m.add_landmarks(_pts(16), np.ones(16, bool))
    for k in range(4):
        obs_lm = np.full(8, -1, np.int32)
        obs_lm[:4] = idx[4 * k: 4 * k + 4]
        m.insert_keyframe(k, np.eye(4), np.zeros((8, 2)), obs_lm,
                          obs_lm >= 0)

    # window = last 2 keyframes -> landmarks 0..7 are unreachable, except
    # the protected one (live track table)
    n = m.retire_out_of_window(2, protected=idx[0:1])
    assert n == 7
    assert m.landmark_alive[idx[0]]              # protected
    assert not m.landmark_alive[idx[1:8]].any()  # retired
    assert m.landmark_alive[idx[8:]].all()       # still in window
    assert m.stats()["n_retired"] == 7

    # after recycle, the slots are reusable and old obs are scrubbed
    m.recycle_dead()
    assert not m.kf_obs_valid[0, 1:4].any()
    idx2 = m.add_landmarks(_pts(7, 2), np.ones(7, bool))
    assert (idx2 >= 0).all() and m.n_landmarks == 16


def test_retire_wave_is_chunked_oldest_first():
    """A retirement wave is capped at `max_per_wave` slots, oldest
    creation stamps first — a single >10k-slot wave was measured (round 5,
    longrun route on the chip) to churn the live table into a reset
    cascade; chunking spreads the pressure relief across keyframes."""
    m = MapStore(max_landmarks=64, max_keyframes=8, max_obs_per_kf=8)
    idx = m.add_landmarks(_pts(20), np.ones(20, bool))
    # one keyframe observing only the LAST 4 -> the first 16 are
    # out-of-window candidates
    obs_lm = np.full(8, -1, np.int32)
    obs_lm[:4] = idx[16:20]
    m.insert_keyframe(0, np.eye(4), np.zeros((8, 2)), obs_lm, obs_lm >= 0)

    n = m.retire_out_of_window(1, max_per_wave=6)
    assert n == 6, f"wave not capped: {n}"
    # oldest stamps (== lowest, creation order) went first
    assert not m.landmark_alive[idx[:6]].any()
    assert m.landmark_alive[idx[6:16]].all()
    # the rest drains on subsequent waves
    n2 = m.retire_out_of_window(1, max_per_wave=6)
    n3 = m.retire_out_of_window(1, max_per_wave=6)
    assert n2 == 6 and n3 == 4
    assert not m.landmark_alive[idx[:16]].any()
    assert m.landmark_alive[idx[16:20]].all()


def test_keyframe_eviction_shifts_and_orphans():
    m = MapStore(max_landmarks=64, max_keyframes=4, max_obs_per_kf=8)
    idx = m.add_landmarks(_pts(12), np.ones(12, bool))
    for k in range(4):
        obs_lm = np.full(8, -1, np.int32)
        obs_lm[:3] = idx[3 * k: 3 * k + 3]
        m.insert_keyframe(k, np.eye(4), np.zeros((8, 2)), obs_lm, obs_lm >= 0)
    assert m.n_keyframes == 4

    ev = m.evict_oldest_keyframes(2, protected_landmarks=idx[0:1])
    assert ev == 2
    assert m.n_keyframes == 2
    # remaining keyframes are the two newest, shifted down
    assert list(m.kf_frame_id[:2]) == [2, 3]
    # landmarks observed ONLY by evicted keyframes die, protected survive
    assert m.landmark_alive[idx[0]]          # protected
    assert not m.landmark_alive[idx[1]]      # orphaned
    assert not m.landmark_alive[idx[5]]
    assert m.landmark_alive[idx[6]]          # still observed by kf 2
    assert m.n_evicted_keyframes == 2
    # eviction then insert works again
    k = m.insert_keyframe(9, np.eye(4))
    assert k == 2


def test_long_textured_run_with_tiny_map_survives():
    """80 photoreal frames through a map 8x smaller than default: eviction
    + recycling must BOTH trigger, nothing may be silently dropped, and
    tracking must hold with zero resets and small ATE."""
    from ya_vo_tpu.config import MapConfig, VOConfig
    from ya_vo_tpu.tracking.frontend import Frontend
    from ya_vo_tpu.utils.scene import TexturedSequence
    from ya_vo_tpu.viz.evaluation import ate_rmse

    import dataclasses

    from ya_vo_tpu.config import BAConfig

    # sync BA: lifecycle assertions must be deterministic on any host speed
    # (async applies land at wall-clock-dependent frames)
    cfg = VOConfig(map=MapConfig(max_landmarks=2048, max_keyframes=16,
                                 window_size=8),
                   ba=BAConfig(asynchronous=False))
    seq = TexturedSequence(n_frames=80, seed=4)
    fe = Frontend(cfg, seq.cam)
    est = fe.run(seq, pipelined=True)
    fe.finish()
    stats = fe.map.stats()
    assert fe.n_resets == 0, f"resets under tiny map: {fe.n_resets}"
    assert stats["n_evicted_keyframes"] > 0, "eviction never triggered"
    assert stats["n_recycled"] > 0, "recycling never triggered"
    assert stats["n_dropped_landmarks"] == 0, "silent landmark drops"
    ate = ate_rmse(est, np.linalg.inv(seq.poses))
    assert ate < 0.15, f"ATE {ate:.3f} m under map-lifecycle pressure"
