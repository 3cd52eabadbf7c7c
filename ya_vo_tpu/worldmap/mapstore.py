"""World-model store: fixed-capacity masked arrays instead of pointer graphs.

The reference's world model is a shared_ptr/weak_ptr object graph —
`Map` holds id->Frame / id->MapPoint hash maps under mutexes (reference:
include/Map.hpp:9-36), landmarks keep observation lists (include/
MapPoint.hpp:10-28), features weak-link frames to landmarks
(include/Feature.hpp:9-22). None of that maps to a TPU. Here the map is a
struct of preallocated numpy arrays on the host (SURVEY.md §7.1 "arrays,
not objects"): landmark slots with alive masks, keyframe pose slots, and
integer index links. Device stages receive flat array views; the store
itself does only O(1) bookkeeping per insert, so host Python is never on
the hot path.

The active/passive split the reference scaffolds but never uses
(include/Map.hpp:29-34, `resetActive` never called) is realized here as
`active_window()` for the sliding-window BA.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class MapStore:
    """Fixed-capacity landmark + keyframe store with observation links."""

    def __init__(self, max_landmarks: int = 16384, max_keyframes: int = 512,
                 max_obs_per_kf: int = 2048):
        self.max_landmarks = max_landmarks
        self.max_keyframes = max_keyframes
        self.max_obs_per_kf = max_obs_per_kf

        self.landmark_pos = np.zeros((max_landmarks, 3), np.float32)
        self.landmark_alive = np.zeros(max_landmarks, bool)
        self.landmark_obs_count = np.zeros(max_landmarks, np.int32)
        self.n_landmarks = 0  # high-water mark (slots are append-only)

        self.kf_pose = np.tile(np.eye(4, dtype=np.float32),
                               (max_keyframes, 1, 1))
        self.kf_frame_id = np.full(max_keyframes, -1, np.int64)
        self.kf_valid = np.zeros(max_keyframes, bool)
        self.n_keyframes = 0

        # per-keyframe observations: pixel + landmark link (-1 = none)
        self.kf_obs_uv = np.zeros((max_keyframes, max_obs_per_kf, 2),
                                  np.float32)
        self.kf_obs_lm = np.full((max_keyframes, max_obs_per_kf), -1,
                                 np.int32)
        self.kf_obs_valid = np.zeros((max_keyframes, max_obs_per_kf), bool)

    # -- landmarks --------------------------------------------------------
    def add_landmarks(self, positions: np.ndarray, mask: np.ndarray) -> np.ndarray:
        """Append `positions[mask]` as new landmarks.

        Returns an int32 array shaped like `mask` with the assigned landmark
        index per input row (-1 where masked off or capacity exhausted).
        """
        positions = np.asarray(positions, np.float32)
        mask = np.asarray(mask, bool)
        idx_out = np.full(mask.shape[0], -1, np.int32)
        sel = np.nonzero(mask)[0]
        space = self.max_landmarks - self.n_landmarks
        if space <= 0 or sel.size == 0:
            return idx_out
        sel = sel[:space]
        slots = np.arange(self.n_landmarks, self.n_landmarks + sel.size)
        self.landmark_pos[slots] = positions[sel]
        self.landmark_alive[slots] = True
        self.landmark_obs_count[slots] = 0
        idx_out[sel] = slots.astype(np.int32)
        self.n_landmarks += sel.size
        return idx_out

    def kill_landmarks(self, indices: np.ndarray) -> None:
        """Mark landmarks dead (reference drops outlier map points by
        resetting the feature's weak_ptr, src/LoopHandler.cc:850-855)."""
        indices = np.asarray(indices)
        valid = indices[(indices >= 0) & (indices < self.max_landmarks)]
        self.landmark_alive[valid] = False

    def update_landmark_positions(self, indices: np.ndarray,
                                  positions: np.ndarray) -> None:
        ok = indices >= 0
        self.landmark_pos[indices[ok]] = positions[ok]

    # -- keyframes --------------------------------------------------------
    def insert_keyframe(
        self, frame_id: int, pose_wc: np.ndarray,
        obs_uv: Optional[np.ndarray] = None,
        obs_lm: Optional[np.ndarray] = None,
        obs_valid: Optional[np.ndarray] = None,
    ) -> int:
        """Insert a keyframe (reference Map::insertKeyFrame, src/Map.cc:9-23).
        Returns the keyframe slot, or -1 when capacity is exhausted."""
        if self.n_keyframes >= self.max_keyframes:
            return -1
        k = self.n_keyframes
        self.kf_pose[k] = np.asarray(pose_wc, np.float32)
        self.kf_frame_id[k] = frame_id
        self.kf_valid[k] = True
        if obs_uv is not None:
            n = min(len(obs_uv), self.max_obs_per_kf)
            self.kf_obs_uv[k, :n] = obs_uv[:n]
            self.kf_obs_lm[k, :n] = obs_lm[:n]
            ov = obs_valid[:n] if obs_valid is not None else np.ones(n, bool)
            self.kf_obs_valid[k, :n] = ov & (self.kf_obs_lm[k, :n] >= 0)
            if obs_lm is not None:
                linked = self.kf_obs_lm[k, :n][self.kf_obs_valid[k, :n]]
                np.add.at(self.landmark_obs_count, linked, 1)
        self.n_keyframes += 1
        return k

    def update_keyframe_poses(self, kf_indices: np.ndarray,
                              poses: np.ndarray) -> None:
        self.kf_pose[kf_indices] = poses

    # -- views ------------------------------------------------------------
    def alive_landmarks(self):
        """(positions [n, 3], indices [n]) of live landmarks."""
        idx = np.nonzero(self.landmark_alive[: self.n_landmarks])[0]
        return self.landmark_pos[idx], idx

    def active_window(self, window: int):
        """Last `window` keyframes: (kf_slots, poses, obs_uv, obs_lm, obs_valid)
        — the input to sliding-window BA."""
        k0 = max(0, self.n_keyframes - window)
        sl = slice(k0, self.n_keyframes)
        slots = np.arange(k0, self.n_keyframes)
        return (
            slots,
            self.kf_pose[sl],
            self.kf_obs_uv[sl],
            self.kf_obs_lm[sl],
            self.kf_obs_valid[sl],
        )

    def stats(self) -> dict:
        return {
            "n_landmarks": int(self.n_landmarks),
            "n_alive": int(self.landmark_alive.sum()),
            "n_keyframes": int(self.n_keyframes),
        }
