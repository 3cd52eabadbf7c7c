"""Checkpoint / resume for the VO session.

The reference has NO persistence: poses live only in memory and are lost at
exit (SURVEY.md §5 "Checkpoint / resume: none"). Here the complete session
state — trajectory, map arrays, track table, FSM status — serializes to a
single compressed npz, and a Frontend can be restored mid-sequence and
continue tracking.
"""

from __future__ import annotations

import numpy as np


def save_frontend(fe, path: str) -> None:
    if hasattr(fe, "_pipe_flush"):
        # resolve the pipelined in-flight queue FIRST: at pipeline_depth=8
        # up to 7 dispatched frames are ahead of the resolved frontier, and
        # sync_host_state would otherwise mix the dispatched device frontier
        # (track_uv/track_valid) with resolved-frontier host state
        # (track_lm, last_pose, trajectory) — a corrupt snapshot
        fe._pipe_flush()
    if hasattr(fe, "finish"):
        fe.finish()  # drain in-flight backend BA: snapshot is consistent
    if hasattr(fe, "sync_host_state"):
        fe.sync_host_state()  # device-resident track table -> host mirrors
    m = fe.map
    np.savez_compressed(
        path,
        status=np.int32(fe.status.value),
        frame_id=np.int64(fe.frame_id),
        last_pose=fe.last_pose,
        rel_motion=fe.rel_motion,
        trajectory=np.stack(fe.trajectory) if fe.trajectory else
        np.zeros((0, 4, 4), np.float32),
        track_uv=fe.track_uv,
        track_lm=fe.track_lm,
        track_valid=fe.track_valid,
        n_resets=np.int32(fe.n_resets),
        # map store
        landmark_pos=m.landmark_pos[: m.n_landmarks],
        landmark_alive=m.landmark_alive[: m.n_landmarks],
        landmark_obs_count=m.landmark_obs_count[: m.n_landmarks],
        landmark_stamp=m.landmark_stamp[: m.n_landmarks],
        lm_free=np.asarray(m._free, np.int64),
        lm_stamp_counter=np.int64(m.lm_stamp_counter),
        kf_stamp_counter=np.int64(m.kf_stamp_counter),
        window_barrier=np.int64(m.window_barrier),
        kf_pose=m.kf_pose[: m.n_keyframes],
        kf_frame_id=m.kf_frame_id[: m.n_keyframes],
        kf_stamp=m.kf_stamp[: m.n_keyframes],
        kf_obs_uv=m.kf_obs_uv[: m.n_keyframes],
        kf_obs_lm=m.kf_obs_lm[: m.n_keyframes],
        kf_obs_valid=m.kf_obs_valid[: m.n_keyframes],
        kf_obs_stamp=m.kf_obs_stamp[: m.n_keyframes],
        # retirement archive (offline full-session refinement geometry)
        archive_stamps=(m.archive.arrays()[0] if m.archive
                        else np.zeros(0, np.int64)),
        archive_pos=(m.archive.arrays()[1].astype(np.float32) if m.archive
                     else np.zeros((0, 3), np.float32)),
        # last-frame context so LK/matching continue seamlessly on resume
        last_img=np.asarray(fe.last_img) if fe.last_img is not None
        else np.zeros((0, 0), np.uint8),
        # keyframe/anchor context (template-anchored tracking + wide-baseline
        # replenishment + keyframe policy state)
        track_anchor_uv=fe.track_anchor_uv,
        kf_ref_inliers=np.int32(fe._kf_ref_inliers),
        anchor_kf_pose=fe._kf_pose,
        anchor_kf_img=np.asarray(fe._kf_img) if fe._kf_img is not None
        else np.zeros((0, 0), np.uint8),
        anchor_kf_kp_uv=np.asarray(fe._kf_kp.uv) if fe._kf_kp is not None
        else np.zeros((0, 2), np.float32),
        anchor_kf_kp_score=np.asarray(fe._kf_kp.score)
        if fe._kf_kp is not None else np.zeros((0,), np.float32),
        anchor_kf_kp_mask=np.asarray(fe._kf_kp.mask)
        if fe._kf_kp is not None else np.zeros((0,), bool),
        anchor_kf_desc=np.asarray(fe._kf_desc) if fe._kf_desc is not None
        else np.zeros((0, 8), np.uint32),
        last_kp_uv=np.asarray(fe.last_kp.uv) if fe.last_kp is not None
        else np.zeros((0, 2), np.float32),
        last_kp_score=np.asarray(fe.last_kp.score) if fe.last_kp is not None
        else np.zeros((0,), np.float32),
        last_kp_mask=np.asarray(fe.last_kp.mask) if fe.last_kp is not None
        else np.zeros((0,), bool),
        last_desc=np.asarray(fe.last_desc) if fe.last_desc is not None
        else np.zeros((0, 8), np.uint32),
    )


def load_frontend(fe, path: str) -> None:
    """Restore state saved by `save_frontend` into a freshly-constructed
    Frontend (same config)."""
    from ya_vo_tpu.tracking.frontend import VOStatus

    z = np.load(path)
    fe.status = VOStatus(int(z["status"]))
    fe.frame_id = int(z["frame_id"])
    fe.last_pose = z["last_pose"].astype(np.float32)
    fe.rel_motion = z["rel_motion"].astype(np.float32)
    fe.trajectory = [p for p in z["trajectory"]]
    fe.track_uv[:] = z["track_uv"]
    fe.track_lm[:] = z["track_lm"]
    fe.track_valid[:] = z["track_valid"]
    fe.n_resets = int(z["n_resets"])

    m = fe.map
    nl = len(z["landmark_pos"])
    nk = len(z["kf_pose"])
    m.n_landmarks = nl
    m.landmark_pos[:nl] = z["landmark_pos"]
    m.landmark_alive[:] = False
    m.landmark_alive[:nl] = z["landmark_alive"]
    m.landmark_obs_count[:nl] = z["landmark_obs_count"]
    m.n_keyframes = nk
    m.kf_pose[:nk] = z["kf_pose"]
    m.kf_frame_id[:nk] = z["kf_frame_id"]
    m.kf_valid[:] = False
    m.kf_valid[:nk] = True
    m.kf_obs_uv[:nk] = z["kf_obs_uv"]
    m.kf_obs_lm[:nk] = z["kf_obs_lm"]
    m.kf_obs_valid[:nk] = z["kf_obs_valid"]
    if "kf_obs_stamp" in z:          # round-5 checkpoints
        m.kf_obs_stamp[:nk] = z["kf_obs_stamp"]
        from ya_vo_tpu.worldmap.mapstore import ArchiveStore
        arch = ArchiveStore(max(len(z["archive_stamps"]), 4) * 2)
        if len(z["archive_stamps"]):
            arch.update_bulk(z["archive_stamps"], z["archive_pos"])
        m.archive = arch
    if "landmark_stamp" in z:       # lifecycle state (round-2 checkpoints)
        m.landmark_stamp[:nl] = z["landmark_stamp"]
        m._free = [int(i) for i in z["lm_free"]]
        m.lm_stamp_counter = int(z["lm_stamp_counter"])
        m.kf_stamp_counter = int(z["kf_stamp_counter"])
        m.kf_stamp[:nk] = z["kf_stamp"]
    else:
        m.landmark_stamp[:nl] = np.arange(nl)
        m._free = []
        m.lm_stamp_counter = nl
        m.kf_stamp_counter = nk
        m.kf_stamp[:nk] = np.arange(nk)
    # scale-break fence: without restoring it, a session resumed from a
    # checkpoint taken after a bootstrap reset could again solve a BA
    # window straddling the break (round-3 advisor). 0 for old checkpoints.
    m.window_barrier = int(z["window_barrier"]) if "window_barrier" in z \
        else 0

    if z["last_img"].size:
        import jax.numpy as jnp
        from ya_vo_tpu.features.fast import Keypoints

        fe.last_img = jnp.asarray(z["last_img"])
        fe.last_kp = Keypoints(
            uv=jnp.asarray(z["last_kp_uv"]),
            score=jnp.asarray(z["last_kp_score"]),
            mask=jnp.asarray(z["last_kp_mask"]),
        )
        fe.last_desc = jnp.asarray(z["last_desc"])

    # keyframe/anchor context (absent in old checkpoints -> safe fallbacks)
    if "track_anchor_uv" in z:
        import jax.numpy as jnp
        from ya_vo_tpu.features.fast import Keypoints

        fe.track_anchor_uv = z["track_anchor_uv"].copy()
        fe._kf_ref_inliers = int(z["kf_ref_inliers"])
        fe._kf_pose = z["anchor_kf_pose"].astype(np.float32)
        if z["anchor_kf_img"].size:
            fe._kf_img = jnp.asarray(z["anchor_kf_img"])
        if z["anchor_kf_desc"].size:
            fe._kf_kp = Keypoints(
                uv=jnp.asarray(z["anchor_kf_kp_uv"]),
                score=jnp.asarray(z["anchor_kf_kp_score"]),
                mask=jnp.asarray(z["anchor_kf_kp_mask"]),
            )
            fe._kf_desc = jnp.asarray(z["anchor_kf_desc"])
    else:
        fe.track_anchor_uv = fe.track_uv.copy()

    # rebuild the device-resident tracking state from the restored mirrors
    if hasattr(fe, "_push_state_to_device"):
        fe._push_state_to_device()
