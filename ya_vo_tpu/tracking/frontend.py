"""Pipeline runtime: the INIT / TRACKING / RESET state machine.

This is the TPU-native `LoopHandler` (reference: include/LoopHandler.hpp:27-89,
src/LoopHandler.cc). The control flow stays host-side Python over a handful
of device scalars (SURVEY.md §7.1 "host FSM, device math"); every heavy
arrow of the reference call stacks (SURVEY.md §3.2-3.4) is one jitted stage:

  reference                               here
  ------------------------------------   -----------------------------------
  insertFrameFeatures (FAST+BRIEF,        extract(): one jit fusing detect +
    LoopHandler.cc:468-485)                 blur + describe
  buildInitMap (match,F-RANSAC,E,         initialize(): matching.match +
    recoverPose, triangulate2View,          ransac.estimate_two_view (incl.
    LoopHandler.cc:532-652)                 cheirality triangulation)
  track/trackLastFrame (projection-       track_step(): project seeds ->
    seeded PyrLK, LoopHandler.cc:306-449)   lk.track -> pose_solver.solve_pose
  optimizePoseOnly (g2o LM,
    LoopHandler.cc:730-861)
  reinitialize (LoopHandler.cc:168-296)   reinitialize(): same recipe as
                                            initialize, chained on last pose
  Map/MapPoint bookkeeping                MapStore masked arrays

Gates match the reference: >= min_flow_inliers tracked features
(LoopHandler.cc:144), >= min_ba_inliers pose-BA inliers (LoopHandler.cc:151),
else RESET -> reinitialize.
"""

from __future__ import annotations

import enum
import logging
import time
from collections import deque
from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ya_vo_tpu.config import VOConfig
from ya_vo_tpu.core import lie
from ya_vo_tpu.core.camera import Camera
from ya_vo_tpu.features import brief, fast, matching
from ya_vo_tpu.geometry import ransac
from ya_vo_tpu.tracking import lk, pose_solver
from ya_vo_tpu.worldmap.mapstore import MapStore


_log = logging.getLogger("ya_vo_tpu.frontend")


class VOStatus(enum.Enum):
    """reference: enum voStatus {INIT, TRACKING, ERROR, RESET}
    (include/LoopHandler.hpp:25)."""

    INIT = 0
    TRACKING = 1
    RESET = 2


@dataclass
class FrameResult:
    frame_id: int
    status: str
    pose_wc: np.ndarray
    n_keypoints: int = 0
    n_matches: int = 0
    n_flow_inliers: int = 0
    n_ba_inliers: int = 0
    n_new_landmarks: int = 0
    is_keyframe: bool = False
    reset: bool = False
    timings_ms: dict = field(default_factory=dict)


class Frontend:
    def __init__(self, config: VOConfig, cam: Camera):
        if config.camera_type != "mono":
            # the reference's stereo flag is vestigial (right-image path
            # handling dead, reference src/LoopHandler.cc:17-24); reject
            # explicitly instead of silently tracking mono
            raise ValueError(
                f"camera_type={config.camera_type!r} unsupported: this "
                f"pipeline is monocular (like the reference's live path)")
        self.cfg = config
        self.cam = cam
        self.K = jnp.asarray(np.asarray(cam.K), jnp.float32)
        self.map = MapStore(
            max_landmarks=config.map.max_landmarks,
            max_keyframes=config.map.max_keyframes,
            max_obs_per_kf=config.features.max_keypoints,
        )
        self.status = VOStatus.INIT
        self.frame_id = -1
        self._rng = jax.random.PRNGKey(config.ransac.seed)

        fc = config.features
        self._offsets = brief.make_offsets(
            fc.brief_n_bits, fc.brief_patch_radius, fc.brief_seed)

        # per-frame state (previous frame)
        self.last_img: Optional[jnp.ndarray] = None
        self.last_kp = None          # Keypoints
        self.last_desc = None        # [K, 8] uint32
        self.last_pose = np.eye(4, dtype=np.float32)   # world->camera
        self.rel_motion = np.eye(4, dtype=np.float32)  # T_curr = rel @ T_last
        # track table: tracked pixels in LAST frame linked to landmarks
        K_cap = fc.max_keypoints
        self.track_uv = np.zeros((K_cap, 2), np.float32)
        self.track_lm = np.full(K_cap, -1, np.int32)
        self.track_valid = np.zeros(K_cap, bool)

        self.trajectory: List[np.ndarray] = []
        self.results: List[FrameResult] = []
        # per-frame callbacks (result) -> None; e.g. viz.live.attach. Fired
        # from _emit on both the sync and pipelined drivers — the analog of
        # the reference's viz->addCurrentFrame calls (src/LoopHandler.cc:
        # 86-90, :159-162)
        self.observers: List = []
        self.n_resets = 0
        self.n_relocalizations = 0
        self._last_good_frame = -1   # newest frame that tracked/bootstrapped
        self._last_ba_ms = 0.0
        self.n_ba_runs = 0
        self._kf_ref_inliers = 0
        # last-keyframe context: replenishment triangulates against the
        # last KEYFRAME (not the previous frame) so baselines stay wide
        self._kf_desc = None
        self._kf_kp = None
        self._kf_pose = np.eye(4, dtype=np.float32)
        self._kf_img = None
        # feature positions in the ANCHOR keyframe: LK tracks from the
        # keyframe template to the current frame (template anchoring), so
        # per-frame tracking error does not random-walk
        self.track_anchor_uv = np.zeros((K_cap, 2), np.float32)

        # device-resident tracking state (see _push_state_to_device)
        self._d_anchor_uv = jnp.zeros((K_cap, 2), jnp.float32)
        self._d_track_uv = jnp.zeros((K_cap, 2), jnp.float32)
        self._d_track_valid = jnp.zeros(K_cap, bool)
        self._d_lm_pos = jnp.zeros((K_cap, 3), jnp.float32)
        self._d_pose = jnp.eye(4, dtype=jnp.float32)
        self._d_rel = jnp.eye(4, dtype=jnp.float32)
        self._d_kf_desc = jnp.zeros((K_cap, 8), jnp.uint32)
        self._d_kf_uv = jnp.zeros((K_cap, 2), jnp.float32)
        self._d_kf_mask = jnp.zeros(K_cap, bool)
        self._d_kf_pose = jnp.eye(4, dtype=jnp.float32)
        self._d_kf_img = None          # [H, W] uint8 anchor keyframe image
        self._d_prev_img = None        # [H, W] previous frame (lk_template
        #                                "prev": LK template image)
        self._d_kf_ref = jnp.float32(0.0)
        self._d_fsk = jnp.int32(0)     # frames since last keyframe
        # per-slot merge stamp: the frame number whose on-device keyframe
        # merge last wrote the slot. Lets a BA apply (apply_mode="device")
        # overwrite a slot's landmark position with the refined host value
        # ONLY when the slot has not been remapped by a still-in-flight
        # keyframe (stamp <= last resolved frame id) — in-flight merges
        # keep their rigid-corrected fresh triangulations instead.
        self._d_slot_stamp = jnp.zeros(K_cap, jnp.int32)
        self._resolved_fid = 0         # newest frame id resolved on host
        # set by bootstrap / BA apply: device state must be rebuilt from the
        # host mirrors before the next dispatch
        self._state_dirty = False

        self._extract = self._build_extract()
        self._track_step, self._track_step_pre = self._build_track_step()
        # global photometric normalization on ingest (exposure
        # compensation — FeatureConfig.photometric_norm): affinely remap
        # every frame to mean 128 / std 48 so gain/bias drift never
        # violates LK brightness-constancy against the keyframe template.
        # Degenerate frames (std < 1, e.g. blackouts) pass through so real
        # signal loss still fails the gates. Idempotent, so the redo path
        # reusing already-normalized images is safe.
        if self.cfg.features.photometric_norm:
            @jax.jit
            def _norm(img):
                f = img.astype(jnp.float32)
                mu = jnp.mean(f)
                sd = jnp.std(f)
                ok = sd >= 1.0
                g = jnp.where(ok, 48.0 / jnp.maximum(sd, 1e-3), 1.0)
                out = (f - mu) * g + jnp.where(ok, 128.0, mu)
                return jnp.clip(out, 0.0, 255.0).astype(jnp.uint8)

            self._norm_img = _norm
        else:
            self._norm_img = None
        self._kf_since_ba = 0
        self._frames_since_kf = 0
        # backend thread state
        import concurrent.futures
        self._ba_executor = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ba-backend")
        self._ba_pending = None
        self._ba_deferred = False
        self.n_ba_discarded = 0
        # capacity-cap landmark drops across all window solves (longrun
        # reports this; selection is by window obs count, see
        # ba/window.select_window_landmarks)
        self.n_ba_lm_dropped = 0
        # staleness backoff: on a slow host every solve can take longer
        # than max_stale_keyframes of tracking, so every result would be
        # discarded and the backend busy-loop on futile solves with BA
        # silently never applied. After consecutive staleness discards the
        # effective staleness window WIDENS (loudly) so slow hosts degrade
        # to visible late-but-applied refinement instead of zero refinement.
        self._consec_stale_discards = 0
        self._stale_relax = 0
        # recent per-frame translation step lengths (running median feeds
        # the BA divergence gate: the instantaneous step collapses to ~0
        # when the camera is stationary, which made the gate discard
        # healthy corrections exactly while the vehicle was stopped)
        from collections import deque
        self._recent_steps = deque(maxlen=20)
        self._peak_step = 0.0
        self._session_epoch = 0
        # pipelined-run state: dispatched-but-unresolved frames, oldest
        # first. Depth > 2 matters because the tunneled TPU backend has
        # ~50-100 ms execution->readback LATENCY but ~9 ms/step THROUGHPUT
        # (measured round 4): resolving a frame's gates only one frame
        # after dispatch still blocks ~35 ms/frame. With depth D the gate
        # read happens D-1 frame periods after dispatch, fully hiding the
        # latency once (D-1) x frame_period exceeds it.
        self._pending_q = deque()
        # distributed backend: shard the window's landmark axis over the
        # visible devices (BAConfig.distributed). (solve_fn, mesh) or None.
        self._dist_ba = None
        if self.cfg.ba.enabled and self.cfg.ba.distributed != "off":
            self._maybe_build_dist_ba()
        if self.cfg.ba.enabled and self.cfg.ba.asynchronous:
            # compile the window solver NOW, off-thread: a ~0.9 s jit
            # compile landing on the first mid-sequence solve delays that
            # apply by several frames, and the oversized correction that
            # follows can whiplash the map (round-1 async instability)
            self._ba_executor.submit(self._precompile_window_ba)

    # ------------------------------------------------------------------ #
    def _build_extract(self):
        fc = self.cfg.features
        offsets = self._offsets

        @jax.jit
        def extract(img):
            kp = fast.detect(
                img,
                max_keypoints=fc.max_keypoints,
                threshold=fc.fast_threshold,
                arc_length=fc.fast_arc_length,
                nms_radius=fc.nms_radius,
                border=fc.brief_patch_radius + fc.blur_ksize // 2 + 4,
                harris_k=fc.harris_k,
            )
            blurred = brief.gaussian_blur(
                img.astype(jnp.float32), fc.blur_ksize, fc.blur_sigma)
            desc, _ = brief.describe(blurred, kp.uv, kp.mask, offsets)
            return kp, desc

        return extract

    def _build_track_step(self):
        """One fused jit for the entire steady-state tracking frame:
        extract + project-seed + LK + pose-GN + speculative replenishment +
        the KEYFRAME decision and track-table merge. A single device
        dispatch per frame (host<->device sync is the per-frame bottleneck,
        SURVEY.md §7.4 'host-device latency').

        The keyframe policy runs ON DEVICE: the step selects between the
        tracked-only state and the merged post-keyframe state (new anchors,
        new landmarks in free slots, refreshed keyframe context) with no
        host round trip — the host replays the pulled record into the map
        store asynchronously, one frame later, purely for bookkeeping
        (keyframe insertion / BA / export). The reference's equivalent
        control flow is spread over track()/insertFrameFeatures/
        triangulate2View across two CPU threads (src/LoopHandler.cc)."""
        fc = self.cfg.features
        tc = self.cfg.tracking
        offsets = self._offsets
        cam = self.cam

        mc = self.cfg.matching
        K = self.K
        K_cap = fc.max_keypoints

        @jax.jit
        def step(kf_img, img_curr, prev_img, track_uv, anchor_uv,
                 track_mask, lm_pos, pose, rel, kf_desc, kf_uv, kf_mask,
                 kf_pose, kf_ref, fsk, slot_stamp, frame_no, cap_left):
            # state-in/state-out: all tracking state stays on device; the
            # host reads back gate scalars + the pose (async copies) and
            # mirrors the keyframe record into the map store at resolve time.
            # GEOMETRY runs at full f32 matmul precision: the TPU MXU's
            # bf16 default rounds inputs to 8 mantissa bits, i.e. ~0.4%
            # noise on every pose product / point transform — an ~8 cm
            # pose-chain random walk per frame at 20 map units. Feature
            # kernels (FAST/BRIEF/Hamming: small ints and +-1) are exact in
            # bf16 and keep their own (faster) precision settings.
            kp = fast.detect(
                img_curr,
                max_keypoints=fc.max_keypoints,
                threshold=fc.fast_threshold,
                arc_length=fc.fast_arc_length,
                nms_radius=fc.nms_radius,
                border=fc.brief_patch_radius + fc.blur_ksize // 2 + 4,
                harris_k=fc.harris_k,
            )
            blurred = brief.gaussian_blur(
                img_curr.astype(jnp.float32), fc.blur_ksize, fc.blur_sigma)
            desc, _ = brief.describe(blurred, kp.uv, kp.mask, offsets)
            with jax.default_matmul_precision("float32"):
                return _step_body(
                    kp, desc, kf_img, img_curr, prev_img, track_uv,
                    anchor_uv, track_mask, lm_pos, pose, rel, kf_desc,
                    kf_uv, kf_mask, kf_pose, kf_ref, fsk, slot_stamp,
                    frame_no, cap_left)

        @jax.jit
        def step_pre(kp, desc, kf_img, img_curr, prev_img, track_uv,
                     anchor_uv, track_mask, lm_pos, pose, rel, kf_desc,
                     kf_uv, kf_mask, kf_pose, kf_ref, fsk, slot_stamp,
                     frame_no, cap_left):
            # redo variant: extraction (FAST + blur + BRIEF, ~half the
            # step's device time) is state-INDEPENDENT, so a re-dispatch
            # after a reset/BA push reuses the original dispatch's kp/desc
            # and re-runs only the state-dependent tail (LK + pose GN +
            # match/triangulate + merge)
            with jax.default_matmul_precision("float32"):
                return _step_body(
                    kp, desc, kf_img, img_curr, prev_img, track_uv,
                    anchor_uv, track_mask, lm_pos, pose, rel, kf_desc,
                    kf_uv, kf_mask, kf_pose, kf_ref, fsk, slot_stamp,
                    frame_no, cap_left)

        def _step_body(kp, desc, kf_img, img_curr, prev_img, track_uv,
                       anchor_uv, track_mask, lm_pos, pose, rel, kf_desc,
                       kf_uv, kf_mask, kf_pose, kf_ref, fsk, slot_stamp,
                       frame_no, cap_left):
            T_prior = rel @ pose

            pc = lie.transform_points(T_prior, lm_pos)
            seed, z = cam.project(pc)
            if tc.lk_template == "prev":
                # frame-to-frame templates (reference trackLastFrame
                # semantics — see TrackConfig.lk_template). The seed is the
                # last tracked position plus the PROJECTED MOTION DELTA:
                # absolute projection error from a young landmark's noisy
                # depth mostly cancels in the difference, so the seed lands
                # within LK's convergence basin even when the absolute
                # projection is tens of pixels off.
                pc_prev = lie.transform_points(pose, lm_pos)
                seed_prev, z_prev = cam.project(pc_prev)
                use = track_mask & (z > 0.25) & (z_prev > 0.25)
                seed = jnp.where(use[:, None],
                                 track_uv + (seed - seed_prev), track_uv)
                tmpl_img, tmpl_uv = prev_img, track_uv
            else:
                use = track_mask & (z > 0.25)
                seed = jnp.where(use[:, None], seed, anchor_uv)
                tmpl_img, tmpl_uv = kf_img, anchor_uv

            flow = lk.auto_track(
                tmpl_img, img_curr, tmpl_uv, seed, use,
                levels=tc.lk_levels, half=tc.lk_window // 2,
                iters=tc.lk_iters, eps=tc.lk_eps,
                max_residual=tc.lk_max_residual,
                rel_residual=tc.lk_rel_residual,
            )
            n_flow = jnp.sum(flow.status.astype(jnp.int32))

            solve = pose_solver.solve_pose(
                T_prior, lm_pos, flow.uv, flow.status, cam,
                iters=tc.gn_rounds * tc.gn_iters_per_round,
                huber_delta=tc.huber_delta,
                chi2_threshold=tc.chi2_threshold,
            )
            n_ba = solve.n_inliers
            keep = flow.status & solve.inlier_mask
            new_track_uv = jnp.where(keep[:, None], flow.uv, anchor_uv)
            # closed-form SE(3) inverse: jnp.linalg.inv's LU runs on the
            # MXU at bf16 default precision (~1% translation noise), and
            # the error compounds through the constant-velocity prior chain
            new_rel = solve.pose @ jnp.linalg.inv(pose)

            # speculative replenishment: match the anchor keyframe's
            # descriptors against this frame and triangulate with the
            # solved pose — computed every frame (a few ms of MXU work) so
            # a keyframe costs ZERO extra dispatches
            m = matching.match(
                kf_desc, desc, kf_mask, kp.mask,
                abs_threshold=mc.abs_threshold, cross_check=mc.cross_check)
            r_uv2 = kp.uv[m.idx2]
            ok = m.mask
            d2 = jnp.sum(
                (r_uv2[:, None, :] - new_track_uv[None, :, :]) ** 2, axis=-1)
            near = jnp.any((d2 < 144.0) & keep[None, :], axis=1)
            ok = ok & ~near
            from ya_vo_tpu.geometry.triangulation import triangulate_fast
            P1 = K @ kf_pose[:3, :4]
            P2 = K @ solve.pose[:3, :4]
            r_pts, r_valid = triangulate_fast(P1, P2, kf_uv, r_uv2, ok)
            # (a per-view reprojection gate on fresh landmarks was tried in
            # round 1 and reverted, commit acd41b1: every threshold made the
            # keyframe cadence chaotic and accuracy worse than no gate. A
            # reprojection gate cannot catch the real failure mode anyway —
            # a wrong-depth point reprojects perfectly in BOTH triangulating
            # views; that is the low-parallax degeneracy itself.)
            if tc.max_depth_baseline_ratio > 0:
                # parallax gate (round-3 reset-storm fix, see
                # TrackConfig.max_depth_baseline_ratio): depth in the
                # CURRENT camera must stay below ratio x baseline
                c_kf_t = -kf_pose[:3, :3].T @ kf_pose[:3, 3]
                c_cur_t = -solve.pose[:3, :3].T @ solve.pose[:3, 3]
                baseline = jnp.linalg.norm(c_cur_t - c_kf_t)
                z_cur = (lie.transform_points(solve.pose, r_pts))[:, 2]
                r_valid = r_valid & (
                    z_cur < tc.max_depth_baseline_ratio * baseline)
            n_matches = jnp.sum(m.mask.astype(jnp.int32))
            n_kp = jnp.sum(kp.mask.astype(jnp.int32))

            # ---- device-side keyframe decision (policy in _finish_track's
            # docstring; identical maths to the former host version) ----
            n_valid_new = jnp.sum(r_valid.astype(jnp.int32))
            n_free = jnp.int32(K_cap) - jnp.sum(keep.astype(jnp.int32))
            n_new = jnp.minimum(jnp.minimum(n_valid_new, n_free),
                                cap_left.astype(jnp.int32))
            # decay floor: min_ba + margin, NOT 2x min_ba — at the
            # production gate (100) a 2x floor (200) sat above this world's
            # healthy inlier level (~150-250), forcing "urgent" keyframes
            # EVERY frame and with them ~1-unit-baseline replenishment;
            # round-3 reset-storm diagnosis
            decay_floor = tc.min_ba_inliers + max(20, tc.min_ba_inliers // 5)
            want_kf = n_ba < jnp.maximum(
                jnp.int32(decay_floor),
                (tc.keyframe_min_inlier_ratio * kf_ref).astype(jnp.int32))
            if tc.keyframe_max_translation > 0:
                c_now = -solve.pose[:3, :3].T @ solve.pose[:3, 3]
                c_kf = -kf_pose[:3, :3].T @ kf_pose[:3, 3]
                want_kf |= (jnp.linalg.norm(c_now - c_kf)
                            > tc.keyframe_max_translation)
            if tc.keyframe_max_rotation_deg > 0:
                # rotation trigger (TrackConfig.keyframe_max_rotation_deg):
                # keep the anchor fresh through turns
                R_rel = solve.pose[:3, :3] @ kf_pose[:3, :3].T
                cos_r = jnp.clip((jnp.trace(R_rel) - 1.0) * 0.5, -1.0, 1.0)
                want_kf |= jnp.degrees(jnp.arccos(cos_r)) \
                    > tc.keyframe_max_rotation_deg
            urgent = n_ba < jnp.int32(decay_floor)
            want_kf &= urgent | (fsk + 1 >= jnp.int32(tc.min_keyframe_gap))
            # a frame that fails the FSM gates resets on the host instead —
            # don't let it seed a keyframe from a broken pose
            gates_ok = ((n_flow >= jnp.int32(tc.min_flow_inliers))
                        & (n_ba >= jnp.int32(tc.min_ba_inliers)))
            is_kf = (want_kf & gates_ok & (n_matches >= 8)
                     & (n_valid_new >= 4) & (n_new > 0))

            # ---- merged post-keyframe track table: kept slots re-anchor at
            # their tracked positions; new features fill free slots in
            # ascending order (stable argsorts define the assignment; the
            # host replays it from the pulled dest/src/n_new) ----
            dest = jnp.argsort(keep.astype(jnp.int32), stable=True)
            src = jnp.argsort(
                jnp.logical_not(r_valid).astype(jnp.int32), stable=True)
            write_ok = jnp.arange(K_cap) < n_new
            anchor_kf = new_track_uv.at[dest].set(
                jnp.where(write_ok[:, None], r_uv2[src],
                          new_track_uv[dest]))
            lm_kf = lm_pos.at[dest].set(
                jnp.where(write_ok[:, None], r_pts[src], lm_pos[dest]))
            valid_kf = keep.at[dest].set(keep[dest] | write_ok)
            stamp_kf = slot_stamp.at[dest].set(
                jnp.where(write_ok, frame_no, slot_stamp[dest]))

            # ---- select the state chain by the keyframe decision ----
            anchor_o = jnp.where(is_kf, anchor_kf, anchor_uv)
            valid_o = jnp.where(is_kf, valid_kf, keep)
            lm_o = jnp.where(is_kf, lm_kf, lm_pos)
            kf_desc_o = jnp.where(is_kf, desc, kf_desc)
            kf_uv_o = jnp.where(is_kf, kp.uv, kf_uv)
            kf_mask_o = jnp.where(is_kf, kp.mask, kf_mask)
            kf_pose_o = jnp.where(is_kf, solve.pose, kf_pose)
            kf_img_o = jnp.where(is_kf, img_curr, kf_img)
            kf_ref_o = jnp.where(is_kf, (n_ba + n_new).astype(jnp.float32),
                                 kf_ref)
            fsk_o = jnp.where(is_kf, jnp.int32(0), fsk + 1)
            stamp_o = jnp.where(is_kf, stamp_kf, slot_stamp)

            # current-frame uv of every valid slot (keyframe merges write
            # the fresh slots' positions into anchor_kf): the next frame's
            # LK template positions under lk_template="prev", and the
            # host's live-table uv mirror either way
            track_uv_o = jnp.where(is_kf, anchor_kf, new_track_uv)
            state_out = (anchor_o, valid_o, lm_o, solve.pose, new_rel,
                         kf_desc_o, kf_uv_o, kf_mask_o, kf_pose_o, kf_img_o,
                         kf_ref_o, fsk_o, track_uv_o, stamp_o, img_curr)
            record = (n_flow, n_ba, n_kp, n_matches, is_kf, n_new,
                      solve.pose, keep, flow.status, solve.inlier_mask,
                      dest, src, anchor_o, valid_o, r_pts, track_uv_o)
            return kp, desc, state_out, record

        return step, step_pre

    def _push_map_state_to_device(self) -> None:
        """Refresh the device-resident anchor/landmark/keyframe-context
        state from the host mirrors — everything EXCEPT the pose chain
        (pipelined mode keeps the device pose chain live across a keyframe;
        see _pipe_step)."""
        alive = self.track_valid & (self.track_lm >= 0) & \
            self.map.landmark_alive[np.maximum(self.track_lm, 0)]
        dropped = int(self.track_valid.sum()) - int(alive.sum())
        if dropped > 32:
            # a push is rebuilding the device table and a large slice of
            # the live tracks reference DEAD host landmarks — the
            # storm-precursor signature (round 5); log who they were
            dd = self.track_valid & ~alive
            st = self.map.landmark_stamp[np.maximum(self.track_lm[dd], 0)]
            _log.warning(
                "device push drops %d/%d live tracks (dead host landmarks);"
                " victim landmark stamps p10/p50/p90 = %s / %s / %s "
                "(newest stamp %d)", dropped, int(self.track_valid.sum()),
                int(np.percentile(st, 10)), int(np.percentile(st, 50)),
                int(np.percentile(st, 90)), self.map.lm_stamp_counter)
        self.track_valid = alive
        self._d_anchor_uv = jnp.asarray(self.track_anchor_uv)
        # live-table uv: LK template positions under lk_template="prev"
        self._d_track_uv = jnp.asarray(self.track_uv)
        self._d_track_valid = jnp.asarray(alive)
        self._d_lm_pos = jnp.asarray(
            self.map.landmark_pos[np.maximum(self.track_lm, 0)])
        if self._kf_desc is not None:
            self._d_kf_desc = self._kf_desc
            self._d_kf_uv = self._kf_kp.uv
            self._d_kf_mask = self._kf_kp.mask
            self._d_kf_pose = jnp.asarray(self._kf_pose)

    def _push_state_to_device(self) -> None:
        """Refresh ALL device-resident tracking state from the host mirrors
        (called whenever host bookkeeping touched them: bootstrap, reset,
        BA apply, checkpoint restore)."""
        self._push_map_state_to_device()
        self._d_pose = jnp.asarray(self.last_pose)
        self._d_rel = jnp.asarray(self.rel_motion)
        if self._kf_img is not None:
            self._d_kf_img = jnp.asarray(self._kf_img)
        # invalidate the chain's previous-frame image: the next dispatch
        # falls back to self.last_img (every driver updates it before its
        # next dispatch), and redone in-flight frames re-use the template
        # image their ORIGINAL dispatch used (rec["prev_img"]) — the
        # correct predecessor regardless of how many pushes intervened
        self._d_prev_img = None
        self._d_kf_ref = jnp.float32(self._kf_ref_inliers)
        self._d_fsk = jnp.int32(self._frames_since_kf)
        # the table now equals the host mirrors: every slot is "resolved"
        self._d_slot_stamp = jnp.zeros(
            self._d_slot_stamp.shape, jnp.int32)
        self._state_dirty = False

    def _apply_corr_device(self, corr: np.ndarray) -> None:
        """Compose a BA apply into the device-resident chain IN PLACE:

        * world->camera poses right-multiply by corr;
        * landmark slots the host has RESOLVED (merge stamp <= newest
          resolved frame id) take the authoritative post-apply position
          from the host map — this carries the solver's actual REFINED
          positions to the tracker (load-bearing for accuracy: with only
          the rigid transform below, raw ATE degraded 10x in the round-4
          measurement because the tracker kept solving against unrefined
          two-view triangulations);
        * slots remapped by a still-in-flight keyframe merge keep their
          fresh triangulation, moved rigidly as points through corr^-1
          (projection-invariant: (T corr)(corr^-1 X) = T X).

        In-flight pipelined records were dispatched pre-correction and
        will resolve in the OLD coordinates; each is stamped with the
        (composed) correction so _finish_track rotates its outputs at
        resolve time. No push, no redo."""
        corr_d = jnp.asarray(corr)
        inv_c = np.linalg.inv(corr)
        inv_d = jnp.asarray(inv_c)
        self._d_pose = self._d_pose @ corr_d
        self._d_kf_pose = self._d_kf_pose @ corr_d
        # authoritative positions at the resolved frontier (the map was
        # updated by the caller just before this): slot -> refined/
        # corrected landmark position
        tl = np.maximum(self.track_lm, 0)
        upd_mask = (self.track_valid & (self.track_lm >= 0)
                    & self.map.landmark_alive[tl])
        upd_pos = self.map.landmark_pos[tl]
        rigid = self._d_lm_pos @ inv_d[:3, :3].T + inv_d[:3, 3]
        safe = jnp.asarray(upd_mask) & (
            self._d_slot_stamp <= jnp.int32(self._resolved_fid))
        self._d_lm_pos = jnp.where(
            safe[:, None], jnp.asarray(upd_pos), rigid)
        for rec in self._pending_q:
            rec["post_corr"] = corr if rec["post_corr"] is None \
                else (rec["post_corr"] @ corr).astype(np.float32)

    def precompile(self) -> None:
        """Compile the steady-state programs (fused step + its cached-
        extraction redo variant) for this session's shapes WITHOUT touching
        the state chain — call after bootstrap, before a timed loop, so the
        first mid-run BA redo or reset doesn't stall on a cold jit (axon
        remote compiles take minutes; one landing inside a timed window
        invalidates the figure)."""
        if (self._d_kf_img is None or self.last_img is None
                or self.last_kp is None):
            return
        state_in = (self._d_kf_img, self.last_img, self.last_img,
                    self._d_track_uv, self._d_anchor_uv,
                    self._d_track_valid, self._d_lm_pos, self._d_pose,
                    self._d_rel, self._d_kf_desc, self._d_kf_uv,
                    self._d_kf_mask, self._d_kf_pose, self._d_kf_ref,
                    self._d_fsk, self._d_slot_stamp,
                    np.int32(self.frame_id), np.int32(0))
        o1 = self._track_step(*state_in)
        o2 = self._track_step_pre(self.last_kp, self.last_desc, *state_in)
        jax.block_until_ready((o1[3], o2[3]))

    def device_throughput_probe(self, imgs, n_steps: int = 200) -> dict:
        """Measure the fused tracking step's PURE DEVICE throughput:
        dispatch `n_steps` chained steps with no host read between them,
        block once at the end. The axon tunnel's 50-100 ms dispatch->
        readback latency and its 2x run-to-run "weather" (docs/PERF.md)
        cancel out of this figure — one latency amortized over n_steps —
        so it is the tunnel-independent per-chip rate the end-to-end bench
        converges to under ideal transport. Runs on a THROWAWAY copy of
        the device state chain (self._d_* is untouched); call only in
        TRACKING state after precompile().

        `imgs` : sequence of device-resident frames to cycle through
        (>=2 recommended so LK sees real inter-frame motion).
        Returns {"device_step_ms", "fps_device", "n_steps"}.
        """
        if self._d_kf_img is None:
            raise RuntimeError("probe requires an initialized track chain")
        imgs = [jnp.asarray(im) for im in imgs]
        if self._norm_img is not None:
            imgs = [self._norm_img(im) for im in imgs]
        cap_left = np.int32(self.map.free_landmark_capacity)
        o = None
        prev0 = self._d_prev_img if self._d_prev_img is not None \
            else imgs[0]
        s = (self._d_kf_img, None, prev0, self._d_track_uv,
             self._d_anchor_uv, self._d_track_valid,
             self._d_lm_pos, self._d_pose, self._d_rel, self._d_kf_desc,
             self._d_kf_uv, self._d_kf_mask, self._d_kf_pose,
             self._d_kf_ref, self._d_fsk, self._d_slot_stamp)

        def step(i):
            nonlocal o, s
            img = imgs[i % len(imgs)]
            _, _, o, _ = self._track_step(
                s[0], img, *s[2:], np.int32(self.frame_id + 1 + i),
                cap_left)
            # state_out order: (anchor_uv, track_valid, lm_pos, pose, rel,
            # kf_desc, kf_uv, kf_mask, kf_pose, kf_img, kf_ref, fsk,
            # track_uv, slot_stamp, prev_img) -> next state_in (img slot
            # filled above)
            s = (o[9], None, o[14], o[12], o[0], o[1], o[2], o[3], o[4],
                 o[5], o[6], o[7], o[8], o[10], o[11], o[13])

        step(0)                      # warm (already compiled; fill queues)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for i in range(1, n_steps + 1):
            step(i)
        jax.block_until_ready(o)
        dt = time.perf_counter() - t0
        return {"device_step_ms": round(dt / n_steps * 1e3, 2),
                "fps_device": round(n_steps / dt, 2),
                "n_steps": n_steps}

    def sync_host_state(self) -> None:
        """Pull the device-resident track table into the host mirrors
        (needed before checkpointing mid-segment — between keyframes the
        host copies are intentionally stale)."""
        if self._d_track_uv is not None:
            self.track_uv = np.array(self._d_track_uv)
            self.track_valid = np.array(self._d_track_valid)

    def _next_key(self):
        self._rng, k = jax.random.split(self._rng)
        return k

    def _emit(self, res: FrameResult) -> None:
        """Record a finished frame and notify observers (never let a
        viewer error kill tracking)."""
        self.results.append(res)
        for cb in self.observers:
            try:
                cb(res)
            except Exception:
                _log.exception("frame observer failed")

    # ------------------------------------------------------------------ #
    def process(self, img: np.ndarray) -> FrameResult:
        """Feed one grayscale frame (reference addFrame,
        src/LoopHandler.cc:80-122). Fully synchronous: gates are evaluated
        before returning. `run()` uses the pipelined path instead."""
        self.frame_id += 1
        self._poll_ba()
        img_dev = jnp.asarray(img)
        if self._norm_img is not None:
            img_dev = self._norm_img(img_dev)
        return self._process_sync(img_dev)

    def _process_sync(self, img_dev) -> FrameResult:
        t0 = time.perf_counter()
        if self.status == VOStatus.INIT or self.last_img is None:
            kp, desc = self._extract(img_dev)
            res = self._handle_init(img_dev, kp, desc)
            res.n_keypoints = int(kp.count())
            if res.is_keyframe:         # bootstrap succeeded
                self._kf_img = img_dev
                self.track_anchor_uv = self.track_uv.copy()
        else:
            if self._state_dirty:
                self._push_state_to_device()
            rec = self._dispatch_track(img_dev)
            kp, desc = rec["kp"], rec["desc"]
            res = self._finish_track(rec)
        res.timings_ms["frame"] = (time.perf_counter() - t0) * 1e3

        if res.reset and res.is_keyframe:
            # reset-bootstrap: record the new anchor keyframe image
            self._kf_img = img_dev
            self.track_anchor_uv = self.track_uv.copy()
        if self._state_dirty:
            # bootstrap / reset / BA apply touched host state: rebuild the
            # device-resident chain before the next dispatch
            self._push_state_to_device()
        self.last_img = img_dev
        self.last_kp = kp
        self.last_desc = desc
        self.trajectory.append(self.last_pose.copy())
        self._emit(res)
        return res

    # ------------------------------------------------------------------ #
    def _handle_init(self, img, kp, desc) -> FrameResult:
        if self.last_img is None:
            # first frame: identity pose, wait for a second view
            self.last_pose = np.eye(4, dtype=np.float32)
            return FrameResult(self.frame_id, "INIT", self.last_pose.copy())

        if self.map.n_keyframes > 0:
            # a map exists (we are re-initializing after an outage, e.g.
            # blackout frames whose descriptors matched nothing): prefer
            # scale-consistent PnP relocalization against it over a fresh
            # unit-scale bootstrap
            reloc = self._relocalize(kp, desc)
            if reloc is not None:
                n_inl = self._apply_relocalization(kp, desc, reloc)
                return FrameResult(
                    self.frame_id, "TRACKING", self.last_pose.copy(),
                    n_ba_inliers=n_inl, is_keyframe=True)

        ok, info = self._two_view_bootstrap(kp, desc, chain_on_last=False)
        if ok:
            self.status = VOStatus.TRACKING
            self._kf_desc, self._kf_kp = desc, kp
            self._kf_pose = self.last_pose.copy()
        return FrameResult(
            self.frame_id, "INIT" if not ok else "TRACKING",
            self.last_pose.copy(), **info,
        )

    # ------------------------------------------------------------------ #
    def _two_view_bootstrap(self, kp, desc, chain_on_last: bool):
        """Match last<->current descriptors, robust E, triangulate, populate
        map. Covers reference buildInitMap (LoopHandler.cc:532-652) and
        reinitialize (:168-296) — `chain_on_last` selects the latter
        (new motion chained onto the last pose; landmarks re-created)."""
        mc = self.cfg.matching
        m = matching.match(
            self.last_desc, desc, self.last_kp.mask, kp.mask,
            abs_threshold=mc.abs_threshold, cross_check=mc.cross_check,
        )
        n_matches = int(m.count())
        info = dict(n_matches=n_matches)
        if n_matches < 8:
            return False, info

        uv1 = self.last_kp.uv
        uv2 = kp.uv[m.idx2]
        rc = self.cfg.ransac
        tv = ransac.estimate_two_view(
            uv1, uv2, m.mask, self.K, self._next_key(),
            n_hypotheses=rc.n_hypotheses,
            sample_size=rc.sample_size,
            inlier_threshold_px=rc.inlier_threshold_px,
        )
        n_inl = int(tv.n_inliers)
        info["n_ba_inliers"] = n_inl
        if n_inl < max(8, self.cfg.tracking.min_flow_inliers):
            return False, info

        # camera1 = last frame; x2 = R x1 + t (unit baseline). World pose of
        # current frame: T2_wc = [R|t] @ T1_wc (reference sets the inverse
        # composition at LoopHandler.cc:619-620 / 277-279).
        T_rel = np.asarray(lie.rt_to_mat(tv.R, tv.t))
        T1 = self.last_pose
        T2 = (T_rel @ T1).astype(np.float32)

        # triangulated points are in CAMERA-1 coords; lift to world
        pts_c1 = np.asarray(tv.points)
        valid = np.asarray(tv.points_valid)
        T1_inv = np.asarray(lie.se3_inverse(jnp.asarray(T1)))
        pts_w = pts_c1 @ T1_inv[:3, :3].T + T1_inv[:3, 3]

        # lifecycle: a bootstrap/reset deep into a long run must find room
        if self.map.free_landmark_capacity < int(valid.sum()):
            self.map.retire_out_of_window(self.cfg.map.window_size)
            self.map.recycle_dead()
        if self.map.n_keyframes + 2 > self.map.max_keyframes:
            self.map.evict_oldest_keyframes(
                max(2, self.map.max_keyframes // 4))

        lm_idx = self.map.add_landmarks(pts_w, valid)
        n_new = int((lm_idx >= 0).sum())
        info["n_new_landmarks"] = n_new
        if n_new < self.cfg.tracking.min_flow_inliers:
            return False, info

        # a bootstrap re-triangulates at UNIT baseline: the map's metric
        # scale breaks here. Fence the BA window so no solve ever mixes
        # pre-break and post-break keyframes (incompatible scales make GN
        # "corrections" that whiplash the live pose — the reset-storm
        # persistence mechanism found in round 3).
        if self.map.n_keyframes > 0:
            # (covers both the reset-bootstrap and the INIT-after-outage
            # path; a first bootstrap on an empty map is a no-op fence)
            self.map.mark_scale_break()

        # keyframes: last + current, with current-frame observations
        uv2_np = np.asarray(uv2)
        self.map.insert_keyframe(
            self.frame_id - 1, T1, np.asarray(uv1), lm_idx, lm_idx >= 0)
        self.map.insert_keyframe(
            self.frame_id, T2, uv2_np, lm_idx, lm_idx >= 0)

        self._session_epoch += 1   # invalidate in-flight backend work
        self._state_dirty = True   # device state must be rebuilt via push
        # track table for the CURRENT frame (becomes "last" after process())
        self.track_uv.fill(0)
        self.track_lm.fill(-1)
        self.track_valid.fill(False)
        n = min(len(uv2_np), len(self.track_uv))
        self.track_uv[:n] = uv2_np[:n]
        self.track_lm[:n] = lm_idx[:n]
        self.track_valid[:n] = lm_idx[:n] >= 0

        self.rel_motion = (T2 @ np.linalg.inv(T1)).astype(np.float32)
        self.last_pose = T2
        self._kf_ref_inliers = n_new
        self._frames_since_kf = 0
        self._last_good_frame = self.frame_id
        info["is_keyframe"] = True
        return True, info  # caller records keyframe context in process()

    # ------------------------------------------------------------------ #
    def _dispatch_track(self, img, pre=None, prev_override=None) -> dict:
        """Dispatch the fused per-frame tracking step and commit the
        device-side state chain — NO host sync happens here.

        ONE device dispatch over DEVICE-RESIDENT state: extract +
        constant-velocity prior + project-seeded LK + pose-GN + the
        keyframe decision/merge (reference runs these as separate stages
        across two threads, SURVEY.md §3.2/§3.4). Everything the host may
        later need (gate scalars, pose, the keyframe record) starts an
        async device->host copy that lands while the device works — the
        tunnel costs ~25 ms per SYNC, not per byte, so the pull set is free
        and the sync itself can be deferred a whole frame (see _pipe_step).
        """
        t0 = time.perf_counter()
        # map-capacity guard for the in-jit landmark allocation (may be one
        # frame stale in pipelined mode; only matters near a full map) —
        # recycled free-list slots count as capacity
        cap_left = self.map.free_landmark_capacity
        if prev_override is not None:
            prev_img = prev_override
        elif self._d_prev_img is not None:
            prev_img = self._d_prev_img
        else:
            prev_img = self.last_img if self.last_img is not None else img
        state_in = (
            self._d_kf_img, img, prev_img, self._d_track_uv,
            self._d_anchor_uv, self._d_track_valid,
            self._d_lm_pos, self._d_pose, self._d_rel,
            self._d_kf_desc, self._d_kf_uv, self._d_kf_mask,
            self._d_kf_pose, self._d_kf_ref, self._d_fsk,
            self._d_slot_stamp, np.int32(self.frame_id),
            np.int32(cap_left),
        )
        if pre is None:
            kp, desc, state_out, record = self._track_step(*state_in)
        else:
            kp, desc, state_out, record = self._track_step_pre(
                *pre, *state_in)
        for arr in record:
            arr.copy_to_host_async()
        # commit the device-resident chain NOW so the next frame can be
        # dispatched before this one's gates are read (pipelined mode); a
        # failed gate later rebuilds this state wholesale via _reset
        (self._d_anchor_uv, self._d_track_valid, self._d_lm_pos,
         self._d_pose, self._d_rel,
         self._d_kf_desc, self._d_kf_uv, self._d_kf_mask, self._d_kf_pose,
         self._d_kf_img, self._d_kf_ref, self._d_fsk,
         self._d_track_uv, self._d_slot_stamp,
         self._d_prev_img) = state_out
        return dict(frame_id=self.frame_id, img=img, prev_img=prev_img,
                    kp=kp, desc=desc,
                    prev_kp=self.last_kp, prev_desc=self.last_desc,
                    pull=record, t0=t0, post_corr=None)

    def _finish_track(self, rec: dict) -> FrameResult:
        """Evaluate the FSM gates and REPLAY the device-made keyframe
        decision into the host map store (reference track(),
        src/LoopHandler.cc:132-165). In pipelined mode the async copies
        have already landed under the NEXT frame's compute, so the reads
        below cost no round trip.

        Keyframe policy (decided ON DEVICE inside the step): replenish when
        the tracked-inlier count decays below a fraction of its level at
        the last keyframe, when tracking is close to the failure gate, or
        when the camera has translated `keyframe_max_translation` since the
        last keyframe. The reference has no explicit keyframe logic — every
        successfully tracked frame enters the map (LoopHandler.cc
        insertKeyFrame on every addFrame); a decay+parallax policy keeps
        triangulation baselines wide and the backend off the hot path."""
        tc = self.cfg.tracking
        (n_flow_d, n_ba_d, n_kp_d, n_match_d, is_kf_d, n_new_d, pose_d,
         keep_d, flow_ok_d, inl_d, dest_d, src_d, anchor_d, valid_d,
         r_pts_d, track_uv_d) = rec["pull"]
        kp, desc = rec["kp"], rec["desc"]
        n_flow = int(np.asarray(n_flow_d))
        n_ba = int(np.asarray(n_ba_d))
        n_kp = int(np.asarray(n_kp_d))
        t_step = (time.perf_counter() - rec["t0"]) * 1e3

        if n_flow < tc.min_flow_inliers or n_ba < tc.min_ba_inliers:
            # tracking failed: bootstrap from rec's PREDECESSOR frame pair
            # (self.last_* may already point at a newer dispatched frame in
            # pipelined mode)
            self._maybe_dump_reset(rec)
            self.last_kp, self.last_desc = rec["prev_kp"], rec["prev_desc"]
            res = self._reset(kp, desc, n_matches=0,
                              n_flow=n_flow, n_ba=n_ba)
            self.last_kp, self.last_desc = kp, desc
            self.last_img = rec["img"]
            res.n_keypoints = n_kp
            res.timings_ms["step"] = t_step
            return res

        # commit the host pose mirrors from the pulled pose. rel is
        # recomputed on host in float64 (prev_pose = the frame before rec —
        # in pipelined mode self.last_pose has not advanced past it, since
        # mirrors only move here): the host mirror feeds resets/pushes,
        # where f32 inverse noise tips knife-edge downstream decisions
        prev_pose = self.last_pose
        pc_corr = rec.get("post_corr")
        if pc_corr is None:
            self.last_pose = np.asarray(pose_d, np.float32)
        else:
            # rec was dispatched before a BA re-anchor landed on the device
            # chain (_apply_corr_device): rotate its outputs into the
            # corrected coordinates it would have produced post-apply
            self.last_pose = (
                np.asarray(pose_d) @ pc_corr).astype(np.float32)
        self.rel_motion = (
            self.last_pose @ np.linalg.inv(prev_pose)).astype(np.float32)
        # feed the gate's scale reference only with MOVING steps: during a
        # long stop (multi-hundred-frame red light) raw appends would
        # collapse the median to ~0 within maxlen frames and the divergence
        # gate would discard healthy corrections for the rest of the stop —
        # the exact failure the median was introduced to remove. A step
        # counts as motion if it exceeds 5% of the current nominal step
        # (or anything at all while the reference is still empty).
        _step = float(np.linalg.norm(self.rel_motion[:3, 3]))
        if (not self._recent_steps
                or _step > 0.05 * float(np.median(self._recent_steps))):
            self._recent_steps.append(_step)
        # slowly-decaying speed peak: a second floor for the gate that a
        # smooth deceleration cannot ratchet down (halves in ~700 frames)
        self._peak_step = max(self._peak_step * 0.999, _step)

        is_kf = bool(np.asarray(is_kf_d))
        n_new = int(np.asarray(n_new_d)) if is_kf else 0
        self._frames_since_kf += 1
        self._last_good_frame = rec["frame_id"]
        self._resolved_fid = max(self._resolved_fid, rec["frame_id"])
        if is_kf:
            keep, flow_ok, inl, dest, src, anchor_o, valid_o, r_pts = \
                jax.device_get((keep_d, flow_ok_d, inl_d, dest_d, src_d,
                                anchor_d, valid_d, r_pts_d))
            if pc_corr is not None:
                # fresh triangulations are in pre-correction coordinates
                ic = np.linalg.inv(pc_corr)
                r_pts = r_pts @ ic[:3, :3].T + ic[:3, 3]
            # demote landmarks that were confidently tracked but rejected
            # by the pose solve (reference clears outlier features' map
            # points, src/LoopHandler.cc:850-855)
            old_lm = self.track_lm
            self.map.kill_landmarks(old_lm[flow_ok & ~inl])
            # lifecycle: reclaim dead slots when the free pool runs low, and
            # evict the oldest keyframe block when the ring fills — full-
            # length sequences (KITTI 00 = 4,541 frames) would otherwise
            # starve replenishment (round-1 MapStore was append-only)
            if self.map.free_landmark_capacity < max(
                    2 * n_new, self.map.max_landmarks // 8):
                # escalating reclamation: first retire landmarks that left
                # both the track table and the BA window (they can never
                # contribute a residual again — without this the map fills
                # after ~55 keyframes and replenishment starves for the
                # rest of a full-length sequence), then sweep all dead
                # slots onto the free list
                self.map.retire_out_of_window(
                    self.cfg.map.window_size, protected=old_lm[keep])
                self.map.recycle_dead(protected=old_lm[keep])
            # replay the device-side table merge: new landmarks enter the
            # map in the same slot order the device assigned (dest/src)
            d, s = dest[:n_new], src[:n_new]
            lm_ids = self.map.add_landmarks(r_pts[s], np.ones(n_new, bool))
            new_lm = np.where(keep, old_lm, -1).astype(np.int32)
            new_lm[d] = lm_ids
            self.track_lm = new_lm
            self.track_uv = np.array(anchor_o)
            self.track_valid = np.array(valid_o) & (new_lm >= 0)
            self.track_anchor_uv = self.track_uv.copy()
            if self.map.n_keyframes >= self.map.max_keyframes:
                self.map.evict_oldest_keyframes(
                    max(1, self.map.max_keyframes // 4),
                    protected_landmarks=new_lm[self.track_valid])
                # keyframe slots shifted: any in-flight backend snapshot's
                # slot indices are stale
                self._session_epoch += 1
            self.map.insert_keyframe(
                rec["frame_id"], self.last_pose,
                self.track_uv, self.track_lm, self.track_valid)
            self._kf_desc, self._kf_kp = desc, kp
            self._kf_pose = self.last_pose.copy()
            self._kf_img = rec["img"]
            self._kf_ref_inliers = n_ba + n_new
            self._frames_since_kf = 0
            self._run_window_ba()
        else:
            # keep the host uv/valid mirrors at the RESOLVED frontier even
            # between keyframes: an ASYNC BA apply can land on a
            # non-keyframe resolve, and its push+redo rebuilds the device
            # table from these mirrors — under lk_template="prev" a
            # keyframe-stale uv mirror would sample the redo frames' LK
            # templates at positions several frames behind the template
            # image (measured: stamps-world async ATE 0.0183 -> 0.2627)
            keep, uv_now = jax.device_get((keep_d, track_uv_d))
            self.track_valid = self.track_valid & keep
            self.track_uv = np.where(keep[:, None], uv_now, self.track_uv)

        return FrameResult(
            rec["frame_id"], "TRACKING", self.last_pose.copy(),
            n_keypoints=n_kp, n_matches=int(np.asarray(n_match_d)),
            n_flow_inliers=n_flow, n_ba_inliers=n_ba,
            n_new_landmarks=n_new, is_keyframe=is_kf,
            timings_ms={"step": t_step,
                        "ba": self._last_ba_ms if is_kf else 0.0},
        )

    # ------------------------------------------------------------------ #
    def _maybe_build_dist_ba(self) -> None:
        """Build the landmark-sharded window solver when the host has more
        than one device (BAConfig.distributed="auto"). The per-iteration
        cross-device traffic is one psum of the reduced camera system
        (O((6W)^2) floats) riding ICI — parallel/dist_ba module docstring.
        Falls back silently to the single-device solver otherwise."""
        bc = self.cfg.ba
        try:
            n_dev = len(jax.devices())
        except Exception:
            return
        if n_dev < 2 or bc.max_window_landmarks % n_dev != 0:
            return
        from ya_vo_tpu.parallel import dist_ba
        from ya_vo_tpu.parallel import mesh as mesh_lib

        m = mesh_lib.landmark_mesh()
        solve = dist_ba.make_dist_solver(
            m, self.cam, iters=bc.iters, huber_delta=bc.huber_delta,
            damping=bc.damping, n_fixed_poses=2,
            pose_prior_weight=bc.pose_prior_weight)
        self._dist_ba = (solve, m)
        _log.info("backend BA: window landmark axis sharded over %d devices "
                  "(BAConfig.distributed=%s)", n_dev, bc.distributed)

    def _solve_window_distributed(self, prob):
        """Run one window solve on the device mesh: convert the keyframe-
        major snapshot to the landmark-major layout, shard the landmark
        axis, solve, return (poses, landmarks) device arrays."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ya_vo_tpu.parallel import dist_ba

        solve, m = self._dist_ba
        dprob = dist_ba.from_window_problem(prob)
        shard = NamedSharding(m, P("lm"))
        dprob = dist_ba.DistBAProblem(
            poses=dprob.poses,
            landmarks=jax.device_put(dprob.landmarks, shard),
            lm_valid=jax.device_put(dprob.lm_valid, shard),
            obs_uv=jax.device_put(dprob.obs_uv, shard),
            obs_valid=jax.device_put(dprob.obs_valid, shard),
        )
        poses_o, lms_o, _c0, _c1 = solve(dprob)
        return poses_o, lms_o

    def _precompile_window_ba(self) -> None:
        """Warm solve_window's jit cache with the production static shapes
        (all-invalid observations; gauge pin + damping keep it finite).
        Runs on the backend thread during sequence bootstrap."""
        try:
            import jax.numpy as jnp

            from ya_vo_tpu.ba import window as ba_window

            bc = self.cfg.ba
            W = self.cfg.map.window_size
            O = self.map.max_obs_per_kf
            L = bc.max_window_landmarks
            prob = ba_window.BAProblem(
                poses=jnp.tile(jnp.eye(4, dtype=jnp.float32), (W, 1, 1)),
                pose_valid=jnp.ones(W, bool),
                landmarks=jnp.zeros((L, 3), jnp.float32),
                lm_valid=jnp.zeros(L, bool),
                obs_uv=jnp.zeros((W, O, 2), jnp.float32),
                obs_lm=jnp.full((W, O), -1, jnp.int32),
                obs_valid=jnp.zeros((W, O), bool),
            )
            if self._dist_ba is not None:
                poses_o, _ = self._solve_window_distributed(prob)
                jax.block_until_ready(poses_o)
            else:
                res = ba_window.solve_window(
                    prob, self.cam, iters=bc.iters,
                    huber_delta=bc.huber_delta,
                    damping=bc.damping, n_fixed_poses=2,
                    pose_prior_weight=bc.pose_prior_weight)
                jax.block_until_ready(res.poses)
        except Exception:
            _log.exception("window-BA precompile failed (first real solve "
                           "will compile inline instead)")

    def _run_window_ba(self, force: bool = False) -> None:
        """Sliding-window BA over the active keyframe window (the windowed
        BA the reference scaffolds via Map's active sets but never built,
        SURVEY.md §2.3); refined poses/landmarks are written back to the
        map, and the live pose follows the newest keyframe's correction.

        force=True (deferred re-launch from _poll_ba) bypasses the
        keyframe cadence."""
        bc = self.cfg.ba
        if not bc.enabled or self.map.n_keyframes < bc.min_keyframes:
            return
        if not force:
            self._kf_since_ba += 1
            if self._kf_since_ba < bc.every_n_keyframes:
                return
            self._kf_since_ba = 0
        if bc.asynchronous and self._ba_pending is not None:
            n_behind = self.map.kf_stamp_counter - self._ba_pending["kf_stamp"]
            if n_behind >= bc.max_stale_keyframes and not force:
                # The backend has fallen a full staleness window behind
                # (slow host / slow tunnel: solves span several keyframes).
                # BLOCK for the in-flight solve and apply it now — a
                # bounded stall that degrades toward sync cadence. Without
                # this, refinement lags unboundedly and the un-refined pose
                # chain bends until the chi2 inlier count collapses: the
                # round-3 textured 4,000-frame run stormed into 2,578
                # resets this way (sync-BA control run: 0 resets), because
                # only 445 of ~1,750 scheduled window solves ever ran.
                _log.info(
                    "async BA %d keyframes behind: blocking for the "
                    "in-flight solve (sync-degraded cadence)", n_behind)
                # A deliberate stall must always yield applied refinement:
                # deferred relaunches dispatch at arbitrary keyframe parity,
                # so this path can first trigger at n_behind = limit+1 —
                # without the floor the apply-side staleness gate would
                # discard the very result we just paid a sync stall for
                # (block-then-discard, round-3 advisor). The divergence
                # gate still applies; only the staleness discard is lifted
                # for THIS result.
                self._ba_pending["stale_floor"] = n_behind
                self._ba_pending["fut"].result()
                self._poll_ba()
            if self._ba_pending is not None:
                # one solve in flight at a time; relaunch on completion
                # with a FRESH snapshot (round 1 silently dropped these
                # windows, starving refinement whenever a solve spanned >1
                # keyframe)
                self._ba_deferred = True
                return
        from ya_vo_tpu.ba import window as ba_window

        job = self._build_window_problem()
        if job is None:
            return
        prob, slots, used, n_real = job
        self._last_ba_prob = prob   # kept for gate-rejection dumps
        anchor_old = self.map.kf_pose[slots[-1]].copy()

        def solve():
            t0 = time.perf_counter()
            if self._dist_ba is not None:
                poses_o, lms_o = self._solve_window_distributed(prob)
            else:
                res = ba_window.solve_window(
                    prob, self.cam, iters=bc.iters,
                    huber_delta=bc.huber_delta, damping=bc.damping,
                    n_fixed_poses=2,
                    pose_prior_weight=bc.pose_prior_weight)
                poses_o, lms_o = res.poses, res.landmarks
            out = jax.device_get((poses_o, lms_o))
            return out, (time.perf_counter() - t0) * 1e3

        if bc.asynchronous:
            # backend thread (the two-thread split the reference implements
            # with std::thread for VO+viewer, src/main.cc:11-12, here for
            # frontend+backend): tracking continues while GN runs
            fut = self._ba_executor.submit(solve)
            self._ba_pending = dict(
                fut=fut, slots=slots, used=used, n_real=n_real,
                anchor_old=anchor_old, epoch=self._session_epoch,
                kf_stamp=self.map.kf_stamp_counter,
                lm_stamp=self.map.lm_stamp_counter,
            )
        else:
            (new_poses, new_lms), ms = solve()
            self._apply_ba_result(new_poses, new_lms, slots, used, n_real,
                                  anchor_old, ms)

    def _build_window_problem(self):
        """Snapshot the active window into a fixed-shape, landmark-compacted
        BAProblem. Returns (prob, slots, used, n_real) or None."""
        from ya_vo_tpu.ba import window as ba_window

        bc = self.cfg.ba
        W = self.cfg.map.window_size
        slots, poses, obs_uv, obs_lm, obs_valid = self.map.active_window(W)
        n_real = len(slots)
        if n_real < bc.min_keyframes:
            return None
        # pad the window to the static shape [W, O]
        O = obs_uv.shape[1]
        poses_p = np.tile(np.eye(4, dtype=np.float32), (W, 1, 1))
        poses_p[:n_real] = poses
        uv_p = np.zeros((W, O, 2), np.float32)
        uv_p[:n_real] = obs_uv
        lm_p = np.full((W, O), -1, np.int32)
        lm_p[:n_real] = obs_lm
        ok_p = np.zeros((W, O), bool)
        ok_p[:n_real] = obs_valid
        pv = np.zeros(W, bool)
        pv[:n_real] = True

        # compact: only the window's landmarks enter the problem (a fixed
        # L_cap slice of the 16k global array would waste 4x compute and a
        # 16k-landmark device->host pull per run)
        L_cap = bc.max_window_landmarks
        used, n_drop, n_drop_obs = ba_window.select_window_landmarks(
            lm_p, ok_p, self.map.landmark_alive, L_cap)
        if n_drop:
            self.n_ba_lm_dropped += n_drop
            _log.warning(
                "window BA landmark cap: dropping the %d least-observed of "
                "%d window landmarks (%d observations, "
                "max_window_landmarks=%d) — the best-constrained ones are "
                "kept", n_drop, len(used) + n_drop, n_drop_obs, L_cap)
        remap = np.full(self.map.max_landmarks, -1, np.int32)
        remap[used] = np.arange(len(used), dtype=np.int32)
        lm_compact = np.where(lm_p >= 0, remap[np.maximum(lm_p, 0)], -1)
        ok_p = ok_p & (lm_compact >= 0)
        lms_local = np.zeros((L_cap, 3), np.float32)
        lms_local[: len(used)] = self.map.landmark_pos[used]
        lm_valid = np.zeros(L_cap, bool)
        lm_valid[: len(used)] = True

        prob = ba_window.BAProblem(
            poses=jnp.asarray(poses_p),
            pose_valid=jnp.asarray(pv),
            landmarks=jnp.asarray(lms_local),
            lm_valid=jnp.asarray(lm_valid),
            obs_uv=jnp.asarray(uv_p),
            obs_lm=jnp.asarray(lm_compact),
            obs_valid=jnp.asarray(ok_p),
        )
        return prob, slots, used, n_real

    def _apply_ba_result(self, new_poses, new_lms, slots, used, n_real,
                         anchor_old, ms, kf_stamp_snap=None,
                         lm_stamp_snap=None, stale_floor=0) -> None:
        new_poses = new_poses[:n_real]
        if not (np.all(np.isfinite(new_poses))
                and np.all(np.isfinite(new_lms))):
            return
        if kf_stamp_snap is not None:
            n_stale = self.map.kf_stamp_counter - kf_stamp_snap
            stale_limit = max(
                self.cfg.ba.max_stale_keyframes + self._stale_relax,
                stale_floor)
            if n_stale > stale_limit:
                # the rigid correction below is only a good approximation
                # near the solved window; a result this stale does more
                # harm than good (the deferred re-launch in _poll_ba will
                # solve a fresh window immediately)
                self.n_ba_discarded += 1
                self._consec_stale_discards += 1
                _log.warning(
                    "discarding async BA result: %d keyframes created since "
                    "its snapshot (limit=%d)", n_stale, stale_limit)
                if self._consec_stale_discards >= 3:
                    # slow-host backoff: every solve is outliving the window
                    self._stale_relax += self.cfg.ba.max_stale_keyframes
                    self._consec_stale_discards = 0
                    _log.warning(
                        "async BA: 3 consecutive staleness discards — this "
                        "host solves slower than tracking creates keyframes; "
                        "widening the staleness window to %d so refinement "
                        "applies late instead of never",
                        self.cfg.ba.max_stale_keyframes + self._stale_relax)
                return
            self._consec_stale_discards = 0
            # recover gradually: a transient stall should not permanently
            # loosen the gate
            self._stale_relax = max(0, self._stale_relax - 1)
        # divergence gate — SYNC applies included (round 5: sync solves on
        # a lifecycle-degraded window — e.g. right after a keyframe-block
        # eviction orphan-kills part of the window's landmark set — can
        # diverge exactly like stale async ones, and they used to apply
        # unguarded): corrections of a few step lengths are normal
        # accumulated drift over a wide window and are safe to apply
        # (the re-anchor is rigid and rel_motion-invariant, see below);
        # a correction of 10+ steps means the solve diverged and would
        # teleport the map.
        # scale reference: running MEDIAN of recent step lengths, not
        # the instantaneous step — when the camera is (near-)stationary
        # the instantaneous step collapses to ~0 and the gate would
        # discard healthy corrections exactly while the vehicle stops
        inst = float(np.linalg.norm(self.rel_motion[:3, 3]))
        step = float(np.median(self._recent_steps)) \
            if self._recent_steps else inst
        # drift (what corrections repair) scales with distance
        # traveled, not current speed: floor the scale reference at
        # 10% of the decaying speed peak so crawling doesn't
        # over-tighten the gate
        step = max(step, inst * 0.25, 0.1 * self._peak_step)
        # measure the CENTER displacement, NOT the translation row of
        # inv(anchor_old) @ anchor_new: for world->camera poses that
        # row contains rotation x |camera-to-world-origin| — 700 units
        # into a route, a healthy 0.1 deg rotational refinement reads
        # as a phantom |t| ~ 1.3 while the camera center moved 4 cm
        # (round-3 diagnosis: every "slide" was this artifact)
        corr_try = np.linalg.inv(anchor_old) @ new_poses[-1]
        c_old = -anchor_old[:3, :3].T @ anchor_old[:3, 3]
        c_new = -new_poses[-1][:3, :3].T @ new_poses[-1][:3, 3]
        t_corr = float(np.linalg.norm(c_new - c_old))
        cosang = (np.trace(corr_try[:3, :3]) - 1.0) / 2.0
        r_corr = float(np.degrees(np.arccos(np.clip(cosang, -1, 1))))
        bc = self.cfg.ba
        if (t_corr > bc.max_correction_steps * max(step, 1e-3)
                or r_corr > bc.max_correction_rot_deg):
            self.n_ba_discarded += 1
            kf_now = self.map.kf_pose[slots[-1]]
            _log.warning(
                "discarding %s BA result: correction too large to "
                "apply post-hoc (|t|=%.3f vs step %.3f, rot=%.2f deg); "
                "slots[-1]=%d n_real=%d anchor_old_c=%s kf_now_c=%s "
                "new_c=%s",
                "sync" if kf_stamp_snap is None else "async",
                t_corr, step, r_corr, int(slots[-1]), n_real,
                np.round(-anchor_old[:3, :3].T @ anchor_old[:3, 3], 2),
                np.round(-kf_now[:3, :3].T @ kf_now[:3, 3], 2),
                np.round(-new_poses[-1][:3, :3].T @ new_poses[-1][:3, 3],
                         2))
            self._maybe_dump_rejected_solve(new_poses, t_corr, r_corr)
            return
        self._last_ba_ms = ms
        self.n_ba_runs += 1

        # write back keyframe poses + landmark positions, then re-anchor the
        # live pose: the frame chain since the newest window keyframe is
        # preserved while that keyframe's pose moves from anchor_old to its
        # optimized value (T_live' = T_live anchor_old^-1 anchor_new)
        self.map.update_keyframe_poses(slots, new_poses)
        if lm_stamp_snap is not None:
            # async apply: a `used` slot may have been killed + RECYCLED
            # into a different landmark since the snapshot (stamp moved past
            # the snapshot counter) — never write stale positions into it
            same = (self.map.landmark_stamp[used] < lm_stamp_snap) \
                & self.map.landmark_alive[used]
            self.map.landmark_pos[used[same]] = new_lms[: len(used)][same]
        else:
            self.map.landmark_pos[used] = new_lms[: len(used)]
        anchor_new = new_poses[-1]
        corr = (np.linalg.inv(anchor_old) @ anchor_new).astype(np.float32)
        if _log.isEnabledFor(logging.INFO):
            ca = (np.trace(corr[:3, :3]) - 1.0) / 2.0
            dc = np.linalg.norm(
                (-anchor_new[:3, :3].T @ anchor_new[:3, 3])
                - (-anchor_old[:3, :3].T @ anchor_old[:3, 3]))
            _log.info(
                "BA apply: center_moved=%.4f rot=%.3fdeg stale_kf=%s "
                "solve=%.0fms", float(dc),
                float(np.degrees(np.arccos(np.clip(ca, -1, 1)))),
                "sync" if kf_stamp_snap is None else
                str(self.map.kf_stamp_counter - kf_stamp_snap), ms)

        # anything created AFTER the snapshot still lives in the pre-BA
        # coordinate frame: move those keyframes (T' = T corr) and those
        # landmarks (X' = corr^-1 X as points) into the corrected frame,
        # else the map splits into two inconsistent segments and the next
        # window diverges. Creation STAMPS (not slot ranges) identify them:
        # slots are recycled/shifted under the map lifecycle.
        if kf_stamp_snap is not None:
            sl = np.nonzero(
                self.map.kf_stamp[: self.map.n_keyframes] >= kf_stamp_snap
            )[0]
            if sl.size:
                self.map.kf_pose[sl] = self.map.kf_pose[sl] @ corr
        if lm_stamp_snap is not None:
            hwm = self.map.n_landmarks
            fresh = np.nonzero(
                (self.map.landmark_stamp[:hwm] >= lm_stamp_snap)
                & self.map.landmark_alive[:hwm])[0]
            if fresh.size:
                inv_c = np.linalg.inv(corr)
                pts = self.map.landmark_pos[fresh]
                self.map.landmark_pos[fresh] = (
                    pts @ inv_c[:3, :3].T + inv_c[:3, 3])

        # table consistency: a live-table landmark that was neither
        # re-solved in this window (`used`) nor created after the snapshot
        # (those are corrected by the stamp-based block above) still sits
        # in the PRE-apply coordinate frame; after a rotational correction
        # its reprojection from the corrected live pose is off by ~f*theta
        # px (0.1 deg ~ 1.3 px at fx 718 — enough of those and the chi2
        # inlier count collapses, the round-3 sudden-death mechanism).
        # TRANSFORM them with the same corr^-1 the fresh landmarks get:
        # their live-tracking view stays exactly consistent, and their
        # out-of-window keyframes no longer constrain anything.
        upd = np.zeros(self.map.max_landmarks, bool)
        upd[used] = True
        tl = np.maximum(self.track_lm, 0)
        snap_bound = (lm_stamp_snap if lm_stamp_snap is not None
                      else np.inf)   # sync applies: nothing is post-snapshot
        stranded = (self.track_valid & (self.track_lm >= 0)
                    & ~upd[tl]
                    & (self.map.landmark_stamp[tl] < snap_bound))
        if stranded.any():
            idx = self.track_lm[stranded]
            inv_c = np.linalg.inv(corr)
            pts = self.map.landmark_pos[idx]
            self.map.landmark_pos[idx] = (
                pts @ inv_c[:3, :3].T + inv_c[:3, 3])
        # the retirement archive (offline-refinement geometry) rides the
        # same re-anchor as every other non-window landmark, else it
        # drifts out of the map frame apply by apply
        self.map.transform_archive(np.linalg.inv(corr))

        self.last_pose = (self.last_pose @ corr).astype(np.float32)
        # rel_motion (the frame-to-frame velocity T_curr @ T_prev^-1) is
        # INVARIANT under this rigid re-anchor: both endpoints move by the
        # same right-multiplied corr, which cancels. Recomputing it against
        # the stored (uncorrected) trajectory pose — as this code once did —
        # injected the FULL correction into the next constant-velocity
        # prediction: a meters-sized LK seed error whenever corr was
        # nontrivial, which is exactly the apply-time whiplash that made
        # async BA look "unstable on long runs".
        self._kf_pose = (self._kf_pose @ corr).astype(np.float32)
        if (self.cfg.ba.apply_mode == "device"
                and self.status is VOStatus.TRACKING):
            # compose the rigid re-anchor directly into the DEVICE chain
            # (O(table) device work) instead of marking state dirty: a
            # dirty flag forces a full host->device push AND a re-dispatch
            # of every in-flight pipelined frame — with pipeline_depth 8
            # and a BA apply every ~4 frames that redo tax (~D x 9 ms
            # device) erased most of the deep pipeline's win (round-4
            # measurement). The right-multiplied corr commutes with the
            # frame-to-frame chain, so correcting the newest dispatched
            # state is equivalent (up to float reassociation) to
            # re-tracking from the corrected frontier. BAConfig.apply_mode
            # = "push" restores the bit-exact legacy path.
            self._apply_corr_device(corr)
        else:
            # bootstrap/reset context: host mirrors are authoritative,
            # rebuild the device chain wholesale before the next dispatch
            self._state_dirty = True

    def _maybe_dump_reset(self, rec: dict) -> None:
        """Env-gated observability (YA_VO_DUMP_RESET_DIR): dump the failing
        frame's full slot state — tracked uv, GN inlier mask, landmark
        links/stamps/positions, poses — so a chi2 inlier collapse can be
        audited per landmark (which slots failed, how old, what depth)
        instead of re-derived from counters."""
        import os

        d = os.environ.get("YA_VO_DUMP_RESET_DIR")
        if not d:
            return
        try:
            os.makedirs(d, exist_ok=True)
            (n_flow_d, n_ba_d, _, _, _, _, pose_d, keep_d, flow_ok_d,
             inl_d, *_rest) = rec["pull"]
            tl = np.maximum(self.track_lm, 0)
            np.savez(
                os.path.join(d, f"reset_f{rec['frame_id']}.npz"),
                frame_id=rec["frame_id"],
                n_flow=np.asarray(n_flow_d), n_ba=np.asarray(n_ba_d),
                pose=np.asarray(pose_d), last_pose=self.last_pose,
                rel_motion=self.rel_motion,
                flow_ok=np.asarray(flow_ok_d),
                gn_inlier=np.asarray(inl_d), keep=np.asarray(keep_d),
                track_uv=np.asarray(self._d_track_uv),
                track_lm=self.track_lm,
                track_valid=np.asarray(self._d_track_valid),
                anchor_uv=np.asarray(self._d_anchor_uv),
                lm_pos_dev=np.asarray(self._d_lm_pos),
                lm_stamp=self.map.landmark_stamp[tl],
                lm_alive=self.map.landmark_alive[tl],
                slot_stamp=np.asarray(self._d_slot_stamp),
            )
            _log.warning("reset dump written to %s (frame %d)", d,
                         rec["frame_id"])
        except Exception:
            _log.exception("reset dump failed")

    def _maybe_dump_rejected_solve(self, new_poses, t_corr, r_corr) -> None:
        """Env-gated observability (YA_VO_DUMP_BA_DIR): pickle the window
        problem whose solve the divergence gate just rejected, so weak-mode
        slides can be analyzed offline instead of re-derived from logs."""
        import os
        import pickle

        d = os.environ.get("YA_VO_DUMP_BA_DIR")
        if not d or getattr(self, "_last_ba_prob", None) is None:
            return
        try:
            os.makedirs(d, exist_ok=True)
            path = os.path.join(
                d, f"rejected_f{self.frame_id}_{self.n_ba_discarded}.pkl")
            prob_np = jax.device_get(self._last_ba_prob)
            with open(path, "wb") as f:
                pickle.dump({"prob": prob_np, "new_poses": new_poses,
                             "t_corr": t_corr, "r_corr": r_corr}, f)
            _log.info("dumped gate-rejected BA problem to %s", path)
        except Exception:
            _log.exception("BA problem dump failed")

    def _poll_ba(self) -> None:
        """Apply a finished backend result (frontend-thread side)."""
        if self._ba_pending is None:
            return
        p = self._ba_pending
        if not p["fut"].done():
            return
        self._ba_pending = None
        if p["epoch"] == self._session_epoch:
            try:
                (new_poses, new_lms), ms = p["fut"].result()
            except Exception:
                _log.exception("backend BA solve failed")
            else:
                self._apply_ba_result(
                    new_poses, new_lms, p["slots"], p["used"], p["n_real"],
                    p["anchor_old"], ms, kf_stamp_snap=p["kf_stamp"],
                    lm_stamp_snap=p["lm_stamp"],
                    stale_floor=p.get("stale_floor", 0))
        if self._ba_deferred:
            self._ba_deferred = False
            self._run_window_ba(force=True)

    def finish(self) -> None:
        """Drain in-flight backend work, including deferred re-launches
        (end of sequence)."""
        while self._ba_pending is not None:
            self._ba_pending["fut"].result()
            self._poll_ba()

    # ------------------------------------------------------------------ #
    def _relocalize(self, kp, desc):
        """Scale-consistent recovery: solve the current pose by PnP against
        the SURVIVING map instead of a fresh unit-scale two-view bootstrap.

        Matches the current frame's descriptors against the anchor
        keyframe's, lifts each match to 3-D through the track table (the
        host mirrors hold the anchor keyframe's feature->landmark links —
        LK failures since then never touched them), and runs the robust
        pose GN. Success keeps the map, the trajectory, and crucially the
        METRIC SCALE intact — the reference's reinitialize (src/
        LoopHandler.cc:168-296) re-triangulates at unit scale, so every
        reset there introduces an arbitrary scale jump into the trajectory.

        Returns (pose, uv, lm_idx, inlier_mask, n_inliers) or None.
        """
        if self._kf_desc is None or self._kf_kp is None:
            return None
        mc = self.cfg.matching
        tc = self.cfg.tracking
        m = matching.match(
            self._kf_desc, desc, self._kf_kp.mask, kp.mask,
            abs_threshold=mc.abs_threshold, cross_check=mc.cross_check)
        mmask = np.asarray(m.mask)
        idx2 = np.asarray(m.idx2)
        if mmask.sum() < 12:
            _log.debug("relocalize: only %d descriptor matches", mmask.sum())
            return None

        # anchor-keyframe keypoint index -> track-table slot, by nearest
        # anchor position. Slots NEWLY filled at the anchor keyframe sit
        # exactly on FAST pixels, but KEPT slots were re-anchored at their
        # LK-tracked subpixel positions — a corner FAST re-detects lands
        # within a pixel or two of those, so associate by proximity.
        kf_uv = np.asarray(self._kf_kp.uv)
        # association pool: every slot that HAD a landmark at the anchor
        # keyframe (track_lm is rewritten only at keyframe merges), not
        # just currently-valid tracks — the per-resolve mirror update
        # (round 5) shrinks track_valid as tracks die, and the tracks lost
        # during the failing frames are precisely the ones relocalization
        # must re-find (using track_valid here measurably deepened reset
        # cascades: 18 -> 38 resets by frame 1000 on the longrun route)
        live = self.track_lm >= 0
        live &= self.map.landmark_alive[np.maximum(self.track_lm, 0)]
        r_assoc = 4.0
        K_cap = self.cfg.features.max_keypoints
        pts_w = np.zeros((K_cap, 3), np.float32)
        uv_cur = np.zeros((K_cap, 2), np.float32)
        lm_sel = np.full(K_cap, -1, np.int32)
        uv2 = np.asarray(kp.uv)
        live_idx = np.nonzero(live)[0]
        mi_all = np.nonzero(mmask)[0]
        n = 0
        if live_idx.size and mi_all.size:
            # batched nearest-anchor association (round-3 verdict weak #5:
            # the former dict-grid looped interpreted Python per match,
            # exactly when the system was least healthy). One [M, L]
            # distance matrix (<=2048^2 f32 = 16 MB) + argmin replaces it;
            # result identical — r_assoc(4) < the old 8 px grid cell, so
            # the 3x3-cell search already saw every candidate in radius.
            q = kf_uv[mi_all]                           # [M, 2]
            anchors = self.track_anchor_uv[live_idx]    # [L, 2]
            d2 = ((q[:, None, :] - anchors[None, :, :]) ** 2).sum(-1)
            jbest = np.argmin(d2, axis=1)
            ok = d2[np.arange(len(mi_all)), jbest] < r_assoc * r_assoc
            sel = live_idx[jbest[ok]]                   # track-table slots
            n = int(ok.sum())
            lm_hit = self.track_lm[sel]
            pts_w[:n] = self.map.landmark_pos[lm_hit]
            uv_cur[:n] = uv2[idx2[mi_all[ok]]]
            lm_sel[:n] = lm_hit
        # acceptance: a quarter of the tracking gate (PnP against known
        # 3-D points is far better conditioned than two-view tracking; the
        # chi2 gate inside the robust GN already rejects false poses, and
        # the teleport test pins that a foreign scene cannot pass)
        min_inl = max(15, tc.min_ba_inliers // 6)
        if n < min_inl:
            _log.debug("relocalize: %d of %d matches lift to 3-D (< %d)",
                       n, int(mmask.sum()), min_inl)
            return None

        # prior candidates: the robust GN needs its starting reprojection
        # inside the Huber/chi2 basin, but after a k-frame outage the last
        # constant-velocity estimate is k steps stale — try extrapolations
        # of the last good motion for several gap lengths plus pose-hold
        gap = max(1, self.frame_id - self._last_good_frame)
        obs_mask = jnp.asarray(np.arange(K_cap) < n)
        pts_j, uv_j = jnp.asarray(pts_w), jnp.asarray(uv_cur)
        best = None
        for k in dict.fromkeys([gap, 1, 0, gap + 1]):
            T_prior = np.linalg.matrix_power(
                self.rel_motion, k).astype(np.float32) @ self.last_pose
            solve = pose_solver.solve_pose(
                jnp.asarray(T_prior), pts_j, uv_j, obs_mask, self.cam,
                iters=tc.gn_rounds * tc.gn_iters_per_round,
                huber_delta=tc.huber_delta,
                chi2_threshold=tc.chi2_threshold)
            n_inl = int(solve.n_inliers)
            if best is None or n_inl > best[0]:
                best = (n_inl, solve)
            if n_inl >= max(2 * min_inl, int(0.6 * n)):
                break  # confidently relocalized; stop probing priors
        n_inl, solve = best
        if n_inl < min_inl:
            _log.debug("relocalize: PnP kept %d of %d correspondences "
                       "(< %d)", n_inl, n, min_inl)
            return None
        # hand the full descriptor-match set back too: the caller
        # re-triangulates it against the (now metric) recovered pose to
        # refill the track table — the PnP inliers alone are too thin a
        # seed set to survive the next frame's gates
        mi = np.nonzero(mmask)[0]
        return (np.asarray(solve.pose, np.float32), uv_cur, lm_sel,
                np.asarray(solve.inlier_mask), n_inl,
                (kf_uv[mi], uv2[idx2[mi]]))

    def _apply_relocalization(self, kp, desc, reloc) -> int:
        """Commit a successful PnP relocalization: pose, track table, anchor
        keyframe context, keyframe insertion. Returns the inlier count.

        The PnP inliers alone (often only 20-50 after an outage) cannot
        carry tracking, so the rest of the descriptor matches between the
        old anchor keyframe and this frame are RE-TRIANGULATED with the
        recovered metric pose — a wide-baseline replenishment that refills
        the track table at map scale."""
        pose, uv_cur, lm_sel, inl, n_inl, (kf_uv_m, uv2_m) = reloc
        self.n_relocalizations += 1
        _log.info("frame %d: PnP relocalization with %d inliers "
                  "(map scale preserved)", self.frame_id, n_inl)
        old_kf_pose = self._kf_pose.copy()
        prev_pose = self.trajectory[-1] if self.trajectory \
            else self.last_pose
        self.last_pose = pose
        self.rel_motion = (
            pose @ np.linalg.inv(prev_pose)).astype(np.float32)
        self.track_uv = uv_cur.copy()
        self.track_lm = lm_sel.copy()
        self.track_valid = inl & (lm_sel >= 0)
        self.track_anchor_uv = uv_cur.copy()

        # --- refill: triangulate the remaining matches at metric scale ---
        from ya_vo_tpu.geometry.triangulation import triangulate_fast

        K_np = np.asarray(self.K)
        P1 = jnp.asarray(K_np @ old_kf_pose[:3, :4])
        P2 = jnp.asarray(K_np @ pose[:3, :4])
        ok_m = np.ones(len(kf_uv_m), bool)
        # skip matches that duplicate an accepted PnP correspondence
        acc = uv_cur[self.track_valid]
        if len(acc):
            d2 = ((uv2_m[:, None, :] - acc[None, :, :]) ** 2).sum(-1)
            ok_m &= d2.min(axis=1) > 144.0
        pts, valid = triangulate_fast(
            P1, P2, jnp.asarray(kf_uv_m), jnp.asarray(uv2_m),
            jnp.asarray(ok_m))
        pts, valid = np.asarray(pts), np.asarray(valid) & ok_m
        tc = self.cfg.tracking
        if tc.max_depth_baseline_ratio > 0:
            # same parallax gate as the in-jit replenishment path
            c_kf = -old_kf_pose[:3, :3].T @ old_kf_pose[:3, 3]
            c_cur = -pose[:3, :3].T @ pose[:3, 3]
            baseline = float(np.linalg.norm(c_cur - c_kf))
            z_cur = (pts @ pose[:3, :3].T + pose[:3, 3])[:, 2]
            valid &= z_cur < tc.max_depth_baseline_ratio * max(baseline, 1e-6)
        free = np.nonzero(~self.track_valid)[0]
        take = np.nonzero(valid)[0][: len(free)]
        if take.size:
            if self.map.free_landmark_capacity < take.size:
                self.map.retire_out_of_window(
                    self.cfg.map.window_size,
                    protected=self.track_lm[self.track_valid])
                self.map.recycle_dead(
                    protected=self.track_lm[self.track_valid])
            ids = self.map.add_landmarks(pts[take],
                                         np.ones(take.size, bool))
            dst = free[: take.size][ids >= 0]
            src = take[ids >= 0]
            self.track_uv[dst] = uv2_m[src]
            self.track_anchor_uv[dst] = uv2_m[src]
            self.track_lm[dst] = ids[ids >= 0]
            self.track_valid[dst] = True
            _log.info("relocalization refill: %d fresh landmarks "
                      "triangulated at metric scale", int(dst.size))
        if self.map.n_keyframes >= self.map.max_keyframes:
            self.map.evict_oldest_keyframes(
                max(1, self.map.max_keyframes // 4),
                protected_landmarks=self.track_lm[self.track_valid])
        # fence the BA window at the relocalization: the PnP pose (often
        # only a few dozen inliers) plus its wide-baseline refill is only
        # LOOSELY consistent with the pre-reset keyframes; windows
        # straddling the discontinuity produced growing corrections
        # (rot 0.2 -> 1.1 deg across successive applies) that re-broke
        # tracking — the round-3 post-reloc reset-cluster mechanism.
        self.map.mark_scale_break()
        self.map.insert_keyframe(
            self.frame_id, self.last_pose,
            self.track_uv, self.track_lm, self.track_valid)
        self._session_epoch += 1
        self._state_dirty = True
        self.status = VOStatus.TRACKING
        self._kf_desc, self._kf_kp = desc, kp
        self._kf_pose = self.last_pose.copy()
        self._kf_ref_inliers = int(self.track_valid.sum())
        self._frames_since_kf = 0
        self._last_good_frame = self.frame_id
        return n_inl

    def _reset(self, kp, desc, n_matches=0, n_flow=0, n_ba=0) -> FrameResult:
        """Tracking failed: first try scale-consistent PnP relocalization
        against the surviving map (`_relocalize`); only when that fails —
        e.g. the camera genuinely sees a new scene after a blackout — fall
        back to a fresh two-view bootstrap chained (at unit scale) onto the
        last good pose, which is the reference's reinitialize semantics
        (src/LoopHandler.cc:168-296, scale caveat and all)."""
        self.n_resets += 1
        self._state_dirty = True  # device chain holds the failed frame

        reloc = self._relocalize(kp, desc)
        if reloc is not None:
            n_inl = self._apply_relocalization(kp, desc, reloc)
            return FrameResult(
                self.frame_id, "RESET", self.last_pose.copy(),
                n_matches=n_matches, n_flow_inliers=n_flow,
                n_ba_inliers=n_inl, reset=True, is_keyframe=True)

        ok, info = self._two_view_bootstrap(kp, desc, chain_on_last=True)
        if not ok:
            self.status = VOStatus.INIT
            # hold pose (constant position) until re-init succeeds
        else:
            self.status = VOStatus.TRACKING
            self._kf_desc, self._kf_kp = desc, kp
            self._kf_pose = self.last_pose.copy()
        return FrameResult(
            self.frame_id, "RESET", self.last_pose.copy(),
            n_flow_inliers=n_flow, n_ba_inliers=n_ba, reset=True,
            **{k: v for k, v in info.items()
               if k in ("n_matches", "n_new_landmarks", "is_keyframe")},
        )

    # ------------------------------------------------------------------ #
    def run(self, frames, pipelined: bool = True) -> np.ndarray:
        """Drive a whole sequence; returns [F, 4, 4] world->camera poses
        (reference runVO, src/LoopHandler.cc:517-530).

        Two overlap mechanisms hide the host<->device boundary:
        * the NEXT frame's upload is issued before processing the current
          one (device_put is async), so the transfer rides under compute —
          the reference instead blocks its VO thread on imread
          (src/LoopHandler.cc:917-927);
        * with `pipelined` (default), gate evaluation is deferred one frame
          (see _pipe_step), hiding the ~25 ms tunnel sync per frame behind
          the next frame's compute. `pipelined=False` reproduces the fully
          synchronous reference semantics frame by frame.
        """
        it = iter(frames)
        try:
            pending = jax.device_put(jnp.asarray(next(it)))
        except StopIteration:
            return np.zeros((0, 4, 4), np.float32)
        while pending is not None:
            current = pending
            nxt = next(it, None)
            pending = jax.device_put(jnp.asarray(nxt)) if nxt is not None                 else None
            if pipelined:
                self._pipe_step(current)
            else:
                self.process(current)
        self._pipe_flush()
        self.finish()
        return np.stack(self.trajectory)

    # ------------------------------------------------------------------ #
    def _pipe_step(self, img_dev) -> None:
        """Pipelined frame ingest: dispatch THIS frame's fused step first,
        then resolve the OLDEST in-flight frame's gates and FSM bookkeeping
        once the queue exceeds `tracking.pipeline_depth - 1` — by then its
        async device->host copies have landed under the newer frames'
        compute, so the host never blocks on the tunnel's execution->
        readback latency (~50-100 ms measured; throughput is ~9 ms/step).
        Keyframe and reset decisions consequently apply up to depth-1
        frames late; tracking quality is unaffected because every step
        re-solves its pose against the landmark set it was given, a late
        keyframe only delays anchor replenishment, and a late reset redoes
        the queued dispatches against the rebuilt state (device time only,
        no host sync — see _redo_queue)."""
        self.frame_id += 1
        self._poll_ba()
        img_dev = jnp.asarray(img_dev)
        if self._norm_img is not None:
            img_dev = self._norm_img(img_dev)
        if (self.status != VOStatus.TRACKING or self.last_img is None
                or self._kf_img is None):
            # bootstrap paths are rare and inherently host-driven: drain the
            # pipeline and fall back to the synchronous step
            self._pipe_flush()
            self._process_sync(img_dev)
            return
        if self._state_dirty:
            # BA apply (or an observer) rebuilt host state between frames:
            # push it and re-dispatch any queued stale work — no drain
            self._redo_queue()
        rec = self._dispatch_track(img_dev)
        self._pending_q.append(rec)
        self.last_img = img_dev
        self.last_kp, self.last_desc = rec["kp"], rec["desc"]
        depth = max(1, self.cfg.tracking.pipeline_depth)
        while len(self._pending_q) >= depth:
            self._resolve_record(self._pending_q.popleft())

    def _pipe_flush(self) -> None:
        """Resolve all in-flight frames (end of sequence / mode switch)."""
        while self._pending_q:
            self._resolve_record(self._pending_q.popleft())

    def _resolve_record(self, rec: dict) -> None:
        """Finish a previously dispatched frame: gates, keyframe/BA
        bookkeeping, trajectory. On a reset, the frame dispatched AFTER
        `rec` ran against pre-reset state — it is redone from its stored
        image (its extraction is state-independent and reused)."""
        fid = self.frame_id
        self.frame_id = rec["frame_id"]
        try:
            res = self._finish_track(rec)
            res.timings_ms["frame"] = \
                (time.perf_counter() - rec["t0"]) * 1e3
            if res.reset and res.is_keyframe:
                # reset-bootstrap: record the new anchor keyframe image
                # (device-decided keyframes record theirs in _finish_track)
                self._kf_img = rec["img"]
                self.track_anchor_uv = self.track_uv.copy()
            dirty = self._state_dirty
            if dirty:
                # reset or BA apply rebuilt host state: push it; the device
                # chain advanced past rec with a dispatch that is about to
                # be REDONE below, so the host mirrors are authoritative
                self._push_state_to_device()
            self.trajectory.append(self.last_pose.copy())
            self._emit(res)
        finally:
            self.frame_id = fid

        if dirty and self._pending_q:
            # rec's resolution rebuilt the device state (reset or BA apply)
            # — the optimistically dispatched in-flight frames ran against
            # the OLD state. Re-dispatch them against the fresh state: the
            # wasted dispatches cost device time but no host sync, and
            # resolved results stay exactly what the synchronous path would
            # produce. (A plain device-side keyframe does NOT invalidate
            # anything — in-flight frames already track against the merged
            # table.)
            self._redo_queue()

    def _redo_queue(self) -> None:
        """Re-dispatch every queued in-flight frame against freshly pushed
        device state (after a reset, BA apply, or relocalization rebuilt
        the host mirrors). Device work only — never blocks on the tunnel.
        Frames hitting the INIT fallback are handled synchronously, reusing
        their state-independent extraction."""
        if self._state_dirty:
            self._push_state_to_device()
        if not self._pending_q:
            return
        redos = list(self._pending_q)
        self._pending_q.clear()
        fid = self.frame_id
        for redo in redos:
            if self.status == VOStatus.TRACKING:
                # dispatch under the redo frame's OWN id: the kernel stamps
                # keyframe-merged slots with frame_no (_d_slot_stamp), and a
                # too-new stamp makes _apply_corr_device misclassify those
                # slots as in-flight for up to depth-1 extra frames
                self.frame_id = redo["frame_id"]
                try:
                    rec2 = self._dispatch_track(
                        redo["img"], pre=(redo["kp"], redo["desc"]),
                        prev_override=redo["prev_img"])
                finally:
                    self.frame_id = fid
                rec2["frame_id"] = redo["frame_id"]
                # keep the ORIGINAL predecessor pair for a potential reset
                # bootstrap (each original rec stored its true predecessor)
                rec2["prev_kp"] = redo["prev_kp"]
                rec2["prev_desc"] = redo["prev_desc"]
                self._pending_q.append(rec2)
                self.last_img = redo["img"]
                self.last_kp, self.last_desc = rec2["kp"], rec2["desc"]
            else:
                # re-init failed -> INIT: handle the redo frame's result
                # synchronously, reusing its (state-independent) extraction
                self.frame_id = redo["frame_id"]
                try:
                    res2 = self._handle_init(
                        redo["img"], redo["kp"], redo["desc"])
                    if res2.is_keyframe:
                        self._kf_img = redo["img"]
                        self.track_anchor_uv = self.track_uv.copy()
                    if self._state_dirty:
                        self._push_state_to_device()
                    self.last_img = redo["img"]
                    self.last_kp = redo["kp"]
                    self.last_desc = redo["desc"]
                    self.trajectory.append(self.last_pose.copy())
                    self._emit(res2)
                finally:
                    self.frame_id = fid
