"""Single explicit configuration for the whole pipeline.

Supersedes the reference's split config story: jsoncpp `{basePath, sequence,
cameraType}` (reference: config/KITTI.json:1-6, src/LoopHandler.cc:7-33) plus
a long tail of hardcoded constants (FAST threshold/N at
include/FastDetector.hpp:32-38, BRIEF params src/BriefDescriptor.cc:4-20,:90,
RANSAC 400/0.1 src/LoopHandler.cc:567, LK window src/LoopHandler.cc:372-375,
chi2/round counts src/LoopHandler.cc:811-838, inlier gates :144,:151).
Every one of those knobs is an explicit field here.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field


@dataclass(frozen=True)
class FeatureConfig:
    # FAST-12 on a Bresenham radius-3 circle (reference FastDetector.hpp:32-38;
    # ctor args were ignored there — here they are real).
    # Ring threshold 20, NOT the reference's hardcoded 40: detection here
    # keeps the top `max_keypoints` by HARRIS response, so the ring
    # threshold is a RECALL knob, not a precision knob — in corner-rich
    # scenes the Harris ranking selects the same strong corners either
    # way, while in low-contrast stretches 40 starves the tracker (round-3
    # textured longrun: ~850 corners -> inliers pinned at the reset gate;
    # at 20 the same frames fill the full 2048 budget and 1-frame matches
    # double). The reference has no NMS/top-K interplay to exploit: it
    # ranks-then-keeps 2000 too, but its hand-rolled detector was never
    # run on low-contrast imagery (KITTI daylight only).
    fast_threshold: int = 20
    fast_arc_length: int = 12
    max_keypoints: int = 2048          # reference keeps top 2000 (FastDetector.cc:353)
    nms_radius: int = 3                # 0 disables; reference has no NMS
    harris_k: float = 0.04             # FastDetector.cc:270
    # BRIEF-256 (reference BriefDescriptor.cc:4-20): offsets uniform in
    # [-patch_radius, patch_radius], fixed SEEDED table (fixes quirk §2.4.6).
    brief_n_bits: int = 256
    brief_patch_radius: int = 8
    brief_seed: int = 42
    blur_sigma: float = 2.5            # 9x9 sigma 2.5 pre-blur (BriefDescriptor.cc:90)
    blur_ksize: int = 9
    # Global photometric normalization on ingest (remap every frame to
    # mean 128 / std 48). DEFAULT OFF — measured round 4 it is actively
    # HARMFUL on realistic imagery: global frame statistics track scene
    # COMPOSITION (sky fraction, nearby walls), so pinning them injects
    # frame-to-frame photometric churn far larger than the slow exposure
    # drift it was meant to cancel (1,400-frame textured route: 876
    # resets with it vs 3 without). Exposure robustness belongs at the
    # LK-window level (zero-mean/ZNCC residuals), not global gain. Kept
    # as a knob for genuinely exposure-unstable, composition-stable
    # inputs.
    photometric_norm: bool = False


@dataclass(frozen=True)
class MatchConfig:
    # keep if hamming < max(2*min_dist, abs_threshold)
    # (reference BriefDescriptor.cc:225, called with 20 at LoopHandler.cc:537)
    abs_threshold: int = 20
    cross_check: bool = True           # mutual-best filter (reference is one-way)


@dataclass(frozen=True)
class RansacConfig:
    # reference: 400 iters, algebraic threshold 0.1 (LoopHandler.cc:567) for F;
    # OpenCV E-RANSAC conf .999 / 1.0 px (LoopHandler.cc:581). We score with
    # Sampson error in pixels.
    n_hypotheses: int = 512
    sample_size: int = 8
    inlier_threshold_px: float = 1.0
    seed: int = 7


@dataclass(frozen=True)
class TrackConfig:
    # LK template source. "prev": track last frame -> current frame, the
    # reference's trackLastFrame semantics (cv::calcOpticalFlowPyrLK over
    # consecutive frames, src/LoopHandler.cc:306-449) — templates are ONE
    # frame old, so per-frame appearance change (scale/perspective under
    # forward motion) is ~1% and tracks survive until they leave the FOV
    # or fail the pose-GN chi2 leash. "anchor": track the anchor KEYFRAME's
    # image -> current (rounds 1-4 behavior) — drift-free templates, but
    # at 0.8 units/frame forward motion a near-field template is stale
    # after ~3 frames and LK's photometric gate kills it: measured
    # per-frame track loss 20-30%, median track lifetime ~4 frames, track
    # population pinned at ~1.2x the decay floor, and every route
    # disturbance (turn, lighting trough, landmark retirement) tipped the
    # production-gate run into a reset (round-5 longrun: 1,443 resets in
    # 3,800 frames). With "prev", the same route tracks at 5-10x the
    # inlier margin. Geometric drift along a track is bounded by the
    # per-frame chi2 gate against the landmark's reprojection.
    lk_template: str = "prev"
    # pyramidal LK (reference: 11x11, 3 levels, 30 iters, eps .01,
    # LoopHandler.cc:372-375)
    lk_window: int = 11
    lk_levels: int = 3
    lk_iters: int = 30
    lk_eps: float = 0.01
    # photometric residual gate: pass if mean |I - T| <
    # max(lk_max_residual, lk_rel_residual * std(template)). Absolute-only
    # gating cannot work on real imagery: measured on a real KITTI photo,
    # perfectly tracked high-contrast windows leave residual ~0.2-0.38x the
    # template's std (resampling blur), mistracks leave >= 0.7x — see
    # tests/test_real_images.py.
    lk_max_residual: float = 12.0
    lk_rel_residual: float = 0.5
    # pose-only GN/LM (reference: chi2 5.991, 4 rounds x 10 iters, Huber,
    # LoopHandler.cc:811-838)
    gn_rounds: int = 4
    gn_iters_per_round: int = 10
    chi2_threshold: float = 5.991
    huber_delta: float = 2.4477        # sqrt(5.991), matches g2o default usage
    # state-machine gates (reference LoopHandler.cc:144, :151)
    min_flow_inliers: int = 2
    min_ba_inliers: int = 100
    keyframe_min_inlier_ratio: float = 0.5
    min_keyframe_gap: int = 1          # frames between keyframes unless
                                       # tracking is close to the failure gate
    # Rotation trigger: keyframe once the camera has rotated this many
    # degrees since the last keyframe. DEFAULT OFF (0) — measured round 4
    # at 1.5 deg on the textured longrun route it FLOODED keyframes
    # (1,176 keyframes in 1,400 frames: every turn frame fired), churning
    # the landmark table and evicting the map out from under the tracker
    # (432 resets vs 3 stock). The decay + translation triggers already
    # keep the anchor fresh enough through the route's 0.7 deg/frame
    # turns. Kept as a knob for slow-translation / fast-pan rigs.
    keyframe_max_rotation_deg: float = 0.0
    # parallax trigger: keyframe once the camera has translated this far
    # (map units; the two-view bootstrap fixes the unit) since the last
    # keyframe, even if inliers are healthy. Landmark DEPTH accuracy is set
    # by triangulation baseline, so inlier-decay alone (which a robust
    # tracker rarely trips) starves the map of fresh well-conditioned
    # landmarks. <= 0 disables.
    keyframe_max_translation: float = 1.5
    # Pipelined-ingest depth: how many dispatched frames may be in flight
    # before the oldest one's FSM gates are resolved. The tunneled TPU
    # backend has ~50-100 ms execution->readback LATENCY but ~9 ms/step
    # THROUGHPUT (round-4 measurement); depth-1 frame periods must cover
    # the latency for gate reads to land for free. Gate/keyframe/reset
    # decisions apply up to depth-1 frames late; on a reset or BA apply the
    # in-flight dispatches are redone against the rebuilt state (device
    # time only), so results remain what the synchronous path produces.
    # 2 reproduces the round-3 single-slot pipelining.
    pipeline_depth: int = 8
    # Replenishment landmark parallax gate: accept a freshly triangulated
    # landmark only if its depth is below this multiple of the
    # triangulation baseline (z/B < 45 ~ parallax > 1.3 deg). Without it
    # the hot-path triangulation accepts anything closer than 500 map
    # units, and under a keyframe-per-frame cadence (~1 unit baselines)
    # far landmarks carry tens of units of depth error — enough of them
    # and the pose solve's chi2 inlier count collapses, which is exactly
    # the 4,000-frame textured-run reset storm diagnosed in round 3
    # (healthy LK flow, n_ba 164 -> 27 in one frame). <= 0 disables.
    max_depth_baseline_ratio: float = 45.0


@dataclass(frozen=True)
class MapConfig:
    # Landmark slot capacity. Host-side cost is trivial (~20 B/slot; the
    # device table is the separate K_cap-sized track slice), so size it
    # for the target sequence: live landmarks accrue ~30/frame at the
    # production keyframe cadence, and 131072 covers a KITTI-00-length
    # (4,541-frame) run WITHOUT ever entering retirement pressure.
    # Measured round 5 (longrun route, real chip): each
    # retire_out_of_window + recycle_dead wave at the old 16384 cap was
    # followed within ~4 frames by a live-track collapse and a reset
    # cascade (53 resets by frame 1100; the identical run with retirement
    # never triggering: 0 resets, every turn and keyframe-block eviction
    # included). Retirement still guards unbounded sequences; see
    # MapStore.retire_out_of_window for the wave-size cap that bounds the
    # damage when it does run. (The reference's Map grows without bound,
    # include/Map.hpp:29-34 — this default trades a few MB of host RAM
    # for never hitting the lifecycle cliff on its target workload.)
    max_landmarks: int = 131072
    max_keyframes: int = 512
    window_size: int = 8               # sliding-window BA keyframes


@dataclass(frozen=True)
class BAConfig:
    enabled: bool = True
    iters: int = 8
    huber_delta: float = 2.4477
    damping: float = 1e-4
    min_keyframes: int = 3             # don't run BA below this window fill
    # Backend cadence: solve every 3rd keyframe. Measured round 4 (TPU,
    # both the stamps and textured worlds, pipeline_depth=8): every-3
    # BEATS every-2 on BOTH throughput (+45%: fewer ~15 ms solves sharing
    # the chip + fewer apply-time redo bursts) and accuracy (textured ATE
    # 0.027 vs 0.050: each solve sees a wider-baseline window and fewer
    # half-converged corrections thrash the live chain).
    every_n_keyframes: int = 3
    max_window_landmarks: int = 4096   # compacted landmark capacity
    # Run BA on a backend thread (the reference's two-thread split,
    # src/main.cc:11-12, applied to frontend+backend). Stability rests on
    # three mechanisms in tracking/frontend.py: the solver is PRECOMPILED
    # on the backend thread at init (a mid-sequence ~0.9 s jit compile once
    # delayed an apply by 6 frames, whose oversized correction whiplashed
    # the map — the round-1 "destabilizes long runs" bug), results staler
    # than max_stale_keyframes are discarded, and a solve request arriving
    # while one is in flight re-launches on completion with a fresh
    # snapshot instead of being dropped.
    #
    # DEFAULT: SYNCHRONOUS (flipped round 5, measured). On the tunneled
    # v5e the async path's corrections apply 4-6 keyframes stale (solve
    # ~150-300 ms wall vs ~15 ms device: readback latency + contention
    # with the depth-8 pipelined frontend), and the late rigid re-anchors
    # inject a SYSTEMATIC monocular scale slide (+1.8% over a 410-frame
    # production route, local-Sim(3) probe) plus occasional chi2 inlier
    # collapses -> resets. Same commit, same workload, same gates:
    #   async: ATE_sim3 0.25-0.71 across runs, 0-1 resets, 8.5-21.3 fps
    #   sync:  ATE_sim3 0.121,     0 resets, 0 discards, 17.3-18.8 fps
    # The blocking solve costs nothing measurable here because the
    # per-frame budget is already dominated by the same tunnel latency
    # the pipeline hides. Async remains fully supported (staleness/
    # divergence/scale-break gates all tested) for hardware where solve
    # latency is genuinely small vs the keyframe period.
    asynchronous: bool = False
    # Discard an async result if this many keyframes were created after its
    # snapshot: the rigid post-hoc correction is only a good approximation
    # near the solved window.
    max_stale_keyframes: int = 4
    # Trust-region pose prior for LIVE backend solves (passed through to
    # ba/window.solve_window and the distributed solvers): w/2 *
    # ||log(T T_tracked^-1)||^2 anchors each window pose to the tracked
    # estimate. Forward-motion monocular windows have a weakly-constrained
    # scale mode (short observation arcs); without the prior the solver
    # ratcheted ~1-unit translation "corrections" with ~0 rotation along
    # the corridor axis — the round-3 textured-longrun collapse. The
    # generic solver keeps default 0 (unbiased GN for offline problems);
    # the live backend opts in because ITS input poses are fresh tracked
    # estimates, trustworthy to ~0.01 units.
    pose_prior_weight: float = 100.0
    # Trust-region prior for OFFLINE sweeps (ba/global_refine). Separate
    # from the live weight: offline windows solve against the COMPLETE
    # full-session observation set (retirement archive restored), so the
    # data constrains far more directions and a heavy prior mostly drags
    # poses back toward the unrefined estimates (round-5 sync sweep:
    # w=100 gave 2.6%-to-negative refinement; w=10 tracked the data).
    # 0 stays dangerous (monocular scale-mode ratchet, see above).
    offline_pose_prior_weight: float = 10.0
    # Backend solver placement: "auto" shards the window's landmark axis
    # over ALL visible devices (parallel/dist_ba.make_dist_solver — one
    # psum of the reduced camera system per GN iteration, riding ICI) when
    # more than one device is present and max_window_landmarks divides
    # evenly; "off" always uses the single-device ba/window solver. The
    # live-pipeline extension axis the reference never had (SURVEY.md §5
    # "distributed backend": absent).
    distributed: str = "auto"
    # How a BA correction reaches the device-resident tracking chain:
    #   "push" (default): mark state dirty, push the host mirrors wholesale
    #     and re-dispatch in-flight pipelined frames against them (the
    #     redo reuses each frame's cached extraction, so it costs only the
    #     state-dependent tail). Bit-identical to the synchronous driver,
    #     and every in-flight frame immediately tracks against the
    #     solver's REFINED landmark positions.
    #   "device": compose the rigid re-anchor into the device state in
    #     place and rotate in-flight frames' outputs at resolve time — no
    #     push, no redo. ~20% faster at pipeline_depth 8, but in-flight
    #     frames (including their keyframe triangulations) keep tracking
    #     against pre-refinement landmarks for up to an apply cycle;
    #     measured round 4 this costs 2-10x raw-trajectory ATE on long
    #     runs. Kept as an option for latency-critical deployments where
    #     the offline global refine recovers the accuracy.
    apply_mode: str = "push"
    # Divergence gate: discard an async result whose re-anchoring
    # correction moves the anchor keyframe's camera CENTER by more than
    # this many (median) per-frame step lengths, or rotates it by more
    # than this many degrees. Center displacement, NOT the translation row
    # of the relative transform: for world->camera poses that row carries
    # rotation x |camera-to-world-origin| — far into a route a healthy
    # 0.1 deg refinement reads as a phantom multi-unit "translation"
    # (round-3 diagnosis). Healthy corrections measure <= ~0.1 steps of
    # center motion; 1.0 is a pure teleport guard.
    max_correction_steps: float = 1.0
    max_correction_rot_deg: float = 12.0


@dataclass(frozen=True)
class VOConfig:
    # dataset (reference config/KITTI.json:1-6)
    base_path: str = ""
    sequence: str = "00"
    camera_type: str = "mono"
    image_height: int = 376            # KITTI gray (LoopHandlerTest.cc:29-30)
    image_width: int = 1241
    features: FeatureConfig = field(default_factory=FeatureConfig)
    matching: MatchConfig = field(default_factory=MatchConfig)
    ransac: RansacConfig = field(default_factory=RansacConfig)
    tracking: TrackConfig = field(default_factory=TrackConfig)
    map: MapConfig = field(default_factory=MapConfig)
    ba: BAConfig = field(default_factory=BAConfig)

    @staticmethod
    def from_json(path: str) -> "VOConfig":
        """Load a config JSON. Accepts both this framework's full schema and
        the reference's 3-key schema (basePath/sequence/cameraType), and
        tolerates // line comments (the reference's jsoncpp accepted them —
        its own KITTI_mock_test.json contains one, SURVEY.md §2.2)."""
        import re

        with open(path) as f:
            text = f.read()
        # strip whitespace-preceded // comments (not "://" inside URLs)
        text = re.sub(r"(?m)(^|\s)//.*$", r"\1", text)
        return VOConfig.from_dict(json.loads(text))

    @staticmethod
    def from_dict(raw: dict) -> "VOConfig":
        # reference-schema compatibility
        alias = {"basePath": "base_path", "cameraType": "camera_type"}
        top = {alias.get(k, k): v for k, v in raw.items()}
        kwargs = {}
        for f_ in dataclasses.fields(VOConfig):
            if f_.name not in top:
                continue
            v = top[f_.name]
            if dataclasses.is_dataclass(f_.type) or f_.name in (
                "features", "matching", "ransac", "tracking", "map", "ba"
            ):
                sub_cls = {
                    "features": FeatureConfig, "matching": MatchConfig,
                    "ransac": RansacConfig, "tracking": TrackConfig,
                    "map": MapConfig, "ba": BAConfig,
                }[f_.name]
                # Tolerate keys from older schema revisions (e.g. the
                # retired MatchConfig.max_matches): drop with a warning
                # instead of TypeError, so saved configs keep loading
                # across framework upgrades — the reference's jsoncpp
                # reader was similarly lenient (src/LoopHandler.cc:8-11).
                known = {sf.name for sf in dataclasses.fields(sub_cls)}
                unknown = set(v) - known
                if unknown:
                    import warnings
                    warnings.warn(
                        f"config section '{f_.name}': ignoring unknown "
                        f"key(s) {sorted(unknown)}", stacklevel=2)
                kwargs[f_.name] = sub_cls(
                    **{k: x for k, x in v.items() if k in known})
            else:
                kwargs[f_.name] = v
        return VOConfig(**kwargs)

    def to_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2)
