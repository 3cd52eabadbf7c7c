"""Real-photograph unit fixtures for the feature/tracking kernels.

Every accuracy number in round 1 came from the stamp-splat synthetic
renderer; this file runs the front-end kernels on an actual KITTI
photograph. The reference repo ships two real 1241x376 KITTI grayscale
renders (reference: tests/epilines.png, tests/epilinesOpencv.png — the same
street-scene frame with different epipolar-line overlays drawn by
3DHandlerTest.cc:175-262). They are loaded read-only from /root/reference;
tests skip when the fixture is absent.

What real imagery exercises that the stamp renderer cannot:
  * FAST on natural texture (trees, road, facades) — corner density and
    spatial spread instead of isolated engineered stamps;
  * BRIEF discriminativity under photographic noise + the thin line overlay
    differences between the two renders (an adversarial perturbation);
  * LK on real texture with aperture-problem structures (road markings,
    building edges) under a known subpixel warp.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

REAL_A = "/root/reference/tests/epilines.png"
REAL_B = "/root/reference/tests/epilinesOpencv.png"

needs_real = pytest.mark.skipif(
    not (os.path.exists(REAL_A) and os.path.exists(REAL_B)),
    reason="reference real-image fixtures not present",
)


def _load(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("L"), np.uint8)


@pytest.fixture(scope="module")
def real_pair():
    return _load(REAL_A), _load(REAL_B)


def _extract(img: np.ndarray):
    import jax.numpy as jnp

    from ya_vo_tpu.config import VOConfig
    from ya_vo_tpu.features import brief, fast

    fc = VOConfig().features
    kp = fast.detect(
        jnp.asarray(img),
        max_keypoints=fc.max_keypoints,
        # pinned to the REFERENCE operating point (FastDetector threshold
        # 40) — these tests document behavior at the reference's config,
        # independent of the pipeline's default (20, see FeatureConfig)
        threshold=40,
        arc_length=fc.fast_arc_length,
        nms_radius=fc.nms_radius,
        border=fc.brief_patch_radius + fc.blur_ksize // 2 + 4,
        harris_k=fc.harris_k,
    )
    offsets = brief.make_offsets(fc.brief_n_bits, fc.brief_patch_radius,
                                 fc.brief_seed)
    blurred = brief.gaussian_blur(
        jnp.asarray(img, jnp.float32), fc.blur_ksize, fc.blur_sigma)
    desc, _ = brief.describe(blurred, kp.uv, kp.mask, offsets)
    return kp, desc


@needs_real
def test_fast_finds_spread_corners_on_real_photo(real_pair):
    """FAST at the reference operating point (threshold 40, FAST-12) must
    find hundreds of corners on a real street scene, spread across the
    image — not clustered in one region (which would starve tracking on
    camera rotation)."""
    img, _ = real_pair
    kp, _ = _extract(img)
    mask = np.asarray(kp.mask)
    uv = np.asarray(kp.uv)[mask]
    assert mask.sum() >= 500, f"only {mask.sum()} corners on real texture"
    H, W = img.shape
    # every horizontal third of the frame contributes corners
    for lo, hi in [(0, W / 3), (W / 3, 2 * W / 3), (2 * W / 3, W)]:
        n = ((uv[:, 0] >= lo) & (uv[:, 0] < hi)).sum()
        assert n >= 50, f"third [{lo:.0f},{hi:.0f}) has only {n} corners"


@needs_real
def test_brief_is_deterministic_and_self_discriminative(real_pair):
    """Seeded BRIEF (fixes reference quirk SURVEY §2.4.6: offsets re-drawn
    per process from std::random_device) must be bit-identical across calls
    and must match an image against itself essentially perfectly."""
    from ya_vo_tpu.features import matching

    img, _ = real_pair
    kp, desc1 = _extract(img)
    _, desc2 = _extract(img)
    np.testing.assert_array_equal(np.asarray(desc1), np.asarray(desc2))

    m = matching.match(desc1, desc2, kp.mask, kp.mask,
                       abs_threshold=20, cross_check=True)
    mask = np.asarray(m.mask)
    idx2 = np.asarray(m.idx2)
    valid = np.asarray(kp.mask)
    # self-match: nearly all keypoints match themselves at distance 0
    self_ok = mask & (idx2 == np.arange(len(idx2)))
    assert self_ok.sum() >= 0.95 * valid.sum()


@needs_real
def test_brief_matching_survives_line_overlay_perturbation(real_pair):
    """The two reference renders are the SAME photograph with different
    epipolar-line overlays (~20% of pixels perturbed by thin black lines).
    Descriptor matching across them is a robustness test: most matches must
    land on the same pixel (zero displacement), with very few gross
    mismatches."""
    from ya_vo_tpu.features import matching

    img_a, img_b = real_pair
    kp_a, desc_a = _extract(img_a)
    kp_b, desc_b = _extract(img_b)
    m = matching.match(desc_a, desc_b, kp_a.mask, kp_b.mask,
                       abs_threshold=20, cross_check=True)
    mask = np.asarray(m.mask)
    assert mask.sum() >= 100, f"only {mask.sum()} cross-overlay matches"
    uv1 = np.asarray(kp_a.uv)[mask]
    uv2 = np.asarray(kp_b.uv)[np.asarray(m.idx2)[mask]]
    disp = np.linalg.norm(uv2 - uv1, axis=1)
    # same underlying frame: the dominant mode is zero displacement
    assert np.median(disp) <= 1.0
    assert (disp < 2.0).mean() >= 0.8, "gross mismatch rate too high"


@needs_real
def test_two_view_on_identical_real_pair_degrades_gracefully(real_pair):
    """The two reference renders are the SAME camera pose (zero baseline):
    epipolar geometry is degenerate-identity, which is itself a testable
    case (reference 3DHandlerTest.cc:175-262 runs its epipolar check on
    exactly this frame). The robust two-view path must not crash and must
    NOT hand back a usable map: with ~zero parallax the triangulation
    quality gate has to reject essentially every point, which is what stops
    the frontend bootstrapping off a stationary pair."""
    import jax
    import jax.numpy as jnp

    from ya_vo_tpu.features import matching
    from ya_vo_tpu.geometry import ransac
    from ya_vo_tpu.utils.synthetic import kitti_camera

    img_a, img_b = real_pair
    kp_a, desc_a = _extract(img_a)
    kp_b, desc_b = _extract(img_b)
    m = matching.match(desc_a, desc_b, kp_a.mask, kp_b.mask,
                       abs_threshold=20, cross_check=True)
    assert int(m.count()) >= 100
    uv2 = kp_b.uv[m.idx2]
    K = jnp.asarray(np.asarray(kitti_camera().K), jnp.float32)
    tv = ransac.estimate_two_view(
        kp_a.uv, uv2, m.mask, K, jax.random.PRNGKey(0),
        n_hypotheses=256, inlier_threshold_px=1.0)

    # zero-displacement correspondences satisfy ANY skew-symmetric E, so a
    # huge "inlier" count is expected and not a bug...
    assert int(tv.n_inliers) >= 50
    # ...but the parallax-quality gate must refuse to mint landmarks: the
    # frontend's bootstrap gate (n_new_landmarks >= min_flow_inliers,
    # tracking/frontend.py _two_view_bootstrap) then keeps status INIT.
    n_valid = int(np.asarray(tv.points_valid).sum())
    assert n_valid <= 0.05 * int(tv.n_inliers), (
        f"{n_valid} 'triangulated' points from a zero-baseline pair — the "
        f"quality gate failed")


def _warp_two_plane(img: np.ndarray, K: np.ndarray, R: np.ndarray,
                    t: np.ndarray, d_top: float, d_bot: float,
                    v_split: int):
    """Synthesize the view of (R, t) assuming the photo is two fronto-
    parallel planes (depth d_top above row v_split, d_bot below) — a
    piecewise plane-induced homography H = K (R - t n^T / d) K^-1.
    A SINGLE plane is degenerate for E estimation (all correspondences
    coplanar); two planes make the two-view problem well-posed while
    keeping the ground truth closed-form.

    Returns (img1, gt_map) where gt_map(uv [N,2]) -> warped uv [N,2]."""
    Kinv = np.linalg.inv(K)
    n = np.array([0.0, 0.0, 1.0])

    def H_for(d):
        return K @ (R - np.outer(t, n) / d) @ Kinv

    H_top, H_bot = H_for(d_top), H_for(d_bot)
    Ht_inv, Hb_inv = np.linalg.inv(H_top), np.linalg.inv(H_bot)

    Hh, Ww = img.shape
    v, u = np.meshgrid(np.arange(Hh, dtype=np.float64),
                       np.arange(Ww, dtype=np.float64), indexing="ij")
    ones = np.ones_like(u)
    tgt = np.stack([u, v, ones], -1)

    # the split line lives in the SOURCE image; map each target pixel
    # through both inverse homographies and pick the one whose source row
    # is consistent with its plane
    out = np.zeros_like(img, np.float32)
    filled = np.zeros(img.shape, bool)
    f = img.astype(np.float64)
    for Hinv, cond in ((Ht_inv, lambda vs: vs < v_split),
                       (Hb_inv, lambda vs: vs >= v_split)):
        src = tgt @ Hinv.T
        us = src[..., 0] / src[..., 2]
        vs = src[..., 1] / src[..., 2]
        ok = (~filled & cond(vs) & (us >= 0) & (us < Ww - 1.001)
              & (vs >= 0) & (vs < Hh - 1.001))
        u0 = np.clip(np.floor(us), 0, Ww - 2).astype(np.int64)
        v0 = np.clip(np.floor(vs), 0, Hh - 2).astype(np.int64)
        fu = np.clip(us - u0, 0, 1)
        fv = np.clip(vs - v0, 0, 1)
        val = (f[v0, u0] * (1 - fu) * (1 - fv) + f[v0, u0 + 1] * fu * (1 - fv)
               + f[v0 + 1, u0] * (1 - fu) * fv + f[v0 + 1, u0 + 1] * fu * fv)
        out = np.where(ok, val, out).astype(np.float32)
        filled |= ok

    def gt_map(uv: np.ndarray) -> np.ndarray:
        H = np.where((uv[:, 1] < v_split)[:, None, None], H_top, H_bot)
        p = np.einsum("nij,nj->ni", H,
                      np.concatenate([uv, np.ones((len(uv), 1))], 1))
        return p[:, :2] / p[:, 2:3]

    return np.clip(out, 0, 255).astype(np.uint8), gt_map, filled


@needs_real
def test_two_view_pose_recovery_on_warped_real_photo(real_pair):
    """match -> RANSAC E -> recoverPose-with-cheirality on REAL texture:
    a second view with known rotation + parallax is synthesized from the
    real frame via a two-plane homography warp, and the recovered (R, t)
    must match the ground truth (t up to monocular scale). This is the
    reference's buildInitMap geometry chain (src/LoopHandler.cc:532-652)
    exercised on real photographic texture."""
    import jax
    import jax.numpy as jnp

    from ya_vo_tpu.core import lie
    from ya_vo_tpu.features import matching
    from ya_vo_tpu.geometry import ransac
    from ya_vo_tpu.utils.synthetic import kitti_camera

    img, _ = real_pair
    K = np.asarray(kitti_camera().K, np.float64)
    # a gentle yaw + lateral/forward translation; planes at 12 m and 25 m
    yaw = np.deg2rad(1.2)
    R_gt = np.array([[np.cos(yaw), 0, np.sin(yaw)],
                     [0, 1, 0],
                     [-np.sin(yaw), 0, np.cos(yaw)]])
    t_gt = np.array([0.35, 0.05, 0.45])
    img1, _gt_map, filled = _warp_two_plane(
        img, K, R_gt, t_gt, d_top=25.0, d_bot=12.0,
        v_split=img.shape[0] // 2)
    assert filled.mean() > 0.8, "warp left most of the frame empty"

    kp0, desc0 = _extract(img)
    kp1, desc1 = _extract(img1)
    m = matching.match(desc0, desc1, kp0.mask, kp1.mask,
                       abs_threshold=20, cross_check=True)
    assert int(m.count()) >= 60, f"only {int(m.count())} matches"

    tv = ransac.estimate_two_view(
        kp0.uv, kp1.uv[m.idx2], m.mask,
        jnp.asarray(K, jnp.float32), jax.random.PRNGKey(1),
        n_hypotheses=512, inlier_threshold_px=1.0)
    assert int(tv.n_inliers) >= 40

    # rotation: exact up to noise
    R_est = np.asarray(tv.R, np.float64)
    dR = R_est @ R_gt.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 0.5, f"rotation error {ang:.3f} deg"
    # translation: direction only (monocular scale is free). The bound is
    # loose: correspondences here are FAST re-detections (about +-1 px
    # localization on resampled texture, no subpixel flow refinement), and
    # with a ~0.57 m baseline against 12-25 m depths that pixel noise maps
    # to several degrees of epipole direction (measured 6.4 deg on CPU).
    t_est = np.asarray(tv.t, np.float64).ravel()
    cosang = abs(t_est @ t_gt) / (
        np.linalg.norm(t_est) * np.linalg.norm(t_gt))
    assert np.degrees(np.arccos(np.clip(cosang, -1, 1))) < 10.0
    # cheirality: the winning candidate must put (nearly) all inlier
    # points in front of both cameras, and the quality gate must keep a
    # healthy fraction (real parallax this time)
    assert int(np.asarray(tv.points_valid).sum()) >= 0.5 * int(tv.n_inliers)


def _bilinear_shift(img: np.ndarray, dx: float, dy: float) -> np.ndarray:
    """img1[v, u] = img0[v + dy, u + dx] with bilinear interpolation, so a
    feature at (u0, v0) moves to (u0 - dx, v0 - dy)."""
    H, W = img.shape
    v, u = np.meshgrid(np.arange(H, dtype=np.float64),
                       np.arange(W, dtype=np.float64), indexing="ij")
    us = np.clip(u + dx, 0, W - 1.001)
    vs = np.clip(v + dy, 0, H - 1.001)
    u0 = np.floor(us).astype(np.int64)
    v0 = np.floor(vs).astype(np.int64)
    fu = us - u0
    fv = vs - v0
    f = img.astype(np.float64)
    out = (
        f[v0, u0] * (1 - fu) * (1 - fv)
        + f[v0, u0 + 1] * fu * (1 - fv)
        + f[v0 + 1, u0] * (1 - fu) * fv
        + f[v0 + 1, u0 + 1] * fu * fv
    )
    return out.astype(np.float32)


@needs_real
def test_lk_tracks_real_texture_to_subpixel(real_pair):
    """Pyramidal LK on real photographic texture: warp the photo by a known
    subpixel translation and require sub-quarter-pixel median endpoint
    error. The stamp renderer cannot test this — its features are isolated
    high-contrast patches; real texture has low-contrast regions, repeated
    structure, and aperture-problem edges that the conditioning gate must
    reject rather than mistrack."""
    import jax.numpy as jnp

    from ya_vo_tpu.tracking import lk

    img, _ = real_pair
    dx, dy = 3.37, -2.61
    img1 = _bilinear_shift(img, dx, dy)

    kp, _ = _extract(img)
    mask = np.asarray(kp.mask)
    uv0 = np.asarray(kp.uv)
    # keep keypoints whose window stays in-bounds after the shift
    H, W = img.shape
    margin = 24
    ok = (mask & (uv0[:, 0] > margin) & (uv0[:, 0] < W - margin)
          & (uv0[:, 1] > margin) & (uv0[:, 1] < H - margin))

    flow = lk.track(
        jnp.asarray(img, jnp.float32), jnp.asarray(img1),
        jnp.asarray(uv0), jnp.asarray(uv0), jnp.asarray(ok),
        levels=3, half=5, iters=30, eps=0.01,
    )
    status = np.asarray(flow.status) & ok
    assert status.sum() >= 0.7 * ok.sum(), "too many tracks rejected"
    err = np.linalg.norm(
        np.asarray(flow.uv)[status] - (uv0[status] + [-dx, -dy]), axis=1)
    assert np.median(err) < 0.25, f"median endpoint error {np.median(err)}"
    assert (err < 1.0).mean() >= 0.9
