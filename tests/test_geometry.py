"""Geometry tests: 8-point F on exact correspondences, Sampson error
behavior, essential decomposition recovering known (R, t), batched DLT
triangulation round-trips, and full vmapped-RANSAC two-view recovery with
outliers. These are the with-asserts versions of what the reference only
eyeballed via epipolar-line renders (reference tests/3DHandlerTest.cc)."""

import jax
import jax.numpy as jnp
import numpy as np

from ya_vo_tpu.core import lie
from ya_vo_tpu.geometry import epipolar, ransac, triangulation
from ya_vo_tpu.utils import synthetic


def _two_view_setup(seed=0, n=200, noise=0.0, rotvec=(0.02, -0.03, 0.01),
                    tvec=(1.0, 0.1, 0.3)):
    """Exact synthetic two-view geometry with known relative pose."""
    rng = np.random.default_rng(seed)
    cam = synthetic.kitti_camera()
    K = np.asarray(cam.K)
    pts_w = synthetic.random_landmarks(n, seed=seed)
    R = np.asarray(lie.so3_exp(jnp.asarray(rotvec, jnp.float32)))
    t = np.asarray(tvec, np.float32)
    # view1 = identity; view2: x2 = R x1 + t
    p1 = pts_w
    p2 = pts_w @ R.T + t
    uv1 = (p1[:, :2] / p1[:, 2:3]) * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
    uv2 = (p2[:, :2] / p2[:, 2:3]) * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
    if noise > 0:
        uv1 = uv1 + rng.normal(0, noise, uv1.shape)
        uv2 = uv2 + rng.normal(0, noise, uv2.shape)
    valid = (p1[:, 2] > 0.1) & (p2[:, 2] > 0.1)
    return (
        jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
        jnp.asarray(valid), jnp.asarray(K, jnp.float32), R, t, pts_w,
    )


class TestEightPoint:
    def test_exact_epipolar_constraint(self):
        uv1, uv2, mask, K, R, t, _ = _two_view_setup()
        F = epipolar.eight_point(uv1, uv2, mask)
        err = epipolar.epipolar_error(F, uv1, uv2)
        # algebraic error tiny for exact correspondences
        assert float(jnp.max(jnp.where(mask, err, 0.0))) < 1e-3

    def test_rank_two(self):
        uv1, uv2, mask, K, *_ = _two_view_setup()
        F = epipolar.eight_point(uv1, uv2, mask)
        s = np.linalg.svd(np.asarray(F), compute_uv=False)
        assert s[2] < 1e-6 * s[0]

    def test_sampson_zero_on_exact(self):
        uv1, uv2, mask, K, *_ = _two_view_setup()
        F = epipolar.eight_point(uv1, uv2, mask)
        err = epipolar.sampson_error(F, uv1, uv2)
        assert float(jnp.max(jnp.where(mask, err, 0.0))) < 1e-3  # px^2

    def test_batched_hypotheses(self):
        uv1, uv2, mask, K, *_ = _two_view_setup(n=64)
        s1 = jnp.stack([uv1[:8], uv1[8:16]])
        s2 = jnp.stack([uv2[:8], uv2[8:16]])
        m = jnp.ones((2, 8), bool)
        F = epipolar.eight_point(s1, s2, m)
        assert F.shape == (2, 3, 3)
        err = epipolar.sampson_error(F, uv1[None], uv2[None])
        assert err.shape == (2, uv1.shape[0])
        assert float(jnp.median(err)) < 1e-2


class TestEssential:
    def test_decompose_recovers_motion(self):
        uv1, uv2, mask, K, R_true, t_true, _ = _two_view_setup()
        F = epipolar.eight_point(uv1, uv2, mask)
        E = epipolar.essential_from_fundamental(F, K, K)
        Rs, ts = epipolar.decompose_essential(E)
        t_unit = t_true / np.linalg.norm(t_true)
        # one of the 4 candidates must match (R, +-t_unit up to E sign)
        best_r = min(np.linalg.norm(np.asarray(Rs[i]) - R_true) for i in range(4))
        best_t = min(
            min(np.linalg.norm(np.asarray(ts[i]) - t_unit),
                np.linalg.norm(np.asarray(ts[i]) + t_unit))
            for i in range(4)
        )
        assert best_r < 5e-3, best_r
        assert best_t < 5e-3, best_t


class TestTriangulation:
    def test_roundtrip_exact(self):
        uv1, uv2, mask, K, R, t, pts_w = _two_view_setup(n=150)
        eye34 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
        P1 = K @ eye34
        P2 = K @ jnp.asarray(np.concatenate([R, t[:, None]], axis=1), jnp.float32)
        pts, valid = triangulation.triangulate(P1, P2, uv1, uv2, mask)
        sel = np.asarray(valid)
        assert sel.sum() > 140
        err = np.linalg.norm(np.asarray(pts)[sel] - pts_w[sel], axis=-1)
        rel = err / pts_w[sel][:, 2]
        assert np.median(rel) < 2e-3, np.median(rel)

    def test_behind_camera_rejected(self):
        uv1, uv2, mask, K, R, t, pts_w = _two_view_setup(n=50)
        eye34 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
        P1 = K @ eye34
        # reversed baseline: points should mostly fail cheirality in cam2...
        # instead test directly: flip t so triangulated points go behind
        P2 = K @ jnp.asarray(
            np.concatenate([R, -5000.0 * t[:, None]], axis=1), jnp.float32)
        pts, valid = triangulation.triangulate(P1, P2, uv1, uv2, mask)
        # degenerate geometry: far fewer valid points than the honest setup
        assert int(valid.sum()) < int(mask.sum())

    def test_reprojection_errors(self):
        uv1, uv2, mask, K, R, t, pts_w = _two_view_setup(n=80)
        eye34 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
        P1 = K @ eye34
        errs = triangulation.reprojection_errors(
            P1, jnp.asarray(pts_w), uv1)
        assert float(jnp.max(jnp.where(mask, errs, 0))) < 1e-2


class TestRansac:
    def test_recovers_pose_with_outliers(self):
        uv1, uv2, mask, K, R_true, t_true, _ = _two_view_setup(
            n=256, noise=0.3)
        # corrupt 30% of matches
        rng = np.random.default_rng(9)
        n = uv1.shape[0]
        bad = rng.random(n) < 0.3
        uv2_np = np.array(uv2)
        uv2_np[bad] = rng.uniform([0, 0], [1241, 376], (bad.sum(), 2))
        uv2c = jnp.asarray(uv2_np, jnp.float32)

        res = ransac.estimate_two_view(
            uv1, uv2c, mask, K, jax.random.PRNGKey(0),
            n_hypotheses=512, inlier_threshold_px=1.5,
        )
        n_in = int(res.n_inliers)
        assert n_in > 0.6 * (~bad).sum(), n_in
        # recovered rotation close to truth; translation parallel to truth
        assert np.linalg.norm(np.asarray(res.R) - R_true) < 2e-2
        t_unit = t_true / np.linalg.norm(t_true)
        cos = abs(float(np.dot(np.asarray(res.t), t_unit)))
        assert cos > 0.999, cos
        # inliers are mostly the uncorrupted ones
        inl = np.asarray(res.inlier_mask)
        assert (inl & bad).sum() < 0.05 * n
        # triangulated cheirality votes dominate
        assert int(res.n_cheirality) > 0.8 * n_in

    def test_deterministic_given_key(self):
        uv1, uv2, mask, K, *_ = _two_view_setup(n=128, noise=0.2)
        r1 = ransac.estimate_two_view(uv1, uv2, mask, K, jax.random.PRNGKey(3))
        r2 = ransac.estimate_two_view(uv1, uv2, mask, K, jax.random.PRNGKey(3))
        np.testing.assert_array_equal(np.asarray(r1.F), np.asarray(r2.F))
        assert int(r1.n_inliers) == int(r2.n_inliers)
