"""Tests for the pose-only GN solver and pyramidal LK flow."""

import jax
import jax.numpy as jnp
import numpy as np

from ya_vo_tpu.core import lie
from ya_vo_tpu.tracking import lk, pose_solver
from ya_vo_tpu.utils import synthetic


class TestPoseSolver:
    def _setup(self, seed=0, n=300, noise=0.0, outlier_frac=0.0):
        rng = np.random.default_rng(seed)
        cam = synthetic.kitti_camera()
        pts = synthetic.random_landmarks(n, seed=seed)
        xi = np.array([0.3, -0.1, 0.5, 0.02, -0.04, 0.01], np.float32)
        T_true = np.asarray(lie.se3_exp(jnp.asarray(xi)))
        pc = pts @ T_true[:3, :3].T + T_true[:3, 3]
        uv = np.stack(
            [
                718.856 * pc[:, 0] / pc[:, 2] + 607.1928,
                718.856 * pc[:, 1] / pc[:, 2] + 185.2157,
            ],
            axis=-1,
        ).astype(np.float32)
        if noise > 0:
            uv += rng.normal(0, noise, uv.shape)
        n_out = int(outlier_frac * n)
        if n_out:
            idx = rng.choice(n, n_out, replace=False)
            uv[idx] += rng.uniform(20, 120, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
        mask = pc[:, 2] > 0.5
        return cam, jnp.asarray(pts), jnp.asarray(uv), jnp.asarray(mask), T_true

    def test_converges_from_identity(self):
        cam, pts, uv, mask, T_true = self._setup()
        res = pose_solver.solve_pose(jnp.eye(4), pts, uv, mask, cam)
        np.testing.assert_allclose(np.asarray(res.pose), T_true, atol=1e-3)
        assert int(res.n_inliers) == int(np.asarray(mask).sum())

    def test_robust_to_outliers(self):
        cam, pts, uv, mask, T_true = self._setup(noise=0.5, outlier_frac=0.25)
        res = pose_solver.solve_pose(jnp.eye(4), pts, uv, mask, cam)
        # rotation within ~0.1 deg, translation within 5 cm
        dR = np.asarray(res.pose)[:3, :3] @ T_true[:3, :3].T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 0.2, ang
        dt = np.linalg.norm(np.asarray(res.pose)[:3, 3] - T_true[:3, 3])
        assert dt < 0.05, dt
        # outliers excluded from the final inlier set
        assert int(res.n_inliers) < int(np.asarray(mask).sum())
        assert int(res.n_inliers) > 0.6 * int(np.asarray(mask).sum())

    def test_warm_start_faster_than_cold(self):
        cam, pts, uv, mask, T_true = self._setup(noise=0.3)
        res = pose_solver.solve_pose(
            jnp.asarray(T_true), pts, uv, mask, cam, iters=5)
        dt = np.linalg.norm(np.asarray(res.pose)[:3, 3] - T_true[:3, 3])
        assert dt < 0.02

    def test_all_masked_is_safe(self):
        cam, pts, uv, mask, T_true = self._setup()
        res = pose_solver.solve_pose(
            jnp.eye(4), pts, uv, jnp.zeros_like(mask), cam)
        assert np.all(np.isfinite(np.asarray(res.pose)))
        assert int(res.n_inliers) == 0


class TestLK:
    def test_pure_translation(self):
        rng = np.random.default_rng(0)
        img0 = rng.uniform(0, 255, (128, 256)).astype(np.float32)
        # smooth it so gradients are informative
        from ya_vo_tpu.features.brief import gaussian_blur
        img0 = np.asarray(gaussian_blur(jnp.asarray(img0), 5, 1.2))
        shift = (3.0, 7.0)  # (dv, du)
        img1 = np.roll(img0, (int(shift[0]), int(shift[1])), axis=(0, 1))
        uv0 = np.stack(
            [rng.uniform(30, 220, 50), rng.uniform(30, 100, 50)], axis=-1
        ).astype(np.float32)
        res = lk.track(
            jnp.asarray(img0), jnp.asarray(img1),
            jnp.asarray(uv0), jnp.asarray(uv0),
            jnp.ones(50, bool),
        )
        ok = np.asarray(res.status)
        assert ok.sum() >= 40
        flow = np.asarray(res.uv)[ok] - uv0[ok]
        np.testing.assert_allclose(
            flow, np.tile([[shift[1], shift[0]]], (ok.sum(), 1)), atol=0.25)

    def test_subpixel_translation(self):
        rng = np.random.default_rng(1)
        base = rng.uniform(0, 255, (140, 140)).astype(np.float32)
        from ya_vo_tpu.features.brief import gaussian_blur
        base = np.asarray(gaussian_blur(jnp.asarray(base), 7, 1.5))
        # sample img1 at half-pixel offset via bilinear (exact model)
        img1 = 0.5 * (base + np.roll(base, -1, axis=1))  # shift u by +0.5...
        # actually rolling -1 then averaging = sampling at u+0.5
        uv0 = np.stack(
            [rng.uniform(20, 120, 30), rng.uniform(20, 120, 30)], axis=-1
        ).astype(np.float32)
        res = lk.track(
            jnp.asarray(base), jnp.asarray(img1),
            jnp.asarray(uv0), jnp.asarray(uv0), jnp.ones(30, bool),
            levels=1,
        )
        ok = np.asarray(res.status)
        flow = np.asarray(res.uv)[ok] - uv0[ok]
        assert ok.sum() >= 25
        np.testing.assert_allclose(flow[:, 0], -0.5, atol=0.15)
        np.testing.assert_allclose(flow[:, 1], 0.0, atol=0.15)

    def test_flat_region_rejected(self):
        img = np.full((100, 100), 77, np.float32)
        uv0 = np.array([[50.0, 50.0]], np.float32)
        res = lk.track(
            jnp.asarray(img), jnp.asarray(img),
            jnp.asarray(uv0), jnp.asarray(uv0), jnp.ones(1, bool),
        )
        assert not bool(res.status[0])

    def test_rendered_scene_flow_matches_projection(self):
        """Track between two rendered frames; recovered flow must match the
        ground-truth projected landmark displacement."""
        imgs, poses, lms, cam = synthetic.render_sequence(
            n_frames=2, n_landmarks=160, height=256, width=512,
            step=0.3, seed=2,
        )
        uv, vis = synthetic.project_tracks(
            lms, poses, cam, 256, 512, margin=24)
        both = vis[0] & vis[1]
        uv0 = uv[0][both]
        uv1_true = uv[1][both]
        shift_true = uv1_true - uv0  # renderer is subpixel-accurate
        res = lk.track(
            jnp.asarray(imgs[0]), jnp.asarray(imgs[1]),
            jnp.asarray(uv0, jnp.float32), jnp.asarray(uv0, jnp.float32),
            jnp.ones(uv0.shape[0], bool),
            # the high-contrast checker stamps interpolate with large
            # photometric deltas at sub-pixel shifts; relax the residual
            # gate so status reflects geometry, not stamp contrast
            max_residual=30.0,
        )
        ok = np.asarray(res.status)
        assert ok.sum() >= 0.5 * len(uv0), (ok.sum(), len(uv0))
        err = np.linalg.norm(
            (np.asarray(res.uv)[ok] - uv0[ok]) - shift_true[ok], axis=-1)
        assert np.median(err) < 0.5, np.median(err)
