"""Unit tests for SO(3)/SE(3) ops — closed-form and round-trip checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ya_vo_tpu.core import lie


def random_se3(rng, n=()):
    w = rng.normal(size=n + (3,)) * 0.5
    v = rng.normal(size=n + (3,))
    xi = np.concatenate([v, w], axis=-1).astype(np.float32)
    return jnp.asarray(xi)


class TestSO3:
    def test_exp_identity(self):
        R = lie.so3_exp(jnp.zeros(3))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)

    def test_exp_known_axis(self):
        # 90 degrees about z
        R = lie.so3_exp(jnp.array([0.0, 0.0, np.pi / 2]))
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
        np.testing.assert_allclose(R, expected, atol=1e-6)

    def test_orthonormal(self, rng):
        w = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
        R = lie.so3_exp(w)
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)

    def test_log_roundtrip(self, rng):
        w = jnp.asarray((rng.normal(size=(64, 3)) * 0.8).astype(np.float32))
        np.testing.assert_allclose(lie.so3_log(lie.so3_exp(w)), w, atol=1e-4)

    def test_small_angle_roundtrip(self):
        w = jnp.array([[1e-7, -2e-7, 3e-8], [0, 0, 0]], dtype=jnp.float32)
        np.testing.assert_allclose(lie.so3_log(lie.so3_exp(w)), w, atol=1e-9)

    def test_grad_finite_at_zero(self):
        g = jax.grad(lambda w: jnp.sum(lie.so3_exp(w)))(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = random_se3(rng, (64,))
        np.testing.assert_allclose(lie.se3_log(lie.se3_exp(xi)), xi, atol=1e-4)

    def test_pure_translation(self):
        xi = jnp.array([1.0, 2.0, 3.0, 0, 0, 0], dtype=jnp.float32)
        T = lie.se3_exp(xi)
        np.testing.assert_allclose(T[:3, 3], [1, 2, 3], atol=1e-6)
        np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-6)

    def test_inverse(self, rng):
        T = lie.se3_exp(random_se3(rng, (16,)))
        eye = jnp.broadcast_to(jnp.eye(4), T.shape)
        np.testing.assert_allclose(T @ lie.se3_inverse(T), eye, atol=1e-5)

    def test_compose_transform_points(self, rng):
        Ta = lie.se3_exp(random_se3(rng))
        Tb = lie.se3_exp(random_se3(rng))
        pts = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
        ab = lie.transform_points(lie.se3_compose(Ta, Tb), pts)
        step = lie.transform_points(Ta, lie.transform_points(Tb, pts))
        np.testing.assert_allclose(ab, step, atol=1e-5)

    def test_left_multiplicative_update_matches_jacobian(self, rng):
        """d/dxi [exp(xi) T x]_xi=0 == [I | -hat(Tx)] — the pose-Jacobian
        convention the GN solver relies on (reference Optimizer.hpp:108-126)."""
        T = lie.se3_exp(random_se3(rng))
        x = jnp.asarray(rng.normal(size=(3,)).astype(np.float32))

        def f(xi):
            return lie.transform_points(lie.se3_exp(xi) @ T, x)

        J = jax.jacobian(f)(jnp.zeros(6))
        Tx = lie.transform_points(T, x)
        expected = np.concatenate([np.eye(3), -np.asarray(lie.hat(Tx))], axis=1)
        np.testing.assert_allclose(J, expected, atol=1e-4)
