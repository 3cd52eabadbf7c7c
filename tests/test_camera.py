import jax.numpy as jnp
import numpy as np

from ya_vo_tpu.core import lie
from ya_vo_tpu.core.camera import Camera, in_bounds

KITTI = Camera.create(718.856, 718.856, 607.1928, 185.2157)


def test_project_unproject_roundtrip(rng):
    pts = rng.uniform([-5, -2, 2], [5, 2, 40], size=(256, 3)).astype(np.float32)
    uv, z = KITTI.project(jnp.asarray(pts))
    back = KITTI.unproject(uv, z)
    np.testing.assert_allclose(back, pts, rtol=1e-4, atol=1e-3)


def test_principal_point_maps_to_center():
    uv, z = KITTI.project(jnp.array([0.0, 0.0, 10.0]))
    np.testing.assert_allclose(uv, [607.1928, 185.2157], atol=1e-4)
    assert float(z) == 10.0


def test_projection_matrix_matches_manual(rng):
    T = lie.se3_exp(jnp.asarray(rng.normal(size=6).astype(np.float32) * 0.3))
    P = KITTI.projection_matrix(T)
    pt_w = jnp.asarray(rng.normal(size=3).astype(np.float32) + [0, 0, 10])
    pt_h = jnp.concatenate([pt_w, jnp.ones(1)])
    proj = P @ pt_h
    uv_manual = proj[:2] / proj[2]
    uv_direct, _ = KITTI.project(lie.transform_points(T, pt_w))
    np.testing.assert_allclose(uv_manual, uv_direct, rtol=1e-4)


def test_in_bounds():
    uv = jnp.array([[0.0, 0.0], [1240, 375], [8, 8], [1233, 367], [-1, 5], [620, 376]])
    m0 = in_bounds(uv, 376, 1241, margin=0)
    np.testing.assert_array_equal(m0, [True, True, True, True, False, False])
    m8 = in_bounds(uv, 376, 1241, margin=8)
    np.testing.assert_array_equal(m8, [False, False, True, False, False, False])


def test_negative_depth_flagged():
    _, z = KITTI.project(jnp.array([1.0, 1.0, -5.0]))
    assert float(z) < 0
