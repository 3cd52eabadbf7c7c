"""FAST detector tests: golden Bresenham geometry (vs the reference repo's
fixture), contiguity semantics on synthetic patterns, end-to-end detection
on a rendered scene. Mirrors the useful parts of the reference's
FastDetectorTest.cc (golden circle check :6-31, synthetic contiguity
:38-80) with real asserts."""

import jax.numpy as jnp
import numpy as np
import pytest

from ya_vo_tpu.features import fast
from ya_vo_tpu.utils import synthetic


def test_bresenham_offsets_match_reference_golden():
    """The 16 ring offsets must equal the reference's golden mask
    (/root/reference/tests/testBresenham.png: 16 circle pixels + center)."""
    from PIL import Image

    img = np.asarray(Image.open("/root/reference/tests/testBresenham.png"))
    if img.ndim == 3:
        img = img[..., 0]
    ys, xs = np.nonzero(img)
    cy, cx = int(round(ys.mean())), int(round(xs.mean()))
    golden = {(y - cy, x - cx) for y, x in zip(ys, xs)} - {(0, 0)}
    ours = {(int(dv), int(du)) for dv, du in fast.BRESENHAM_OFFSETS}
    assert ours == golden
    assert len(ours) == 16


def _ring_image(on_indices, center_val=100, ring_val=200, size=50):
    img = np.full((size, size), center_val, dtype=np.uint8)
    c = size // 2
    for k in on_indices:
        dv, du = fast.BRESENHAM_OFFSETS[k]
        img[c + dv, c + du] = ring_val
    return img


def test_contiguous_12_detected():
    img = _ring_image(range(12))
    corner = fast.fast_response(jnp.asarray(img, jnp.float32), 40.0, 12)
    assert bool(corner[25, 25])


def test_contiguous_11_rejected():
    img = _ring_image(range(11))
    corner = fast.fast_response(jnp.asarray(img, jnp.float32), 40.0, 12)
    assert not bool(corner[25, 25])


def test_wraparound_arc_detected():
    # arc spanning the ring seam: indices 10..15 + 0..5 (12 contiguous)
    img = _ring_image(list(range(10, 16)) + list(range(6)))
    corner = fast.fast_response(jnp.asarray(img, jnp.float32), 40.0, 12)
    assert bool(corner[25, 25])


def test_darker_arc_detected():
    img = _ring_image([], center_val=200)
    c = 25
    for k in range(12):
        dv, du = fast.BRESENHAM_OFFSETS[k]
        img[c + dv, c + du] = 40
    corner = fast.fast_response(jnp.asarray(img, jnp.float32), 40.0, 12)
    assert bool(corner[25, 25])


def test_flat_image_no_corners():
    img = jnp.full((64, 64), 128, jnp.uint8)
    kps = fast.detect(img, max_keypoints=128, border=8)
    assert int(kps.count()) == 0


def test_small_blob_detected_at_center():
    """A bright 3x3 blob fits inside the radius-3 ring: all 16 ring pixels
    are darker -> strongest possible FAST response at the blob center."""
    img = np.full((96, 96), 20, dtype=np.uint8)
    img[47:50, 47:50] = 220
    kps = fast.detect(jnp.asarray(img), max_keypoints=64, border=8)
    n = int(kps.count())
    assert n >= 1
    uv = np.asarray(kps.uv)[np.asarray(kps.mask)]
    d = np.min(np.linalg.norm(uv - np.array([48.0, 48.0]), axis=-1))
    assert d <= 2.0, uv


def test_axis_aligned_square_corner_not_fast12():
    """Regression-documenting test: a perfect 90-degree axis-aligned corner
    yields only 11 contiguous ring pixels, below FAST-12's threshold —
    detection must rely on texture, not smooth right angles."""
    img = np.full((96, 96), 20, dtype=np.uint8)
    img[40:61, 40:61] = 220
    corner = fast.fast_response(jnp.asarray(img, jnp.float32), 40.0, 12)
    assert not bool(corner[40, 40])
    # ... but FAST-9 does fire there
    corner9 = fast.fast_response(jnp.asarray(img, jnp.float32), 40.0, 9)
    assert bool(corner9[40, 40])


def test_rendered_scene_detection():
    imgs, poses, lms, cam = synthetic.render_sequence(
        n_frames=1, n_landmarks=120, height=256, width=512, seed=1
    )
    kps = fast.detect(jnp.asarray(imgs[0]), max_keypoints=1024, border=16)
    assert int(kps.count()) > 100
    # all reported keypoints respect the border and the mask is prefix-sorted
    uv = np.asarray(kps.uv)[np.asarray(kps.mask)]
    assert uv[:, 0].min() >= 16 and uv[:, 0].max() < 512 - 16
    assert uv[:, 1].min() >= 16 and uv[:, 1].max() < 256 - 16
    # scores are sorted descending among valid entries
    sc = np.asarray(kps.score)[np.asarray(kps.mask)]
    assert np.all(np.diff(sc) <= 1e-3)


def test_pallas_score_map_matches_jnp():
    """Fused Pallas score kernel (interpret mode on CPU) == jnp pipeline on
    the interior (borders differ only in wrap source, masked anyway)."""
    from ya_vo_tpu.features import pallas_fast

    imgs, *_ = synthetic.render_sequence(
        n_frames=1, n_landmarks=80, height=128, width=256, seed=4)
    img_f = jnp.asarray(imgs[0], jnp.float32)

    is_corner = fast.fast_response(img_f, 40.0, 12)
    harris = fast.harris_response(img_f, 0.04)
    keep_ref = is_corner & fast._nms(
        jnp.where(is_corner, harris, -jnp.inf), 3)

    smap = pallas_fast.fast_score_map(
        img_f, threshold=40.0, arc_length=12, harris_k=0.04, nms_radius=3)
    keep_pal = smap > pallas_fast.NEG / 2

    interior = np.zeros((128, 256), bool)
    interior[16:-16, 16:-16] = True
    np.testing.assert_array_equal(
        np.asarray(keep_pal) & interior, np.asarray(keep_ref) & interior)
    sel = np.asarray(keep_ref) & interior
    np.testing.assert_allclose(
        np.asarray(smap)[sel], np.asarray(harris)[sel], rtol=1e-5)
