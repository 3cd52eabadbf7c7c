"""BRIEF-256 binary descriptors, deterministic and batched.

Replaces the reference's per-keypoint loop (reference:
src/BriefDescriptor.cc:86-124) with one vectorized gather over all keypoints
x all 256 tests. Two deliberate fixes vs the reference:

* The random offset table is generated ONCE from a fixed seed instead of
  re-sampled per process via std::random_device (reference
  BriefDescriptor.cc:4-20 — quirk SURVEY.md §2.4.6). Descriptors are
  reproducible across runs, which the golden tests rely on.
* Descriptors are packed [K, 8] uint32 (256 bits) instead of 32 uchar, so
  Hamming matching can bit-count on 32-bit lanes (see matching.py).

The 9x9 sigma=2.5 Gaussian pre-blur matches reference
BriefDescriptor.cc:90 (`cv::GaussianBlur(img, out, (9,9), 2.5, 2.5)`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def make_offsets(n_bits: int = 256, patch_radius: int = 8, seed: int = 42):
    """Deterministic BRIEF test table [n_bits, 4] int32 = (du1, dv1, du2, dv2),
    uniform in [-patch_radius, patch_radius] (reference draws the same range,
    BriefDescriptor.cc:10-19)."""
    rng = np.random.default_rng(seed)
    offs = rng.integers(-patch_radius, patch_radius + 1, size=(n_bits, 4))
    return jnp.asarray(offs, dtype=jnp.int32)


def gaussian_kernel_1d(ksize: int, sigma: float) -> jnp.ndarray:
    half = (ksize - 1) / 2.0
    x = np.arange(ksize, dtype=np.float64) - half
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return jnp.asarray(k / k.sum(), dtype=jnp.float32)


def gaussian_blur(img_f32: jnp.ndarray, ksize: int = 9, sigma: float = 2.5):
    """Separable Gaussian blur on [H, W] float32 (SAME padding)."""
    k = gaussian_kernel_1d(ksize, sigma)
    img4 = img_f32[None, None]  # NCHW
    kv = k.reshape(1, 1, ksize, 1)
    ku = k.reshape(1, 1, 1, ksize)
    out = jax.lax.conv_general_dilated(img4, kv, (1, 1), "SAME")
    out = jax.lax.conv_general_dilated(out, ku, (1, 1), "SAME")
    return out[0, 0]


@functools.partial(jax.jit, static_argnames=())
def describe(
    blurred: jnp.ndarray,
    uv: jnp.ndarray,
    kp_mask: jnp.ndarray,
    offsets: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Compute descriptors for keypoints on a pre-blurred image.

    Args:
      blurred: [H, W] float32 blurred image.
      uv: [K, 2] float32 keypoint coords (u=col, v=row).
      kp_mask: [K] bool valid keypoints (assumed inside the safe border —
        the detector enforces `border >= patch_radius + blur support`).
      offsets: [B, 4] int32 test table from `make_offsets`.

    Returns:
      desc: [K, B//32] uint32 packed descriptors.
      mask: [K] bool (same as kp_mask; kept for API symmetry).
    """
    H, W = blurred.shape
    u = uv[..., 0].astype(jnp.int32)  # [K]
    v = uv[..., 1].astype(jnp.int32)
    du1, dv1, du2, dv2 = offsets[:, 0], offsets[:, 1], offsets[:, 2], offsets[:, 3]

    # [K, B] sample coordinates, clipped (masked kps may hold garbage coords)
    u1 = jnp.clip(u[:, None] + du1[None, :], 0, W - 1)
    v1 = jnp.clip(v[:, None] + dv1[None, :], 0, H - 1)
    u2 = jnp.clip(u[:, None] + du2[None, :], 0, W - 1)
    v2 = jnp.clip(v[:, None] + dv2[None, :], 0, H - 1)

    p1 = blurred[v1, u1]  # [K, B] gathers
    p2 = blurred[v2, u2]
    bits = (p1 < p2).astype(jnp.uint32)  # [K, B]

    K, B = bits.shape
    words = bits.reshape(K, B // 32, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    desc = jnp.sum(words << shifts[None, None, :], axis=-1, dtype=jnp.uint32)
    desc = jnp.where(kp_mask[:, None], desc, 0)
    return desc, kp_mask
