"""Pallas TPU kernel for fused FAST-12 + Harris + NMS scoring.

The pure-jnp detector (features/fast.py) expresses the ring test as 16
shifted whole-image views with 11 rolled ANDs for contiguity — correct, but
XLA materializes several [16, H, W] intermediates in HBM. This kernel keeps
the ENTIRE image in VMEM (a KITTI frame is 376x1241 f32 ~= 1.9 MB) and does
everything in one pass:

  * the 16 ring comparisons are packed into one int32 bitfield per pixel;
  * "exists >= N contiguous set bits cyclically" becomes O(log N) bitwise
    rotate-AND steps on the packed field (vs 16xN boolean ANDs);
  * Harris (Sobel + 3x3 box + response) and separable NMS run on the same
    VMEM-resident image via static `pltpu.roll`s;
  * output is the masked score map; `fast.detect` finishes with top_k.

Reference semantics covered: segment test + Harris ranking
(reference src/FastDetector.cc:277-369), threshold/N as configured.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ya_vo_tpu.features.fast import BRESENHAM_OFFSETS

NEG = -3.0e38  # sentinel for "not a corner" (safely below any Harris score)


def _shift(img, dv: int, du: int):
    """out[v, u] = img[v + dv, u + du] with cyclic wrap (borders are masked
    off downstream, matching the jnp path's jnp.roll semantics)."""
    out = img
    if dv:
        out = pltpu.roll(out, -dv % out.shape[0], axis=0)
    if du:
        out = pltpu.roll(out, -du % out.shape[1], axis=1)
    return out


def _rot16(b, s: int):
    """Cyclic rotate of a 16-bit ring bitfield stored in int32 lanes:
    bit i of result = bit (i + s) mod 16 of b."""
    s = s % 16
    if s == 0:
        return b
    return ((b >> s) | (b << (16 - s))) & jnp.int32(0xFFFF)


def _has_run(b, n: int):
    """True where the 16-bit cyclic bitfield contains >= n contiguous set
    bits: log-doubling rotate-AND (r_k bit i == positions i..i+k-1 all set)."""
    r = b
    covered = 1
    while covered < n:
        s = min(covered, n - covered)
        r = r & _rot16(r, s)
        covered += s
    return r != 0


HALO = 8    # ring(3) | sobel+box chain(5) both + nms(3) <= 8
TH = 64     # output rows per program


def _fast_score_kernel(img_ref, out_ref, band, sem, *, Hp: int,
                       threshold: float, arc_length: int,
                       harris_k: float, nms_radius: int):
    # DMA this band + halo from HBM ([TH + 2*HALO, W]); the image is
    # halo-padded top and bottom by the wrapper, so the band start is
    # simply i*TH (8-aligned) and the output offset is a CONSTANT HALO
    i = pl.program_id(0)
    BAND = TH + 2 * HALO
    start = pl.multiple_of(i * TH, 8)
    dma = pltpu.make_async_copy(
        img_ref.at[pl.ds(start, BAND), :], band, sem)
    dma.start()
    dma.wait()

    img = band[:]                          # [BAND, W] f32
    thr = jnp.float32(threshold)

    # ---- segment test, bit-packed -------------------------------------
    bright = jnp.zeros(img.shape, jnp.int32)
    dark = jnp.zeros(img.shape, jnp.int32)
    for ridx, (dv, du) in enumerate(BRESENHAM_OFFSETS):
        ring = _shift(img, int(dv), int(du))
        bit = jnp.int32(1 << ridx)
        bright = bright | jnp.where(ring > img + thr, bit, 0)
        dark = dark | jnp.where(ring < img - thr, bit, 0)
    corner = _has_run(bright, arc_length) | _has_run(dark, arc_length)

    # ---- Harris response ----------------------------------------------
    def sh(dv, du):
        return _shift(img, dv, du)

    gx = (sh(-1, 1) + 2.0 * sh(0, 1) + sh(1, 1)) \
        - (sh(-1, -1) + 2.0 * sh(0, -1) + sh(1, -1))
    gy = (sh(1, -1) + 2.0 * sh(1, 0) + sh(1, 1)) \
        - (sh(-1, -1) + 2.0 * sh(-1, 0) + sh(-1, 1))

    def box3(a):
        s = _shift(a, -1, 0) + a + _shift(a, 1, 0)
        return _shift(s, 0, -1) + s + _shift(s, 0, 1)

    sxx = box3(gx * gx)
    syy = box3(gy * gy)
    sxy = box3(gx * gy)
    det = sxx * syy - sxy * sxy
    trace = sxx + syy
    harris = det - harris_k * trace * trace

    # ---- NMS (separable max over (2r+1)^2) ----------------------------
    score = jnp.where(corner, harris, NEG)
    if nms_radius > 0:
        m = score
        for d in range(1, nms_radius + 1):
            m = jnp.maximum(m, jnp.maximum(_shift(score, -d, 0),
                                           _shift(score, d, 0)))
        m2 = m
        for d in range(1, nms_radius + 1):
            m2 = jnp.maximum(m2, jnp.maximum(_shift(m, 0, -d),
                                             _shift(m, 0, d)))
        score = jnp.where(score >= m2, score, NEG)

    # with halo padding, output rows always sit at the fixed offset HALO
    out_ref[:] = score[HALO: HALO + TH, :]


def fast_score_map(
    img_f32: jnp.ndarray,
    *,
    threshold: float,
    arc_length: int,
    harris_k: float,
    nms_radius: int,
) -> jnp.ndarray:
    """[H, W] f32 image -> [H, W] f32 score map (NEG where not a surviving
    corner). Pads to (8, 128) tile multiples internally."""
    H, W = img_f32.shape
    Hp = -(-H // TH) * TH
    Wp = -(-W // 128) * 128
    # pad width/height to tiles AND add HALO rows top+bottom so every band's
    # output lands at a fixed in-band offset
    img_f32 = jnp.pad(
        img_f32, ((HALO, Hp - H + HALO), (0, Wp - W)))
    kernel = functools.partial(
        _fast_score_kernel, Hp=Hp, threshold=float(threshold),
        arc_length=int(arc_length), harris_k=float(harris_k),
        nms_radius=int(nms_radius),
    )
    score = pl.pallas_call(
        kernel,
        grid=(Hp // TH,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((TH, Wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TH + 2 * HALO, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=jax.default_backend() != "tpu",
    )(img_f32)
    return score[:H, :W]
