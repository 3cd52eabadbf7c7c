"""Pallas TPU kernel for pyramidal Lucas-Kanade tracking.

Why: the pure-jnp LK (ya_vo_tpu.tracking.lk) samples each keypoint's window
with XLA gathers — ~9 ms per [N, 121] bilinear sample on a v5e, and the
iteration loop needs ~90 of them (measured: 1.1 s/frame). The reference
calls cv::calcOpticalFlowPyrLK (src/LoopHandler.cc:372-375); this kernel is
the TPU-native equivalent.

Design (v2): a KITTI-resolution pyramid level fits in VMEM outright
(376 x 1280 f32 = 1.9 MB), so both images are kept fully VMEM-resident and
window sampling needs NO per-keypoint DMA at all (v1 issued 2 patch DMAs
per keypoint — 4096 DMA launches ≈ 2.6 ms/level of pure issue overhead).
Per iteration a keypoint:

  * dynamically slices an aligned [32, 256] block around its current
    position (row starts 8-aligned, col starts 128-aligned — aligned VMEM
    views are free; the block FOLLOWS the track, so drift is unlimited,
    unlike v1's +-25 px search patch);
  * extracts its bilinear-blended 11x11 window with two tiny MXU matmuls
    against one-hot selector matrices built from iota compares — the
    fractional-offset weights are baked into the selectors, so sampling,
    shifting and blending are TWO ops with no lane rotates.

The template (intensity + gradients + inverted 2x2 normal matrix) is
computed once per keypoint the same way from the previous image, then the
inverse-compositional solve runs in an early-exit while_loop on-chip.

The public `track()` matches ya_vo_tpu.tracking.lk.track and is selected
automatically on TPU backends (see lk.auto_track).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ya_vo_tpu.tracking.lk import FlowResult, build_pyramid

KPB = 8       # keypoints per pallas program (block divisibility)
BH = 32       # sampled block rows (8-aligned dynamic slice)
BW = 256      # sampled block cols (128-aligned dynamic slice)
HALF = 5      # 11x11 window


def _selectors(ru, rv, bu, bv, rows: int, cols: int, size: int):
    """Bilinear one-hot selector matrices for a `size x size` window at
    fractional position (ru, rv), relative to a block at (bu, bv).

    R [size, rows] row-selects (with the v-fraction blended in),
    C [size, cols] col-selects (u-fraction blended in); the sampled window
    is R @ block @ C^T."""
    half = (size - 1) // 2
    iu = jnp.floor(ru).astype(jnp.int32)
    iv = jnp.floor(rv).astype(jnp.int32)
    au = ru - jnp.floor(ru)
    av = rv - jnp.floor(rv)
    # window top-left relative to the block, clamped so the +1 blend tap
    # stays inside (border keypoints sample a slightly shifted window —
    # same semantics as v1 / OpenCV's edge clamping)
    r0 = jnp.clip(iv - half - bv, 0, rows - size - 1)
    c0 = jnp.clip(iu - half - bu, 0, cols - size - 1)
    ri = jax.lax.broadcasted_iota(jnp.int32, (size, rows), 1)
    rj = jax.lax.broadcasted_iota(jnp.int32, (size, rows), 0) + r0
    R = ((ri == rj).astype(jnp.float32) * (1.0 - av)
         + (ri == rj + 1).astype(jnp.float32) * av)
    ci = jax.lax.broadcasted_iota(jnp.int32, (size, cols), 1)
    cj = jax.lax.broadcasted_iota(jnp.int32, (size, cols), 0) + c0
    C = ((ci == cj).astype(jnp.float32) * (1.0 - au)
         + (ci == cj + 1).astype(jnp.float32) * au)
    return R, C


def _block_origin(ru, rv, H: int, W: int):
    """Aligned [BH, BW] block origin roughly centred on (ru, rv)."""
    bv = jnp.clip(((jnp.floor(rv).astype(jnp.int32) - BH // 2 + 4) // 8) * 8,
                  0, H - BH)
    bu = jnp.clip(((jnp.floor(ru).astype(jnp.int32) - BW // 2 + 64) // 128)
                  * 128, 0, W - BW)
    return pl.multiple_of(bu, 128), pl.multiple_of(bv, 8)


def _sample_window(img_ref, ru, rv, size: int, H: int, W: int):
    """Bilinear `size x size` window around (ru, rv) from a VMEM image."""
    bu, bv = _block_origin(ru, rv, H, W)
    S = img_ref[pl.ds(bv, BH), pl.ds(bu, BW)]          # [BH, BW] VMEM view
    R, C = _selectors(ru, rv, bu, bv, BH, BW, size)
    RS = jax.lax.dot_general(
        R, S, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)           # [size, BW]
    return jax.lax.dot_general(
        RS, C, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)           # [size, size]


def _lk_level_kernel_batched(
    uv0_ref, seed_ref, valid_ref, img0_ref, img1_ref,
    out_uv_ref, out_eig_ref, out_res_ref, out_std_ref,
    *, H: int, W: int, iters: int, eps: float,
):
    """v3: ONE early-exit while_loop per KPB-keypoint block (the v2 kernel
    below ran KPB independent while_loops — ~0.7 ms/iteration-equivalent
    of scalar loop control, the round-4 perf backlog item). The loop
    carries all KPB positions; each keypoint's update is guarded by its
    own convergence + slot-validity scalar via lax.cond, so a converged or
    dead keypoint costs no sampling work, and per-keypoint iterate
    TRAJECTORIES are identical to v2's (a keypoint updates on every global
    iteration while active, exactly as its private loop did — pinned by
    the pallas-vs-jnp parity selfcheck)."""
    lo = 6.0
    hi_u = W - 8.0
    hi_v = H - 8.0

    tmpl = []   # per-keypoint (T, gx, gy, iG00, iG01, iG11) — loop-invariant
    for k in range(KPB):
        valid_k = valid_ref[k, 0] > 0

        def make_template(k=k):
            u0 = uv0_ref[k, 0]
            v0 = uv0_ref[k, 1]
            B = _sample_window(img0_ref, u0, v0, 13, H, W)
            T = B[1:12, 1:12]
            gx = 0.5 * (B[1:12, 2:13] - B[1:12, 0:11])
            gy = 0.5 * (B[2:13, 1:12] - B[0:11, 1:12])
            return T, gx, gy

        def dead_template(k=k):
            z = jnp.zeros((11, 11), jnp.float32)
            return z, z, z

        T, gx, gy = jax.lax.cond(valid_k, make_template, dead_template)
        t_mean = jnp.mean(T)
        t_std = jnp.sqrt(jnp.maximum(
            jnp.mean(T * T) - t_mean * t_mean, 0.0))
        gxx = jnp.sum(gx * gx)
        gxy = jnp.sum(gx * gy)
        gyy = jnp.sum(gy * gy)
        det = gxx * gyy - gxy * gxy
        trace = gxx + gyy
        min_eig = (trace - jnp.sqrt(
            jnp.maximum(trace * trace - 4.0 * det, 0.0))) \
            * 0.5 / (11.0 * 11.0)
        det_safe = jnp.where(jnp.abs(det) < 1e-6, 1e-6, det)
        tmpl.append((T, gx, gy, gyy / det_safe, -gxy / det_safe,
                     gxx / det_safe, t_std, min_eig, valid_k))

    ru0 = jnp.stack([jnp.clip(seed_ref[k, 0], lo, hi_u)
                     for k in range(KPB)])
    rv0 = jnp.stack([jnp.clip(seed_ref[k, 1], lo, hi_v)
                     for k in range(KPB)])
    step0 = jnp.stack([jnp.where(tmpl[k][8], jnp.float32(1e9),
                                 jnp.float32(0.0)) for k in range(KPB)])

    def cond(carry):
        _, _, step, it = carry
        return (it < iters) & jnp.any(step >= eps)

    def body(carry):
        ru, rv, step, it = carry
        nru, nrv, nst = [], [], []
        for k in range(KPB):
            T, gx, gy, iG00, iG01, iG11, *_ = tmpl[k]
            act = step[k] >= eps

            def advance(ru_k=ru[k], rv_k=rv[k], T=T, gx=gx, gy=gy,
                        iG00=iG00, iG01=iG01, iG11=iG11):
                I = _sample_window(img1_ref, ru_k, rv_k, 11, H, W)
                err = I - T
                err = err - jnp.mean(err)
                bx = jnp.sum(err * gx)
                by = jnp.sum(err * gy)
                du = -(iG00 * bx + iG01 * by)
                dv = -(iG01 * bx + iG11 * by)
                return (jnp.clip(ru_k + du, lo, hi_u),
                        jnp.clip(rv_k + dv, lo, hi_v),
                        jnp.sqrt(du * du + dv * dv))

            def hold(ru_k=ru[k], rv_k=rv[k]):
                return ru_k, rv_k, jnp.float32(0.0)

            r, v, s = jax.lax.cond(act, advance, hold)
            nru.append(r)
            nrv.append(v)
            nst.append(s)
        return (jnp.stack(nru), jnp.stack(nrv), jnp.stack(nst), it + 1)

    ru, rv, _, _ = jax.lax.while_loop(
        cond, body, (ru0, rv0, step0, jnp.int32(0)))

    for k in range(KPB):
        *_, t_std, min_eig, valid_k = tmpl[k]
        T = tmpl[k][0]

        @pl.when(valid_ref[k, 0] > 0)
        def _final(k=k, T=T, t_std=t_std, min_eig=min_eig):
            I = _sample_window(img1_ref, ru[k], rv[k], 11, H, W)
            out_uv_ref[k, 0] = ru[k]
            out_uv_ref[k, 1] = rv[k]
            out_eig_ref[k, 0] = min_eig
            out_res_ref[k, 0] = jnp.mean(jnp.abs(I - T))
            out_std_ref[k, 0] = t_std

        @pl.when(valid_ref[k, 0] <= 0)
        def _dead(k=k):
            out_uv_ref[k, 0] = seed_ref[k, 0]
            out_uv_ref[k, 1] = seed_ref[k, 1]
            out_eig_ref[k, 0] = jnp.float32(0.0)
            out_res_ref[k, 0] = jnp.float32(1e9)
            out_std_ref[k, 0] = jnp.float32(0.0)


def _lk_level_kernel(
    uv0_ref, seed_ref, valid_ref, img0_ref, img1_ref,
    out_uv_ref, out_eig_ref, out_res_ref, out_std_ref,
    *, H: int, W: int, iters: int, eps: float,
):
    for k in range(KPB):
        # dead track-table slots (fixed-capacity masked arrays) skip ALL
        # sampling/iteration work — the table is typically 25-50% occupied,
        # so this is a 2-4x kernel-time saving, not a micro-opt
        @pl.when(valid_ref[k, 0] > 0)
        def _track_one(k=k):
            u0 = uv0_ref[k, 0]
            v0 = uv0_ref[k, 1]

            # template: 13x13 blended neighborhood -> 11x11 window + grads
            B = _sample_window(img0_ref, u0, v0, 13, H, W)
            T = B[1:12, 1:12]
            gx = 0.5 * (B[1:12, 2:13] - B[1:12, 0:11])
            gy = 0.5 * (B[2:13, 1:12] - B[0:11, 1:12])
            t_mean = jnp.mean(T)
            t_std = jnp.sqrt(jnp.maximum(
                jnp.mean(T * T) - t_mean * t_mean, 0.0))

            gxx = jnp.sum(gx * gx)
            gxy = jnp.sum(gx * gy)
            gyy = jnp.sum(gy * gy)
            det = gxx * gyy - gxy * gxy
            trace = gxx + gyy
            min_eig = (trace - jnp.sqrt(
                jnp.maximum(trace * trace - 4.0 * det, 0.0))) \
                * 0.5 / (11.0 * 11.0)
            det_safe = jnp.where(jnp.abs(det) < 1e-6, 1e-6, det)
            iG00 = gyy / det_safe
            iG01 = -gxy / det_safe
            iG11 = gxx / det_safe

            lo = 6.0
            hi_u = W - 8.0
            hi_v = H - 8.0

            # early-exit inverse-compositional iteration: most tracks
            # converge in < 10 steps
            def cond(carry):
                _, _, it, step = carry
                return (it < iters) & (step >= eps)

            def body(carry):
                ru, rv, it, _ = carry
                I = _sample_window(img1_ref, ru, rv, 11, H, W)
                err = I - T
                # zero-mean residuals: photometric-bias invariance,
                # identical to lk.py's jnp path (see its comment)
                err = err - jnp.mean(err)
                bx = jnp.sum(err * gx)
                by = jnp.sum(err * gy)
                du = -(iG00 * bx + iG01 * by)
                dv = -(iG01 * bx + iG11 * by)
                step = jnp.sqrt(du * du + dv * dv)
                ru = jnp.clip(ru + du, lo, hi_u)
                rv = jnp.clip(rv + dv, lo, hi_v)
                return ru, rv, it + 1, step

            ru0 = jnp.clip(seed_ref[k, 0], lo, hi_u)
            rv0 = jnp.clip(seed_ref[k, 1], lo, hi_v)
            ru, rv, _, _ = jax.lax.while_loop(
                cond, body, (ru0, rv0, jnp.int32(0), jnp.float32(1e9)))

            I = _sample_window(img1_ref, ru, rv, 11, H, W)
            # raw gate residual (solve above is zero-mean; see lk.py)
            res = jnp.mean(jnp.abs(I - T))

            out_uv_ref[k, 0] = ru
            out_uv_ref[k, 1] = rv
            out_eig_ref[k, 0] = min_eig
            out_res_ref[k, 0] = res
            out_std_ref[k, 0] = t_std

        @pl.when(valid_ref[k, 0] <= 0)
        def _dead_slot(k=k):
            out_uv_ref[k, 0] = seed_ref[k, 0]
            out_uv_ref[k, 1] = seed_ref[k, 1]
            out_eig_ref[k, 0] = jnp.float32(0.0)
            out_res_ref[k, 0] = jnp.float32(1e9)
            out_std_ref[k, 0] = jnp.float32(0.0)


def _track_level_pallas(img0, img1, uv0, seed, valid, iters: int,
                        eps: float):
    """One pyramid level for all keypoints. img*: [H, W] f32;
    uv0/seed: [N, 2]; valid: [N] bool (dead slots are skipped in-kernel).
    Returns (uv [N, 2], min_eig [N], residual [N], t_std [N])."""
    # round image dims up to block/tile multiples so aligned dynamic slices
    # always have room for a full [BH, BW] block
    H0, W0 = img0.shape
    pad_h = max(BH, -(H0 % -8) + H0) - H0
    pad_w = max(BW, -(W0 % -128) + W0) - W0
    if pad_h or pad_w:
        img0 = jnp.pad(img0, ((0, pad_h), (0, pad_w)))
        img1 = jnp.pad(img1, ((0, pad_h), (0, pad_w)))
    H, W = img0.shape
    N = uv0.shape[0]
    # YA_VO_LK_KERNEL selects the iteration variant: v2 = per-keypoint
    # while_loops, v3 = block-batched single while_loop (see
    # _lk_level_kernel_batched; A/B via tools/bench_lk.py)
    import os

    kfun = _lk_level_kernel_batched \
        if os.environ.get("YA_VO_LK_KERNEL", "v2") == "v3" \
        else _lk_level_kernel
    kernel = functools.partial(kfun, H=H, W=W, iters=iters, eps=eps)
    if N % KPB != 0:
        raise ValueError(f"keypoint count {N} must be a multiple of {KPB}")
    uv, eig, res, std = pl.pallas_call(
        kernel,
        grid=(N // KPB,),
        in_specs=[
            pl.BlockSpec((KPB, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((KPB, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((KPB, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            # whole level image stays VMEM-resident across the grid
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((KPB, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((KPB, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((KPB, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((KPB, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, 2), jnp.float32),
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(uv0, seed, valid.astype(jnp.int32)[:, None], img0, img1)
    return uv, eig[:, 0], res[:, 0], std[:, 0]


@functools.partial(
    jax.jit,
    static_argnames=("levels", "half", "iters", "eps", "min_eig",
                     "max_residual", "rel_residual"),
)
def track(
    img0: jnp.ndarray,
    img1: jnp.ndarray,
    uv0: jnp.ndarray,
    uv_init: jnp.ndarray,
    mask: jnp.ndarray,
    *,
    levels: int = 3,
    half: int = 5,
    iters: int = 30,
    eps: float = 0.01,
    min_eig: float = 1e-3,
    max_residual: float = 12.0,
    rel_residual: float = 0.5,
) -> FlowResult:
    """Drop-in replacement for lk.track backed by the Pallas kernel.
    `half` is fixed at 5 (11x11 window) by the kernel layout. The residual
    gate is contrast-normalized exactly like lk.track's (see its docstring
    for the real-image measurements behind it)."""
    del half
    img0 = img0.astype(jnp.float32)
    img1 = img1.astype(jnp.float32)
    H, W = img0.shape
    pyr0 = build_pyramid(img0, levels)
    pyr1 = build_pyramid(img1, levels)

    scale_top = 2.0 ** (levels - 1)
    uv = uv_init / scale_top
    cond_all = jnp.ones(uv0.shape[0], bool)
    residual = jnp.zeros(uv0.shape[0], jnp.float32)
    t_std = jnp.zeros(uv0.shape[0], jnp.float32)
    for lvl in range(levels - 1, -1, -1):
        s = 2.0 ** lvl
        uv, eig, residual, t_std = _track_level_pallas(
            pyr0[lvl], pyr1[lvl], uv0 / s, uv, mask, iters, eps)
        cond_all = cond_all & (eig > min_eig)
        if lvl > 0:
            uv = uv * 2.0

    in_bounds = (
        (uv[:, 0] >= HALF) & (uv[:, 0] < W - HALF)
        & (uv[:, 1] >= HALF) & (uv[:, 1] < H - HALF)
    )
    gate = jnp.maximum(max_residual, rel_residual * t_std)
    status = mask & cond_all & in_bounds & (residual < gate)
    return FlowResult(uv=uv, status=status, residual=residual)
