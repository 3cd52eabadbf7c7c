"""Microbenchmark the fused tracking step and its components on TPU."""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from ya_vo_tpu.tracking.frontend import Frontend
from ya_vo_tpu.config import VOConfig, TrackConfig, FeatureConfig, BAConfig
from ya_vo_tpu.utils import synthetic

H, W = 376, 1241
imgs, poses_gt, lms, cam = synthetic.render_sequence(
    n_frames=12, n_landmarks=1200, height=H, width=W,
    step=0.5, yaw_rate=0.002, seed=11, corridor=True)
cfg = VOConfig(image_height=H, image_width=W,
               features=FeatureConfig(max_keypoints=2048),
               tracking=TrackConfig(min_ba_inliers=20, min_flow_inliers=5),
               ba=BAConfig(asynchronous=True))
fe = Frontend(cfg, cam)
for img in imgs[:8]:
    fe.process(img)
print("valid tracks:", int(fe.track_valid.sum()), "of", len(fe.track_valid))

img_dev = jnp.asarray(imgs[8])
args = (fe._d_kf_img, img_dev, fe._d_anchor_uv, fe._d_track_valid,
        fe._d_lm_pos, fe._d_pose, fe._d_rel, fe._d_kf_desc, fe._d_kf_uv,
        fe._d_kf_mask, fe._d_kf_pose, fe._d_kf_ref, fe._d_fsk,
        fe._d_slot_stamp, np.int32(fe.frame_id), np.int32(500))


def timeit(fn, n=20, label=""):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label}: {dt:.2f} ms")
    return dt


timeit(lambda: fe._track_step(*args), label="fused step")

# components
from ya_vo_tpu.features import fast, brief, matching
from ya_vo_tpu.tracking import lk, pose_solver
from ya_vo_tpu.core import lie

fc, tc, mc = cfg.features, cfg.tracking, cfg.matching

detect = jax.jit(lambda im: fast.detect(
    im, max_keypoints=fc.max_keypoints, threshold=fc.fast_threshold,
    arc_length=fc.fast_arc_length, nms_radius=fc.nms_radius,
    border=fc.brief_patch_radius + fc.blur_ksize // 2 + 4,
    harris_k=fc.harris_k))
kp = detect(img_dev)
timeit(lambda: detect(img_dev), label="fast.detect")

blur = jax.jit(lambda im: brief.gaussian_blur(
    im.astype(jnp.float32), fc.blur_ksize, fc.blur_sigma))
blurred = blur(img_dev)
timeit(lambda: blur(img_dev), label="gaussian_blur")

desc_fn = jax.jit(lambda b, kp: brief.describe(b, kp.uv, kp.mask,
                                               fe._offsets))
timeit(lambda: desc_fn(blurred, kp), label="brief.describe")

T_prior = fe._d_rel @ fe._d_pose
pc = lie.transform_points(T_prior, fe._d_lm_pos)
seed, z = cam.project(pc)
use = fe._d_track_valid & (z > 0.25)
seed = jnp.where(use[:, None], seed, fe._d_anchor_uv)


def lk_fn():
    return lk.auto_track(fe._d_kf_img, img_dev, fe._d_anchor_uv, seed, use,
                         levels=tc.lk_levels, half=tc.lk_window // 2,
                         iters=tc.lk_iters, eps=tc.lk_eps,
                         max_residual=tc.lk_max_residual)


flow = lk_fn()
timeit(lk_fn, label="LK (pallas, masked)")

solve_fn = jax.jit(lambda: pose_solver.solve_pose(
    T_prior, fe._d_lm_pos, flow.uv, flow.status, cam,
    iters=tc.gn_rounds * tc.gn_iters_per_round,
    huber_delta=tc.huber_delta, chi2_threshold=tc.chi2_threshold))
timeit(solve_fn, label="pose GN")

match_fn = jax.jit(lambda: matching.match(
    fe._d_kf_desc, desc_fn(blurred, kp)[0], fe._d_kf_mask, kp.mask,
    abs_threshold=mc.abs_threshold, cross_check=mc.cross_check))
timeit(match_fn, label="match (incl describe)")

print("--- same components under default_matmul_precision('float32') ---")
with jax.default_matmul_precision("float32"):
    d2 = jax.jit(lambda im: fast.detect(
        im, max_keypoints=fc.max_keypoints, threshold=fc.fast_threshold,
        arc_length=fc.fast_arc_length, nms_radius=fc.nms_radius,
        border=fc.brief_patch_radius + fc.blur_ksize // 2 + 4,
        harris_k=fc.harris_k))
    timeit(lambda: d2(img_dev), label="fast.detect/f32")
    b2 = jax.jit(lambda im: brief.gaussian_blur(
        im.astype(jnp.float32), fc.blur_ksize, fc.blur_sigma))
    timeit(lambda: b2(img_dev), label="gaussian_blur/f32")
    df2 = jax.jit(lambda b, kp: brief.describe(b, kp.uv, kp.mask,
                                               fe._offsets))
    timeit(lambda: df2(blurred, kp), label="brief.describe/f32")
    mf2 = jax.jit(lambda: matching.match(
        fe._d_kf_desc, df2(blurred, kp)[0], fe._d_kf_mask, kp.mask,
        abs_threshold=mc.abs_threshold, cross_check=mc.cross_check))
    timeit(mf2, label="match/f32")
    from ya_vo_tpu.geometry.triangulation import (reprojection_errors,
                                                  triangulate)
    K = fe.K
    P1 = K @ fe._d_kf_pose[:3, :4]
    P2 = K @ fe._d_pose[:3, :4]
    m = mf2()
    r_uv2 = kp.uv[m.idx2]
    tri = jax.jit(lambda: triangulate(P1, P2, fe._d_kf_uv, r_uv2, m.mask))
    r_pts, r_valid = tri()
    timeit(tri, label="triangulate/f32")
    re_fn = jax.jit(lambda: (reprojection_errors(P1, r_pts, fe._d_kf_uv),
                             reprojection_errors(P2, r_pts, r_uv2)))
    timeit(re_fn, label="reproj errors/f32")
    srt = jax.jit(lambda k: (jnp.argsort(k.astype(jnp.int32), stable=True),
                             jnp.argsort(jnp.logical_not(r_valid)
                                         .astype(jnp.int32), stable=True)))
    timeit(lambda: srt(flow.status), label="2x argsort 2048")
    prox = jax.jit(lambda: jnp.any(
        (jnp.sum((r_uv2[:, None, :] - flow.uv[None, :, :]) ** 2, axis=-1)
         < 144.0) & flow.status[None, :], axis=1))
    timeit(prox, label="proximity d2 2048x2048")
