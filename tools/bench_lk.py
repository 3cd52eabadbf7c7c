"""Microbenchmark the pallas LK kernel: where does the time go?

Usage: python tools/bench_lk.py [iters ...]
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from ya_vo_tpu.tracking import lk_pallas  # noqa: E402


def main():
    H, W = 376, 1241
    N = 2048
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.integers(0, 255, (H, W)).astype(np.float32))
    img1 = jnp.asarray(rng.integers(0, 255, (H, W)).astype(np.float32))
    uv0 = jnp.asarray(
        rng.uniform([20, 20], [W - 20, H - 20], (N, 2)).astype(np.float32))
    seed = uv0 + jnp.asarray(
        rng.uniform(-3, 3, (N, 2)).astype(np.float32))
    mask = jnp.ones(N, bool)

    iter_list = [1, 5, 10, 30]
    for levels in (1, 3):
        for iters in iter_list:
            fn = jax.jit(lambda a, b, c, d, e, it=iters, lv=levels:
                         lk_pallas.track(a, b, c, d, e,
                                         levels=lv, iters=it))
            out = fn(img0, img1, uv0, seed, mask)
            jax.block_until_ready(out.uv)
            reps = 5
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(img0, img1, uv0, seed, mask)
            jax.block_until_ready(out.uv)
            dt = (time.perf_counter() - t0) / reps * 1e3
            print(f"levels={levels} iters={iters:3d}: {dt:7.2f} ms  "
                  f"(status={int(out.status.sum())})")


if __name__ == "__main__":
    main()
