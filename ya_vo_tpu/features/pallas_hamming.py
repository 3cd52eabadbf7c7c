"""Pallas MXU kernel for the Hamming distance matrix.

The reference's matcher is an O(N1*N2*32) scalar triple loop with a
bit-twiddling popcount (reference: src/BriefDescriptor.cc:163-183,
:139-160). `features/matching.py` already recasts it as an int8 matmul for
XLA; this module is the explicit Pallas version of that contraction —
a tiled MXU matmul over the +-1-expanded descriptor bits

    hamming(a, b) = (n_bits - <a_pm1, b_pm1>) / 2

with the bit-unpack fused into the kernel (the packed uint32 descriptors
are expanded tile-by-tile in VMEM, so the [K, 256] int8 expansion never
round-trips through HBM).

Used by matching.hamming_matrix on TPU backends; interpret-mode tests pin
it against the numpy popcount oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256  # keypoints per tile (both sides)


def _unpack_pm1_tile(packed):
    """[T, W] uint32 -> [T, 32*W] float32 in {-1, +1} (f32 feeds the MXU
    directly; at [256, 256] tiles the cast is free next to the matmul)."""
    T, Wn = packed.shape
    shifts = jax.lax.broadcasted_iota(jnp.uint32, (1, 32), 1)
    pieces = []
    # per-word expansion + lane concatenation (Mosaic supports neither the
    # [T, Wn, 32] -> [T, Wn*32] lane reshape nor uint32->f32 casts, so the
    # unpack is 8 broadcast-shift slices and a where)
    for w in range(Wn):
        bits = (packed[:, w: w + 1] >> shifts) & jnp.uint32(1)  # [T, 32]
        pieces.append(jnp.where(bits > 0, 1.0, -1.0))
    return jnp.concatenate(pieces, axis=1)  # [T, Wn*32]


def _hamming_kernel(d1_ref, d2_ref, out_ref, *, n_bits: int):
    a = _unpack_pm1_tile(d1_ref[:])            # [T, B]
    b = _unpack_pm1_tile(d2_ref[:])            # [T, B]
    dots = jax.lax.dot_general(
        a, b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = ((n_bits - dots) * 0.5).astype(jnp.int32)


def hamming_matrix_pallas(desc1: jnp.ndarray, desc2: jnp.ndarray):
    """[K1, W] x [K2, W] packed uint32 -> [K1, K2] int32 Hamming distances.
    K1/K2 must be multiples of TILE (the caller's fixed capacities are)."""
    K1, Wn = desc1.shape
    K2 = desc2.shape[0]
    n_bits = Wn * 32
    if K1 % TILE or K2 % TILE:
        raise ValueError(f"descriptor counts must be multiples of {TILE}")
    kernel = functools.partial(_hamming_kernel, n_bits=n_bits)
    return pl.pallas_call(
        kernel,
        grid=(K1 // TILE, K2 // TILE),
        in_specs=[
            pl.BlockSpec((TILE, Wn), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, Wn), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K1, K2), jnp.int32),
        interpret=jax.default_backend() != "tpu",
    )(desc1, desc2)
