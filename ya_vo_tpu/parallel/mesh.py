"""Device mesh helpers: single-chip to multi-host, one code path.

The reference has no distributed layer at all (single process + two threads,
SURVEY.md §5). Here every multi-device feature is expressed against a
`jax.sharding.Mesh`; the same code runs on 1 chip (trivial mesh), a
multi-chip host, or a multi-host slice (after `jax.distributed.initialize`).
Tests exercise it on a virtual 8-device CPU mesh
(xla_force_host_platform_device_count).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def landmark_mesh(n_devices: Optional[int] = None, axis: str = "lm") -> Mesh:
    """1-D mesh over (up to) all devices for landmark sharding."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def init_multihost(coordinator: Optional[str] = None) -> None:
    """Initialize multi-host JAX if launched across processes.

    On a pod slice each host runs this before building meshes; single-host
    callers may skip it (jax.distributed.initialize is then a no-op guard).
    """
    if jax.process_count() > 1:
        return  # already initialized by the launcher
    if coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
