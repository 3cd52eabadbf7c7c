#!/bin/bash
# Fast pytest: skip the axon sitecustomize (PYTHONPATH) so JAX stays on CPU
# and startup doesn't pay the TPU-tunnel handshake.
cd "$(dirname "$0")/.." || exit 1
exec env PYTHONPATH= JAX_PLATFORMS=cpu \
  XLA_FLAGS="--xla_force_host_platform_device_count=8" \
  python -m pytest "$@"
