"""Device mesh setup.

The reference is single-node shared-memory (SURVEY.md §2.3); distribution here
is a new first-class subsystem: a 1-D `shard` mesh over all chips (pod slices
included — jax.distributed handles multi-host process groups; every collective
in dist/ rides ICI/DCN via XLA).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

SHARD_AXIS = "shard"


def make_mesh(n_devices: int | None = None, axis: str = SHARD_AXIS) -> Mesh:
    """1-D mesh over the first n devices (default all)."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def maybe_init_distributed():
    """Initialize jax.distributed when running multi-process (no-op otherwise)."""
    try:
        if jax.process_count() > 1:
            return  # already initialized
    except RuntimeError:
        pass
    # Single-process (or pre-initialized): nothing to do. Multi-host launchers
    # should call jax.distributed.initialize() before importing qadc_tpu.dist.
