"""Device-mesh helpers for the Monte-Carlo engine.

The reference has no multi-device story (SURVEY.md §2: batch-parallel CuPy /
single-device JAX only). Here distribution is first-class: a 1-D mesh over
all local (or all global) devices, the Monte-Carlo sample batch sharded over
it, per-shard RNG derived with ``fold_in``, and counters reduced with psum
inside ``shard_map``. Multi-host pods extend the same mesh transparently via
``jax.distributed.initialize`` (call :func:`init_distributed` first on each
host); no code in the engine changes.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec

__all__ = ["make_mesh", "init_distributed", "BATCH_AXIS", "PartitionSpec"]

BATCH_AXIS = "mc"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the sample-batch axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (BATCH_AXIS,))


def init_distributed(**kwargs) -> None:
    """Multi-host bring-up (coordinator address etc. from env or kwargs)."""
    jax.distributed.initialize(**kwargs)
