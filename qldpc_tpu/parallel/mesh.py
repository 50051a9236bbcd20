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

__all__ = [
    "make_mesh", "init_distributed", "BATCH_AXIS", "RATE_AXIS", "PartitionSpec",
]

BATCH_AXIS = "mc"
RATE_AXIS = "rate"


def make_mesh(
    n_devices: int | None = None, devices=None, rate_shards: int = 1
) -> Mesh:
    """Device mesh for Monte-Carlo sweeps.

    ``rate_shards == 1`` (default): 1-D mesh, every device shards the
    sample batch. ``rate_shards > 1``: 2-D ``(rate, mc)`` mesh — the
    error-rate grid is sharded ``rate_shards`` ways and each rate group
    batch-shards over the remaining devices
    (:meth:`MonteCarloEngine.run_rates_sharded`). Wide sweeps on big
    meshes trade batch parallelism for rate parallelism, which keeps
    per-device batches large enough to stay compute-bound."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    devices = np.asarray(devices)
    if rate_shards == 1:
        return Mesh(devices, (BATCH_AXIS,))
    if devices.size % rate_shards:
        raise ValueError(
            f"rate_shards={rate_shards} must divide {devices.size} devices"
        )
    return Mesh(
        devices.reshape(rate_shards, -1), (RATE_AXIS, BATCH_AXIS)
    )


def init_distributed(**kwargs) -> None:
    """Multi-host bring-up (coordinator address etc. from env or kwargs)."""
    jax.distributed.initialize(**kwargs)
