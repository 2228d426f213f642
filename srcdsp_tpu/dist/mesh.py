"""Device mesh construction and canonical shardings.

Axis names are fixed framework-wide: 'time' for time-block (sequence)
parallelism, 'channel' for channel (data) parallelism. A mesh may have one
or both. Multi-host: `jax.distributed.initialize()` before `make_mesh`, and
the same code runs with DCN crossings handled by the runtime.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TIME_AXIS = "time"
CHANNEL_AXIS = "channel"


def make_mesh(time: int = 1, channel: int = 1,
              devices=None) -> Mesh:
    """Mesh of shape [time, channel]. Total must divide available devices."""
    devices = jax.devices() if devices is None else devices
    n = time * channel
    if n > len(devices):
        raise ValueError(f"need {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(time, channel)
    return Mesh(dev, (TIME_AXIS, CHANNEL_AXIS))


def init_multihost(coordinator: str | None = None, num_processes: int | None = None,
                   process_id: int | None = None) -> None:
    """Multi-host bring-up: call once per host before `make_mesh`.

    On Cloud TPU pods all arguments auto-detect from the metadata server;
    elsewhere pass them explicitly. After this, `jax.devices()` spans the
    whole slice and `make_mesh(time=..., channel=...)` lays the global mesh
    over it — the same chain code then runs with DCN-crossing collectives
    inserted by the runtime (SURVEY.md §5 comm-backend row).
    """
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def time_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the last axis (time) across the 'time' mesh axis."""
    spec = [None] * (ndim - 1) + [TIME_AXIS]
    return NamedSharding(mesh, P(*spec))


def channel_sharding(mesh: Mesh, ndim: int = 2, axis: int = 0) -> NamedSharding:
    """Shard a channel axis across the 'channel' mesh axis."""
    spec = [None] * ndim
    spec[axis] = CHANNEL_AXIS
    return NamedSharding(mesh, P(*spec))
