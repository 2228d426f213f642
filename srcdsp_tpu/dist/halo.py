"""Overlap-save halo exchange for time-block-sharded streams (SURVEY.md N2).

A stream of length S split into P contiguous shards: every FIR/overlap-save
op needs the last `halo` samples of its LEFT neighbor as initial delay-line
state (BASELINE.json: "overlap-save FIR boundary samples exchanged via halo
collectives"). One `lax.ppermute` right-shift per chain step; shard 0
receives zeros, which is exactly the causal-from-rest initial state, so the
time-sharded result is **bit-identical** to the single-device streaming
result ("bit-exact block joins").

These helpers run *inside* `shard_map`; `fir_time_sharded` is the packaged
outside-view op.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from srcdsp_tpu.dist.mesh import TIME_AXIS
from srcdsp_tpu.ops.fir import complex_conv


def shift_from_left(x: jax.Array, axis_name: str = TIME_AXIS) -> jax.Array:
    """Each shard receives its left neighbor's x; the first shard gets zeros.

    (ppermute zero-fills unaddressed outputs — the stream-start semantics.)
    """
    n = lax.axis_size(axis_name)
    perm = [(i, i + 1) for i in range(n - 1)]
    return lax.ppermute(x, axis_name, perm=perm)


def halo_from_left(x: jax.Array, halo: int, axis_name: str = TIME_AXIS) -> jax.Array:
    """Fetch the last `halo` samples (trailing axis) of the left neighbor."""
    return shift_from_left(x[..., x.shape[-1] - halo:], axis_name)


def _fir_shard(taps, x, decim: int, axis_name: str):
    t = jnp.asarray(taps).shape[0]
    tail = halo_from_left(x, t - 1, axis_name)
    xin = jnp.concatenate([tail, x], axis=-1)
    return complex_conv(xin, jnp.asarray(taps), stride=decim)


def fir_time_sharded(taps, x: jax.Array, mesh: Mesh, decim: int = 1) -> jax.Array:
    """Causal FIR (+decimation) over a time-sharded stream.

    x: [..., S] sharded on the last axis over mesh axis 'time', with the
    per-shard length divisible by decim. Output is sharded the same way.
    Bit-identical to `ops.fir.fir_full(taps, x, decim)` on one device.
    """
    pspec = P(*([None] * (x.ndim - 1) + [TIME_AXIS]))
    f = jax.shard_map(
        partial(_fir_shard, taps, decim=decim, axis_name=TIME_AXIS),
        mesh=mesh, in_specs=(pspec,), out_specs=pspec)
    return f(x)
