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
from jax.sharding import Mesh, PartitionSpec as P

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


def _fir_shard_stream(taps, decim: int, axis_name: str, carried_tail, x):
    """Shard body with carried inter-buffer state: shard 0's halo comes from
    the previous buffer's LAST shard (the carried tail) instead of zeros."""
    t = jnp.asarray(taps).shape[0]
    local = x[..., x.shape[-1] - (t - 1):]
    from_left = shift_from_left(local, axis_name)   # zeros on shard 0
    is_first = (lax.axis_index(axis_name) == 0)
    tail = jnp.where(is_first, carried_tail, from_left)
    xin = jnp.concatenate([tail, x], axis=-1)
    y = complex_conv(xin, jnp.asarray(taps), stride=decim)
    # next buffer's carried tail = last shard's trailing samples, replicated
    # via masked psum (ppermute can't one-to-many; the tail is T-1 samples,
    # so the all-reduce is negligible)
    is_last = lax.axis_index(axis_name) == lax.axis_size(axis_name) - 1
    new_tail = lax.psum(jnp.where(is_last, local, jnp.zeros_like(local)),
                        axis_name)
    return new_tail, y


def fir_time_sharded_stream(taps, state_tail: jax.Array, x: jax.Array,
                            mesh: Mesh, decim: int = 1
                            ) -> tuple[jax.Array, jax.Array]:
    """Streaming form: filter successive time-sharded buffers seamlessly.

    state_tail: [..., T-1] replicated tail of the previous buffer (zeros at
    stream start, e.g. `fir_init(T).tail`). Each call consumes one buffer
    x: [..., S] (time-sharded) and returns the updated tail + the filtered
    buffer. The concatenated outputs across calls are bit-identical to one
    giant single-device streaming run: shard 0 seeds from the carried tail,
    every other shard from its left neighbor via ppermute, and the new tail
    is broadcast from the last shard to all devices (tiny: T-1 samples).
    """
    pspec = P(*([None] * (x.ndim - 1) + [TIME_AXIS]))
    rspec = P(*([None] * x.ndim))  # replicated tail
    f = jax.shard_map(
        partial(_fir_shard_stream, taps, decim, TIME_AXIS),
        mesh=mesh, in_specs=(rspec, pspec), out_specs=(rspec, pspec))
    return f(state_tail, x)
