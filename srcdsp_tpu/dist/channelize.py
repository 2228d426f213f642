"""Distributed channelizer: time-sharded wideband in, channel-sharded out.

The Ulysses-style re-shard (SURVEY.md §2.1): each time shard runs the
polyphase bank on its own contiguous block (with a left halo of T-1 samples,
so frames are globally seamless), producing all M channels for its local
frames. One `lax.all_to_all` then transposes the layout: every device ends
up with M/P channels over ALL frames — exactly what per-channel demods
(channel parallelism) want downstream.

Bit-exactness: local framing + left halo makes the concatenated frames
identical to the single-device channelizer, so the re-sharded output is a
pure layout change of `channelize_full`.
"""

from __future__ import annotations

from functools import partial

import jax
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from srcdsp_tpu.chains.channelizer import ChannelizerState, channelize_apply, pad_prototype
from srcdsp_tpu.dist.halo import shift_from_left
from srcdsp_tpu.dist.mesh import TIME_AXIS


def _channelize_shard(taps, num_channels: int, x, axis_name: str):
    h = pad_prototype(taps, num_channels)
    t = h.shape[0]
    tail = shift_from_left(x[..., x.shape[-1] - (t - 1):], axis_name)
    st = ChannelizerState(tail=tail)
    _, y = channelize_apply(taps, st, x, num_channels)   # [..., M, Kl]
    # all_to_all: split the channel axis across peers, concatenate local
    # frame axes in device order -> [..., M/P, K]
    return lax.all_to_all(y, axis_name, split_axis=y.ndim - 2,
                          concat_axis=y.ndim - 1, tiled=True)


def _channelize_shard_stream(taps, num_channels: int, axis_name: str,
                             carried_tail, x):
    import jax.numpy as jnp

    h = pad_prototype(taps, num_channels)
    t = h.shape[0]
    local = x[..., x.shape[-1] - (t - 1):]
    from_left = shift_from_left(local, axis_name)
    is_first = lax.axis_index(axis_name) == 0
    tail = jnp.where(is_first, carried_tail, from_left)
    st = ChannelizerState(tail=tail)
    _, y = channelize_apply(taps, st, x, num_channels)
    y = lax.all_to_all(y, axis_name, split_axis=y.ndim - 2,
                       concat_axis=y.ndim - 1, tiled=True)
    is_last = lax.axis_index(axis_name) == lax.axis_size(axis_name) - 1
    new_tail = lax.psum(jnp.where(is_last, local, jnp.zeros_like(local)),
                        axis_name)
    return new_tail, y


def channelize_time_sharded_stream(taps, state_tail, x: jax.Array,
                                   num_channels: int, mesh: Mesh
                                   ) -> tuple[jax.Array, jax.Array]:
    """Streaming form: successive time-sharded buffers channelize seamlessly.

    state_tail: [..., T-1] replicated (zeros at stream start). Concatenated
    outputs across calls are bit-identical to one single-device streaming
    run (same guarantee as `dist.halo.fir_time_sharded_stream`)."""
    p = mesh.shape[TIME_AXIS]
    if num_channels % p != 0:
        raise ValueError(f"num_channels {num_channels} not divisible by "
                         f"time-axis size {p}")
    in_spec = P(*([None] * (x.ndim - 1) + [TIME_AXIS]))
    rspec = P(*([None] * x.ndim))
    out_spec = P(*([None] * (x.ndim - 1) + [TIME_AXIS, None]))
    f = jax.shard_map(
        partial(_channelize_shard_stream, taps, num_channels, TIME_AXIS),
        mesh=mesh, in_specs=(rspec, in_spec), out_specs=(rspec, out_spec))
    return f(state_tail, x)


def _channelize_os2_shard(taps, num_channels: int, x, axis_name: str):
    from srcdsp_tpu.chains.channelizer import channelize_os2_apply

    # the (-1)^{m*k} twiddle uses the LOCAL frame index: per-shard length
    # must be a multiple of M (an even local frame count) or odd channels
    # silently flip sign on alternating shards
    if x.shape[-1] % num_channels != 0:
        raise ValueError(
            f"os2 per-shard length {x.shape[-1]} must be a multiple of "
            f"num_channels {num_channels} for global frame-parity consistency")
    h = pad_prototype(taps, num_channels)
    t = h.shape[0]
    tail = shift_from_left(x[..., x.shape[-1] - (t - 1):], axis_name)
    st = ChannelizerState(tail=tail)
    _, y = channelize_os2_apply(taps, st, x, num_channels)
    return lax.all_to_all(y, axis_name, split_axis=y.ndim - 2,
                          concat_axis=y.ndim - 1, tiled=True)


def channelize_os2_time_sharded(taps, x: jax.Array, num_channels: int,
                                mesh: Mesh) -> jax.Array:
    """2x-oversampled variant: [..., S] time-sharded -> [..., M, 2S/M]
    channel-sharded. Same halo + all_to_all structure as the critically-
    sampled bank; frames advance by M/2 so per-shard length must divide
    by M/2. NOTE: the os2 twiddle (-1)^{m*k} uses the LOCAL frame index;
    shard lengths must be multiples of M (not just M/2) so frame parity is
    globally consistent across shard boundaries."""
    p = mesh.shape[TIME_AXIS]
    if num_channels % p != 0:
        raise ValueError(f"num_channels {num_channels} not divisible by "
                         f"time-axis size {p}")
    in_spec = P(*([None] * (x.ndim - 1) + [TIME_AXIS]))
    out_spec = P(*([None] * (x.ndim - 1) + [TIME_AXIS, None]))
    f = jax.shard_map(
        partial(_channelize_os2_shard, taps, num_channels,
                axis_name=TIME_AXIS),
        mesh=mesh, in_specs=(in_spec,), out_specs=out_spec)
    return f(x)


def channelize_time_sharded(taps, x: jax.Array, num_channels: int,
                            mesh: Mesh) -> jax.Array:
    """x: [..., S] time-sharded -> y: [..., M, S//M] channel-sharded.

    Requires S/P % M == 0 (each shard's frame count integral) and M % P == 0
    (channels divide evenly over the 'time' axis size for the re-shard).
    """
    p = mesh.shape[TIME_AXIS]
    if num_channels % p != 0:
        raise ValueError(f"num_channels {num_channels} not divisible by "
                         f"time-axis size {p}")
    in_spec = P(*([None] * (x.ndim - 1) + [TIME_AXIS]))
    out_spec = P(*([None] * (x.ndim - 1) + [TIME_AXIS, None]))
    f = jax.shard_map(
        partial(_channelize_shard, taps, num_channels, axis_name=TIME_AXIS),
        mesh=mesh, in_specs=(in_spec,), out_specs=out_spec)
    return f(x)
