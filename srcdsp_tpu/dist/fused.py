"""Distributed fused front-end: the Pallas mix+FIR+decimate kernel running
per time shard (SURVEY.md N2 + T1 composed).

Each shard of a time-sharded wideband stream runs the SAME banded-Toeplitz
Pallas kernel as the single-chip path; the two pieces of cross-shard glue
are pure data:

  - the overlap-save history: each shard receives its left neighbor's last
    `hist` samples via one ppermute (shard 0 gets the carried stream tail —
    zeros at stream start);
  - the NCO phase: shard p's start word is word0 + p*S*dword in u32 — an
    exact closed form, so every shard mixes with the same phase sequence a
    single device would have produced.

Result: bit-identical to the single-device kernel on the unsharded stream
(tested on the 8-virtual-device mesh in Pallas interpret mode), with one
tiny collective per buffer.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from srcdsp_tpu.dist.mesh import TIME_AXIS
from srcdsp_tpu.kernels.mixfir import MixFirKernel


def _shard_body(kernel: MixFirKernel, dword: int, axis_name: str,
                carried_tail, word0_arr, x):
    # x: [2, S_local] this shard's raw planes (no history)
    hist = kernel.hist
    local_tail = x[:, x.shape[-1] - hist:]
    from_left = lax.ppermute(
        local_tail, axis_name,
        perm=[(i, i + 1) for i in range(lax.axis_size(axis_name) - 1)])
    is_first = lax.axis_index(axis_name) == 0
    tail = jnp.where(is_first, carried_tail, from_left)
    xin = jnp.concatenate([tail, x], axis=-1)
    # per-shard phase start: word0 + (p*S - hist)*dword, exact in u32/i32
    p_idx = lax.axis_index(axis_name)
    s_local = x.shape[-1]
    shift = (p_idx * jnp.int32(s_local) - jnp.int32(hist)) \
        * jnp.int32(np.uint32(dword).view(np.int32))
    w0 = (word0_arr.astype(jnp.int32) + shift).reshape(1, 1)
    dw = jnp.asarray(np.uint32(dword).view(np.int32)).reshape(1, 1)
    yr, yi = kernel.fn(w0, dw, xin)
    k = yr.shape[0] * yr.shape[1]
    # new carried tail for the NEXT buffer: last shard's local tail
    is_last = lax.axis_index(axis_name) == lax.axis_size(axis_name) - 1
    new_tail = lax.psum(
        jnp.where(is_last, local_tail, jnp.zeros_like(local_tail)), axis_name)
    return new_tail, jnp.stack([yr.reshape(k), yi.reshape(k)])


def fftconv_time_sharded(kernel, state_tail: jax.Array, x_planes: jax.Array,
                         mesh: Mesh) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Time-sharded fused overlap-save FFT filter (the long-filter analog
    of `mix_fir_time_sharded`).

    kernel: a kernels.fftconv_pallas.FftConvKernel built with
    num_channels = C. x_planes: [C, 2, S] raw planes (NO history prefix),
    sharded on the last axis over mesh axis 'time'; per-shard length must
    be a multiple of kernel.block_in(). state_tail: [C, 2, overlap]
    replicated carried tail (zeros at stream start).

    Each shard receives its left neighbor's trailing `overlap` samples via
    one ppermute (shard 0 takes the carried tail) and runs the SAME fused
    kernel as the single-chip path — frames are globally seamless, so the
    output is bit-identical to the single-device kernel on [tail | x].
    Returns (new_state_tail, yr, yi) with yr/yi [C, S] sharded like x.
    """
    from srcdsp_tpu.kernels.fftconv_pallas import fftconv_pallas

    ov = kernel.overlap

    def body(tail, x):
        local_tail = x[..., x.shape[-1] - ov:]
        from_left = lax.ppermute(
            local_tail, TIME_AXIS,
            perm=[(i, i + 1) for i in range(lax.axis_size(TIME_AXIS) - 1)])
        is_first = lax.axis_index(TIME_AXIS) == 0
        seed = jnp.where(is_first, tail, from_left)
        xin = jnp.concatenate([seed, x], axis=-1)
        yr, yi = fftconv_pallas(kernel, xin)
        is_last = lax.axis_index(TIME_AXIS) == lax.axis_size(TIME_AXIS) - 1
        new_tail = lax.psum(
            jnp.where(is_last, local_tail, jnp.zeros_like(local_tail)),
            TIME_AXIS)
        return new_tail, yr, yi

    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(None, None, TIME_AXIS)),
        out_specs=(P(), P(None, TIME_AXIS), P(None, TIME_AXIS)),
        check_vma=False,
    )
    return f(state_tail, x_planes)


def mix_fir_time_sharded(kernel: MixFirKernel, word0: int, dword: int,
                         state_tail: jax.Array, x_planes: jax.Array,
                         mesh: Mesh) -> tuple[jax.Array, jax.Array]:
    """Run the fused kernel over a time-sharded buffer.

    x_planes: [2, S] f32 raw planes (NO history prefix), sharded on the last
    axis over mesh axis 'time'; per-shard length must be a multiple of
    kernel.block_in(). state_tail: [2, hist] replicated carried tail (zeros
    at stream start). word0 is the phase of x_planes[.., 0].

    Returns (new_state_tail, y_planes [2, S/decim] sharded). Output is
    bit-identical to the single-device kernel fed [state_tail | x].
    """
    w0_arr = jnp.asarray(np.uint32(word0).view(np.int32))
    f = jax.shard_map(
        partial(_shard_body, kernel, dword, TIME_AXIS),
        mesh=mesh,
        in_specs=(P(), P(), P(None, TIME_AXIS)),
        out_specs=(P(), P(None, TIME_AXIS)),
        check_vma=False,  # pallas_call out_shapes carry no vma annotation
    )
    new_tail, y = f(state_tail, w0_arr, x_planes)
    return new_tail, y
