"""Fused NCO-mix + rational L/M resampler Pallas kernel (SURVEY.md C5).

The decimating-FIR kernel's banded-Toeplitz structure generalizes directly
to rational resampling: with u the zero-stuffed upsample of x,

    y[j] = sum_k h[k] u[j*M - k] = sum_i h[j*M - i*L] x[i]

so the tap matrix simply places h at stride-L row positions:

    H[a, j] = h[j*M + HX*L - a*L]        (HX = input-domain history)

and the same kernel body (slab DMA -> windows -> u32-phase mix -> banded
matmuls) runs unchanged with input strides OT*M/L per output row. No
zero-stuffed samples ever exist in memory — XLA's lhs_dilation path
materializes them implicitly, the MXU path bakes them out of the taps.

Semantics identical to ops.resample.resample_apply from zero state
(causal, output rate fs*L/M). Tiling constraint: out_tile*M % L == 0 and
block_cols*M % L == 0.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from srcdsp_tpu.kernels.mixfir import (
    LANE, MixFirKernel, _kernel, _kernel_mc, _kernel_mc_pipelined,
    _kernel_pipelined, _round_up,
)


def toeplitz_resample(taps: np.ndarray, up: int, down: int, out_tile: int,
                      hist: int) -> np.ndarray:
    """H[a, j] = h[j*down + hist*up - a*up], zero outside [0, T)."""
    h = np.asarray(taps, np.float32)
    t = h.shape[0]
    span = (out_tile * down) // up + hist
    mat = np.zeros((span, out_tile), np.float32)
    for j in range(out_tile):
        base = j * down + hist * up
        for a in range(span):
            k = base - a * up
            if 0 <= k < t:
                mat[a, j] = h[k]
    return mat


def banded_resample_taps(taps, up: int, down: int, out_tile: int, hist: int,
                         block_cols: int) -> np.ndarray:
    ht = toeplitz_resample(taps, up, down, out_tile, hist)
    nb = out_tile // block_cols
    blk_stride = (block_cols * down) // up
    bspan = blk_stride + hist
    return np.stack([
        ht[j * blk_stride: j * blk_stride + bspan,
           j * block_cols: (j + 1) * block_cols]
        for j in range(nb)
    ])


def combine_fir_resample_taps(fir_taps, resample_taps, up: int) -> np.ndarray:
    """Fold a unit-rate FIR in front of an L/M resampler into ONE tap set.

    With u = h1 * x (unit-rate FIR) and y = resample_{L/M}(h2, u):

        y[j] = sum_i h2[j*M - i*L] u[i]
             = sum_q x[q] * (upsample_L(h1) conv h2)[j*M - q*L]

    because zero-stuffing commutes with convolution: up_L(a * b) =
    up_L(a) conv up_L(b). So the whole config-2 chain (mix -> FIR ->
    resample) is the SAME banded stride-L Toeplitz kernel with taps
    hc = h2 conv up_L(h1), length len(h2) + L*(len(h1)-1) — one HBM pass,
    no intermediate buffer, no second kernel launch.
    """
    h1 = np.asarray(fir_taps, np.float64)
    h2 = np.asarray(resample_taps, np.float64)
    h1u = np.zeros(up * (len(h1) - 1) + 1, np.float64)
    h1u[::up] = h1
    return np.convolve(h1u, h2).astype(np.float32)


def make_mix_resample_kernel(taps, up: int, down: int, out_tile: int = 512,
                             b_rows: int = 8, block_cols: int = 128,
                             precision=jax.lax.Precision.HIGHEST,
                             hist_round: int = LANE,
                             pipelined: bool | None = None,
                             interpret: bool = False) -> MixFirKernel:
    """Fused mix + L/M resample: x [2, HX+NIN] -> planes [NT, OT].

    NIN input samples produce NIN*up/down outputs; NIN must be a multiple of
    block_in() = b_rows*out_tile*down/up.

    hist_round: alignment of the history prefix. Interpret mode accepts
    any multiple of 8 (the trimmed band is numerically identical — see
    tests), but the HARDWARE Mosaic lowering rejects non-lane-aligned
    window slices (measured 2026-08-17: hist_round=8 fails to compile on
    TPU v5 lite), so on real chips keep the default 128. The band
    therefore carries up to 127 zero rows of MXU padding for long
    combined tap sets — a known cost, not a knob, on current Mosaic.
    """
    taps = np.asarray(taps, np.float32)
    if (out_tile * down) % up != 0 or (block_cols * down) % up != 0:
        raise ValueError(f"out_tile*down and block_cols*down must be "
                         f"multiples of up={up}")
    if not interpret:
        if b_rows % 8 != 0:
            raise ValueError(f"b_rows must be a multiple of 8, got {b_rows}")
        if out_tile % LANE != 0:
            raise ValueError(f"out_tile must be a multiple of 128, got {out_tile}")
    t = taps.shape[0]
    hist = _round_up(-(-(t - 1) // up), hist_round)  # ceil((T-1)/up) aligned
    row_stride = (out_tile * down) // up
    blk_stride = (block_cols * down) // up
    span = row_stride + hist
    bspan = blk_stride + hist
    hsubs = jnp.asarray(
        banded_resample_taps(taps, up, down, out_tile, hist, block_cols))
    nb = out_tile // block_cols
    bstride = b_rows * row_stride
    slab_len = bstride + hist
    pipe_ok = bstride % hist == 0
    use_pipe = pipe_ok if pipelined is None else pipelined
    if use_pipe and not pipe_ok:
        raise ValueError(
            f"pipelined form needs hist ({hist}) | b_rows*row_stride "
            f"({bstride})")

    def fn(word0, dword, x):
        nin = x.shape[-1] - hist
        if nin % bstride != 0:
            raise ValueError(
                f"NIN={nin} not a multiple of {bstride}")
        grid = nin // bstride
        nt = grid * b_rows
        common = dict(
            b_rows=b_rows, out_tile=out_tile,
            row_stride=row_stride, blk_stride=blk_stride,
            span=span, bspan=bspan,
            block_cols=block_cols, precision=precision)
        if use_pipe:
            kern = functools.partial(_kernel_pipelined, **common)
            x_specs = [
                pl.BlockSpec((2, bstride), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, hist),
                             lambda i: (0, (i + 1) * bstride // hist),
                             memory_space=pltpu.VMEM),
            ]
            x_args = (x, x)
            scratch = []
        else:
            kern = functools.partial(_kernel, slab_len=slab_len, **common)
            x_specs = [pl.BlockSpec(memory_space=pl.ANY)]
            x_args = (x,)
            scratch = [
                pltpu.VMEM((2, slab_len), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ]
        return pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ] + x_specs + [
                pl.BlockSpec((nb, bspan, block_cols), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((b_rows, out_tile), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_rows, out_tile), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nt, out_tile), jnp.float32),
                jax.ShapeDtypeStruct((nt, out_tile), jnp.float32),
            ],
            scratch_shapes=scratch,
            interpret=interpret,
        )(word0, dword, *x_args, hsubs)

    return MixFirKernel(fn=fn, num_taps=t, decim=down, out_tile=out_tile,
                        b_rows=b_rows, hist=hist,
                        in_block=b_rows * row_stride)


def mix_resample_pallas(kernel: MixFirKernel, word0: int, dword: int,
                        x_planes: jax.Array) -> tuple[jax.Array, jax.Array]:
    """x_planes: [2, HX+NIN] f32 -> planes [1, NIN*up/down]."""
    w0 = jnp.asarray(np.array(word0, np.uint32).view(np.int32).reshape(1, 1))
    dw = jnp.asarray(np.array(dword, np.uint32).view(np.int32).reshape(1, 1))
    yr, yi = kernel.fn(w0, dw, x_planes)
    n = yr.shape[0] * yr.shape[1]
    return yr.reshape(1, n), yi.reshape(1, n)


# ---------------------------------------------------------------------------
# Multi-channel variant (BASELINE config 2 is a 4-CHANNEL chain): C
# independent channels with per-channel NCO words, one shared tap set,
# grid (channels, row-groups) — the resampler analog of
# kernels.mixfir.make_mix_fir_kernel_mc.
# ---------------------------------------------------------------------------


def make_mix_resample_kernel_mc(taps, up: int, down: int, num_channels: int,
                                out_tile: int = 512, b_rows: int = 8,
                                block_cols: int = 128,
                                precision=jax.lax.Precision.HIGHEST,
                                hist_round: int = LANE,
                                pipelined: bool | None = None,
                                interpret: bool = False) -> MixFirKernel:
    """Multi-channel fused mix + L/M resample: x [C, 2, HX+NIN] ->
    planes [C, NT, OT]. Call via `mix_resample_pallas_mc`; per-channel NCO
    words, shared taps."""
    taps = np.asarray(taps, np.float32)
    if (out_tile * down) % up != 0 or (block_cols * down) % up != 0:
        raise ValueError(f"out_tile*down and block_cols*down must be "
                         f"multiples of up={up}")
    if not interpret:
        if b_rows % 8 != 0:
            raise ValueError(f"b_rows must be a multiple of 8, got {b_rows}")
        if out_tile % LANE != 0:
            raise ValueError(f"out_tile must be a multiple of 128, got {out_tile}")
    t = taps.shape[0]
    hist = _round_up(-(-(t - 1) // up), hist_round)
    row_stride = (out_tile * down) // up
    blk_stride = (block_cols * down) // up
    span = row_stride + hist
    bspan = blk_stride + hist
    # leading unit dim: mixfir's MC kernels index taps as hsub_ref[0, j]
    # (shared taps -> every channel selects block 0)
    hsubs = jnp.asarray(
        banded_resample_taps(taps, up, down, out_tile, hist, block_cols))[None]
    nb = out_tile // block_cols
    bstride = b_rows * row_stride
    slab_len = bstride + hist
    pipe_ok = bstride % hist == 0
    use_pipe = pipe_ok if pipelined is None else pipelined
    if use_pipe and not pipe_ok:
        raise ValueError(
            f"pipelined form needs hist ({hist}) | b_rows*row_stride "
            f"({bstride})")

    def fn(words0, dwords, x):
        nin = x.shape[-1] - hist
        if nin % bstride != 0:
            raise ValueError(
                f"NIN={nin} not a multiple of {bstride}")
        grid = (num_channels, nin // bstride)
        nt = grid[1] * b_rows
        common = dict(
            b_rows=b_rows, out_tile=out_tile,
            row_stride=row_stride, blk_stride=blk_stride,
            span=span, bspan=bspan,
            block_cols=block_cols, precision=precision)
        if use_pipe:
            kern = functools.partial(_kernel_mc_pipelined, **common)
            x_specs = [
                pl.BlockSpec((1, 2, bstride), lambda c, i: (c, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, hist),
                             lambda c, i: (c, 0, (i + 1) * bstride // hist),
                             memory_space=pltpu.VMEM),
            ]
            x_args = (x, x)
            scratch = []
        else:
            kern = functools.partial(_kernel_mc, slab_len=slab_len, **common)
            x_specs = [pl.BlockSpec(memory_space=pl.ANY)]
            x_args = (x,)
            scratch = [
                pltpu.VMEM((2, slab_len), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ]
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # words0 [C, 1]
                pl.BlockSpec(memory_space=pltpu.SMEM),   # dwords [C, 1]
            ] + x_specs + [
                pl.BlockSpec((1, nb, bspan, block_cols),
                             lambda c, i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, b_rows, out_tile), lambda c, i: (c, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b_rows, out_tile), lambda c, i: (c, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((num_channels, nt, out_tile), jnp.float32),
                jax.ShapeDtypeStruct((num_channels, nt, out_tile), jnp.float32),
            ],
            scratch_shapes=scratch,
            interpret=interpret,
        )(words0, dwords, *x_args, hsubs)

    return MixFirKernel(fn=fn, num_taps=t, decim=down, out_tile=out_tile,
                        b_rows=b_rows, hist=hist,
                        in_block=b_rows * row_stride)


def mix_resample_pallas_mc(kernel: MixFirKernel, words0, dwords,
                           x_planes: jax.Array) -> tuple[jax.Array, jax.Array]:
    """x_planes: [C, 2, HX+NIN] f32; words0/dwords: [C] u32 ->
    planes [C, NIN*up/down]."""
    w0 = jnp.asarray(np.asarray(words0, np.uint32).view(np.int32).reshape(-1, 1))
    dw = jnp.asarray(np.asarray(dwords, np.uint32).view(np.int32).reshape(-1, 1))
    yr, yi = kernel.fn(w0, dw, x_planes)
    c, nt, ot = yr.shape
    return yr.reshape(c, nt * ot), yi.reshape(c, nt * ot)
