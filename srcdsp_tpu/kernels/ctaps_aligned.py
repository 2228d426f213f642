"""Aligned-layout complex-taps mix+FIR+decimate: no window copies.

kernels/mixfir_ctaps removed the per-sample NCO from the config-1 kernel
but kept its window framing: every output row copies a [1, span]
overlapping window out of the slab before the banded matmuls — ~640 MB
of VMEM copy traffic per 64M-sample call, the dominant term left in the
round-3 roofline attribution. The round-2 chunked experiment
(kernels/mixfir_rows.py) removed the copies by decomposing into
[B,128]x[128,BC] chunk matmuls and LOST 7% — too many small MXU ops.

This kernel removes the copies while KEEPING the banded matmul shapes:

- the wrapper reshapes the body to [2, NT, stride] in HBM (a free view —
  row-major split of the last axis), so each BlockSpec step delivers a
  natively-tiled [2, b_rows, stride] block: output row r's samples ARE
  sublane r — no window materialization;
- output column block j >= 1 of row r reads window rows
  [j*BC*decim, j*BC*decim + bspan), i.e. main[:, j*BC*decim - hist : ...]
  — a contiguous, lane-aligned 2-D SLICE of the block ref (zero copies),
  against the SAME banded tap tensor as mixfir_ctaps (outputs of these
  blocks are bit-identical to it);
- only block j = 0 crosses the row boundary: its top `hist` window rows
  come from the PREVIOUS row's tail, staged as one [b_rows, hist]
  sublane-shifted copy (concat of the carried last-row tail + rows
  [0, b_rows-1) of this block) — hist/span of the old copy traffic
  (128/1152 for the config-1 shape) — and its matmul splits in two
  (prev_tail @ H[:hist] + main @ H[hist:]).

Streaming contract: fn(word0, x_hist [2, hist], x_body [2, NT, stride])
— the caller carries the last `hist` samples of the previous chunk
instead of prepending them (ctaps_aligned_pallas handles the split from
the classic [2, hist+N] layout; that path pays one XLA slice). word0 is
the phase word of x_body sample 0. Same math as mixfir_ctaps: the
tuning word is baked into complex taps at build time, the per-OUTPUT
phasor runs at 1/decim rate with exact i32 words.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from srcdsp_tpu.kernels.mixfir import LANE, _round_up
from srcdsp_tpu.kernels.mixfir_ctaps import _banded_pack
from srcdsp_tpu.ops.nco import TWO_PI, _INV_SCALE
from srcdsp_tpu.types import F32

__all__ = ["make_ctaps_aligned_kernel", "ctaps_aligned_pallas",
           "AlignedKernel"]


@dataclasses.dataclass(frozen=True)
class AlignedKernel:
    fn: Callable          # (word0 i32[1,1], x_hist [2,H], x_body [2,NT,ST])
    num_taps: int
    decim: int
    out_tile: int
    b_rows: int
    hist: int
    dword: int

    def block_in(self) -> int:
        return self.b_rows * self.out_tile * self.decim


def _kernel(word0_ref, xh_ref, x_ref, hsub_ref, yr_ref, yi_ref, tail, *,
            b_rows: int, out_tile: int, decim: int, hist: int,
            block_cols: int, precision, dword: int):
    i = pl.program_id(0)
    stride = out_tile * decim
    blk = block_cols * decim
    bspan = blk + hist
    nb = out_tile // block_cols
    xr = x_ref[0]                       # [b_rows, stride]
    xi = x_ref[1]
    xsum = xr + xi                      # shared karatsuba term, once/sample

    # previous-row tail [b_rows, hist]: row 0 from the carry (step 0: the
    # history operand), rows 1.. from this block's own rows shifted by one
    @pl.when(i == 0)
    def _():
        tail[0, 0:1, :] = xh_ref[0:1, :]
        tail[1, 0:1, :] = xh_ref[1:2, :]

    ptr = jnp.concatenate([tail[0], xr[: b_rows - 1, stride - hist:]], axis=0)
    pti = jnp.concatenate([tail[1], xi[: b_rows - 1, stride - hist:]], axis=0)
    tail[0, 0:1, :] = xr[b_rows - 1: b_rows, stride - hist:]
    tail[1, 0:1, :] = xi[b_rows - 1: b_rows, stride - hist:]
    pts = ptr + pti

    def mm(a, bb):
        return jnp.dot(a, bb, preferred_element_type=F32,
                       precision=precision)

    g0 = i * b_rows * stride
    dwi = jnp.int32(np.int32(np.uint32(dword)))
    for j in range(nb):
        hsub = hsub_ref[j]
        if j == 0:
            # split at the row boundary: top `hist` band rows multiply the
            # previous-row tail, the rest multiply this row's prefix
            t1 = (mm(pts, hsub[:hist, :block_cols])
                  + mm(xsum[:, :blk], hsub[hist:, :block_cols]))
            t2 = (mm(pti, hsub[:hist, block_cols:2 * block_cols])
                  + mm(xi[:, :blk], hsub[hist:, block_cols:2 * block_cols]))
            t3 = (mm(ptr, hsub[:hist, 2 * block_cols:])
                  + mm(xr[:, :blk], hsub[hist:, 2 * block_cols:]))
        else:
            xs = slice(j * blk - hist, j * blk - hist + bspan)
            t1 = mm(xsum[:, xs], hsub[:, :block_cols])
            t2 = mm(xi[:, xs], hsub[:, block_cols:2 * block_cols])
            t3 = mm(xr[:, xs], hsub[:, 2 * block_cols:])
        ar = t1 - t2
        ai = t1 + t3
        # per-OUTPUT phasor at body sample index g0 + row*stride +
        # (j*BC + lane)*decim (exact i32 words, factored col x row)
        colw = (jnp.int32(j * block_cols) +
                jax.lax.broadcasted_iota(jnp.int32, (1, block_cols), 1)
                ) * jnp.int32(decim) * dwi + word0_ref[0, 0] \
            + jnp.int32(g0) * dwi
        roww = (jax.lax.broadcasted_iota(jnp.int32, (b_rows, 1), 0)
                * (jnp.int32(stride) * dwi))
        cang = colw.astype(F32) * F32(TWO_PI * _INV_SCALE)
        rang = roww.astype(F32) * F32(TWO_PI * _INV_SCALE)
        ccol = jnp.cos(cang)
        scol = jnp.sin(cang)
        crow = jnp.cos(rang)
        srow = jnp.sin(rang)
        c = crow * ccol - srow * scol
        s = crow * scol + srow * ccol
        ys = slice(j * block_cols, (j + 1) * block_cols)
        yr_ref[:, ys] = ar * c - ai * s
        yi_ref[:, ys] = ar * s + ai * c


def make_ctaps_aligned_kernel(taps, dword: int, decim: int,
                              out_tile: int = 512, b_rows: int = 32,
                              block_cols: int = 128,
                              precision=jax.lax.Precision.HIGHEST,
                              interpret: bool = False) -> AlignedKernel:
    """Build the aligned complex-taps kernel for a FIXED tuning word.

    Requires block_cols*decim >= hist (so only column block 0 crosses the
    row boundary) — true for every BASELINE config shape."""
    taps = np.asarray(taps, np.float64)
    if not interpret:
        if b_rows % 8 != 0:
            raise ValueError(f"b_rows must be a multiple of 8, got {b_rows}")
        if out_tile % LANE != 0:
            raise ValueError(f"out_tile must be a multiple of 128, "
                             f"got {out_tile}")
    if out_tile % block_cols != 0:
        raise ValueError(f"out_tile {out_tile} % block_cols "
                         f"{block_cols} != 0")
    t = taps.shape[0]
    hist = _round_up(t - 1, LANE)
    if block_cols * decim < hist:
        raise ValueError(
            f"aligned framing needs block_cols*decim ({block_cols * decim})"
            f" >= hist ({hist})")
    nb = out_tile // block_cols
    bspan = block_cols * decim + hist
    dth = TWO_PI * (np.uint32(dword) * _INV_SCALE)
    a_idx = np.arange(t)
    taps_c = taps * np.exp(-1j * dth * a_idx)
    hsubs = jnp.asarray(
        _banded_pack(taps_c, decim, out_tile, hist, block_cols))
    stride = out_tile * decim

    def fn(word0, x_hist, x_body):
        nt = x_body.shape[1]
        if x_body.shape[-1] != stride or x_hist.shape[-1] != hist:
            raise ValueError(
                f"x_body last dim must be {stride}, x_hist {hist}; got "
                f"{x_body.shape[-1]}, {x_hist.shape[-1]}")
        if nt % b_rows != 0:
            raise ValueError(f"NT={nt} not a multiple of {b_rows}")
        grid = nt // b_rows
        kern = functools.partial(
            _kernel, b_rows=b_rows, out_tile=out_tile, decim=decim,
            hist=hist, block_cols=block_cols, precision=precision,
            dword=int(dword))
        return pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((2, hist), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, b_rows, stride), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nb, bspan, 3 * block_cols),
                             lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
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
            scratch_shapes=[pltpu.VMEM((2, 1, hist), jnp.float32)],
            interpret=interpret,
        )(word0, x_hist, x_body, hsubs)

    return AlignedKernel(fn=fn, num_taps=t, decim=decim, out_tile=out_tile,
                         b_rows=b_rows, hist=hist, dword=int(dword))


def ctaps_aligned_pallas(kernel: AlignedKernel, word0: int,
                         x_hist: jax.Array, x_body: jax.Array
                         ) -> tuple[jax.Array, jax.Array]:
    """x_hist: [2, hist] (zeros at stream start; thereafter the previous
    chunk's last hist samples). x_body: [2, N], N % block_in() == 0 —
    reshaped to the aligned layout as a free view. word0 = phase word of
    x_body[0] (stream_pos * dword). Returns planes [1, N/M]."""
    n = x_body.shape[-1]
    stride = kernel.out_tile * kernel.decim
    w0 = jnp.asarray(np.array(word0, np.uint32).view(np.int32).reshape(1, 1))
    x4 = x_body.reshape(2, n // stride, stride)
    yr, yi = kernel.fn(w0, x_hist, x4)
    k = yr.shape[0] * yr.shape[1]
    return yr.reshape(1, k), yi.reshape(1, k)
