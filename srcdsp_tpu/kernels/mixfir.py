"""Fused NCO-mix + FIR + decimate Pallas TPU kernel (SURVEY.md C2–C4, M2).

One kernel launch replaces the reference's three per-sample loops and the
XLA plane-path's several fused passes: each input sample crosses HBM once,
is mixed in VMEM, and hits the MXU as a banded-Toeplitz matmul.

Structure per grid step (grid is 1-D over output row-groups):

  1. DMA one contiguous slab x[2, B*OT*M + HK] from HBM into VMEM
     (double-buffered across grid steps);
  2. mix: phase = word0 + global_index * dword in uint32 (bit-exact with
     ops.nco across any block/chunk split), w = cos/sin, complex multiply
     on the f32 planes — one VPU pass over the slab;
  3. windows: B overlapping static slices of the mixed slab form
     X [B, span], span = OT*M + HK;
  4. FIR+decimate: Y[B, OT] = X @ H_T on the MXU, where
     H_T[a, j] = h[j*M + HK - a] is the precomputed banded-Toeplitz tap
     matrix (zeros outside the band) — decimation is folded into the
     band structure, so no strided memory access exists anywhere.

HK (the history prefix) is taps-1 rounded up to a full lane tile; callers
prepend HK history samples (zeros at stream start), exactly like
ops.planes. Output j equals sum_a h[a] * u[j*M - a] with u the logical
stream — identical semantics to ops.fir.fir_apply from zero state.
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

from srcdsp_tpu.ops.nco import TWO_PI, _INV_SCALE
from srcdsp_tpu.types import F32

U32 = jnp.uint32
LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def toeplitz_taps(taps: np.ndarray, decim: int, out_tile: int,
                  hist: int) -> np.ndarray:
    """H_T[a, j] = h[j*decim + hist - a], zero outside [0, T)."""
    h = np.asarray(taps, np.float32)
    t = h.shape[0]
    span = out_tile * decim + hist
    mat = np.zeros((span, out_tile), np.float32)
    for j in range(out_tile):
        for a in range(t):
            idx = j * decim + hist - a
            if 0 <= idx < span:
                mat[idx, j] = h[a]
    return mat


def _kernel(word0_ref, dword_ref, x_hbm, hsub_ref, yr_ref, yi_ref,
            slab, sem, *, b_rows: int, out_tile: int, row_stride: int,
            blk_stride: int, span: int, bspan: int, slab_len: int,
            block_cols: int, precision, phasor: str = "factored"):
    """Manual-DMA form: one blocking slab copy per grid step.

    row_stride / blk_stride: INPUT samples advanced per output row / per
    output column block (decimating FIR: OT*M and BC*M; L/M resampler:
    OT*M/L and BC*M/L)."""
    i = pl.program_id(0)
    g0 = i * b_rows * row_stride  # global sample index of slab start

    cp = pltpu.make_async_copy(
        x_hbm.at[:, pl.ds(g0, slab_len)], slab, sem)
    cp.start()
    cp.wait()
    _compute(slab, word0_ref[0, 0], dword_ref[0, 0], g0,
             lambda j: hsub_ref[j], yr_ref, yi_ref,
             b_rows=b_rows, out_tile=out_tile, row_stride=row_stride,
             blk_stride=blk_stride, span=span, bspan=bspan,
             block_cols=block_cols, precision=precision, phasor=phasor)


def _kernel_pipelined(word0_ref, dword_ref, x_main, x_ov, hsub_ref,
                      yr_ref, yi_ref, *, b_rows: int, out_tile: int,
                      row_stride: int, blk_stride: int, span: int,
                      bspan: int, block_cols: int, precision,
                      phasor: str = "factored"):
    """Pipelined form: the overlapping slab arrives as TWO BlockSpec
    operands (the b_rows*row_stride hop block + the next block's `hist`
    prefix), so the Pallas grid pipeline double-buffers the HBM loads
    behind the previous step's matmuls instead of the blocking copy
    above. Identical math — bit-identical outputs (tested)."""
    i = pl.program_id(0)
    g0 = i * b_rows * row_stride
    slab = jnp.concatenate([x_main[:, :], x_ov[:, :]], axis=-1)
    _compute(slab, word0_ref[0, 0], dword_ref[0, 0], g0,
             lambda j: hsub_ref[j], yr_ref, yi_ref,
             b_rows=b_rows, out_tile=out_tile, row_stride=row_stride,
             blk_stride=blk_stride, span=span, bspan=bspan,
             block_cols=block_cols, precision=precision, phasor=phasor)


def _compute(slab, w0, dw, g0, hsub_at, yr_ref, yi_ref, *, b_rows: int,
             out_tile: int, row_stride: int, blk_stride: int, span: int,
             bspan: int, block_cols: int, precision,
             phasor: str = "factored", mc_out: bool = False):
    # --- B overlapping windows from the raw slab (VMEM copies) ---
    xr = slab[0:1, :]
    xi = slab[1:2, :]
    xwr = jnp.concatenate(
        [xr[:, b * row_stride: b * row_stride + span] for b in range(b_rows)],
        axis=0)
    xwi = jnp.concatenate(
        [xi[:, b * row_stride: b * row_stride + span] for b in range(b_rows)],
        axis=0)

    # --- NCO mix on the window matrix. Phase arithmetic runs in int32:
    # two's-complement wrap == u32 wrap, and the signed reinterpretation
    # only shifts the angle by whole turns (Mosaic has no u32->f32 cast).
    # The phasor is factored e^{j(col + row)} = e^{j col} * e^{j row}:
    # transcendentals run on ONE [1, span] column vector and ONE [B, 1] row
    # vector instead of the full [B, span] matrix (~B x fewer), recombined
    # by a complex multiply. The (row, col) split of a sample's phase word
    # is launch-alignment-invariant (chunks advance by whole row blocks),
    # so chunked streaming stays bit-exact.
    if phasor == "factored":
        colw = w0 + (jnp.int32(g0) +
                     jax.lax.broadcasted_iota(jnp.int32, (1, span), 1)) * dw
        roww = (jax.lax.broadcasted_iota(jnp.int32, (b_rows, 1), 0)
                * (jnp.int32(row_stride) * dw))
        cang = colw.astype(F32) * F32(TWO_PI * _INV_SCALE)
        rang = roww.astype(F32) * F32(TWO_PI * _INV_SCALE)
        ccol = jnp.cos(cang)
        scol = jnp.sin(cang)
        crow = jnp.cos(rang)
        srow = jnp.sin(rang)
        c = crow * ccol - srow * scol
        s = crow * scol + srow * ccol
    else:  # direct: full-matrix transcendentals
        row = jax.lax.broadcasted_iota(jnp.int32, (b_rows, span), 0) * row_stride
        col = jax.lax.broadcasted_iota(jnp.int32, (b_rows, span), 1)
        ph = w0 + (jnp.int32(g0) + row + col) * dw
        ang = ph.astype(F32) * F32(TWO_PI * _INV_SCALE)
        c = jnp.cos(ang)
        s = jnp.sin(ang)
    mr = xwr * c - xwi * s
    mi = xwr * s + xwi * c
    xwr, xwi = mr, mi
    # --- banded-block matmuls: output columns [j*BC, (j+1)*BC) only read
    # window columns [j*blk_stride, j*blk_stride + bspan), so splitting the
    # big [span, OT] Toeplitz into per-block bands cuts the MXU zero-padding
    # waste by ~OT/BC. `precision` trades MXU passes for accuracy
    # (HIGHEST=6-pass f32; the TPU default is 1-pass bf16, ~2e-3 error).
    nb = out_tile // block_cols
    for j in range(nb):
        xs = slice(j * blk_stride, j * blk_stride + bspan)
        ys = slice(j * block_cols, (j + 1) * block_cols)
        hsub = hsub_at(j)
        vr = jnp.dot(xwr[:, xs], hsub, preferred_element_type=F32,
                     precision=precision)
        vi = jnp.dot(xwi[:, xs], hsub, preferred_element_type=F32,
                     precision=precision)
        if mc_out:
            yr_ref[0, :, ys] = vr
            yi_ref[0, :, ys] = vi
        else:
            yr_ref[:, ys] = vr
            yi_ref[:, ys] = vi


@dataclasses.dataclass(frozen=True)
class MixFirKernel:
    """Compiled fused kernel + its layout contract."""

    fn: Callable          # (word0 u32[1,1], dword u32[1,1], x [2, HK+N]) -> (yr, yi) [NT, OT]
    num_taps: int
    decim: int
    out_tile: int
    b_rows: int
    hist: int             # HK: history samples callers must prepend
    in_block: int = 0     # input granularity override (resampler kernels)

    def block_in(self) -> int:
        """Input block granularity (N must be a multiple of this)."""
        return self.in_block or self.b_rows * self.out_tile * self.decim


def banded_taps(taps: np.ndarray, decim: int, out_tile: int, hist: int,
                block_cols: int) -> np.ndarray:
    """Per-block bands of the Toeplitz matrix: [NB, BC*M + hist, BC]."""
    ht = toeplitz_taps(taps, decim, out_tile, hist)
    nb = out_tile // block_cols
    bspan = block_cols * decim + hist
    return np.stack([
        ht[j * block_cols * decim: j * block_cols * decim + bspan,
           j * block_cols: (j + 1) * block_cols]
        for j in range(nb)
    ])


def make_mix_fir_kernel(taps, decim: int, out_tile: int = 512,
                        b_rows: int = 32, block_cols: int = 128,
                        precision=jax.lax.Precision.HIGHEST,
                        phasor: str = "factored",
                        pipelined: bool | None = None,
                        interpret: bool = False) -> MixFirKernel:
    """Build the fused kernel for a fixed tap set / decimation / tiling.

    `pipelined`: route the input through grid BlockSpecs (the hop block +
    the next block's `hist` prefix as separate operands) so the Pallas
    pipeline double-buffers HBM loads behind the matmuls, instead of the
    manual blocking slab DMA. Requires hist | b_rows*out_tile*decim;
    None = auto (use it whenever the divisibility holds). Outputs are
    bit-identical either way."""
    taps = np.asarray(taps, np.float32)
    if not interpret:
        # Mosaic block-shape constraint: last two output-block dims must be
        # divisible by (8, 128)
        if b_rows % 8 != 0:
            raise ValueError(f"b_rows must be a multiple of 8 on TPU, got {b_rows}")
        if out_tile % LANE != 0:
            raise ValueError(f"out_tile must be a multiple of 128, got {out_tile}")
    if out_tile % block_cols != 0:
        raise ValueError(f"out_tile {out_tile} % block_cols {block_cols} != 0")
    t = taps.shape[0]
    hist = _round_up(t - 1, LANE)
    span = out_tile * decim + hist
    nb = out_tile // block_cols
    bspan = block_cols * decim + hist
    hsubs = jnp.asarray(banded_taps(taps, decim, out_tile, hist, block_cols))
    stride = out_tile * decim
    bstride = b_rows * stride
    pipe_ok = bstride % hist == 0
    use_pipe = pipe_ok if pipelined is None else pipelined
    if use_pipe and not pipe_ok:
        raise ValueError(
            f"pipelined form needs hist ({hist}) | b_rows*out_tile*decim "
            f"({bstride})")

    def fn(word0, dword, x):
        n = x.shape[-1] - hist
        if n % bstride != 0:
            raise ValueError(f"N={n} not a multiple of kernel block {bstride}")
        nt = n // (out_tile * decim)
        grid = nt // b_rows
        slab_len = bstride + hist
        common = dict(
            b_rows=b_rows, out_tile=out_tile,
            row_stride=out_tile * decim, blk_stride=block_cols * decim,
            span=span, bspan=bspan,
            block_cols=block_cols, precision=precision, phasor=phasor)
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
            x_specs = [pl.BlockSpec(memory_space=pl.ANY)]  # x stays in HBM
            x_args = (x,)
            scratch = [
                pltpu.VMEM((2, slab_len), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ]
        return pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # word0 [1,1]
                pl.BlockSpec(memory_space=pltpu.SMEM),   # dword [1,1]
            ] + x_specs + [
                pl.BlockSpec((nb, bspan, block_cols), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),   # banded taps
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

    return MixFirKernel(fn=fn, num_taps=t, decim=decim, out_tile=out_tile,
                        b_rows=b_rows, hist=hist)


def mix_fir_decim_pallas(kernel: MixFirKernel, word0: int, dword: int,
                         x_planes: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Convenience wrapper. x_planes: [2, HK+N] f32 -> planes [1, N/M]."""
    w0 = jnp.asarray(np.array(word0, np.uint32).view(np.int32).reshape(1, 1))
    dw = jnp.asarray(np.array(dword, np.uint32).view(np.int32).reshape(1, 1))
    yr, yi = kernel.fn(w0, dw, x_planes)
    k = yr.shape[0] * yr.shape[1]
    return yr.reshape(1, k), yi.reshape(1, k)


# ---------------------------------------------------------------------------
# Multi-channel variant: C independent channels, each with its own NCO
# tuning/phase word, one shared tap set (the BASELINE north-star chain is
# "10-channel FIR-decimate + NCO-mix"). Grid = (channels, row-groups); the
# channel axis parallelizes trivially and per-channel words live in SMEM.
# ---------------------------------------------------------------------------


def _kernel_mc(words0_ref, dwords_ref, x_hbm, hsub_ref, yr_ref, yi_ref,
               slab, sem, *, b_rows: int, out_tile: int, row_stride: int,
               blk_stride: int, span: int, bspan: int, slab_len: int,
               block_cols: int, precision):
    """Manual-DMA multi-channel form (also reused by the L/M resampler —
    row_stride/blk_stride carry the input-advance rates)."""
    c = pl.program_id(0)
    i = pl.program_id(1)
    g0 = i * b_rows * row_stride

    cp = pltpu.make_async_copy(
        x_hbm.at[c, :, pl.ds(g0, slab_len)], slab, sem)
    cp.start()
    cp.wait()
    _compute(slab, words0_ref[c, 0], dwords_ref[c, 0], g0,
             lambda j: hsub_ref[0, j], yr_ref, yi_ref,
             b_rows=b_rows, out_tile=out_tile, row_stride=row_stride,
             blk_stride=blk_stride, span=span, bspan=bspan,
             block_cols=block_cols, precision=precision, mc_out=True)


def _kernel_mc_pipelined(words0_ref, dwords_ref, x_main, x_ov, hsub_ref,
                         yr_ref, yi_ref, *, b_rows: int, out_tile: int,
                         row_stride: int, blk_stride: int, span: int,
                         bspan: int, block_cols: int, precision):
    """Pipelined multi-channel form (see _kernel_pipelined)."""
    c = pl.program_id(0)
    i = pl.program_id(1)
    g0 = i * b_rows * row_stride
    slab = jnp.concatenate([x_main[0], x_ov[0]], axis=-1)
    _compute(slab, words0_ref[c, 0], dwords_ref[c, 0], g0,
             lambda j: hsub_ref[0, j], yr_ref, yi_ref,
             b_rows=b_rows, out_tile=out_tile, row_stride=row_stride,
             blk_stride=blk_stride, span=span, bspan=bspan,
             block_cols=block_cols, precision=precision, mc_out=True)


def make_mix_fir_kernel_mc(taps, decim: int, num_channels: int,
                           out_tile: int = 512, b_rows: int = 8,
                           block_cols: int = 128,
                           precision=jax.lax.Precision.HIGHEST,
                           pipelined: bool | None = None,
                           interpret: bool = False) -> MixFirKernel:
    """Multi-channel fused kernel: x [C, 2, HK+N] -> planes [C, NT, OT].

    Call via `mix_fir_decim_pallas_mc`. Shares MixFirKernel metadata; the
    words arguments become per-channel arrays. `taps` may be [T] (shared
    across channels, the common channelizer-filter case) or [C, T]
    (per-channel filters — the reference's fully independent per-channel
    objects): per-channel banded matrices are staged as one [C, NB, ...]
    constant and the grid's channel step selects its block.
    """
    taps = np.asarray(taps, np.float32)
    per_channel = taps.ndim == 2
    if per_channel and taps.shape[0] != num_channels:
        raise ValueError(f"per-channel taps {taps.shape} != C={num_channels}")
    if not interpret:
        if b_rows % 8 != 0:
            raise ValueError(f"b_rows must be a multiple of 8 on TPU, got {b_rows}")
        if out_tile % LANE != 0:
            raise ValueError(f"out_tile must be a multiple of 128, got {out_tile}")
    if out_tile % block_cols != 0:
        raise ValueError(f"out_tile {out_tile} % block_cols {block_cols} != 0")
    t = taps.shape[-1]
    hist = _round_up(t - 1, LANE)
    span = out_tile * decim + hist
    nb = out_tile // block_cols
    bspan = block_cols * decim + hist
    if per_channel:
        hsubs = jnp.asarray(np.stack([
            banded_taps(taps[c], decim, out_tile, hist, block_cols)
            for c in range(num_channels)]))        # [C, NB, bspan, BC]
    else:
        hsubs = jnp.asarray(
            banded_taps(taps, decim, out_tile, hist, block_cols))[None]
    stride = out_tile * decim
    bstride = b_rows * stride
    slab_len = bstride + hist
    pipe_ok = bstride % hist == 0
    use_pipe = pipe_ok if pipelined is None else pipelined
    if use_pipe and not pipe_ok:
        raise ValueError(
            f"pipelined form needs hist ({hist}) | b_rows*out_tile*decim "
            f"({bstride})")

    def fn(words0, dwords, x):
        n = x.shape[-1] - hist
        if n % bstride != 0:
            raise ValueError(f"N={n} not a multiple of kernel block {bstride}")
        nt = n // (out_tile * decim)
        grid = (num_channels, nt // b_rows)
        common = dict(
            b_rows=b_rows, out_tile=out_tile, row_stride=stride,
            blk_stride=block_cols * decim, span=span, bspan=bspan,
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
            x_specs = [pl.BlockSpec(memory_space=pl.ANY)]  # x [C, 2, L] HBM
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
                # taps [Ct, NB, bspan, BC]: channel step c selects its block
                # (index 0 when taps are shared, Ct == 1)
                pl.BlockSpec(
                    (1, nb, bspan, block_cols),
                    (lambda c, i: (c, 0, 0, 0)) if per_channel
                    else (lambda c, i: (0, 0, 0, 0)),
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

    return MixFirKernel(fn=fn, num_taps=t, decim=decim, out_tile=out_tile,
                        b_rows=b_rows, hist=hist)


def mix_fir_decim_pallas_mc(kernel: MixFirKernel, words0, dwords,
                            x_planes: jax.Array) -> tuple[jax.Array, jax.Array]:
    """x_planes: [C, 2, HK+N] f32; words0/dwords: [C] u32 -> planes [C, N/M]."""
    w0 = jnp.asarray(np.asarray(words0, np.uint32).view(np.int32).reshape(-1, 1))
    dw = jnp.asarray(np.asarray(dwords, np.uint32).view(np.int32).reshape(-1, 1))
    yr, yi = kernel.fn(w0, dw, x_planes)
    c, nt, ot = yr.shape
    return yr.reshape(c, nt * ot), yi.reshape(c, nt * ot)
