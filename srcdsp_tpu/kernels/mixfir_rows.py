"""Row-aligned fused NCO-mix + FIR + decimate kernel (config-1 fast-path
experiment; see ROADMAP "config-1 kernel bottleneck hypothesis").

kernels.mixfir builds its B overlapping windows with [1, span]
single-sublane VMEM copies — ~6% of the measured step time is MXU work,
and tiling A/Bs are flat, so those 1/8-sublane-efficient copies are the
prime suspect for the remaining step time. This kernel removes them:

- the caller reshapes the padded planes to [2, R, 128] in HBM (free);
  because row_stride = out_tile*decim is a multiple of 128, window b is
  ROWS [b*rs8, b*rs8 + span/128) of the slab — no window matrix is ever
  materialized;
- the NCO mix runs ONCE over the slab (each input sample is mixed once,
  not once per overlapping window — 1.125x less VPU work), with the
  factored phasor e^{j(row*128 + lane)w} = e^{j row*128 w} * e^{j lane w};
- the banded matmul decomposes by 128-sample chunks: output block j
  (block_cols lanes) = sum over the band's row-chunks delta of
  X[:, j*bc_rows + delta, :] @ H_sub[delta] — X slices are strided
  SUBLANE reads of the mixed slab ([B, 128] full-sublane tiles), and the
  per-chunk tap matrices bake the same banded-Toeplitz zeros out, so the
  issued MAC count is identical to kernels.mixfir.

Same semantics as kernels.mixfir (verified to float-sum reassociation in
tests); the chunked accumulation order differs, so outputs match to ~1e-6
rel, not bit-exactly.

MEASURED OUTCOME (2026-08-17, interleaved A/B on TPU v5 lite): 2259.8 vs
the classic kernel's 2433.5 Ms/s — 7% SLOWER. The window-copy hypothesis
is FALSIFIED: removing the [1, span] copies does not pay, and the 12
smaller [32,128]x[128,128] matmuls per step (vs 8 banded [32,384] ones)
cost more than the copies saved. kernels.mixfir remains the production
config-1 kernel; this module stays as the documented experiment (it also
established that Mosaic's hardware lowering rejects strided
extract_strided_slice — chunk access must go through a sublane-major
reshape + middle-axis index).
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

from srcdsp_tpu.kernels.mixfir import LANE, _round_up, toeplitz_taps
from srcdsp_tpu.ops.nco import TWO_PI, _INV_SCALE
from srcdsp_tpu.types import F32


def _kernel(word0_ref, dword_ref, x_hbm, h_ref, yr_ref, yi_ref, slab, sem,
            *, b_rows: int, out_tile: int, decim: int, hist: int,
            block_cols: int, nb: int, ndelta: int, slab_rows: int,
            precision):
    i = pl.program_id(0)
    rs8 = (out_tile * decim) // LANE          # window stride in rows
    row0 = i * b_rows * rs8

    cp = pltpu.make_async_copy(
        x_hbm.at[:, pl.ds(row0, slab_rows), :], slab, sem)
    cp.start()
    cp.wait()

    # --- factored phasor over the slab: phase(row, lane) =
    # word0 + (g0 + row*128 + lane) * dword, split row/lane
    g0 = jnp.int32(row0) * jnp.int32(LANE)
    roww = word0_ref[0, 0] + (g0 + jax.lax.broadcasted_iota(
        jnp.int32, (slab_rows, 1), 0) * jnp.int32(LANE)) * dword_ref[0, 0]
    lanew = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1) \
        * dword_ref[0, 0]
    rang = roww.astype(F32) * F32(TWO_PI * _INV_SCALE)
    lang = lanew.astype(F32) * F32(TWO_PI * _INV_SCALE)
    crow = jnp.cos(rang)
    srow = jnp.sin(rang)
    clane = jnp.cos(lang)
    slane = jnp.sin(lang)
    c = crow * clane - srow * slane
    s = crow * slane + srow * clane
    xr = slab[0]
    xi = slab[1]
    mr = xr * c - xi * s
    mi = xr * s + xi * c

    # --- chunk slices feed the banded matmuls. Window b's chunk
    # (j*bc_rows + delta) is mixed-slab row b*rs8 + j*bc_rows + delta; over
    # all b that is rows [base :: rs8]. Mosaic's hardware lowering rejects
    # stride-8 extract_strided_slice, so the access is expressed through a
    # sublane-major reshape [nq, rs8, LANE] (layout-preserving) and a
    # middle-axis index: rows base+b*rs8 = m3[q + b, rem] with
    # q, rem = divmod(base, rs8).
    bc_rows = (block_cols * decim) // LANE    # band row advance per j-block
    nq = slab_rows // rs8
    mr3 = mr.reshape(nq, rs8, LANE)
    mi3 = mi.reshape(nq, rs8, LANE)
    for j in range(nb):
        accr = jnp.zeros((b_rows, block_cols), F32)
        acci = jnp.zeros((b_rows, block_cols), F32)
        for delta in range(ndelta):
            base = j * bc_rows + delta
            q, rem = divmod(base, rs8)
            xrs = mr3[q: q + b_rows, rem, :]
            xis = mi3[q: q + b_rows, rem, :]
            h = h_ref[j, delta]
            accr = accr + jnp.dot(xrs, h, preferred_element_type=F32,
                                  precision=precision)
            acci = acci + jnp.dot(xis, h, preferred_element_type=F32,
                                  precision=precision)
        ys = slice(j * block_cols, (j + 1) * block_cols)
        yr_ref[:, ys] = accr
        yi_ref[:, ys] = acci


@dataclasses.dataclass(frozen=True)
class MixFirRowsKernel:
    fn: Callable
    num_taps: int
    decim: int
    out_tile: int
    b_rows: int
    hist: int

    def block_in(self) -> int:
        return self.b_rows * self.out_tile * self.decim


def make_mix_fir_rows_kernel(taps, decim: int, out_tile: int = 512,
                             b_rows: int = 32, block_cols: int = 128,
                             precision=jax.lax.Precision.HIGHEST,
                             interpret: bool = False) -> MixFirRowsKernel:
    """Build the row-aligned fused kernel.

    Constraints beyond kernels.mixfir: out_tile*decim % 128 == 0 and
    block_cols*decim % 128 == 0 (window and band strides must be whole
    rows). hist is taps-1 rounded up to a lane tile, as before.
    """
    taps = np.asarray(taps, np.float32)
    if (out_tile * decim) % LANE != 0:
        raise ValueError(f"out_tile*decim must be a multiple of {LANE}")
    if (block_cols * decim) % LANE != 0:
        raise ValueError(f"block_cols*decim must be a multiple of {LANE}")
    if out_tile % block_cols != 0:
        raise ValueError(f"out_tile {out_tile} % block_cols {block_cols}")
    t = taps.shape[0]
    hist = _round_up(t - 1, LANE)
    span = out_tile * decim + hist
    bspan = block_cols * decim + hist
    ndelta = bspan // LANE
    nb = out_tile // block_cols
    rs8 = (out_tile * decim) // LANE
    # per-(j, delta) tap chunks: rows [j*bc_rows*128 + delta*128, +128) of
    # the full banded-Toeplitz matrix, output cols [j*bc, (j+1)*bc)
    ht = toeplitz_taps(taps, decim, out_tile, hist)      # [span, OT]
    bc_rows = (block_cols * decim) // LANE
    hsub = np.stack([
        np.stack([ht[(j * bc_rows + d) * LANE: (j * bc_rows + d + 1) * LANE,
                     j * block_cols: (j + 1) * block_cols]
                  for d in range(ndelta)])
        for j in range(nb)])                             # [nb, ndelta, 128, BC]
    hsubs = jnp.asarray(hsub)
    import math
    slab_rows = _round_up((b_rows - 1) * rs8 + span // LANE + 1,
                          math.lcm(8, rs8))   # reshapeable to [nq, rs8, .]

    def fn(word0, dword, x, n=None):
        two, r, lane = x.shape
        if two != 2 or lane != LANE:
            raise ValueError(f"x must be [2, R, {LANE}], got {x.shape}")
        if n is None:
            n = r * LANE - hist     # no tail padding
        block = b_rows * out_tile * decim
        if n % block != 0:
            raise ValueError(f"N={n} not a multiple of {block}")
        nt = n // (out_tile * decim)
        grid = nt // b_rows
        # the final grid step's slab reads past the stream end by the
        # rounding margin; require the caller to pad R accordingly
        if (grid - 1) * b_rows * rs8 + slab_rows > r:
            raise ValueError(
                f"need R >= {(grid - 1) * b_rows * rs8 + slab_rows} rows "
                f"(pad the tail), got {r}")
        kern = functools.partial(
            _kernel, b_rows=b_rows, out_tile=out_tile, decim=decim,
            hist=hist, block_cols=block_cols, nb=nb, ndelta=ndelta,
            slab_rows=slab_rows, precision=precision)
        return pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((nb, ndelta, LANE, block_cols),
                             lambda i: (0, 0, 0, 0),
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
            scratch_shapes=[
                pltpu.VMEM((2, slab_rows, LANE), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(word0, dword, x, hsubs)

    return MixFirRowsKernel(fn=fn, num_taps=t, decim=decim,
                            out_tile=out_tile, b_rows=b_rows, hist=hist)


def mix_fir_rows_pallas(kernel: MixFirRowsKernel, word0: int, dword: int,
                        x_planes: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Convenience wrapper. x_planes: [2, HK+N] f32 planes; the tail is
    zero-padded to the kernel's slab-row rounding. Returns planes [1, N/M].
    """
    total = x_planes.shape[-1]
    n = total - kernel.hist
    rs8 = (kernel.out_tile * kernel.decim) // LANE
    span_rows = (kernel.out_tile * kernel.decim + kernel.hist) // LANE
    grid = n // kernel.block_in()
    need_rows = _round_up((grid - 1) * kernel.b_rows * rs8 +
                          _round_up((kernel.b_rows - 1) * rs8 + span_rows + 1,
                                    8), 8)
    pad = need_rows * LANE - total
    if pad > 0:
        x_planes = jnp.concatenate(
            [x_planes, jnp.zeros((2, pad), x_planes.dtype)], axis=-1)
    x3 = x_planes.reshape(2, -1, LANE)
    w0 = jnp.asarray(np.array(word0, np.uint32).view(np.int32).reshape(1, 1))
    dw = jnp.asarray(np.array(dword, np.uint32).view(np.int32).reshape(1, 1))
    yr, yi = kernel.fn(w0, dw, x3, n=n)
    k = yr.shape[0] * yr.shape[1]
    return yr.reshape(1, k), yi.reshape(1, k)
