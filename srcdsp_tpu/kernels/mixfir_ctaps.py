"""Complex-taps fused mix+FIR+decimate: the mix folded INTO the filter.

The round-3 config-1 roofline attribution (BASELINE.md) put the bf16
kernel's time ~85% in the VPU mix + window copies. This variant removes
the per-SAMPLE mix entirely:

    y[J] = sum_a h[a] x[JM+H-a] e^{j phi(JM+H-a)}
         = e^{j phi(JM+H)} * sum_a (h[a] e^{-j a dtheta}) x[JM+H-a]

so the tuning frequency bakes into STATIC complex taps g = h e^{-j a dth}
(built host-side per launch frequency), the banded Toeplitz matmul runs
in the 3-matmul Gauss/karatsuba complex form (kernels/fftconv_pallas's
_kpack trick: 3 MXU passes instead of 4), and only a per-OUTPUT phasor
survives on the VPU — at 1/decim the sample rate and with the same exact
u32 phase-word arithmetic as kernels/mixfir (bit-exact block joins).

Serving tradeoff vs make_mix_fir_kernel: the DWORD (tuning step) is a
BUILD-time constant here — retuning a channel means rebuilding the tap
tensor (host-side, ~ms) — while word0 (start phase) stays a runtime
scalar, so streaming/chunked launches work unchanged. For fixed-tune
DDC channels (the BASELINE config-1/4 shape) that is free; agile
scanners should keep the runtime-tuned kernels/mixfir.

Output matches mix_fir_decim_pallas to f32 rounding (same math, the
multiply-by-phasor reassociated through the sum); not bit-identical.
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

__all__ = ["make_mix_fir_ctaps_kernel", "mix_fir_ctaps_pallas",
           "CtapsKernel"]


@dataclasses.dataclass(frozen=True)
class CtapsKernel:
    """Compiled complex-taps kernel + its layout contract."""

    fn: Callable          # (word0 i32[1,1], x [2, HK+N]) -> (yr, yi) [NT, OT]
    num_taps: int
    decim: int
    out_tile: int
    b_rows: int
    hist: int
    dword: int            # baked tuning word (u32)

    def block_in(self) -> int:
        return self.b_rows * self.out_tile * self.decim


def _banded_pack(taps_c: np.ndarray, decim: int, out_tile: int, hist: int,
                 block_cols: int) -> np.ndarray:
    """Per-block bands packed for the 3-matmul complex form:
    [NB, bspan, 3*BC] = [Gr | Gi+Gr | Gi-Gr] per band."""
    gr = toeplitz_taps(taps_c.real.astype(np.float32), decim, out_tile, hist)
    gi = toeplitz_taps(taps_c.imag.astype(np.float32), decim, out_tile, hist)
    nb = out_tile // block_cols
    blk_stride = block_cols * decim
    bspan = blk_stride + hist
    bands = []
    for j in range(nb):
        rs = slice(j * blk_stride, j * blk_stride + bspan)
        cs = slice(j * block_cols, (j + 1) * block_cols)
        r, i = gr[rs, cs], gi[rs, cs]
        bands.append(np.concatenate([r, i + r, i - r], axis=1))
    return np.stack(bands)


def _compute(slab, w0, g0, hsub_at, yr_ref, yi_ref, *, b_rows: int,
             out_tile: int, row_stride: int, blk_stride: int, span: int,
             bspan: int, block_cols: int, precision, dword: int,
             decim: int, hist: int):
    xr = slab[0:1, :]
    xi = slab[1:2, :]
    xwr = jnp.concatenate(
        [xr[:, b * row_stride: b * row_stride + span] for b in range(b_rows)],
        axis=0)
    xwi = jnp.concatenate(
        [xi[:, b * row_stride: b * row_stride + span] for b in range(b_rows)],
        axis=0)
    xsum = xwr + xwi                       # shared karatsuba term

    def mm(a, bb):
        return jnp.dot(a, bb, preferred_element_type=F32,
                       precision=precision)

    nb = out_tile // block_cols
    dwi = jnp.int32(np.int32(np.uint32(dword)))
    for j in range(nb):
        xs = slice(j * blk_stride, j * blk_stride + bspan)
        hsub = hsub_at(j)
        t1 = mm(xsum[:, xs], hsub[:, :block_cols])
        t2 = mm(xwi[:, xs], hsub[:, block_cols:2 * block_cols])
        t3 = mm(xwr[:, xs], hsub[:, 2 * block_cols:])
        ar = t1 - t2
        ai = t1 + t3
        # per-OUTPUT phasor at buffer sample index g0 + b*stride + J*M
        # + hist, factored into column x row angles (exact i32 words,
        # launch-alignment-invariant like kernels/mixfir)
        colw = (jnp.int32(j * block_cols * decim) +
                jax.lax.broadcasted_iota(jnp.int32, (1, block_cols), 1)
                * jnp.int32(decim)) * dwi + w0 + jnp.int32(hist) * dwi \
            + jnp.int32(g0) * dwi
        roww = (jax.lax.broadcasted_iota(jnp.int32, (b_rows, 1), 0)
                * (jnp.int32(row_stride) * dwi))
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


def _kernel(word0_ref, x_hbm, hsub_ref, yr_ref, yi_ref, slab, sem, *,
            b_rows, out_tile, row_stride, blk_stride, span, bspan,
            slab_len, block_cols, precision, dword, decim, hist):
    i = pl.program_id(0)
    g0 = i * b_rows * row_stride
    cp = pltpu.make_async_copy(x_hbm.at[:, pl.ds(g0, slab_len)], slab, sem)
    cp.start()
    cp.wait()
    _compute(slab, word0_ref[0, 0], g0, lambda j: hsub_ref[j],
             yr_ref, yi_ref, b_rows=b_rows, out_tile=out_tile,
             row_stride=row_stride, blk_stride=blk_stride, span=span,
             bspan=bspan, block_cols=block_cols, precision=precision,
             dword=dword, decim=decim, hist=hist)


def _kernel_pipelined(word0_ref, x_main, x_ov, hsub_ref, yr_ref, yi_ref, *,
                      b_rows, out_tile, row_stride, blk_stride, span,
                      bspan, block_cols, precision, dword, decim, hist):
    i = pl.program_id(0)
    g0 = i * b_rows * row_stride
    slab = jnp.concatenate([x_main[:, :], x_ov[:, :]], axis=-1)
    _compute(slab, word0_ref[0, 0], g0, lambda j: hsub_ref[j],
             yr_ref, yi_ref, b_rows=b_rows, out_tile=out_tile,
             row_stride=row_stride, blk_stride=blk_stride, span=span,
             bspan=bspan, block_cols=block_cols, precision=precision,
             dword=dword, decim=decim, hist=hist)


def make_mix_fir_ctaps_kernel(taps, dword: int, decim: int,
                              out_tile: int = 512, b_rows: int = 32,
                              block_cols: int = 128,
                              precision=jax.lax.Precision.HIGHEST,
                              pipelined: bool | None = None,
                              in_dtype=jnp.float32,
                              interpret: bool = False) -> CtapsKernel:
    """Build the complex-taps kernel for a FIXED tuning word `dword`.

    in_dtype=jnp.bfloat16 is the bf16-INGEST serving variant: the caller
    ships x planes as bf16 (halving input HBM traffic AND the in-kernel
    window-copy bytes — the two dominant terms in the round-3 roofline
    attribution); the matmuls already run bf16 passes under
    precision=DEFAULT, so the only extra loss is the input quantization
    itself (~40-45 dB vs the f32 reference — measure per deployment).
    Outputs stay f32 (f32 accumulate + f32 phasor)."""
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
    span = out_tile * decim + hist
    nb = out_tile // block_cols
    bspan = block_cols * decim + hist
    # g[a] = h[a] * e^{-j a dtheta}; dtheta from the exact u32 word
    dth = TWO_PI * (np.uint32(dword) * _INV_SCALE)
    a_idx = np.arange(t)
    taps_c = taps * np.exp(-1j * dth * a_idx)
    hsubs = jnp.asarray(
        _banded_pack(taps_c, decim, out_tile, hist, block_cols))
    if in_dtype == jnp.bfloat16:
        # keep the MXU pass homogeneous (Mosaic mixed-dtype dots would
        # re-materialize the windows in f32, defeating the ingest saving)
        hsubs = hsubs.astype(jnp.bfloat16)
    stride = out_tile * decim
    bstride = b_rows * stride
    pipe_ok = bstride % hist == 0
    use_pipe = pipe_ok if pipelined is None else pipelined
    if use_pipe and not pipe_ok:
        raise ValueError(f"pipelined form needs hist ({hist}) | "
                         f"b_rows*out_tile*decim ({bstride})")

    def fn(word0, x):
        if x.dtype != in_dtype:
            raise ValueError(f"x dtype {x.dtype} != kernel in_dtype "
                             f"{jnp.dtype(in_dtype).name}")
        n = x.shape[-1] - hist
        if n % bstride != 0:
            raise ValueError(f"N={n} not a multiple of {bstride}")
        nt = n // stride
        grid = nt // b_rows
        slab_len = bstride + hist
        common = dict(b_rows=b_rows, out_tile=out_tile, row_stride=stride,
                      blk_stride=block_cols * decim, span=span, bspan=bspan,
                      block_cols=block_cols, precision=precision,
                      dword=int(dword), decim=decim, hist=hist)
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
            scratch = [pltpu.VMEM((2, slab_len), in_dtype),
                       pltpu.SemaphoreType.DMA]
        return pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + x_specs + [
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
            scratch_shapes=scratch,
            interpret=interpret,
        )(word0, *x_args, hsubs)

    return CtapsKernel(fn=fn, num_taps=t, decim=decim, out_tile=out_tile,
                       b_rows=b_rows, hist=hist, dword=int(dword))


def mix_fir_ctaps_pallas(kernel: CtapsKernel, word0: int,
                         x_planes: jax.Array) -> tuple[jax.Array, jax.Array]:
    """x_planes: [2, HK+N] f32 -> planes [1, N/M]. word0 = start phase
    word (runtime; pass (stream_pos - hist) * dword like mixfir)."""
    w0 = jnp.asarray(np.array(word0, np.uint32).view(np.int32).reshape(1, 1))
    yr, yi = kernel.fn(w0, x_planes)
    k = yr.shape[0] * yr.shape[1]
    return yr.reshape(1, k), yi.reshape(1, k)
