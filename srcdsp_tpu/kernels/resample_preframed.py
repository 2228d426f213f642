"""Producer-pre-framed complex-taps L/M resampler kernel (round-5
transfer #3 of the config-1 window-copy result; SURVEY.md C5, config 2).

`bench/ab_preframed.py` proved the [1, span] in-kernel window copies
were gating the config-1 serving kernel (+65% when the producer ships
[NT, span] frames). `kernels/fsk_preframed.py` transferred it to
config 4 (+50%). This module is the config-2 transfer: the SAME
pre-framed layout over the stride-L banded-Toeplitz resampler
(`kernels/resample_pallas.py` geometry), with TWO config-2-specific
twists:

1. The NCO fold lands in the INPUT domain: the band entry at global
   row offset `a` (input samples from the window origin) is multiplied
   by e^{+j*dth*a} at build time, exactly mirroring the per-element
   mix the fused kernel performs (`mixfir._compute` convention:
   m[p] = x[p] * e^{j*theta(p)}, theta word = w0 + p*dword).
2. The residual phasor is **per output ROW only**: every output column
   of a row shares the same window origin g0 + r*row_stride, so after
   the fold the runtime phase math is ONE [b_rows, 1] cos/sin pair per
   grid step — cheaper than config-1's per-column phasor (out_tile
   transcendental pairs), and the same exact wrapping-i32 word
   arithmetic keeps chunked streaming bit-exact.

The serving kernel body is pure banded 3-matmul (Gauss) complex
products + the row phasor — zero window ops, zero per-element mix.
Frames come from `mixfir_preframed.frame_planes` (host/XLA, gather-
free) or any producer honoring rows x[J*stride : J*stride+span].

Semantics: identical to mix -> resample_{L/M} from zero state (the
`make_mix_resample_kernel` chain) up to f32 rounding of the reordered
ops; agreement gated >100 dB in tests and in the A/B driver.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from srcdsp_tpu.kernels.mixfir import LANE, _round_up
from srcdsp_tpu.kernels.resample_pallas import toeplitz_resample
from srcdsp_tpu.ops.nco import TWO_PI, _INV_SCALE
from srcdsp_tpu.types import F32

__all__ = ["make_resample_preframed_kernel", "banded_resample_ctaps"]


def banded_resample_ctaps(taps, dword: int, up: int, down: int,
                          out_tile: int, hist: int,
                          block_cols: int) -> np.ndarray:
    """Complex-folded stride-L banded pack [NB, bspan, 3*BC].

    Real resampler Toeplitz H[a, j] = h[j*down + hist*up - a*up] times
    the input-domain mix fold e^{+j*dth*a}; packed [Gr | Gi+Gr | Gi-Gr]
    for the shared-term Gauss 3-matmul form (mixfir_ctaps convention).
    """
    ht = toeplitz_resample(np.asarray(taps, np.float64), up, down,
                           out_tile, hist).astype(np.float64)
    span = ht.shape[0]
    dth = TWO_PI * (np.uint32(dword) * _INV_SCALE)
    fold = np.exp(1j * dth * np.arange(span))[:, None]
    hc = ht * fold
    gr = hc.real.astype(np.float32)
    gi = hc.imag.astype(np.float32)
    nb = out_tile // block_cols
    blk_stride = (block_cols * down) // up
    bspan = blk_stride + hist
    bands = []
    for j in range(nb):
        rs = slice(j * blk_stride, j * blk_stride + bspan)
        cs = slice(j * block_cols, (j + 1) * block_cols)
        r, i = gr[rs, cs], gi[rs, cs]
        bands.append(np.concatenate([r, i + r, i - r], axis=1))
    return np.stack(bands)


def _kernel(word0_ref, xr_ref, xi_ref, hsub_ref, yr_ref, yi_ref, *,
            b_rows: int, out_tile: int, row_stride: int, blk_stride: int,
            bspan: int, block_cols: int, precision, dword: int):
    i = pl.program_id(0)
    g0 = i * b_rows * row_stride           # input-domain slab origin
    w0 = word0_ref[0, 0]
    xwr = xr_ref[:, :]                     # pre-framed: NO window ops
    xwi = xi_ref[:, :]
    xsum = xwr + xwi

    def mm(a, bb):
        return jnp.dot(a, bb, preferred_element_type=F32,
                       precision=precision)

    # one phasor per output ROW: all columns share the row's window
    # origin phase w0 + (g0 + r*row_stride)*dword (exact wrapping i32,
    # launch-alignment-invariant -> chunked streaming stays bit-exact)
    dwi = jnp.int32(np.int32(np.uint32(dword)))
    roww = w0 + (jnp.int32(g0) +
                 jax.lax.broadcasted_iota(jnp.int32, (b_rows, 1), 0)
                 * jnp.int32(row_stride)) * dwi
    rang = roww.astype(F32) * F32(TWO_PI * _INV_SCALE)
    c = jnp.cos(rang)
    s = jnp.sin(rang)

    nb = out_tile // block_cols
    for j in range(nb):
        xs = slice(j * blk_stride, j * blk_stride + bspan)
        hsub = hsub_ref[j]
        t1 = mm(xsum[:, xs], hsub[:, :block_cols])
        t2 = mm(xwi[:, xs], hsub[:, block_cols:2 * block_cols])
        t3 = mm(xwr[:, xs], hsub[:, 2 * block_cols:])
        ar = t1 - t2
        ai = t1 + t3
        ys = slice(j * block_cols, (j + 1) * block_cols)
        yr_ref[:, ys] = ar * c - ai * s
        yi_ref[:, ys] = ar * s + ai * c


def make_resample_preframed_kernel(taps, dword: int, up: int, down: int,
                                   out_tile: int = 768, b_rows: int = 16,
                                   block_cols: int = 192,
                                   precision=jax.lax.Precision.HIGHEST,
                                   in_dtype=jnp.float32,
                                   interpret: bool = False):
    """Pure-matmul mix+L/M-resample over pre-framed input.

    Returns (fn, hist, stride, span): fn(word0 i32[1,1],
    xr_f [NT, span], xi_f [NT, span]) -> (yr, yi) [NT, out_tile] f32,
    with frames produced by `mixfir_preframed.frame_planes(x, stride,
    span)` over the [2, hist+N] planes the fused kernel takes (stride =
    out_tile*down/up input samples per output row). word0 is the phase
    word at the first padded sample, exactly the fused kernel's w0.
    """
    taps = np.asarray(taps, np.float64)
    if (out_tile * down) % up != 0 or (block_cols * down) % up != 0:
        raise ValueError(f"out_tile*down and block_cols*down must be "
                         f"multiples of up={up}")
    if not interpret:
        if b_rows % 8 != 0 or out_tile % LANE != 0:
            raise ValueError("b_rows % 8 == 0 and out_tile % 128 == 0")
    if out_tile % block_cols != 0:
        raise ValueError(f"out_tile {out_tile} % block_cols "
                         f"{block_cols} != 0")
    t = taps.shape[0]
    hist = _round_up(-(-(t - 1) // up), LANE)
    row_stride = (out_tile * down) // up
    blk_stride = (block_cols * down) // up
    span = row_stride + hist
    bspan = blk_stride + hist
    nb = out_tile // block_cols
    hsubs = jnp.asarray(banded_resample_ctaps(
        taps, dword, up, down, out_tile, hist, block_cols))
    if in_dtype == jnp.bfloat16:
        hsubs = hsubs.astype(jnp.bfloat16)
    kern = functools.partial(
        _kernel, b_rows=b_rows, out_tile=out_tile, row_stride=row_stride,
        blk_stride=blk_stride, bspan=bspan, block_cols=block_cols,
        precision=precision, dword=int(dword))

    def fn(word0, xr_f, xi_f):
        nt = xr_f.shape[0]
        if xr_f.shape[-1] != span or nt % b_rows:
            raise ValueError(f"frames [{nt},{xr_f.shape[-1]}] vs "
                             f"span={span}, b_rows={b_rows}")
        return pl.pallas_call(
            kern,
            grid=(nt // b_rows,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((b_rows, span), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_rows, span), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nb, bspan, 3 * block_cols),
                             lambda i: (0, 0, 0),
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
            interpret=interpret,
        )(word0, xr_f, xi_f, hsubs)

    return fn, hist, row_stride, span
