"""Producer-pre-framed complex-taps kernel: the FOURTH config-1 framing
experiment (round-5 verdict item 4; ROADMAP "Beyond round 4").

History of the window-copy hypothesis for the config-1/4 gap to the
65 Gs/s HBM speed-of-light (BASELINE.md roofline): three framing
alternatives inside the kernel were falsified (`mixfir_rows.py` -7%,
`ctaps_aligned.py` -42%, bf16-ingest -5.8%). The one untried idea: move
the [1, span] window assembly OUT of the serving kernel entirely — the
PRODUCER emits [NT, span] pre-framed planes (each row is one output
tile's full input window, rows overlap by `hist`), so the serving
kernel is pure banded matmuls + phasor with ZERO window ops.

Cost model: pre-framing duplicates hist/(out_tile*decim) of the input
(~6% at the config-1 shape) — the producer can be the capture-ingest
host path (numpy strided copy, free to the chip), the dist halo stage,
or the tiny on-chip `make_frame_kernel` (measured separately by
bench/ab_preframed.py so the A/B attributes the window cost precisely).

Outputs are BIT-IDENTICAL to kernels/mixfir_ctaps (same values through
the same banded 3-matmul + exact-i32 phasor math — only the window
source differs); asserted by the A/B driver and the unit test.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from srcdsp_tpu.kernels.mixfir import LANE, _round_up
from srcdsp_tpu.kernels.mixfir_ctaps import _banded_pack
from srcdsp_tpu.ops.nco import TWO_PI, _INV_SCALE
from srcdsp_tpu.types import F32

__all__ = ["frame_planes", "make_ctaps_preframed_kernel",
           "make_frame_kernel"]


def frame_planes(x: jax.Array, stride: int, span: int) -> jax.Array:
    """[..., hist+N] -> [..., NT, span] pre-framed rows, gather-free.

    Row J = x[..., J*stride : J*stride+span]; requires span - stride =
    hist with hist | stride (the kernel shapes guarantee both). Built
    from two reshapes + one concat (no gather): base rows [NT, stride]
    plus each row's `hist`-sample lookahead taken from a stride-shifted
    copy padded by (stride - hist) zeros."""
    hist = span - stride
    if hist <= 0 or stride % hist:
        raise ValueError(f"need span-stride=hist with hist | stride; "
                         f"got span={span}, stride={stride}")
    n = x.shape[-1] - hist
    if n % stride:
        raise ValueError(f"N={n} not a multiple of stride {stride}")
    nt = n // stride
    base = x[..., :nt * stride].reshape(*x.shape[:-1], nt, stride)
    shifted = jnp.concatenate(
        [x[..., stride:], jnp.zeros((*x.shape[:-1], stride - hist),
                                    x.dtype)], axis=-1)
    look = shifted.reshape(*x.shape[:-1], nt, stride)[..., :hist]
    return jnp.concatenate([base, look], axis=-1)


def _kernel(word0_ref, xr_ref, xi_ref, hsub_ref, yr_ref, yi_ref, *,
            b_rows: int, out_tile: int, row_stride: int, blk_stride: int,
            bspan: int, block_cols: int, precision, dword: int,
            decim: int, hist: int):
    i = pl.program_id(0)
    g0 = i * b_rows * row_stride
    w0 = word0_ref[0, 0]
    xwr = xr_ref[:, :]                     # pre-framed: NO window ops
    xwi = xi_ref[:, :]
    xsum = xwr + xwi

    def mm(a, bb):
        return jnp.dot(a, bb, preferred_element_type=F32,
                       precision=precision)

    nb = out_tile // block_cols
    dwi = jnp.int32(np.int32(np.uint32(dword)))
    for j in range(nb):
        xs = slice(j * blk_stride, j * blk_stride + bspan)
        hsub = hsub_ref[j]
        t1 = mm(xsum[:, xs], hsub[:, :block_cols])
        t2 = mm(xwi[:, xs], hsub[:, block_cols:2 * block_cols])
        t3 = mm(xwr[:, xs], hsub[:, 2 * block_cols:])
        ar = t1 - t2
        ai = t1 + t3
        # identical phasor math to mixfir_ctaps._compute (exact i32
        # words, launch-alignment-invariant)
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


def make_ctaps_preframed_kernel(taps, dword: int, decim: int,
                                out_tile: int = 512, b_rows: int = 32,
                                block_cols: int = 128,
                                precision=jax.lax.Precision.HIGHEST,
                                in_dtype=jnp.float32,
                                interpret: bool = False):
    """Pure-matmul serving kernel over pre-framed input.

    Returns (fn, hist, stride, span): fn(word0 i32[1,1],
    xr_f [NT, span], xi_f [NT, span]) -> (yr, yi) [NT, out_tile] with
    rows produced by `frame_planes(x, stride, span)` (or any producer
    honoring that layout). Bit-identical to mixfir_ctaps on the same
    underlying stream."""
    taps = np.asarray(taps, np.float64)
    if not interpret:
        if b_rows % 8 != 0 or out_tile % LANE != 0:
            raise ValueError("b_rows % 8 == 0 and out_tile % 128 == 0")
    if out_tile % block_cols != 0:
        raise ValueError(f"out_tile {out_tile} % block_cols "
                         f"{block_cols} != 0")
    t = taps.shape[0]
    hist = _round_up(t - 1, LANE)
    stride = out_tile * decim
    span = stride + hist
    nb = out_tile // block_cols
    bspan = block_cols * decim + hist
    dth = TWO_PI * (np.uint32(dword) * _INV_SCALE)
    taps_c = taps * np.exp(-1j * dth * np.arange(t))
    hsubs = jnp.asarray(
        _banded_pack(taps_c, decim, out_tile, hist, block_cols))
    if in_dtype == jnp.bfloat16:
        hsubs = hsubs.astype(jnp.bfloat16)
    kern = functools.partial(
        _kernel, b_rows=b_rows, out_tile=out_tile, row_stride=stride,
        blk_stride=block_cols * decim, bspan=bspan,
        block_cols=block_cols, precision=precision, dword=int(dword),
        decim=decim, hist=hist)

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

    return fn, hist, stride, span


def _frame_kernel(x_main, x_ov, fr_ref, *, b_rows: int, stride: int,
                  span: int):
    slab = jnp.concatenate([x_main[:, :], x_ov[:, :]], axis=-1)
    fr_ref[:, :] = jnp.concatenate(
        [slab[:, b * stride: b * stride + span] for b in range(b_rows)],
        axis=0)


def make_frame_kernel(stride: int, span: int, b_rows: int = 32,
                      in_dtype=jnp.float32, interpret: bool = False):
    """On-chip producer: raw plane [1? 2, hist+N] -> [NT, span] frames
    per plane. This kernel IS the window-copy cost, isolated — the A/B
    driver times it separately so the serving kernel's matmul rate and
    the framing overhead are attributed independently.

    fn(x [2, hist+N]) -> (xr_f, xi_f) [NT, span]."""
    hist = span - stride
    if hist <= 0 or (stride % hist and not interpret):
        raise ValueError("need hist | stride for the pipelined specs")
    kern = functools.partial(_frame_kernel, b_rows=b_rows, stride=stride,
                             span=span)
    bstride = b_rows * stride

    def one_plane(xp):
        n = xp.shape[-1] - hist
        nt = n // stride
        return pl.pallas_call(
            kern,
            grid=(nt // b_rows,),
            in_specs=[
                pl.BlockSpec((1, bstride), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hist),
                             lambda i: (0, (i + 1) * bstride // hist),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((b_rows, span), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nt, span), in_dtype),
            interpret=interpret,
        )(xp, xp)

    def fn(x):
        return (one_plane(x[0:1]), one_plane(x[1:2]))

    return fn
