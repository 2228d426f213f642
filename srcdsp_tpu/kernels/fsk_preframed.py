"""Producer-pre-framed complex-taps FSK kernel: the config-4 transfer of
the round-5 window-copy confirmation (kernels/mixfir_preframed.py).

Same chain as kernels/fsk_ctaps.py (per-channel complex taps, 3-matmul
Gauss bands, phasor-free discriminator with the constant-add mix
restore, in-kernel O&M partial sums) but the [1, span] window assembly
is gone: the producer ships [C, NT, span] pre-framed rows and the
kernel is pure matmuls + discriminator VPU math. On config-1 the same
change measured +35% f32 / +65% bf16 (84% of HBM SOL) with the window
cost shown to be a hard VPU bottleneck when done in-kernel — this is
the north-star config-4 version of that serving tier.

Outputs are BIT-IDENTICAL to fsk_ctaps on the same underlying stream
(identical banded matmuls, seam logic, and timing sums — only the
window source differs); asserted by the unit test and the A/B driver
before timing. Pre-frame with mixfir_preframed.frame_planes (leading
dims broadcast: [C, 2, hist+N] -> [C, 2, NT, span]).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from srcdsp_tpu.kernels.fsk_fused import PAD, _atan2, demod_tail
from srcdsp_tpu.kernels.mixfir import LANE, _round_up
from srcdsp_tpu.kernels.mixfir_ctaps import _banded_pack
from srcdsp_tpu.ops.nco import TWO_PI, _INV_SCALE
from srcdsp_tpu.types import F32

__all__ = ["make_fsk_preframed_kernel", "fsk_demod_preframed"]


def _kernel(deltas_ref, xr_ref, xi_ref, hsub_ref, perm_ref, d_ref,
            st_ref, yrbuf, yibuf, pcol, carry, *, b_rows: int,
            out_tile: int, decim: int, hist: int, block_cols: int,
            sps: int, precision, class_major: bool):
    c = pl.program_id(0)
    i = pl.program_id(1)
    xwr = xr_ref[0]                        # [b_rows, span] — pre-framed
    xwi = xi_ref[0]
    xsum = xwr + xwi                       # shared karatsuba term

    def mm(a, bb):
        return jnp.dot(a, bb, preferred_element_type=F32,
                       precision=precision)

    nb = out_tile // block_cols
    bspan = block_cols * decim + hist
    for j in range(nb):
        xs = slice(j * block_cols * decim, j * block_cols * decim + bspan)
        ys = slice(j * block_cols, (j + 1) * block_cols)
        hsub = hsub_ref[0, j]
        t1 = mm(xsum[:, xs], hsub[:, :block_cols])
        t2 = mm(xwi[:, xs], hsub[:, block_cols:2 * block_cols])
        t3 = mm(xwr[:, xs], hsub[:, 2 * block_cols:])
        yrbuf[:, ys] = t1 - t2
        yibuf[:, ys] = t1 + t3

    # previous-sample column + per-call seam: identical to fsk_ctaps
    pcol[0, 1:, :] = yrbuf[: b_rows - 1, out_tile - 1: out_tile]
    pcol[1, 1:, :] = yibuf[: b_rows - 1, out_tile - 1: out_tile]

    @pl.when(i == 0)
    def _():
        carry[0] = 0.0
        carry[1] = 0.0

    pcol[0, 0:1, 0:1] = jnp.full((1, 1), carry[0], F32)
    pcol[1, 0:1, 0:1] = jnp.full((1, 1), carry[1], F32)
    carry[0] = yrbuf[b_rows - 1: b_rows, out_tile - 1: out_tile][0, 0]
    carry[1] = yibuf[b_rows - 1: b_rows, out_tile - 1: out_tile][0, 0]

    yr = yrbuf[:, :]
    yi = yibuf[:, :]
    prev_r = jnp.concatenate([pcol[0], yrbuf[:, : out_tile - 1]], axis=1)
    prev_i = jnp.concatenate([pcol[1], yibuf[:, : out_tile - 1]], axis=1)
    zr = yr * prev_r + yi * prev_i
    zi = yi * prev_r - yr * prev_i
    d = _atan2(zi, zr) * F32(1.0 / TWO_PI)
    row = jax.lax.broadcasted_iota(jnp.int32, (b_rows, out_tile), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (b_rows, out_tile), 1)
    seam = (jnp.int32(i) > 0) | ((row + col) > 0)
    d = d + jnp.where(seam, deltas_ref[c, 0], F32(0.0))
    d = d - jnp.where(d > F32(0.5), F32(1.0), F32(0.0))

    gidx = jnp.int32(i * b_rows * out_tile) + row * jnp.int32(out_tile) + col
    ang = jnp.mod(gidx, jnp.int32(sps)).astype(F32) * F32(TWO_PI / sps)
    met = d * d
    rs_c = jnp.sum(met * jnp.cos(ang), axis=1, keepdims=True)
    rs_s = jnp.sum(met * (-jnp.sin(ang)), axis=1, keepdims=True)

    if class_major:
        d = jnp.dot(d, perm_ref[:, :], preferred_element_type=F32,
                    precision=jax.lax.Precision.DEFAULT)
    d_ref[0, :, :] = d
    st_ref[0, :, :] = jnp.zeros((b_rows, PAD), F32)
    st_ref[0, :, 0:1] = rs_c
    st_ref[0, :, 1:2] = rs_s


def make_fsk_preframed_kernel(taps, dwords, decim: int, sps: int,
                              out_tile: int = 512, b_rows: int = 32,
                              block_cols: int = 128,
                              precision=jax.lax.Precision.HIGHEST,
                              class_major: bool = False,
                              in_dtype=jnp.float32,
                              interpret: bool = False):
    """Pre-framed serving form of make_fsk_ctaps_kernel.

    Returns (fn, hist, stride, span): fn(xr_f, xi_f [C, NT, span]) ->
    (d [C, NT, OT], st [C, NT, 128]); frames from
    mixfir_preframed.frame_planes on the [C, 2, hist+N] planes."""
    taps = np.asarray(taps, np.float64)
    dwords = np.asarray(dwords, np.uint32)
    num_channels = int(dwords.shape[0])
    if out_tile % sps != 0:
        raise ValueError(f"out_tile {out_tile} % sps {sps} != 0")
    if not interpret:
        if b_rows % 8 != 0 or out_tile % LANE != 0:
            raise ValueError("b_rows % 8 == 0 and out_tile % 128 == 0")
    if out_tile % block_cols != 0:
        raise ValueError(f"out_tile {out_tile} % block_cols "
                         f"{block_cols} != 0")
    t = taps.shape[-1]
    hist = _round_up(t - 1, LANE)
    stride = out_tile * decim
    span = stride + hist
    nb = out_tile // block_cols
    bspan = block_cols * decim + hist
    a_idx = np.arange(t)
    hs = []
    deltas = np.zeros((num_channels, 1), np.float32)
    for c in range(num_channels):
        dth = TWO_PI * (np.uint32(dwords[c]) * _INV_SCALE)
        hs.append(_banded_pack(taps * np.exp(-1j * dth * a_idx),
                               decim, out_tile, hist, block_cols))
        deltas[c, 0] = np.float32(
            (decim * int(dwords[c])) % (1 << 32)) * np.float32(_INV_SCALE)
    hsubs = jnp.asarray(np.stack(hs))
    if in_dtype == jnp.bfloat16:
        hsubs = hsubs.astype(jnp.bfloat16)
    deltas = jnp.asarray(deltas)
    if class_major:
        pm = np.zeros((out_tile, out_tile), np.float32)
        for i_ in range(out_tile):
            pm[i_, (i_ % sps) * (out_tile // sps) + i_ // sps] = 1.0
    else:
        pm = np.zeros((8, LANE), np.float32)
    perm = jnp.asarray(pm)
    perm_block = pm.shape
    kern = functools.partial(
        _kernel, b_rows=b_rows, out_tile=out_tile, decim=decim,
        hist=hist, block_cols=block_cols, sps=sps, precision=precision,
        class_major=class_major)

    def fn(xr_f, xi_f):
        if xr_f.dtype != in_dtype:
            raise ValueError(f"frames dtype {xr_f.dtype} != kernel "
                             f"in_dtype {jnp.dtype(in_dtype).name}")
        cch, nt, sp = xr_f.shape
        if cch != num_channels or sp != span or nt % b_rows:
            raise ValueError(f"frames [{cch},{nt},{sp}] vs C="
                             f"{num_channels}, span={span}, "
                             f"b_rows={b_rows}")
        grid = (num_channels, nt // b_rows)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, b_rows, span), lambda c, i: (c, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b_rows, span), lambda c, i: (c, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nb, bspan, 3 * block_cols),
                             lambda c, i: (c, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(perm_block, lambda c, i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, b_rows, out_tile), lambda c, i: (c, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b_rows, PAD), lambda c, i: (c, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((num_channels, nt, out_tile),
                                     jnp.float32),
                jax.ShapeDtypeStruct((num_channels, nt, PAD), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((b_rows, out_tile), jnp.float32),
                pltpu.VMEM((b_rows, out_tile), jnp.float32),
                pltpu.VMEM((2, b_rows, 1), jnp.float32),
                pltpu.SMEM((2,), jnp.float32),
            ],
            interpret=interpret,
        )(deltas, xr_f, xi_f, hsubs, perm)

    return fn, hist, stride, span


def fsk_demod_preframed(fn, out_tile: int, xr_f, xi_f, sps: int,
                        state=None, class_major: bool = False):
    """Wrapper: pre-framed kernel + the shared XLA tail (tau + pick)."""
    dd, st = fn(xr_f, xi_f)
    return demod_tail(dd, st, sps, out_tile, state, class_major)
