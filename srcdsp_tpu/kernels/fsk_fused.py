"""Fully-fused FSK front-end kernel (SURVEY.md C8 hot path).

One pallas_call per block does the ENTIRE per-sample work of the config-4
chain: NCO mix -> banded-Toeplitz FIR+decimate (MXU) -> frequency
discriminator -> O&M timing partial sums. Only the per-block scalar math
(tau from the summed accumulator, the one-hot symbol pick) remains outside
— on the dispatch-expensive tunnel backend that's the difference between
~15 XLA ops and 3.

Pieces the Pallas lowering lacks are hand-rolled:
- atan2: 11th-degree odd minimax polynomial on min/max-folded arguments
  plus quadrant selects (|err| < 3e-7 rad — phase noise orders below the
  discriminator's own quantization);
- the discriminator's previous-sample column crosses row/grid boundaries
  via VMEM staging and an SMEM carry (reset at each channel's first step,
  so each kernel CALL starts from rest — one-sample seam per call,
  matching chains.fsk_planes stream-start semantics).

Output layout (round 2): TWO outputs — d [C, NT, OT] (discriminator,
cycles/sample; contiguous, so the wrapper's [C, K] reshape is a free
view) and st [C, NT, 128] (col 0 = the row's sum(d^2 * cos_tone), col 1
= the sin counterpart, rest zeros). The original single padded output
made the wrapper's d-slice a strided 0.5 ms device copy (profiler,
BASELINE.md device-side table); the split removes it.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from srcdsp_tpu.kernels.mixfir import LANE, _round_up, banded_taps
from srcdsp_tpu.ops.nco import TWO_PI, _INV_SCALE
from srcdsp_tpu.types import F32

PAD = 128  # extra output columns (2 used for partial sums)


def _atan_poly(a, s):
    # minimax for atan(a), a in [0, 1]; s = a*a
    return a * (0.99997726 + s * (-0.33262347 + s * (0.19354346 + s * (
        -0.11643287 + s * (0.05265332 - s * 0.01172120)))))


def _atan2(y, x):
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    mn = jnp.minimum(ax, ay)
    a = mn / jnp.maximum(mx, 1e-30)
    t = _atan_poly(a, a * a)
    t = jnp.where(ay > ax, F32(np.pi / 2) - t, t)
    t = jnp.where(x < 0, F32(np.pi) - t, t)
    return jnp.where(y < 0, -t, t)


def _kernel(words0_ref, dwords_ref, x_hbm, hsub_ref, perm_ref, d_ref,
            st_ref, yrbuf, yibuf, pcol, carry, slab, sem, *,
            b_rows: int, out_tile: int, decim: int, hist: int, span: int,
            slab_len: int, block_cols: int, sps: int, precision,
            class_major: bool):
    """Manual-DMA form: one blocking slab copy per grid step."""
    c = pl.program_id(0)
    i = pl.program_id(1)
    stride = out_tile * decim
    g0 = i * b_rows * stride
    cp = pltpu.make_async_copy(
        x_hbm.at[c, :, pl.ds(g0, slab_len)], slab, sem)
    cp.start()
    cp.wait()
    _compute(slab[:, :], words0_ref, dwords_ref, hsub_ref, perm_ref,
             d_ref, st_ref, yrbuf, yibuf, pcol, carry, c, i,
             b_rows=b_rows, out_tile=out_tile, decim=decim, hist=hist,
             span=span, block_cols=block_cols, sps=sps,
             precision=precision, class_major=class_major)


def _kernel_pipelined(words0_ref, dwords_ref, x_main, x_ov, hsub_ref,
                      perm_ref, d_ref, st_ref, yrbuf, yibuf, pcol, carry,
                      *, b_rows: int, out_tile: int, decim: int, hist: int,
                      span: int, block_cols: int, sps: int, precision,
                      class_major: bool):
    """Pipelined form: the overlapping slab arrives as TWO BlockSpec
    operands (the per-step hop block + the next block's `hist` prefix),
    so the Pallas grid pipeline double-buffers the HBM loads behind the
    previous step's compute instead of the blocking copy above.
    Identical math — bit-identical outputs (tested)."""
    c = pl.program_id(0)
    i = pl.program_id(1)
    slab = jnp.concatenate([x_main[0], x_ov[0]], axis=-1)
    _compute(slab, words0_ref, dwords_ref, hsub_ref, perm_ref,
             d_ref, st_ref, yrbuf, yibuf, pcol, carry, c, i,
             b_rows=b_rows, out_tile=out_tile, decim=decim, hist=hist,
             span=span, block_cols=block_cols, sps=sps,
             precision=precision, class_major=class_major)


def _compute(slab, words0_ref, dwords_ref, hsub_ref, perm_ref, d_ref,
             st_ref, yrbuf, yibuf, pcol, carry, c, i, *,
             b_rows: int, out_tile: int, decim: int, hist: int, span: int,
             block_cols: int, sps: int, precision, class_major: bool):
    stride = out_tile * decim
    g0 = i * b_rows * stride
    xr = slab[0:1, :]
    xi = slab[1:2, :]
    xwr = jnp.concatenate(
        [xr[:, b * stride: b * stride + span] for b in range(b_rows)], axis=0)
    xwi = jnp.concatenate(
        [xi[:, b * stride: b * stride + span] for b in range(b_rows)], axis=0)
    colw = words0_ref[c, 0] + (jnp.int32(g0) +
                               jax.lax.broadcasted_iota(jnp.int32, (1, span), 1)
                               ) * dwords_ref[c, 0]
    roww = (jax.lax.broadcasted_iota(jnp.int32, (b_rows, 1), 0)
            * (jnp.int32(stride) * dwords_ref[c, 0]))
    cang = colw.astype(F32) * F32(TWO_PI * _INV_SCALE)
    rang = roww.astype(F32) * F32(TWO_PI * _INV_SCALE)
    cw = jnp.cos(rang) * jnp.cos(cang) - jnp.sin(rang) * jnp.sin(cang)
    sw = jnp.cos(rang) * jnp.sin(cang) + jnp.sin(rang) * jnp.cos(cang)
    mr = xwr * cw - xwi * sw
    mi = xwr * sw + xwi * cw

    nb = out_tile // block_cols
    bspan = block_cols * decim + hist
    for j in range(nb):
        xs = slice(j * block_cols * decim, j * block_cols * decim + bspan)
        ys = slice(j * block_cols, (j + 1) * block_cols)
        hsub = hsub_ref[0, j]
        yrbuf[:, ys] = jnp.dot(mr[:, xs], hsub, preferred_element_type=F32,
                               precision=precision)
        yibuf[:, ys] = jnp.dot(mi[:, xs], hsub, preferred_element_type=F32,
                               precision=precision)

    # previous-sample column: row b's col -1 = row b-1's last col; row 0
    # takes the carried value (0 at each channel's first step)
    pcol[0, 1:, :] = yrbuf[: b_rows - 1, out_tile - 1: out_tile]
    pcol[1, 1:, :] = yibuf[: b_rows - 1, out_tile - 1: out_tile]

    @pl.when(i == 0)
    def _():
        carry[0] = 0.0
        carry[1] = 0.0

    # scalar VMEM stores are rejected by Mosaic: stage through [1,1] values
    pcol[0, 0:1, 0:1] = jnp.full((1, 1), carry[0], F32)
    pcol[1, 0:1, 0:1] = jnp.full((1, 1), carry[1], F32)
    carry[0] = yrbuf[b_rows - 1: b_rows, out_tile - 1: out_tile][0, 0]
    carry[1] = yibuf[b_rows - 1: b_rows, out_tile - 1: out_tile][0, 0]

    yr = yrbuf[:, :]
    yi = yibuf[:, :]
    prev_r = jnp.concatenate([pcol[0], yrbuf[:, : out_tile - 1]], axis=1)
    prev_i = jnp.concatenate([pcol[1], yibuf[:, : out_tile - 1]], axis=1)
    zr = yr * prev_r + yi * prev_i          # y[n] * conj(y[n-1])
    zi = yi * prev_r - yr * prev_i
    d = _atan2(zi, zr) * F32(1.0 / TWO_PI)

    # O&M timing partial sums with in-kernel tone (global index mod sps)
    row = jax.lax.broadcasted_iota(jnp.int32, (b_rows, out_tile), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (b_rows, out_tile), 1)
    gidx = jnp.int32(i * b_rows * out_tile) + row * jnp.int32(out_tile) + col
    ang = jnp.mod(gidx, jnp.int32(sps)).astype(F32) * F32(TWO_PI / sps)
    met = d * d
    rs_c = jnp.sum(met * jnp.cos(ang), axis=1, keepdims=True)
    rs_s = jnp.sum(met * (-jnp.sin(ang)), axis=1, keepdims=True)

    if class_major:
        # lane permutation to offset-class-major order via a 1-pass matmul
        # (a permutation is exact at any matmul precision up to the bf16
        # rounding of d itself, which cannot flip a sign): the wrapper's
        # symbol pick then reads CONTIGUOUS lane blocks instead of paying
        # the minor-sps reshape relayout (~0.5 ms/call, profiled)
        d = jnp.dot(d, perm_ref[:, :], preferred_element_type=F32,
                    precision=jax.lax.Precision.DEFAULT)
    d_ref[0, :, :] = d
    st_ref[0, :, :] = jnp.zeros((b_rows, PAD), F32)
    st_ref[0, :, 0:1] = rs_c
    st_ref[0, :, 1:2] = rs_s


def make_fsk_mc_kernel(taps, decim: int, num_channels: int, sps: int,
                       out_tile: int = 512, b_rows: int = 8,
                       block_cols: int = 128,
                       precision=jax.lax.Precision.HIGHEST,
                       class_major: bool = False,
                       pipelined: bool | None = None,
                       interpret: bool = False):
    """Build the fused FSK front-end. Returns (fn, hist) with
    fn: (words0 i32[C,1], dwords i32[C,1], x [C, 2, HK+N])
        -> (d [C, NT, OT], st [C, NT, 128]).

    class_major=True emits each row of d with its lanes permuted to
    offset-class-major order (lane o*(OT/sps)+s = sample s*sps+o), so the
    demod tail's symbol pick is a sum of contiguous lane blocks — pass the
    same flag to fsk_demod_fused.

    `pipelined`: stage the input through grid BlockSpecs (hop block +
    next block's `hist` prefix) so the pipeline double-buffers HBM loads
    behind compute, instead of the manual blocking slab DMA. Requires
    hist | b_rows*out_tile*decim; None = auto (on when divisible).
    Outputs are bit-identical either way."""
    taps = np.asarray(taps, np.float32)
    if out_tile % sps != 0:
        raise ValueError(f"out_tile {out_tile} % sps {sps} != 0")
    if not interpret:
        if b_rows % 8 != 0 or out_tile % LANE != 0:
            raise ValueError("b_rows % 8 == 0 and out_tile % 128 == 0 required")
    t = taps.shape[-1]
    hist = _round_up(t - 1, LANE)
    span = out_tile * decim + hist
    nb = out_tile // block_cols
    bspan = block_cols * decim + hist
    hsubs = jnp.asarray(banded_taps(taps, decim, out_tile, hist, block_cols))[None]
    # lane permutation matrix: row i -> col (i%sps)*(OT/sps) + i//sps
    pm = np.zeros((out_tile, out_tile), np.float32)
    for i_ in range(out_tile):
        pm[i_, (i_ % sps) * (out_tile // sps) + i_ // sps] = 1.0
    perm = jnp.asarray(pm)
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
            raise ValueError(f"N={n} not a multiple of {bstride}")
        nt = n // (out_tile * decim)
        grid = (num_channels, nt // b_rows)
        common = dict(
            b_rows=b_rows, out_tile=out_tile, decim=decim,
            hist=hist, span=span, block_cols=block_cols,
            sps=sps, precision=precision, class_major=class_major)
        if use_pipe:
            kern = functools.partial(_kernel_pipelined, **common)
            x_specs = [
                pl.BlockSpec((1, 2, bstride), lambda c, i: (c, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, hist),
                             lambda c, i: (c, 0, (i + 1) * bstride // hist),
                             memory_space=pltpu.VMEM),
            ]
            x_args = (x, x)
            slab_scratch = []
        else:
            kern = functools.partial(_kernel, slab_len=slab_len, **common)
            x_specs = [pl.BlockSpec(memory_space=pl.ANY)]
            x_args = (x,)
            slab_scratch = [
                pltpu.VMEM((2, slab_len), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ]
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ] + x_specs + [
                pl.BlockSpec((1, nb, bspan, block_cols),
                             lambda c, i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((out_tile, out_tile), lambda c, i: (0, 0),
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
            ] + slab_scratch,
            interpret=interpret,
        )(words0, dwords, *x_args, hsubs, perm)

    return fn, hist


def fsk_demod_fused(fn, hist: int, out_tile: int, words0, dwords, x_planes,
                    sps: int, state=None, class_major: bool = False):
    """Wrapper: fused kernel + the 3-op XLA tail (tau + one-hot pick).

    x_planes: [C, 2, HK+N]; state: (acc_r [C,1], acc_i [C,1]) or None.
    Returns (state, (bits [C, Nsym] int32, soft [C, Nsym] f32)).
    class_major must match the kernel's flag: the pick then sums
    contiguous lane blocks of the permuted rows (no minor-sps relayout).
    """
    w0 = jnp.asarray(np.asarray(words0, np.uint32).view(np.int32).reshape(-1, 1))
    dw = jnp.asarray(np.asarray(dwords, np.uint32).view(np.int32).reshape(-1, 1))
    dd, st = fn(w0, dw, x_planes)
    return demod_tail(dd, st, sps, out_tile, state, class_major)


def demod_tail(dd, st, sps: int, out_tile: int, state=None,
               class_major: bool = False):
    """The 3-op XLA tail shared by the fused-kernel wrappers: O&M tau from
    the in-kernel partial sums, then the one-hot symbol pick."""
    from srcdsp_tpu.chains.fsk_planes import pick_symbols

    cch = dd.shape[0]
    rs_c = jnp.sum(st[:, :, 0], axis=-1, keepdims=True)
    rs_s = jnp.sum(st[:, :, 1], axis=-1, keepdims=True)
    if state is None:
        z = jnp.zeros((cch, 1), F32)
        state = (z, z)
    acc_r = F32(0.5) * state[0] + rs_c
    acc_i = F32(0.5) * state[1] + rs_s
    tau = jnp.mod(-F32(sps / TWO_PI) * jnp.arctan2(acc_i, acc_r), F32(sps))
    if class_major:
        # rows of dd are class-major: lane block o holds that row's symbols
        # sampled at offset o — select the nearest class with contiguous
        # slices (the whole point of the in-kernel permutation)
        off = jnp.mod(jnp.round(tau), F32(sps))            # [C, 1]
        spr = out_tile // sps
        soft3 = None
        for o in range(sps):
            w = (off == F32(o)).astype(F32)[:, :, None]    # [C, 1, 1]
            term = w * dd[:, :, o * spr:(o + 1) * spr]
            soft3 = term if soft3 is None else soft3 + term
        soft = soft3.reshape(cch, -1)
    else:
        d = dd.reshape(cch, -1)          # contiguous: a free view
        soft = pick_symbols(d, tau, sps)
    bits = (soft > 0).astype(jnp.int32)
    return (acc_r, acc_i), (bits, soft)
