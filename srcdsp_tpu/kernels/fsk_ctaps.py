"""Complex-taps fused FSK front-end: the mix folded INTO the filter.

Same chain as kernels/fsk_fused.py (SURVEY.md C8 hot path: NCO mix ->
banded-Toeplitz FIR+decimate -> discriminator -> O&M timing sums in ONE
pallas_call), but the per-SAMPLE NCO mix — the VPU-dominant term in the
round-3 roofline attribution (BASELINE.md) — is eliminated entirely:

    y[J] = sum_a h[a] x[n_J - a] e^{j theta(n_J - a)}
         = e^{j theta(n_J)} * sum_a (h[a] e^{-j a dtheta}) x[n_J - a]

The tuning bakes into per-CHANNEL static complex taps g_c = h e^{-j a
dth_c} (the kernels/mixfir_ctaps.py trick), the banded matmuls run the
3-matmul Gauss complex form, and — the FSK-specific win — the per-output
phasor e^{j theta(n_J)} is NEVER APPLIED: the discriminator uses only
phase DIFFERENCES, so the phasor contributes the constant decim*dtheta
per output step, folded into the discriminator output as one scalar add:

    z'[J] = u[J] conj(u[J-1]) = z[J] e^{-j decim*dth}
    d[J]  = wrap(atan2(z')/2pi + decim*dword/2^32)

No phase words exist at runtime at all (word0 cancels identically), so
chunked streaming needs no phase bookkeeping — only the same one-sample
discriminator seam per call as fsk_fused.

Serving tradeoff: dwords are BUILD-time constants (fixed-tune channel
bank — the BASELINE config-4 shape); agile retuning means rebuilding the
tap tensor host-side. kernels/fsk_fused stays the runtime-tuned path.

Accuracy: matches fsk_fused to f32 rounding (the phasor reassociated
through the sum + the constant-add wrap); bits identical on modulated
fixtures (tested). Wrap boundary caveat: a discriminator sample landing
within float eps of exactly +/-0.5 cycles/sample can wrap to the other
sign — irrelevant for any real FSK signal (deviation << Nyquist).
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

__all__ = ["make_fsk_ctaps_kernel", "fsk_demod_ctaps",
           "FskCtapsStream"]


def _compute(slab, deltas_ref, hsub_ref, perm_ref, d_ref, st_ref,
             yrbuf, yibuf, pcol, carry, c, i, *,
             b_rows: int, out_tile: int, decim: int, hist: int, span: int,
             block_cols: int, sps: int, precision, class_major: bool):
    stride = out_tile * decim
    xr = slab[0:1, :]
    xi = slab[1:2, :]
    xwr = jnp.concatenate(
        [xr[:, b * stride: b * stride + span] for b in range(b_rows)], axis=0)
    xwi = jnp.concatenate(
        [xi[:, b * stride: b * stride + span] for b in range(b_rows)], axis=0)
    xsum = xwr + xwi                       # shared karatsuba term

    def mm(a, bb):
        return jnp.dot(a, bb, preferred_element_type=F32, precision=precision)

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
    zr = yr * prev_r + yi * prev_i          # u[n] * conj(u[n-1])
    zi = yi * prev_r - yr * prev_i
    d = _atan2(zi, zr) * F32(1.0 / TWO_PI)
    row = jax.lax.broadcasted_iota(jnp.int32, (b_rows, out_tile), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (b_rows, out_tile), 1)
    # restore the mix: + decim*dtheta (cycles, in [0,1)) then wrap to
    # (-0.5, 0.5] — the ONLY runtime trace the NCO leaves in this kernel.
    # The per-call seam sample (prev = rest) stays 0 exactly as in
    # fsk_fused: atan2(0,0) = 0 there, so the correction is masked off.
    seam = (jnp.int32(i) > 0) | ((row + col) > 0)
    d = d + jnp.where(seam, deltas_ref[c, 0], F32(0.0))
    d = d - jnp.where(d > F32(0.5), F32(1.0), F32(0.0))

    # O&M timing partial sums with in-kernel tone (global index mod sps)
    gidx = jnp.int32(i * b_rows * out_tile) + row * jnp.int32(out_tile) + col
    ang = jnp.mod(gidx, jnp.int32(sps)).astype(F32) * F32(TWO_PI / sps)
    met = d * d
    rs_c = jnp.sum(met * jnp.cos(ang), axis=1, keepdims=True)
    rs_s = jnp.sum(met * (-jnp.sin(ang)), axis=1, keepdims=True)

    if class_major:
        # lane permutation to offset-class-major order via a 1-pass matmul
        # (exact: a permutation cannot change d beyond its own bf16-safe
        # selects) — the wrapper's symbol pick then reads contiguous lanes
        d = jnp.dot(d, perm_ref[:, :], preferred_element_type=F32,
                    precision=jax.lax.Precision.DEFAULT)
    d_ref[0, :, :] = d
    st_ref[0, :, :] = jnp.zeros((b_rows, PAD), F32)
    st_ref[0, :, 0:1] = rs_c
    st_ref[0, :, 1:2] = rs_s


def _kernel(deltas_ref, x_hbm, hsub_ref, perm_ref, d_ref, st_ref,
            yrbuf, yibuf, pcol, carry, slab, sem, *, b_rows: int,
            out_tile: int, decim: int, hist: int, span: int, slab_len: int,
            block_cols: int, sps: int, precision, class_major: bool):
    """Manual-DMA form: one blocking slab copy per grid step."""
    c = pl.program_id(0)
    i = pl.program_id(1)
    g0 = i * b_rows * out_tile * decim
    cp = pltpu.make_async_copy(x_hbm.at[c, :, pl.ds(g0, slab_len)], slab, sem)
    cp.start()
    cp.wait()
    _compute(slab[:, :], deltas_ref, hsub_ref, perm_ref, d_ref, st_ref,
             yrbuf, yibuf, pcol, carry, c, i, b_rows=b_rows,
             out_tile=out_tile, decim=decim, hist=hist, span=span,
             block_cols=block_cols, sps=sps, precision=precision,
             class_major=class_major)


def _kernel_pipelined(deltas_ref, x_main, x_ov, hsub_ref, perm_ref, d_ref,
                      st_ref, yrbuf, yibuf, pcol, carry, *, b_rows: int,
                      out_tile: int, decim: int, hist: int, span: int,
                      block_cols: int, sps: int, precision,
                      class_major: bool):
    """Pipelined form: hop block + next block's hist prefix as separate
    BlockSpec operands (double-buffered HBM loads). Identical math."""
    c = pl.program_id(0)
    i = pl.program_id(1)
    slab = jnp.concatenate([x_main[0], x_ov[0]], axis=-1)
    _compute(slab, deltas_ref, hsub_ref, perm_ref, d_ref, st_ref,
             yrbuf, yibuf, pcol, carry, c, i, b_rows=b_rows,
             out_tile=out_tile, decim=decim, hist=hist, span=span,
             block_cols=block_cols, sps=sps, precision=precision,
             class_major=class_major)


def make_fsk_ctaps_kernel(taps, dwords, decim: int, sps: int,
                          out_tile: int = 512, b_rows: int = 32,
                          block_cols: int = 128,
                          precision=jax.lax.Precision.HIGHEST,
                          class_major: bool = False,
                          pipelined: bool | None = None,
                          in_dtype=jnp.float32,
                          interpret: bool = False):
    """Build the complex-taps fused FSK front-end for FIXED per-channel
    tuning words `dwords` (u32 array, one per channel). Returns (fn, hist)
    with fn: (x [C, 2, HK+N]) -> (d [C, NT, OT], st [C, NT, 128]) — no
    runtime phase words (see module docstring).

    Reference parity: same chain semantics as kernels/fsk_fused
    (itself the fused form of SURVEY.md C8 / BASELINE config 4)."""
    taps = np.asarray(taps, np.float64)
    dwords = np.asarray(dwords, np.uint32)
    num_channels = int(dwords.shape[0])
    if out_tile % sps != 0:
        raise ValueError(f"out_tile {out_tile} % sps {sps} != 0")
    if not interpret:
        if b_rows % 8 != 0 or out_tile % LANE != 0:
            raise ValueError("b_rows % 8 == 0 and out_tile % 128 == 0 required")
    if out_tile % block_cols != 0:
        raise ValueError(f"out_tile {out_tile} % block_cols {block_cols} != 0")
    t = taps.shape[-1]
    hist = _round_up(t - 1, LANE)
    span = out_tile * decim + hist
    nb = out_tile // block_cols
    bspan = block_cols * decim + hist
    a_idx = np.arange(t)
    hs = []
    deltas = np.zeros((num_channels, 1), np.float32)
    for c in range(num_channels):
        dth = TWO_PI * (np.uint32(dwords[c]) * _INV_SCALE)
        hs.append(_banded_pack(taps * np.exp(-1j * dth * a_idx),
                               decim, out_tile, hist, block_cols))
        # decim*dword mod 2^32 -> cycles in [0, 1)
        deltas[c, 0] = np.float32(
            (decim * int(dwords[c])) % (1 << 32)) * np.float32(_INV_SCALE)
    hsubs = jnp.asarray(np.stack(hs))       # [C, NB, bspan, 3*BC]
    if in_dtype == jnp.bfloat16:
        # bf16-INGEST variant: x planes ship as bf16 (halved input HBM
        # traffic + window-copy bytes); keep the MXU pass homogeneous
        hsubs = hsubs.astype(jnp.bfloat16)
    deltas = jnp.asarray(deltas)
    if class_major:
        # lane permutation matrix: row i -> col (i%sps)*(OT/sps) + i//sps
        pm = np.zeros((out_tile, out_tile), np.float32)
        for i_ in range(out_tile):
            pm[i_, (i_ % sps) * (out_tile // sps) + i_ // sps] = 1.0
    else:
        # never read by the kernel when class_major is False — ship the
        # smallest tiling-legal dummy (8x128 = 4 KB vs 1 MB at OT=512;
        # round-5 advisor finding: reclaims VMEM + HBM traffic)
        pm = np.zeros((8, LANE), np.float32)
    perm = jnp.asarray(pm)
    perm_block = pm.shape
    stride = out_tile * decim
    bstride = b_rows * stride
    slab_len = bstride + hist
    pipe_ok = bstride % hist == 0
    use_pipe = pipe_ok if pipelined is None else pipelined
    if use_pipe and not pipe_ok:
        raise ValueError(
            f"pipelined form needs hist ({hist}) | b_rows*out_tile*decim "
            f"({bstride})")

    def fn(x):
        if x.dtype != in_dtype:
            raise ValueError(f"x dtype {x.dtype} != kernel in_dtype "
                             f"{jnp.dtype(in_dtype).name}")
        n = x.shape[-1] - hist
        if n % bstride != 0:
            raise ValueError(f"N={n} not a multiple of {bstride}")
        nt = n // stride
        grid = (num_channels, nt // b_rows)
        common = dict(
            b_rows=b_rows, out_tile=out_tile, decim=decim, hist=hist,
            span=span, block_cols=block_cols, sps=sps, precision=precision,
            class_major=class_major)
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
                pltpu.VMEM((2, slab_len), in_dtype),
                pltpu.SemaphoreType.DMA,
            ]
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ] + x_specs + [
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
            ] + slab_scratch,
            interpret=interpret,
        )(deltas, *x_args, hsubs, perm)

    return fn, hist


def fsk_demod_ctaps(fn, hist: int, out_tile: int, x_planes, sps: int,
                    state=None, class_major: bool = False):
    """Wrapper: ctaps kernel + the shared XLA tail (tau + symbol pick).

    x_planes: [C, 2, HK+N]; state: (acc_r [C,1], acc_i [C,1]) or None.
    Returns (state, (bits [C, Nsym] int32, soft [C, Nsym] f32)). No phase
    words: tuning lives in the kernel's baked taps."""
    dd, st = fn(x_planes)
    return demod_tail(dd, st, sps, out_tile, state, class_major)


class FskCtapsStream:
    """Streaming driver for the ctaps serving path (FskPlanesStream
    analog): manages the history prefix and the demod accumulators, so
    callers feed raw [C, 2, N] plane chunks (N a multiple of
    b_rows*out_tile*decim) and receive bits. No phase bookkeeping exists
    at all — the kernel carries none (module docstring)."""

    def __init__(self, taps, dwords, decim: int, sps: int,
                 num_channels: int, out_tile: int = 512, b_rows: int = 32,
                 precision=jax.lax.Precision.DEFAULT,
                 class_major: bool = True, interpret: bool = False):
        self.fn, self.hist = make_fsk_ctaps_kernel(
            taps, dwords, decim, sps, out_tile=out_tile, b_rows=b_rows,
            precision=precision, class_major=class_major,
            interpret=interpret)
        self.out_tile = out_tile
        self.sps = sps
        self.class_major = class_major
        self.block_in = b_rows * out_tile * decim
        self._hist = jnp.zeros((num_channels, 2, self.hist), jnp.float32)
        self._state = None

    def process(self, x_chunk: jax.Array):
        """x_chunk: [C, 2, N] raw planes -> (bits, soft) for this chunk."""
        xin = jnp.concatenate([self._hist, x_chunk], axis=-1)
        self._state, out = fsk_demod_ctaps(
            self.fn, self.hist, self.out_tile, xin, self.sps,
            state=self._state, class_major=self.class_major)
        self._hist = xin[..., xin.shape[-1] - self.hist:]
        return out
