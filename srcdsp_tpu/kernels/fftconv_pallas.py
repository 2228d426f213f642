"""Fused overlap-save FFT-convolution Pallas kernel (SURVEY.md C6 hot path;
BASELINE config 3).

The XLA plane path (ops.fftconv_planes) materializes the overlapped frame
matrix in HBM (fft/hop x the input traffic) and round-trips every four-step
stage through HBM. This kernel does the whole filter in ONE HBM pass per
sample: slab DMA -> frame build in VMEM -> four-step MXU FFT -> frequency
multiply -> inverse FFT -> emit hop samples, with the overlap-discard and
the 1/N scale folded into the final inverse-DFT matrix.

Layout contract that makes it gather/transpose-free: the caller reshapes
the padded planes to [C, 2, R, n2] (a free HBM reshape), so

  - every length-fft frame is n1 = fft/n2 CONSECUTIVE rows of the slab
    (hop % n2 == 0 keeps frame starts row-aligned, hop/n2 % 8 == 0 keeps
    them sublane-tile-aligned);
  - stage 1 contracts the row (n1) axis with frames stacked along LANES:
    S = W1_comb @ X_st, one [2n1, 2n1] x [2n1, B*n2] matmul (planes
    stacked in rows — the combined complex form from kernels.bank_pallas);
  - stage 2 / inverse stage 1 contract the lane (n2) axis with frames
    stacked along ROWS and planes along LANES: [B*n1, 2n2] @ [2n2, 2n2]
    — full-width MXU matmuls where ~80% of the FLOPs live;
  - the inverse's row-contracting stage uses G2_comb [2*hs, 2n1] whose
    rows only cover output samples >= overlap: discard costs zero FLOPs.

Math: four-step (Bailey) decomposition, both directions derived in
ops.fft_planes; inverse decomposed directly (not via the conj trick) so
its twiddle/DFT constants bake the +i sign and the 1/N scale:

  X[k1 + n1*k2] = sum_n2 W2[k2,n2] * tw[k1,n2] * sum_n1 W1[k1,n1] x[n1,n2]
  x[n1,n2] = (1/N) sum_k1 W1c[n1,k1] * twc[k1,n2] * sum_k2 W2c[k2,n2] X[k1,k2]

Semantics identical to ops.fftconv_planes (same frames, same freq
response); verified against it bit-tight in tests/unit/test_fftconv_kernel.

`precision` trades MXU passes for accuracy exactly like the bank kernel:
HIGHEST = 6-pass f32 (~1e-6 rel, the verification default); DEFAULT =
1-pass bf16-input/f32-accumulate (~6x matmul rate, ~30 dB SNR — the
serving config where demod chains follow; see BASELINE.md budgets).
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

from srcdsp_tpu.types import F32

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _dft(n: int, sign: float) -> np.ndarray:
    k = np.arange(n)
    return np.exp(sign * 2j * np.pi * np.outer(k, k) / n)


def _lhs_comb(m: np.ndarray) -> np.ndarray:
    """[[Mr, -Mi], [Mi, Mr]]: out_stacked_rows = comb @ in_stacked_rows."""
    return np.block([[m.real, -m.imag], [m.imag, m.real]]).astype(np.float32)


def _rhs_comb(m: np.ndarray) -> np.ndarray:
    """[[Mr, Mi], [-Mi, Mr]]: out_stacked_lanes = in_stacked_lanes @ comb."""
    return np.block([[m.real, m.imag], [-m.imag, m.real]]).astype(np.float32)


def _kernel(x_hbm, w1c_ref, w2tc_ref, w2cc_ref, g2c_ref, twf_ref, twi_ref,
            h2_ref, yr_ref, yi_ref, slab, sem, *, b: int, n1: int, n2: int,
            hs: int, ov_rows: int, precision, karatsuba: bool):
    """Manual-DMA form: one blocking slab copy per grid step."""
    c = pl.program_id(0)
    i = pl.program_id(1)
    row0 = i * b * hs

    cp = pltpu.make_async_copy(
        x_hbm.at[c, :, pl.ds(row0, b * hs + ov_rows), :], slab, sem)
    cp.start()
    cp.wait()
    _compute(slab, w1c_ref, w2tc_ref, w2cc_ref, g2c_ref, twf_ref, twi_ref,
             h2_ref, yr_ref, yi_ref, b=b, n1=n1, n2=n2, hs=hs,
             ov_rows=ov_rows, precision=precision, karatsuba=karatsuba)


def _kernel_pipelined(x_main, x_ov, w1c_ref, w2tc_ref, w2cc_ref, g2c_ref,
                      twf_ref, twi_ref, h2_ref, yr_ref, yi_ref, *, b: int,
                      n1: int, n2: int, hs: int, ov_rows: int, precision,
                      karatsuba: bool):
    """Pipelined form: the overlapping slab arrives as TWO BlockSpec
    operands (the hop block + the next block's ov_rows prefix), so the
    Pallas grid pipeline double-buffers the HBM loads behind the previous
    step's matmuls instead of the blocking copy above. Identical math —
    bit-identical outputs (tested in interpret mode AND on hardware);
    +16% f32 / +21% bf16 at the config-3 serving shape (A/B medians,
    bench/results_round2.jsonl)."""
    slab = jnp.concatenate([x_main[0], x_ov[0]], axis=1)
    _compute(slab, w1c_ref, w2tc_ref, w2cc_ref, g2c_ref, twf_ref, twi_ref,
             h2_ref, yr_ref, yi_ref, b=b, n1=n1, n2=n2, hs=hs,
             ov_rows=ov_rows, precision=precision, karatsuba=karatsuba)


def _compute(slab, w1c_ref, w2tc_ref, w2cc_ref, g2c_ref, twf_ref, twi_ref,
             h2_ref, yr_ref, yi_ref, *, b: int, n1: int, n2: int,
             hs: int, ov_rows: int, precision, karatsuba: bool):
    def mm(a, bb):
        return jnp.dot(a, bb, preferred_element_type=F32, precision=precision)

    # --- frame build: X_st [2*n1, B*n2], planes stacked in rows, frames in
    # lanes. Frame b_ = slab rows [b_*hs, b_*hs + n1) (sublane-aligned).
    xs_r = [slab[0, bb * hs: bb * hs + n1, :] for bb in range(b)]
    xs_i = [slab[1, bb * hs: bb * hs + n1, :] for bb in range(b)]
    x_st = jnp.concatenate(
        [jnp.concatenate(xs_r, axis=1), jnp.concatenate(xs_i, axis=1)], axis=0)

    # --- stage 1 (contract n1): S_st [2*n1, B*n2]
    s_st = mm(w1c_ref[:, :], x_st)
    sr, si = s_st[:n1, :], s_st[n1:, :]

    # --- forward twiddle (lane-tiled [n1, B*n2] constants)
    twr, twi_f = twf_ref[0], twf_ref[1]
    tr = sr * twr - si * twi_f
    ti = sr * twi_f + si * twr

    if karatsuba:
        # 3-matmul (Gauss) complex form for the lane-contracting stages:
        # with W constant, Y = X @ W needs only
        #   t1 = (Xr + Xi) @ Wr,  t2 = Xi @ (Wi + Wr),  t3 = Xr @ (Wi - Wr)
        #   Yr = t1 - t2,  Yi = t1 + t3
        # i.e. 3 [.,n2]x[n2,n2] MXU tile passes instead of the combined
        # form's 4 ([.,2n2]x[2n2,2n2]). Only worth it here, where every dim
        # is a lane-tile multiple; the row-contracting stages (2n1 = 64 < 128)
        # pad to one tile either way and stay combined. Constants arrive
        # packed [n2, 3*n2] = [Wr | Wi+Wr | Wi-Wr].
        yr_l = jnp.concatenate([tr[:, bb * n2:(bb + 1) * n2]
                                for bb in range(b)], axis=0)
        yi_l = jnp.concatenate([ti[:, bb * n2:(bb + 1) * n2]
                                for bb in range(b)], axis=0)
        t1 = mm(yr_l + yi_l, w2tc_ref[:, :n2])
        t2 = mm(yi_l, w2tc_ref[:, n2:2 * n2])
        t3 = mm(yr_l, w2tc_ref[:, 2 * n2:])
        x2r, x2i = t1 - t2, t1 + t3

        hr, hi = h2_ref[0, 0], h2_ref[0, 1]
        zr = x2r * hr - x2i * hi
        zi = x2r * hi + x2i * hr

        s1 = mm(zr + zi, w2cc_ref[:, :n2])
        s2 = mm(zi, w2cc_ref[:, n2:2 * n2])
        s3 = mm(zr, w2cc_ref[:, 2 * n2:])
        ur, ui = s1 - s2, s1 + s3
    else:
        # --- restack: frames to rows, planes to lanes -> [B*n1, 2*n2]
        y_l = jnp.concatenate(
            [jnp.concatenate([tr[:, bb * n2:(bb + 1) * n2],
                              ti[:, bb * n2:(bb + 1) * n2]], axis=1)
             for bb in range(b)], axis=0)

        # --- stage 2 (contract n2): spectrum [B*n1, 2*n2] = [X2r | X2i]
        x2_l = mm(y_l, w2tc_ref[:, :])
        x2r, x2i = x2_l[:, :n2], x2_l[:, n2:]

        # --- frequency multiply (row-tiled [B*n1, n2] constants; leading
        # block dim selects this channel's response when taps are
        # per-channel)
        hr, hi = h2_ref[0, 0], h2_ref[0, 1]
        zr = x2r * hr - x2i * hi
        zi = x2r * hi + x2i * hr
        z_l = jnp.concatenate([zr, zi], axis=1)

        # --- inverse stage 1 (contract k2): U [B*n1, 2*n2]
        u_l = mm(z_l, w2cc_ref[:, :])
        ur, ui = u_l[:, :n2], u_l[:, n2:]

    # --- inverse twiddle (row-tiled [B*n1, n2] constants)
    tir, tii = twi_ref[0], twi_ref[1]
    vr = ur * tir - ui * tii
    vi = ur * tii + ui * tir

    # --- restack: planes to rows, frames to lanes -> [2*n1, B*n2]
    v_st = jnp.concatenate(
        [jnp.concatenate([vr[bb * n1:(bb + 1) * n1, :] for bb in range(b)],
                         axis=1),
         jnp.concatenate([vi[bb * n1:(bb + 1) * n1, :] for bb in range(b)],
                         axis=1)], axis=0)

    # --- inverse stage 2 (contract k1) + overlap discard + 1/N scale:
    # G2_comb rows only span output rows n1_idx in [ov_rows, n1)
    o_st = mm(g2c_ref[:, :], v_st)              # [2*hs, B*n2]

    yr_ref[0, :, :] = jnp.concatenate(
        [o_st[:hs, bb * n2:(bb + 1) * n2] for bb in range(b)], axis=0)
    yi_ref[0, :, :] = jnp.concatenate(
        [o_st[hs:, bb * n2:(bb + 1) * n2] for bb in range(b)], axis=0)


@dataclasses.dataclass(frozen=True)
class FftConvKernel:
    """Compiled fused overlap-save filter + its layout contract."""

    fn: Callable          # x [C, 2, R, n2] -> (yr, yi) [C, R-ov_rows, n2]
    fft_size: int
    hop: int              # output samples per frame
    overlap: int          # history samples callers must prepend (zeros at start)
    num_taps: int
    n1: int
    n2: int
    b_frames: int
    num_channels: int

    def block_in(self) -> int:
        """Input sample granularity (N must be a multiple of this)."""
        return self.b_frames * self.hop


def make_fftconv_kernel(taps, fft_size: int = 4096, num_channels: int = 1,
                        n2: int = LANE, b_frames: int = 8,
                        precision=jax.lax.Precision.HIGHEST,
                        karatsuba: bool = False,
                        pipelined: bool | None = None,
                        interpret: bool = False) -> FftConvKernel:
    """Build the fused kernel for a fixed tap set / FFT size / tiling.

    `taps` may be [T] (one filter shared by all channels) or [C, T]
    (per-channel filters — the reference's independent per-channel
    objects): per-channel frequency responses are staged as one
    [C, 2, B*n1, n2] constant and the grid's channel step selects its
    block.

    Requirements: fft_size % n2 == 0, n2 % 128 == 0, n1 = fft_size/n2 % 8
    == 0, and the lane-aligned overlap (taps-1 rounded up so hop/n2 is a
    multiple of 8) must leave hop > 0. For 1024 taps at 4096/n2=128:
    overlap = 1024, hop = 3072 — the same hop ops.fftconv_planes would not
    reach (it needs hop | fft_size; here only hop % n2 == 0 is needed).

    `pipelined`: route the input through grid BlockSpecs (two operands —
    the hop block and the next block's overlap prefix) so the Pallas
    pipeline overlaps HBM loads with compute, instead of the manual
    blocking slab DMA. Requires ov_rows | b_frames*hs; None = auto (use
    it whenever the divisibility holds). Outputs are bit-identical.
    """
    taps = np.asarray(taps, np.float64)
    per_channel = taps.ndim == 2
    if per_channel and taps.shape[0] != num_channels:
        raise ValueError(f"per-channel taps {taps.shape} != C={num_channels}")
    t = taps.shape[-1]
    if fft_size % n2 != 0:
        raise ValueError(f"fft_size {fft_size} % n2 {n2} != 0")
    n1 = fft_size // n2
    if not interpret:
        if n2 % LANE != 0:
            raise ValueError(f"n2 must be a multiple of 128, got {n2}")
        if n1 % 8 != 0:
            raise ValueError(f"n1 = {n1} must be a multiple of 8")
    # overlap: >= taps-1, row-aligned, and hop row count a multiple of 8
    ov_rows = _round_up(t - 1, n2) // n2
    while (n1 - ov_rows) % 8 != 0 and ov_rows < n1:
        ov_rows += 1
    hs = n1 - ov_rows
    if hs <= 0:
        raise ValueError(f"taps {t} leave no hop in fft_size {fft_size}")
    overlap = ov_rows * n2
    hop = hs * n2
    # pipelined BlockSpec form needs the overlap operand's row offset
    # ((i+1)*b*hs) to be a whole number of ov_rows blocks for every i
    pipe_ok = (b_frames * hs) % ov_rows == 0
    use_pipe = pipe_ok if pipelined is None else pipelined
    if use_pipe and not pipe_ok:
        raise ValueError(
            f"pipelined form needs ov_rows ({ov_rows}) | b_frames*hs "
            f"({b_frames * hs})")

    w1 = _dft(n1, -1.0)                                   # [k1, n1]
    w2t = _dft(n2, -1.0).T                                # [n2, k2]
    w2c = _dft(n2, +1.0)                                  # [k2, n2]
    # G2[j, k1] = e^{+2*pi*i*k1*(ov_rows+j)/n1} / N  (discard + scale folded)
    jrow = ov_rows + np.arange(hs)
    g2 = np.exp(2j * np.pi * np.outer(jrow, np.arange(n1)) / n1) / fft_size
    # twiddles: fwd tw[k1, n2] = e^{-2*pi*i*k1*n2/N}; inv conjugate
    twf = np.exp(-2j * np.pi * np.outer(np.arange(n1), np.arange(n2))
                 / fft_size)
    # frequency response in [k1, k2] layout: H2[k1, k2] = H[k1 + n1*k2]
    def _h_tiled(h1d):
        h2 = np.fft.fft(h1d, n=fft_size).reshape(n2, n1).T
        return np.stack([np.tile(h2.real, (b_frames, 1)),
                         np.tile(h2.imag, (b_frames, 1))]).astype(np.float32)

    if per_channel:
        h2_t = jnp.asarray(np.stack([_h_tiled(taps[c])
                                     for c in range(num_channels)]))
    else:
        h2_t = jnp.asarray(_h_tiled(taps))[None]    # [Ct, 2, B*n1, n2]

    w1c = jnp.asarray(_lhs_comb(w1))
    if karatsuba:
        # packed [n2, 3*n2] = [Wr | Wi+Wr | Wi-Wr] for the 3-matmul form
        def _kpack(m):
            return np.concatenate(
                [m.real, m.imag + m.real, m.imag - m.real],
                axis=1).astype(np.float32)
        w2tc = jnp.asarray(_kpack(w2t))
        w2cc = jnp.asarray(_kpack(w2c))
    else:
        w2tc = jnp.asarray(_rhs_comb(w2t))
        w2cc = jnp.asarray(_rhs_comb(w2c))
    g2c = jnp.asarray(_lhs_comb(g2))
    twf_t = jnp.asarray(np.stack([np.tile(twf.real, (1, b_frames)),
                                  np.tile(twf.imag, (1, b_frames))]
                                 ).astype(np.float32))    # [2, n1, B*n2]
    # inverse twiddle is the conjugate, row-tiled (frames stacked in rows)
    twi_t = jnp.asarray(np.stack([np.tile(twf.real, (b_frames, 1)),
                                  np.tile(-twf.imag, (b_frames, 1))]
                                 ).astype(np.float32))    # [2, B*n1, n2]

    def fn(x):
        c, two, r, nn2 = x.shape
        if two != 2 or nn2 != n2 or c != num_channels:
            raise ValueError(f"x shape {x.shape} != "
                             f"[{num_channels}, 2, R, {n2}]")
        rows_out = r - ov_rows
        if rows_out % (b_frames * hs) != 0:
            raise ValueError(
                f"output rows {rows_out} not a multiple of {b_frames * hs}")
        grid = (num_channels, rows_out // (b_frames * hs))
        kern = functools.partial(
            _kernel_pipelined if use_pipe else _kernel,
            b=b_frames, n1=n1, n2=n2, hs=hs, ov_rows=ov_rows,
            precision=precision, karatsuba=karatsuba)
        w2_cols = 3 * n2 if karatsuba else 2 * n2
        w2_rows = n2 if karatsuba else 2 * n2
        if use_pipe:
            bh = b_frames * hs
            x_specs = [
                # hop block: rows [i*b*hs, (i+1)*b*hs)
                pl.BlockSpec((1, 2, bh, n2), lambda c, i: (c, 0, i, 0),
                             memory_space=pltpu.VMEM),
                # next block's overlap prefix: ov_rows rows at (i+1)*b*hs
                pl.BlockSpec((1, 2, ov_rows, n2),
                             lambda c, i: (c, 0, (i + 1) * bh // ov_rows, 0),
                             memory_space=pltpu.VMEM),
            ]
            x_args = (x, x)
            scratch = []
        else:
            x_specs = [pl.BlockSpec(memory_space=pl.ANY)]  # x stays in HBM
            x_args = (x,)
            scratch = [
                pltpu.VMEM((2, b_frames * hs + ov_rows, n2), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ]
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=x_specs + [
                pl.BlockSpec((2 * n1, 2 * n1), lambda c, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((w2_rows, w2_cols), lambda c, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((w2_rows, w2_cols), lambda c, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * hs, 2 * n1), lambda c, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, n1, b_frames * n2), lambda c, i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, b_frames * n1, n2), lambda c, i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                # H [Ct, 2, B*n1, n2]: channel step selects its response
                # (index 0 when taps are shared, Ct == 1)
                pl.BlockSpec(
                    (1, 2, b_frames * n1, n2),
                    (lambda c, i: (c, 0, 0, 0)) if per_channel
                    else (lambda c, i: (0, 0, 0, 0)),
                    memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, b_frames * hs, n2), lambda c, i: (c, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b_frames * hs, n2), lambda c, i: (c, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((num_channels, rows_out, n2), jnp.float32),
                jax.ShapeDtypeStruct((num_channels, rows_out, n2), jnp.float32),
            ],
            scratch_shapes=scratch,
            interpret=interpret,
        )(*x_args, w1c, w2tc, w2cc, g2c, twf_t, twi_t, h2_t)

    return FftConvKernel(fn=fn, fft_size=fft_size, hop=hop, overlap=overlap,
                         num_taps=t, n1=n1, n2=n2, b_frames=b_frames,
                         num_channels=num_channels)


class FftConvStream:
    """Streaming driver for the fused OS kernel: manages the carried
    overlap prefix so callers feed raw [C, 2, N] plane chunks (N a multiple
    of kernel.block_in()) and receive filtered planes. Chunked output is
    bit-identical to one-shot (identical frames — see the streaming test).
    """

    def __init__(self, kernel: FftConvKernel):
        self.kernel = kernel
        self.hist = jnp.zeros((kernel.num_channels, 2, kernel.overlap),
                              jnp.float32)

    def process(self, x_chunk: jax.Array) -> tuple[jax.Array, jax.Array]:
        xin = jnp.concatenate([self.hist, x_chunk], axis=-1)
        yr, yi = fftconv_pallas(self.kernel, xin)
        self.hist = xin[..., xin.shape[-1] - self.kernel.overlap:]
        return yr, yi


def fftconv_pallas(kernel: FftConvKernel, x_planes: jax.Array
                   ) -> tuple[jax.Array, jax.Array]:
    """Convenience wrapper. x_planes: [C, 2, overlap + N] f32 (prepend
    `kernel.overlap` history samples — zeros at stream start), N a multiple
    of kernel.block_in(). Returns (yr, yi) [C, N]: the causal FIR output,
    identical semantics to ops.fftconv_planes."""
    c = x_planes.shape[0]
    n = x_planes.shape[-1] - kernel.overlap
    x4 = x_planes.reshape(c, 2, -1, kernel.n2)
    yr, yi = kernel.fn(x4)
    return yr.reshape(c, n), yi.reshape(c, n)
