"""Standalone batched FFT as one Pallas kernel (SURVEY.md C6; the
BASELINE.json "FFT GFLOP/s" metric's hot path).

The XLA plane FFT (ops.fft_planes) round-trips both four-step stages and
the twiddle through HBM and runs its matmuls 6-pass f32 — it measured
~59 GFLOP/s (5NlogN). This kernel does the whole transform in VMEM:

    HBM frame block (auto double-buffered by the Pallas grid pipeline)
    -> stage 1 [2n1, 2n1] combined-complex matmul (contract n1)
    -> forward twiddle (VPU)
    -> stage 2 as the 3-matmul Gauss/karatsuba form (contract n2):
       every dim a lane-tile multiple, so 3 MXU tile passes vs the
       combined form's 4

and emits the spectrum in the four-step's native layout: for each frame,
rows k1, lanes k2, value X[k1 + n1*k2] (the standard transposed-digit
order of Bailey FFTs). `natural_order=True` appends the [B, n1, n2] ->
[B, n2, n1] XLA transpose that callers need for index-linear spectra —
it runs on the restricted on-chip op set (3-D swapaxes works on axon).

Unlike the fused overlap-save kernel (kernels.fftconv_pallas) there is no
frame overlap, so the input needs NO manual slab DMA: BlockSpec index maps
give hardware double-buffering for free.

Math identical to ops.fft_planes (same factorization, same constants);
equivalence is tested in tests/unit/test_fft_kernel.py. The inverse
transform reuses the same kernel via conj/scale in the plane wrapper.
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


def _dft(n: int, sign: float) -> np.ndarray:
    k = np.arange(n)
    return np.exp(sign * 2j * np.pi * np.outer(k, k) / n)


def _lhs_comb(m: np.ndarray) -> np.ndarray:
    """[[Mr, -Mi], [Mi, Mr]]: out_stacked_rows = comb @ in_stacked_rows."""
    return np.block([[m.real, -m.imag], [m.imag, m.real]]).astype(np.float32)


def _kpack(m: np.ndarray) -> np.ndarray:
    """[n, 3n] = [Mr | Mi+Mr | Mi-Mr] for the rhs 3-matmul complex form."""
    return np.concatenate([m.real, m.imag + m.real, m.imag - m.real],
                          axis=1).astype(np.float32)


def _kernel(xr_ref, xi_ref, w1c_ref, w2k_ref, twf_ref, yr_ref, yi_ref, *,
            b: int, n1: int, n2: int, precision, natural: bool = False):
    def mm(a, bb):
        return jnp.dot(a, bb, preferred_element_type=F32, precision=precision)

    # frame f = rows [f*n1, (f+1)*n1) of the block; stack planes in rows,
    # frames in lanes: X_st [2*n1, B*n2]. The planes arrive as two separate
    # refs (a host-side jnp.stack would cost an extra HBM pass — profiled
    # at 0.31 ms for 16M samples).
    x_st = jnp.concatenate(
        [jnp.concatenate([xr_ref[bb * n1:(bb + 1) * n1, :]
                          for bb in range(b)], axis=1),
         jnp.concatenate([xi_ref[bb * n1:(bb + 1) * n1, :]
                          for bb in range(b)], axis=1)], axis=0)

    # stage 1 (contract n1): S[k1, n2] per frame
    s_st = mm(w1c_ref[:, :], x_st)
    sr, si = s_st[:n1, :], s_st[n1:, :]

    # forward twiddle tw[k1, n2] (lane-tiled per frame)
    twr, twi = twf_ref[0], twf_ref[1]
    tr = sr * twr - si * twi
    ti = sr * twi + si * twr

    # restack frames to rows, one plane per matrix: [B*n1, n2]
    yr_l = jnp.concatenate([tr[:, bb * n2:(bb + 1) * n2]
                            for bb in range(b)], axis=0)
    yi_l = jnp.concatenate([ti[:, bb * n2:(bb + 1) * n2]
                            for bb in range(b)], axis=0)

    # stage 2 (contract n2), 3-matmul form: X[k1, k2] = T[k1, :] @ W2^T
    t1 = mm(yr_l + yi_l, w2k_ref[:, :n2])
    t2 = mm(yi_l, w2k_ref[:, n2:2 * n2])
    t3 = mm(yr_l, w2k_ref[:, 2 * n2:])
    xr_out = t1 - t2
    xi_out = t1 + t3
    if not natural:
        yr_ref[:, :] = xr_out
        yi_ref[:, :] = xi_out
        return
    # in-kernel unscramble: each frame's [n1, n2] digit tile flattens to
    # one natural-order row (lane k = n1*k2 + k1 <=> transpose + reshape)
    rows_r, rows_i = [], []
    for bb in range(b):
        fr = xr_out[bb * n1:(bb + 1) * n1, :]
        fi = xi_out[bb * n1:(bb + 1) * n1, :]
        rows_r.append(fr.T.reshape(1, n1 * n2))
        rows_i.append(fi.T.reshape(1, n1 * n2))
    yr_ref[:, :] = jnp.concatenate(rows_r, axis=0)
    yi_ref[:, :] = jnp.concatenate(rows_i, axis=0)


@dataclasses.dataclass(frozen=True)
class FftKernel:
    """Compiled batched FFT + its shape contract.

    `fn`/`fn_rows` close over the twiddle/DFT-matrix constants — fine for
    composition inside a larger jitted program that threads them itself,
    but when wrapped DIRECTLY in jax.jit the captured arrays become jit
    constants, and the tunnel-attached backend re-ships jit constants on
    EVERY call (~26 ms per 4.7 MB measured on the LDPC kernel; here
    ~0.55 MB of twiddles). Serving code should jit `fn_p` and pass
    `consts` as an argument instead:  f = jax.jit(k.fn_p);
    f(k.consts, xr, xi).
    """

    fn: Callable          # (xr, xi) [B, N] -> (Xr, Xi) [B, N]
    fn_rows: Callable     # pre-shaped planes [B*n1, n2] -> [B*n1, n2]
    fn_p: Callable        # (consts, xr, xi) — args-form for serving jits
    fn_rows_p: Callable   # (consts, xr, xi) pre-shaped args-form
    consts: tuple         # (w1c, w2k, twf_t) device arrays
    fft_size: int
    n1: int
    n2: int
    b_frames: int         # B must be a multiple of this
    natural_order: bool


def make_fft_kernel(fft_size: int = 4096, n2: int = LANE, b_frames: int = 16,
                    precision=jax.lax.Precision.HIGHEST,
                    natural_order: bool = True,
                    interpret: bool = False) -> FftKernel:
    """Build a batched Pallas FFT: (xr, xi) [B, N] -> (Xr, Xi) [B, N].

    Requirements: fft_size % n2 == 0, n2 % 128 == 0, n1 = fft_size/n2 a
    multiple of 8, batch B a multiple of b_frames. natural_order=False
    skips the final XLA unscramble and returns the four-step layout
    (frame-major rows of X[k1 + n1*k2] at [k1, k2]) — the transform-only
    rate, and the layout the fused OS-conv kernel consumes internally.
    natural_order="kernel" performs the unscramble INSIDE the kernel
    (per-frame transpose+flatten in VMEM, emitting [B, N] rows directly)
    instead of the XLA transpose pass over HBM. HARDWARE-BLOCKED negative
    result (2026-08-17): the per-frame transpose passes Mosaic layout
    inference but the [n2, n1] -> [1, N] flatten is an unsupported
    sublane-to-lane shape cast ("infer-vector-layout: unsupported shape
    cast"); kept interpret-mode-only for documentation. The relayout is
    not avoidable by refactoring the math: with row-major [s1, s2] input
    tiles (the free HBM view) the four-step's clean cross-term
    cancellation forces the transposed-digit output k = k1 + n1*k2, and
    the dual factorization that yields natural output needs column-major
    input — transpose parity is conserved through the two matmul stages,
    so exactly one physical relayout must happen on one side. The XLA
    unscramble (transpose + lane-collapse reshape) is that relayout.
    """
    n1 = fft_size // n2
    if n1 * n2 != fft_size:
        raise ValueError(f"fft_size {fft_size} % n2 {n2} != 0")
    if not interpret:
        if n2 % LANE != 0:
            raise ValueError(f"n2 must be a multiple of 128, got {n2}")
        if n1 % 8 != 0:
            raise ValueError(f"n1 = {n1} must be a multiple of 8")

    w1c = jnp.asarray(_lhs_comb(_dft(n1, -1.0)))
    w2k = jnp.asarray(_kpack(_dft(n2, -1.0).T))           # [n2, 3n2]
    twf = np.exp(-2j * np.pi * np.outer(np.arange(n1), np.arange(n2))
                 / fft_size)
    twf_t = jnp.asarray(np.stack([np.tile(twf.real, (1, b_frames)),
                                  np.tile(twf.imag, (1, b_frames))]
                                 ).astype(np.float32))    # [2, n1, B*n2]

    kern = functools.partial(_kernel, b=b_frames, n1=n1, n2=n2,
                             precision=precision)
    consts = (w1c, w2k, twf_t)

    def fn_rows_p(consts, xr: jax.Array, xi: jax.Array
                  ) -> tuple[jax.Array, jax.Array]:
        """Pre-shaped form: planes [B*n1, n2] in / [B*n1, n2] out (frame f =
        rows [f*n1, (f+1)*n1), sample s of a frame at [s // n2, s % n2]).
        Streaming pipelines that already hold plane slabs in this layout
        (the fftconv convention) skip the [B, N] relayout reshape — worth
        ~0.2 ms per 16M samples of XLA tile-relayout on hardware."""
        w1c, w2k, twf_t = consts
        rt, nn2 = xr.shape
        if nn2 != n2 or rt % (b_frames * n1) != 0:
            raise ValueError(f"x [{rt}, {nn2}] needs n2={n2}, "
                             f"rows % {b_frames * n1} == 0")
        return pl.pallas_call(
            kern,
            grid=(rt // (b_frames * n1),),
            in_specs=[
                pl.BlockSpec((b_frames * n1, n2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_frames * n1, n2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * n1, 2 * n1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n2, 3 * n2), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, n1, b_frames * n2), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((b_frames * n1, n2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_frames * n1, n2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((rt, n2), jnp.float32),
                jax.ShapeDtypeStruct((rt, n2), jnp.float32),
            ],
            interpret=interpret,
        )(xr, xi, w1c, w2k, twf_t)

    def fn_rows(xr, xi):
        return fn_rows_p(consts, xr, xi)

    kern_nat = functools.partial(_kernel, b=b_frames, n1=n1, n2=n2,
                                 precision=precision, natural=True)

    def fn_nat(consts, xr2: jax.Array, xi2: jax.Array
               ) -> tuple[jax.Array, jax.Array]:
        """In-kernel unscramble: [B*n1, n2] planes in -> [B, N] natural."""
        w1c, w2k, twf_t = consts
        rt = xr2.shape[0]
        bt = rt // n1
        return pl.pallas_call(
            kern_nat,
            grid=(bt // b_frames,),
            in_specs=[
                pl.BlockSpec((b_frames * n1, n2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_frames * n1, n2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * n1, 2 * n1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n2, 3 * n2), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, n1, b_frames * n2), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((b_frames, fft_size), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_frames, fft_size), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bt, fft_size), jnp.float32),
                jax.ShapeDtypeStruct((bt, fft_size), jnp.float32),
            ],
            interpret=interpret,
        )(xr2, xi2, w1c, w2k, twf_t)

    def fn_p(consts, xr: jax.Array, xi: jax.Array
             ) -> tuple[jax.Array, jax.Array]:
        bt, nn = xr.shape
        if nn != fft_size or bt % b_frames != 0:
            raise ValueError(f"x [{bt}, {nn}] needs N={fft_size}, "
                             f"B % {b_frames} == 0")
        if natural_order == "kernel":
            return fn_nat(consts, xr.reshape(bt * n1, n2),
                          xi.reshape(bt * n1, n2))
        yr, yi = fn_rows_p(consts, xr.reshape(bt * n1, n2),
                           xi.reshape(bt * n1, n2))
        if natural_order:
            # [bt, k1, k2] -> [bt, k2, k1]: flat index n1*k2 + k1 = k
            yr = yr.reshape(bt, n1, n2).swapaxes(-1, -2).reshape(bt, nn)
            yi = yi.reshape(bt, n1, n2).swapaxes(-1, -2).reshape(bt, nn)
        return yr, yi

    def fn(xr, xi):
        return fn_p(consts, xr, xi)

    return FftKernel(fn=fn, fn_rows=fn_rows, fn_p=fn_p,
                     fn_rows_p=fn_rows_p, consts=consts,
                     fft_size=fft_size, n1=n1, n2=n2,
                     b_frames=b_frames, natural_order=natural_order)


def ifft_pallas(kernel: FftKernel, xr: jax.Array, xi: jax.Array
                ) -> tuple[jax.Array, jax.Array]:
    """Inverse transform via conj/forward/conj + 1/N (plane ops only, so it
    runs everywhere the forward kernel does). kernel must be natural_order
    for the round-trip identity."""
    yr, yi = kernel.fn(xr, -xi)
    s = 1.0 / kernel.fft_size
    return yr * s, -(yi * s)
