"""Plane-form fused mix+FIR+decimate: the on-chip fast path (SURVEY.md C2–C4).

The reference runs mix, filter, and decimate as three per-sample C++ loops
over the same data (SURVEY.md §3.1a); at TPU memory-bound rates each extra
pass over HBM halves throughput, so the fused op reads each input sample
once (BASELINE.json: "fused mix+filter+decimate").

This module is the *XLA* expression of that op, written against the subset
of ops the TPU backend natively handles on 2-D f32 data — no complex dtype,
no convolution primitive, no gather, everything 2-D:

- complex I/Q is carried as two float32 planes;
- the NCO phase is u32 modular arithmetic on a 2-D iota (bit-exact with
  ops.nco across any block split);
- the decimating FIR is evaluated in the phase-transposed layout
  A[p, j] = u[j*M + p] ([M, cols] after one 2-D reshape+transpose), where

      y[k] = sum_p sum_s h[s*M - p] * A[p, k + Hm - s]

  i.e. S ~= T/M + 1 shifted multiply-accumulates of [M, K] tiles — all
  2-D elementwise ops on contiguous slices, finished by one column reduce.

Semantics are identical to nco_apply + fir_apply(decim) from zero state,
with history carried explicitly as the leading H samples of the input
(H = plane_hist_len(T, M), a multiple of M). The Pallas kernel in
srcdsp_tpu.kernels fuses the same math into one VMEM pass.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.ops.nco import TWO_PI, _INV_SCALE
from srcdsp_tpu.types import F32

U32 = jnp.uint32


def plane_hist_shifts(num_taps: int, decim: int) -> int:
    """Number of shifted MACs S: coefficients h[s*M - p] exist for s < S."""
    return (num_taps - 1 + (decim - 1)) // decim + 1


def plane_hist_len(num_taps: int, decim: int) -> int:
    """History samples H = (S-1)*M carried ahead of each block (mult. of M)."""
    return (plane_hist_shifts(num_taps, decim) - 1) * decim


def phase_coef_matrix(taps, decim: int) -> np.ndarray:
    """coef[p, s] = h[s*M - p] (0 outside range): host-side, once per chain."""
    h = np.asarray(taps, np.float32)
    t = h.shape[0]
    s_max = plane_hist_shifts(t, decim)
    coef = np.zeros((decim, s_max), np.float32)
    for p in range(decim):
        for s in range(s_max):
            a = s * decim - p
            if 0 <= a < t:
                coef[p, s] = h[a]
    return coef


def planes_from_int16(iq: jax.Array, scale: float = 32767.0
                      ) -> tuple[jax.Array, jax.Array]:
    """Device-side wire-format ingestion: interleaved int16 IQ [..., 2N]
    -> f32 planes ([..., N], [..., N]).

    Runs on the restricted on-chip op set (2-D reshape + int16->f32 cast +
    divide), so captures can ship to the chip in half the bytes and convert
    there. Same y = x/scale semantics as types.int16_to_complex64.
    """
    if iq.shape[-1] % 2:
        raise ValueError(f"interleaved IQ length must be even, got {iq.shape}")
    half = iq.shape[-1] // 2
    de = iq.reshape(*iq.shape[:-1], half, 2)
    xr = de[..., 0].astype(F32) / F32(scale)
    xi = de[..., 1].astype(F32) / F32(scale)
    return xr, xi


def planes_to_int16(xr: jax.Array, xi: jax.Array, scale: float = 32767.0
                    ) -> jax.Array:
    """Device-side capture write path: f32 planes -> interleaved int16 IQ.

    Saturating round-half-even, same bits as types.complex64_to_int16.
    xr/xi: [..., N] -> [..., 2N] int16.
    """
    i = jnp.clip(jnp.round(xr * F32(scale)), -32768, 32767)
    q = jnp.clip(jnp.round(xi * F32(scale)), -32768, 32767)
    out = jnp.stack([i, q], axis=-1).astype(jnp.int16)
    return out.reshape(*out.shape[:-2], -1)


def nco_planes(word0, dword, n: int, row_offset=0) -> tuple[jax.Array, jax.Array]:
    """cos/sin planes [1, n] of the NCO phasor, u32 phase accumulator.

    word0/dword: uint32 scalars (arrays OK). Bit-exact with ops.nco.nco_phasor
    phase math; row_offset shifts the sample index (for chunked calls).
    """
    k = jax.lax.broadcasted_iota(U32, (1, n), 1) + U32(row_offset)
    ph = (jnp.asarray(word0, U32) + k * jnp.asarray(dword, U32)).astype(F32)
    ang = ph * F32(TWO_PI * _INV_SCALE)
    return jnp.cos(ang), jnp.sin(ang)


def mix_planes(xr, xi, c, s):
    """(xr + j xi) * (c + j s) in planes."""
    return xr * c - xi * s, xr * s + xi * c


def fir_decim_planes(coef: jax.Array, xr: jax.Array, xi: jax.Array,
                     decim: int) -> tuple[jax.Array, jax.Array]:
    """Decimating FIR on history-prepended planes.

    coef: [M, S] from phase_coef_matrix. xr/xi: [1, H + N] with
    H = (S-1)*M history samples (zeros at stream start), N % M == 0.
    Returns planes [1, N // M].
    """
    m, s_max = coef.shape
    hm = s_max - 1
    cols = xr.shape[-1] // m
    k = cols - hm

    def one(x):
        a = x.reshape(cols, m).T                      # [M, Hm + K]
        acc = jnp.zeros((m, k), F32)
        for s in range(s_max):
            acc = acc + coef[:, s:s + 1] * a[:, hm - s: hm - s + k]
        return jnp.sum(acc, axis=0, keepdims=True)    # [1, K]

    return one(xr), one(xi)


def fused_mix_fir_decim_planes(coef: jax.Array, word0, dword,
                               xr: jax.Array, xi: jax.Array, decim: int,
                               row_offset=0) -> tuple[jax.Array, jax.Array]:
    """NCO mix then decimating FIR, one pass. xr/xi: [1, H+N] planes.

    The history region is mixed too, so `row_offset` indexes the FIRST
    history sample; pass the global sample index of that sample (streaming
    callers advance it by N per block). Output: planes [1, N // M].
    """
    n_tot = xr.shape[-1]
    c, s = nco_planes(word0, dword, n_tot, row_offset)
    mr, mi = mix_planes(xr, xi, c, s)
    return fir_decim_planes(coef, mr, mi, decim)
