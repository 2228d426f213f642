"""MXU-mapped FFT: the four-step (Bailey) factorization in plane form
(SURVEY.md C6 tier 2; BASELINE north_star "transform butterflies" on MXU).

A length-N FFT with N = N1*N2 factors into:

    X[k1 + N1*k2] = sum_{n2} W_N2[k2, n2] * T[n2, k1] ,
    T[n2, k1]     = tw[n2, k1] * sum_{n1} W_N1[k1, n1] * x[n1*N2 + n2] ,
    tw[n2, k1]    = exp(-2*pi*i*n2*k1/N)

i.e. two batched DFT *matmuls* (the MXU's native food) plus one elementwise
twiddle — no butterflies, no bit-reversal, no gather. For N = 4096 both
factors are 64: a [64, 64] DFT matrix against [64, 64] data tiles, batched
over frames x channels. Complex arithmetic is expanded over f32 planes
(3-matmul Karatsuba-free form: 4 real matmuls per DFT stage), so the whole
transform runs on the restricted on-chip op set (matmul + elementwise +
2-D reshape/transpose).

Accuracy: ~1e-6 relative to numpy (float32 matmul DFT against roots of
unity), verified against the C++ oracle FFT in tests.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.types import F32


def _dft_planes(n: int) -> tuple[np.ndarray, np.ndarray]:
    """DFT matrix W[k, j] = exp(-2*pi*i*k*j/n) as (real, imag) f32."""
    k = np.arange(n)
    w = np.exp(-2j * np.pi * np.outer(k, k) / n)
    return w.real.astype(np.float32), w.imag.astype(np.float32)


def _twiddle_planes(n1: int, n2: int) -> tuple[np.ndarray, np.ndarray]:
    """tw[n2, k1] = exp(-2*pi*i*n2*k1/(n1*n2)) as (real, imag) f32."""
    t = np.exp(-2j * np.pi * np.outer(np.arange(n2), np.arange(n1)) / (n1 * n2))
    return t.real.astype(np.float32), t.imag.astype(np.float32)


def make_fft_planes(n: int, n1: int | None = None,
                    precision=jax.lax.Precision.HIGHEST):
    """Build a batched FFT: (xr, xi) [B, N] -> (Xr, Xi) [B, N].

    n must factor as n1*n2 (default: closest-to-square powers of two).
    Returns a jit-able pure function; all matrices are baked constants.
    precision=HIGHEST forces full-f32 MXU passes (the TPU default silently
    runs bf16, ~3e-3 relative error); pass DEFAULT to trade accuracy for
    ~3x matmul throughput when bf16 noise is acceptable.
    """
    if n1 is None:
        n1 = 1 << ((n.bit_length() - 1) // 2)
        if n1 * n1 != n and n % n1 != 0:
            raise ValueError(f"cannot auto-factor {n}")
    n2 = n // n1
    if n1 * n2 != n:
        raise ValueError(f"{n} != {n1} * {n2}")
    w1r, w1i = map(jnp.asarray, _dft_planes(n1))
    w2r, w2i = map(jnp.asarray, _dft_planes(n2))
    twr, twi = map(jnp.asarray, _twiddle_planes(n1, n2))

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=F32, precision=precision)

    def cmatmul(ar, ai, br, bi):
        """(ar + i*ai) @ (br + i*bi) in planes."""
        rr = mm(ar, br) - mm(ai, bi)
        ri = mm(ar, bi) + mm(ai, br)
        return rr, ri

    def fft(xr: jax.Array, xi: jax.Array) -> tuple[jax.Array, jax.Array]:
        b = xr.shape[0]
        # x[n1*N2 + n2] -> tiles [B*N1, N2]; stage 1 contracts n1:
        #   S[k1, n2] = sum_n1 W1[k1, n1] x[n1, n2]
        xr2 = xr.reshape(b * n1, n2)
        xi2 = xi.reshape(b * n1, n2)
        # batch-wise contraction over n1 needs x as [B, n1, n2]; with 2-D
        # ops only, transpose tiles so n1 is the contracted matmul dim:
        # [B*n1, n2] -> [n2, B*n1] is wrong batch layout; instead reshape to
        # put n1 last: x[b, n1, n2] = xr2[b*n1 + n1_, n2]. Use the identity
        # sum_n1 W1[k1, n1] x[b, n1, n2] == (X_b)^T W1^T per batch; realize
        # it as one big matmul by moving n2 into the row dim:
        #   A[b*n2 + n2_, n1] = x[b, n1, n2_]
        ar = xr.reshape(b, n1, n2).swapaxes(-1, -2).reshape(b * n2, n1)
        ai = xi.reshape(b, n1, n2).swapaxes(-1, -2).reshape(b * n2, n1)
        sr, si = cmatmul(ar, ai, w1r.T, w1i.T)         # [B*n2, n1] (k1 cols)
        # twiddle: tw[n2, k1] broadcast over batch
        twr_b = jnp.tile(twr, (b, 1))
        twi_b = jnp.tile(twi, (b, 1))
        tr = sr * twr_b - si * twi_b
        ti = sr * twi_b + si * twr_b
        # stage 2 contracts n2: X[k1 + n1*k2] = sum_n2 W2[k2, n2] T[n2, k1]
        #   B-rows: T as [B, n2, k1] -> [b*n1? ] arrange k1 into rows:
        br_ = tr.reshape(b, n2, n1).swapaxes(-1, -2).reshape(b * n1, n2)
        bi_ = ti.reshape(b, n2, n1).swapaxes(-1, -2).reshape(b * n1, n2)
        yr, yi = cmatmul(br_, bi_, w2r.T, w2i.T)       # [B*n1, n2] (k2 cols)
        # output index k1 + n1*k2: rows are (b, k1), cols k2 -> [B, k1, k2]
        # -> transpose to [B, k2, k1] -> flat gives n1*k2 + k1 ✓
        outr = yr.reshape(b, n1, n2).swapaxes(-1, -2).reshape(b, n)
        outi = yi.reshape(b, n1, n2).swapaxes(-1, -2).reshape(b, n)
        return outr, outi

    return fft


def fft_planes_flops(batch: int, n: int, n1: int | None = None) -> int:
    """Real-FLOP count of the plane FFT (for GFLOP/s metrics): 4 real
    matmuls of [.., k] per stage * 2 FLOP/MAC + twiddle elementwise."""
    if n1 is None:
        n1 = 1 << ((n.bit_length() - 1) // 2)
    n2 = n // n1
    stage1 = batch * n2 * n1 * n1 * 8      # 4 matmuls, 2 FLOP each MAC
    stage2 = batch * n1 * n2 * n2 * 8
    tw = batch * n * 6
    return stage1 + stage2 + tw
