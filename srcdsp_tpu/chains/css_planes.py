"""CSS demodulation in plane form (the on-chip serving tier of
chains/css.py): the dechirp FOLDED into the DFT matrix — one complex
[S, N] @ [N, N] matmul (4 real MXU passes) straight from raw symbol
frames to spectra — plus a row-wise argmax decision. 2-D elementwise +
matmul + reduce only, i.e. the axon-supported op set.

The fold (the same move as the config-4 complex-taps kernel,
kernels/fsk_ctaps.py): demod is FFT(x * conj(u)), and a diagonal
multiply followed by a DFT is one matrix,

    G = diag(conj(u)) @ W,   X = x @ G     (W = symmetric DFT matrix)

so the serving graph has NO elementwise pre-stage at all. For SF <= 10
(N <= 1024, G <= 8 MB as f32 planes) the direct fold is also FASTER
than the four-step `fft_planes` factorization here: the four-step's
[16, 16] DFT tiles badly underfill the 128x128 MXU, while [S, N] @
[N, N] is native MXU food — measured 951 -> 12%+ of SOL on hardware
(bench/css_onchip.py). Above SF 10 the builder falls back to
dechirp planes + `fft_planes`.

Decisions match `css.css_demod` (same argmax; the fold reassociates
float rounding, which cannot flip a decision except on exact
magnitude ties), verified under noise in tests/unit/test_css_planes.py
and gated chip-vs-CPU in bench/css_onchip.py.

Build-time note: all constants are built host-side in numpy; CssParams
carries numpy chirps precisely so nothing complex lands on the device
(verify-skill round-5 finding).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.chains.css import CssParams
from srcdsp_tpu.ops.fft_planes import make_fft_planes
from srcdsp_tpu.types import F32


def make_css_demod_planes(params: CssParams,
                          precision=jax.lax.Precision.HIGHEST,
                          direct: bool | None = None):
    """Build the batched plane demodulator: (xr, xi) [S, N] raw symbol
    frames -> (shifts [S] i32, peak_mag2 [S] f32).

    direct: fold dechirp+DFT into one [N, N] matmul. None = auto,
    which is PRECISION-AWARE after the measured SF11 A/B: the dense
    fold carries a 16x flop overhead over the band at N = 2048, so it
    only pays when the matmul is cheap — direct for N <= 1024 always,
    and for N = 2048 only at DEFAULT (bf16) precision (measured:
    four-step f32 2.11 Gchips/s, direct f32 1.83, direct bf16 9.17).
    The matrices are baked constants, so the returned function is safe
    to wrap in an outer jit/vmap/shard_map."""
    n = params.n
    if direct is None:
        direct = n <= 1024 or (n <= 2048
                               and precision == jax.lax.Precision.DEFAULT)
    dc = np.asarray(params.downchirp)                   # conj(u), [N]

    if direct:
        k = np.arange(n)
        w = np.exp(-2j * np.pi * np.outer(k, k) / n)    # symmetric DFT
        g = dc[:, None] * w                             # fold dechirp in
        gr = jnp.asarray(g.real.astype(np.float32))
        gi = jnp.asarray(g.imag.astype(np.float32))

        def demod(xr: jax.Array, xi: jax.Array):
            sr = (jnp.dot(xr, gr, precision=precision)
                  - jnp.dot(xi, gi, precision=precision))
            si = (jnp.dot(xr, gi, precision=precision)
                  + jnp.dot(xi, gr, precision=precision))
            mag2 = sr * sr + si * si                    # [S, N]
            kk = jnp.argmax(mag2, axis=-1)
            return (kk.astype(jnp.int32),
                    jnp.max(mag2, axis=-1).astype(F32))

        return demod

    fft = make_fft_planes(n, precision=precision)
    # [1, N] (not [N]): 1-D operands are the axon backend's weak spot
    dr = jnp.asarray(dc.real.astype(np.float32)[None, :])
    di = jnp.asarray(dc.imag.astype(np.float32)[None, :])

    def demod(xr: jax.Array, xi: jax.Array):
        yr = xr * dr - xi * di
        yi = xr * di + xi * dr
        sr, si = fft(yr, yi)
        mag2 = sr * sr + si * si                        # [S, N]
        kk = jnp.argmax(mag2, axis=-1)
        return kk.astype(jnp.int32), jnp.max(mag2, axis=-1).astype(F32)

    return demod



def make_css_llr_planes(params: CssParams,
                        precision=jax.lax.Precision.HIGHEST):
    """On-chip SOFT output tier: (xr, xi) [S, N] raw symbol frames ->
    per-Gray-bit LLRs [S, sf] (positive = bit 0), the plane twin of
    `css.css_soft_llrs` — folded dechirp-DFT matmul, |S| magnitudes,
    then one masked max pair per bit (where + reduce, axon-safe).

    Bit b's bin partition is baked as a [1, N] mask from gray(k); the
    max-log LLR is max_{bit=0}|S_k| - max_{bit=1}|S_k|. Matches the
    complex tier up to matmul rounding (gated at equal decoded frames
    in tests and the bench)."""
    from srcdsp_tpu.chains.css import gray_decode_shift

    n, sf = params.n, params.sf
    dc = np.asarray(params.downchirp)
    k = np.arange(n)
    w = np.exp(-2j * np.pi * np.outer(k, k) / n)
    g = dc[:, None] * w
    gr = jnp.asarray(g.real.astype(np.float32))
    gi = jnp.asarray(g.imag.astype(np.float32))
    words = gray_decode_shift(np.arange(n))
    masks0 = np.stack([((words >> (sf - 1 - b)) & 1) == 0
                       for b in range(sf)])           # [sf, N] bit==0
    m0 = jnp.asarray(masks0[:, None, :])              # [sf, 1, N]

    def llrs(xr: jax.Array, xi: jax.Array):
        sr = (jnp.dot(xr, gr, precision=precision)
              - jnp.dot(xi, gi, precision=precision))
        si = (jnp.dot(xr, gi, precision=precision)
              + jnp.dot(xi, gr, precision=precision))
        mag = jnp.sqrt(sr * sr + si * si)[None, :, :]  # [1, S, N]
        neg = F32(-1e30)
        hi0 = jnp.max(jnp.where(m0, mag, neg), axis=-1)   # [sf, S]
        hi1 = jnp.max(jnp.where(m0, neg, mag), axis=-1)
        return (hi0 - hi1).T                           # [S, sf]

    return llrs
