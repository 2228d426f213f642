"""On-chip OFDM receive path (plane form of chains/ofdm.py's demod —
the serving tier for the OFDM waveform family).

The complex-tier receiver (`ofdm_demod`) is jnp.fft-bound and
complex64-typed, neither of which exists on the restricted TPU backend.
The plane form maps every stage to the supported op set:

- CP removal: one reshape + static slice (gather-free);
- FFT restricted to the ACTIVE bins: the DFT matrix columns for unused
  bins are simply dropped at build time, so the transform is ONE
  [S, nfft] x [nfft, n_active] matmul pair — smaller than any
  full-FFT-then-select form, and the bin selection costs nothing;
- one-tap EQ: the pilot symbol's channel estimate inverted with plane
  arithmetic (multiply-by-conjugate-over-power — same math as
  `ofdm_demod`'s h = f0/p, soft = f/h chain up to f32 rounding);
- decision-directed common-phase tracking WITHOUT any table lookup:
  the arithmetic Gray slicer's per-axis level index ki directly gives
  the nearest constellation point's coordinate (2*ki - (l-1))*scale,
  so s_hat needs no gather — the per-symbol LS complex gain is two
  masked reductions;
- final Gray indices from integer ops (xor/shift — supported).

Decisions match the complex tier on clean-through-noisy fixtures
(tested); the on-chip probe gates chip decisions == CPU on the same
graph (`bench/ofdm_onchip.py`).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.chains.ofdm import OfdmSpec, sym_len
from srcdsp_tpu.chains.qam import qam_slice_planes
from srcdsp_tpu.types import F32

I32 = jnp.int32

__all__ = ["make_ofdm_rx_planes"]


def make_ofdm_rx_planes(spec: OfdmSpec,
                        precision=jax.lax.Precision.HIGHEST,
                        n_pilot: int = 1):
    """Build the plane-form receiver for a fixed spec.

    Returns fn(yr, yi, pr, pi) with yr/yi [C, K] aligned sample planes
    (first n_pilot symbols = the known pilot, repeated;
    K % (nfft+cp) == 0) and pr/pi [n_active] the pilot's tx
    constellation planes -> (idx [C, S, n_active] i32, (zr, zi)
    equalized+derotated soft planes), S = K/(nfft+cp) - n_pilot data
    symbols. n_pilot > 1 averages the per-bin LS estimates — estimate
    noise drops 10*log10(n_pilot) dB, worth ~3 dB of design SNR at
    n_pilot=2 vs the single-shot estimate (the modem bench's finding).
    """
    nfft, cp = spec.nfft, spec.cp
    act = np.asarray(spec.active)
    na = act.size
    ll = sym_len(spec)
    # DFT restricted to the active bins, pre-scaled by 1/sqrt(nfft)
    w = np.exp(-2j * np.pi * np.outer(np.arange(nfft), act) / nfft)
    w = (w / np.sqrt(nfft)).astype(np.complex64)
    wr = jnp.asarray(w.real.copy())
    wi = jnp.asarray(w.imag.copy())
    eps = F32(1e-12)

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=F32,
                       precision=precision)

    def fn(yr, yi, pr, pi):
        c, k = yr.shape
        s_tot = k // ll
        tr = yr[:, : s_tot * ll].reshape(c * s_tot, ll)[:, cp:]
        ti = yi[:, : s_tot * ll].reshape(c * s_tot, ll)[:, cp:]
        fr = (mm(tr, wr) - mm(ti, wi)).reshape(c, s_tot, na)
        fi = (mm(tr, wi) + mm(ti, wr)).reshape(c, s_tot, na)

        # one-tap EQ from the pilot symbol(s): h = mean(f0)/p,
        # soft = f/h (pilot repeats, so averaging BEFORE the division
        # is the exact LS estimate over n_pilot observations)
        f0r = jnp.mean(fr[:, :n_pilot], axis=1, keepdims=True)
        f0i = jnp.mean(fi[:, :n_pilot], axis=1, keepdims=True)
        pd = pr * pr + pi * pi + eps
        hr = (f0r * pr + f0i * pi) / pd
        hi = (f0i * pr - f0r * pi) / pd
        hd = hr * hr + hi * hi + eps
        dr, di = fr[:, n_pilot:], fi[:, n_pilot:]
        sr = (dr * hr + di * hi) / hd
        si = (di * hr - dr * hi) / hd

        # nearest point per axis via the shared plane slicer (the level
        # index IS the point coordinate — no table, no gather)
        _, (shr, shi) = qam_slice_planes(sr, si, spec.order)

        # per-symbol DD common phase: g = sum(soft * conj(s_hat)) / sum|s_hat|^2
        num_r = jnp.sum(sr * shr + si * shi, axis=-1, keepdims=True)
        num_i = jnp.sum(si * shr - sr * shi, axis=-1, keepdims=True)
        den = jnp.sum(shr * shr + shi * shi, axis=-1, keepdims=True) + eps
        gr = num_r / den
        gi = num_i / den
        ga = jnp.sqrt(gr * gr + gi * gi) + eps
        zr = (sr * gr + si * gi) / ga
        zi = (si * gr - sr * gi) / ga

        idx, _ = qam_slice_planes(zr, zi, spec.order)
        return idx, (zr, zi)

    return fn
