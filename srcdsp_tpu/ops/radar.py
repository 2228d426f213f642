"""Pulse-Doppler radar processing (beyond parity — composes the LFM
chirp fixture (testing.signals.chirp), matched filtering (C2/C6), and
the CFAR machinery (X23) into the standard radar data cube pipeline).

    pulses [P, N] -> pulse_compress (batched matched filter)
                  -> range_doppler (windowed DFT across pulses)
                  -> |.|^2 -> cfar_2d (integral-image CA-CFAR)
                  -> detections

Everything is one batched tensor op per stage: the matched filter is a
single FFT-domain multiply over all pulses, the Doppler transform is
one FFT over the pulse axis, and the 2-D CFAR training-ring means come
from an INTEGRAL IMAGE (two cumsums) — four corner lookups per cell
via static slices of the padded table, no windows, no gathers. Analysis
tier (host/standard backend, like ops.spectrum / chains.blindscan).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.types import F32

__all__ = ["pulse_compress", "range_doppler", "cfar_alpha_2d", "cfar_2d",
           "detections"]


def pulse_compress(pulses: jax.Array, ref: jax.Array) -> jax.Array:
    """[P, N] complex fast-time pulses x [L] reference waveform ->
    [P, N] matched-filter output (peak at the target's delay bin;
    circular — pad the slow-time records if range wrap matters)."""
    p, n = pulses.shape
    h = jnp.conj(jnp.asarray(ref))[::-1]
    hf = jnp.fft.fft(jnp.concatenate(
        [h, jnp.zeros((n - h.shape[0],), h.dtype)]))
    y = jnp.fft.ifft(jnp.fft.fft(pulses, axis=-1) * hf[None, :], axis=-1)
    # time-align so the peak lands at the target delay (remove the
    # L-1 filter delay, circularly)
    return jnp.roll(y, -(h.shape[0] - 1), axis=-1)


def range_doppler(pulses: jax.Array, ref: jax.Array,
                  window: str = "hann") -> jax.Array:
    """[P, N] pulses -> [P, N] range-Doppler map (complex): matched
    filter in fast time, windowed DFT in slow time, fftshifted so
    Doppler bin P//2 is zero velocity."""
    mf = pulse_compress(pulses, ref)
    p = mf.shape[0]
    if window == "hann":
        w = jnp.asarray(np.hanning(p).astype(np.float32))
    elif window is None or window == "rect":
        w = jnp.ones((p,), F32)
    else:
        raise ValueError(f"unknown window {window!r}")
    return jnp.fft.fftshift(
        jnp.fft.fft(mf * w[:, None].astype(mf.dtype), axis=0), axes=0)


def cfar_alpha_2d(num_train: int, pfa: float) -> float:
    """CA-CFAR threshold multiplier for a 2-D ring of `num_train`
    training cells (same exponential-noise closed form as the 1-D
    ops.cfar.cfar_alpha)."""
    return float(num_train * (pfa ** (-1.0 / num_train) - 1.0))


def _integral(power: jax.Array) -> jax.Array:
    """[D, R] -> [(D+1), (R+1)] integral image (zero row/col 0)."""
    s = jnp.cumsum(jnp.cumsum(power, axis=0), axis=1)
    s = jnp.concatenate([jnp.zeros((1, s.shape[1]), s.dtype), s], axis=0)
    return jnp.concatenate([jnp.zeros((s.shape[0], 1), s.dtype), s],
                           axis=1)


def _box_sum(ii: jax.Array, half: int, d: int, r: int) -> jax.Array:
    """Sum of the (2*half+1)^2 box around every cell, from the integral
    image of the EDGE-PADDED map (caller pads by `half` on each side):
    four static slices, exact."""
    k = 2 * half + 1
    return (ii[k:, k:] - ii[:-k, k:] - ii[k:, :-k]
            + ii[:-k, :-k])[:d, :r]


def cfar_2d(power: jax.Array, guard: int = 1, train: int = 4,
            pfa: float = 1e-4) -> tuple[jax.Array, jax.Array]:
    """2-D CA-CFAR over a [D, R] power map. Returns (mask bool [D, R],
    threshold [D, R]).

    Training region = square ring between the guard box
    (2*guard+1)^2 and the outer box (2*(guard+train)+1)^2, means from
    one integral image of the reflect-padded map (exact — loop-twin
    tested); alpha from the exponential-noise closed form."""
    d, r = power.shape
    ho = guard + train
    pad = jnp.pad(power, ((ho, ho), (ho, ho)), mode="reflect")
    ii = _integral(pad)
    outer = _box_sum(ii, ho, d, r)
    # the guard-box integral needs the same padded origin: slice the
    # integral image so the (2g+1)-box is centered per cell
    off = ho - guard
    kg = 2 * guard + 1
    inner = (ii[off + kg: off + kg + d, off + kg: off + kg + r]
             - ii[off: off + d, off + kg: off + kg + r]
             - ii[off + kg: off + kg + d, off: off + r]
             + ii[off: off + d, off: off + r])
    n_train = (2 * ho + 1) ** 2 - kg ** 2
    noise = (outer - inner) / F32(n_train)
    alpha = F32(cfar_alpha_2d(n_train, pfa))
    thr = alpha * noise
    return power > thr, thr


def detections(power: jax.Array, mask: jax.Array) -> np.ndarray:
    """Host sink: (doppler_bin, range_bin, power) rows for LOCAL MAXIMA
    among CFAR hits (8-neighbour max suppression, gather-free pads)."""
    p = np.asarray(power)
    m = np.asarray(mask)
    pp = np.pad(p, 1, mode="constant", constant_values=-np.inf)
    local = np.ones_like(m)
    for dd in (-1, 0, 1):
        for dr in (-1, 0, 1):
            if dd == 0 and dr == 0:
                continue
            local &= p >= pp[1 + dd: 1 + dd + p.shape[0],
                             1 + dr: 1 + dr + p.shape[1]]
    hits = np.argwhere(m & local)
    rows = sorted(((int(a), int(b), float(p[a, b])) for a, b in hits),
                  key=lambda t: -t[2])
    return np.asarray(rows, dtype=object)
