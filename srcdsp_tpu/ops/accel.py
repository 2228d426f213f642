"""Acceleration search — detection of linearly-DRIFTING tones that a
plain FFT smears away (beyond parity; the technique family of the
retrieved pulsar Fourier-domain-acceleration-search papers, PAPERS.md,
built the framework way: dechirp + batched FFT, no per-template loops).

A tone drifting at rate r cycles/sample^2 spreads over r*N^2 DFT bins
across an N-point window — at LEO-satellite Doppler rates a long
coherent FFT shows nothing above the floor. The matched statistic is

    Z(r, f) = sum_n x[n] exp(-j pi r n^2) exp(-j 2 pi f n)

i.e. for each drift hypothesis ONE quadratic dechirp then ONE FFT row
— the whole search is an [R, N] elementwise multiply + a batched FFT
(`fft_planes`-ready; the CSS dechirp-fold applies verbatim if a
serving tier is ever needed). Peak refinement is parabolic in both
axes. Coherent gain restores the full 10 log10(N) processing gain at
the correct r; the half-power drift resolution is ~2/N^2 (the
quadratic phase error across the window reaching ~pi/2), which sets
the default grid pitch.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["AccelResult", "accel_grid", "accel_search"]


class AccelResult(NamedTuple):
    metric: np.ndarray      # [R, N] |Z|
    rates: np.ndarray       # [R] drift grid, cycles/sample^2
    freq: float             # refined peak frequency, cycles/sample
    drift: float            # refined drift rate, cycles/sample^2
    snr_db: float           # peak over the metric's median floor
    ratio: float            # peak / median (detection statistic)


def accel_grid(n: int, max_drift: float) -> np.ndarray:
    """Drift grid covering +-max_drift at the ~2/N^2 matched pitch."""
    step = 2.0 / (n * n)
    k = int(np.ceil(max_drift / step))
    return np.arange(-k, k + 1) * step


def accel_search(x, rates: np.ndarray | None = None,
                 max_drift: float | None = None) -> AccelResult:
    """Search a block [N] for a drifting tone.

    rates: explicit drift grid, or computed from max_drift via
    accel_grid. Returns the full [R, N] metric plus the refined
    (freq, drift) peak. freq is the tone's instantaneous value at
    BLOCK START (n = 0): the dechirp convention makes the frequency at
    sample n equal freq + r*n, so the mid-block value is
    freq + drift*N/2 (docstring corrected on review; the tests pin the
    n = 0 convention)."""
    xx = jnp.asarray(np.asarray(x).astype(np.complex64))
    n = int(xx.shape[-1])
    if rates is None:
        if max_drift is None:
            raise ValueError("give rates or max_drift")
        rates = accel_grid(n, max_drift)
    rates = np.asarray(rates, np.float64)
    # exact frac phase per (rate, n): r*n^2/2 mod 1 in f64
    idx = np.arange(n, dtype=np.float64)
    fr = np.mod(rates[:, None] * (idx * idx)[None, :] / 2.0, 1.0)
    rot = np.exp(-2j * np.pi * fr).astype(np.complex64)
    z = jnp.fft.fft(jnp.asarray(rot) * xx[None, :], axis=-1)
    mag = np.asarray(jnp.abs(z))
    ri, fi = np.unravel_index(np.argmax(mag), mag.shape)

    def _para(y0, y1, y2):
        d = y0 - 2 * y1 + y2
        return 0.5 * (y0 - y2) / d if abs(d) > 1e-12 else 0.0

    # both neighbors wrap circularly (numpy's -1 handles fi == 0), so
    # the refinement holds at every bin including DC (review finding)
    foff = _para(mag[ri, fi - 1], mag[ri, fi], mag[ri, (fi + 1) % n])
    roff = _para(mag[ri - 1, fi], mag[ri, fi],
                 mag[ri + 1, fi]) if 0 < ri < mag.shape[0] - 1 else 0.0
    rstep = rates[1] - rates[0] if rates.size > 1 else 0.0
    freq = (fi + foff) / n
    if freq > 0.5:
        freq -= 1.0
    med = float(np.median(mag))
    pk = float(mag[ri, fi])
    return AccelResult(
        metric=mag, rates=rates, freq=float(freq),
        drift=float(rates[ri] + roff * rstep),
        snr_db=float(20 * np.log10(pk / max(med, 1e-30))),
        ratio=pk / max(med, 1e-30))
