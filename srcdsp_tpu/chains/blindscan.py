"""Blind wideband signal survey (beyond parity): find and characterize
unknown signals in a capture with no prior knowledge.

Composes the framework's own pieces into a survey receiver:

- **Detection** (`scan`): Welch PSD (ops.spectrum) thresholded against a
  GLOBAL noise floor (low quantile of the averaged PSD — local CFAR
  windows sit inside wide signals and mask them), adjacent occupied bins
  grouped into segments, per-segment center (power centroid), bandwidth,
  and SNR.
- **Baud rate** (`baud_estimate`): the envelope cyclostationary line —
  |x|^2 has a spectral TONE at the symbol rate for linear modulations
  with excess bandwidth. Picked on a zero-padded FFT (a coarse external
  grid misses lines: the Dirichlet peak is only 1/N wide) and refined by
  parabolic interpolation.
- **Modulation classification** (`classify_mpsk`): M-power spectral-line
  tests — x^M concentrates a tone at M*fc for M-PSK of order M. A
  continuum PSD peak can look "strong" vs the median, so line-ness is
  certified by SEGMENT PHASE COHERENCE: the peak-frequency projection of
  K signal segments adds in phase for a true line (|sum|/sum|.| -> 1) and
  incoherently for a continuum (-> 1/sqrt(K)).

Host-facing driver functions (numpy in/out, data-dependent output counts);
the detection PSD runs through the jax welch path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.ops.spectrum import welch

__all__ = ["Detection", "scan", "baud_estimate", "classify_mpsk"]


class Detection(NamedTuple):
    center: float      # cycles/sample, in (-0.5, 0.5]
    bandwidth: float   # cycles/sample (detected extent)
    power_db: float    # mean in-band PSD over the noise floor


def scan(x, nfft: int = 4096, thresh_db: float = 10.0, min_bins: int = 2,
         floor_quantile: float = 0.2, merge_gap: int = 8) -> list[Detection]:
    """Detect occupied bands in a capture.

    The noise floor is the `floor_quantile` quantile of the Welch PSD
    (robust while occupancy < ~1 - quantile); bins above floor +
    `thresh_db` are occupied; gaps up to `merge_gap` bins are closed (a
    modulated signal's skirt dips below threshold without ending the
    signal); contiguous runs (>= min_bins) become Detections, strongest
    first.
    """
    psd = np.asarray(welch(jnp.asarray(np.asarray(x, np.complex64)),
                           nfft=nfft), np.float64)
    floor = float(np.quantile(psd, floor_quantile))
    det = psd > floor * 10.0 ** (thresh_db / 10.0)
    # order bins by frequency (welch returns fftfreq order) so runs are
    # contiguous in frequency and a band straddling +-0.5 stays split
    # only at the true spectrum edge
    freqs = np.fft.fftfreq(nfft)
    order = np.argsort(freqs)
    f_s, p_s, d_s = freqs[order], psd[order], det[order]
    if merge_gap > 0:          # morphological closing along frequency
        kern = np.ones(merge_gap + 1)
        dil = np.convolve(d_s.astype(np.float64), kern, mode="same") > 0
        d_s = np.convolve((~dil).astype(np.float64), kern,
                          mode="same") == 0
    edges = np.flatnonzero(np.diff(np.concatenate([[0], d_s.astype(np.int8),
                                                   [0]])))
    out = []
    for lo, hi in zip(edges[0::2], edges[1::2]):
        if hi - lo < min_bins:
            continue
        p = p_s[lo:hi]
        f = f_s[lo:hi]
        c = float(np.sum(f * p) / np.sum(p))
        snr = 10.0 * np.log10(max(float(np.mean(p)) / max(floor, 1e-30),
                                  1e-30))
        out.append(Detection(center=c, bandwidth=float((hi - lo) / nfft),
                             power_db=snr))
    out.sort(key=lambda d: -d.power_db)
    return out


def _peak_line(z: np.ndarray, f_lo: float, f_hi: float, pad: int = 4
               ) -> tuple[float, float]:
    """(frequency, line-to-background dB) of the strongest spectral line
    of z in [f_lo, f_hi], via a pad-x zero-padded FFT + parabolic
    refinement (lines live between coarse grid points: Dirichlet peak
    width is 1/N)."""
    z = np.asarray(z)
    n = z.shape[-1]
    nfft = pad * (1 << int(np.ceil(np.log2(max(n, 2)))))
    s = np.abs(np.fft.fft(z, nfft)) ** 2
    f = np.fft.fftfreq(nfft)
    mask = (f >= f_lo) & (f <= f_hi)
    if not mask.any():
        return 0.0, -np.inf
    idx = np.flatnonzero(mask)
    k = idx[int(np.argmax(s[idx]))]
    # parabolic sub-bin refinement on log power
    if 0 < k < nfft - 1:
        y0, y1, y2 = np.log(s[k - 1] + 1e-300), np.log(s[k] + 1e-300), \
            np.log(s[k + 1] + 1e-300)
        den = y0 - 2 * y1 + y2
        frac = 0.0 if den == 0 else float(np.clip(0.5 * (y0 - y2) / den,
                                                  -0.5, 0.5))
    else:
        frac = 0.0
    line_db = 10.0 * np.log10(max(s[k], 1e-300)
                              / max(float(np.median(s[idx])), 1e-300))
    return float(f[k] + frac / nfft), line_db


def _coherence(z: np.ndarray, freq: float, start: int = 0, k: int = 8
               ) -> float:
    """Phase coherence of the `freq` projection across k segments of z
    (whose first sample has global index `start`): ~1 for a true
    spectral line, ~1/sqrt(k) for a continuum peak."""
    z = np.asarray(z)
    n = (z.shape[-1] // k) * k
    ph = np.exp(-2j * np.pi * freq * np.arange(start, start + n))
    proj = (z[:n] * ph).reshape(k, -1).mean(axis=-1)
    denom = float(np.sum(np.abs(proj)))
    return 0.0 if denom == 0 else float(np.abs(np.sum(proj)) / denom)


def baud_estimate(x, f_lo: float = 1e-3, f_hi: float = 0.5
                  ) -> tuple[float, float]:
    """Symbol-rate estimate from the |x|^2 cyclostationary line.

    x should be roughly band-centered (mix Detection.center down first).
    Returns (baud in cycles/sample, line-to-background ratio in dB —
    treat < ~10 dB as 'no line found')."""
    env = np.abs(np.asarray(x)) ** 2
    env = env - env.mean()
    return _peak_line(env.astype(np.complex128), f_lo, f_hi)


def classify_mpsk(x, orders=(1, 2, 4, 8), min_coherence: float = 0.7,
                  min_fraction: float = 0.01):
    """Smallest M in `orders` whose x^M spectrum carries a TRUE line.

    Returns (order or 0 if none, {M: (line_fraction, coherence)}). M=1
    reads 'carrier present' (CW / residual-carrier); BPSK lights at M=2,
    QPSK at 4, 8PSK at 8 — x^M is continuum for M below the order.

    Line-ness is certified OUT OF SAMPLE: the candidate frequency comes
    from the first half of the record, the segment phase coherence is
    measured on the second half (an in-sample argmax over ~1e5 bins
    selects chance-aligned frequencies and fakes coherence ~0.9 on pure
    continuum), plus a peak-power-fraction floor (a tone holds a fixed
    fraction of total power; a continuum max bin holds ~log(nbins)/nbins).
    Measured margins: line cases frac >= 6e-2 / coh >= 0.99 vs continuum
    frac <= 1.2e-3 / coh <= 0.44 on RRC PSK bursts."""
    x = np.asarray(x)
    x = x / max(float(np.sqrt(np.mean(np.abs(x) ** 2))), 1e-30)
    h = x.shape[-1] // 2
    report = {}
    for m in orders:
        z = (x ** m).astype(np.complex128)
        freq, _ = _peak_line(z[:h], -0.5, 0.5)
        nfft = 4 * (1 << int(np.ceil(np.log2(max(z.shape[-1], 2)))))
        s = np.abs(np.fft.fft(z, nfft)) ** 2
        frac = float(s.max() / max(s.sum(), 1e-300))
        coh = _coherence(z[h:], freq, start=h)
        report[m] = (float(f"{frac:.2e}"), round(coh, 3))
        if frac > min_fraction and coh > min_coherence:
            return m, report
    return 0, report


def detect_css(x, sf_range=range(6, 13), min_score: float = 2.0):
    """Blind CSS (LoRa-class) detection + spreading-factor estimate.

    Physics: dechirping a CSS signal with the conjugate base chirp of
    the RIGHT length concentrates every N-chip window into one or two
    DFT tones (any window of a symbol stream is a cyclic shift; a
    symbol-straddling window splits into two tones) — regardless of
    timing, CFO, or payload. For noise, or any non-chirp signal, the
    dechirped spectrum stays spread. The statistic per SF is the mean
    top-2-bin energy fraction across frames, normalized by its
    noise-only expectation (~(ln N + 1)/N from exponential order
    statistics), maximized over up- and down-chirp hypotheses.

    Returns {'detected', 'sf', 'score', 'direction', 'scores'} — score
    is the normalized concentration at the winning SF (measured:
    noise 0.95, narrowband PSK 0.89 — its 1/sps bandwidth spreads the
    top-2 fraction — CSS at -5 dB chip SNR 3.0; threshold 2.0); wrong-SF hypotheses score low because a
    half/double-length window of a chirp still sweeps (the SF estimate
    is implicit in the argmax).
    """
    from srcdsp_tpu.chains.css import base_upchirp

    xx = np.asarray(x).astype(np.complex64)
    scores = {}
    best = (0.0, None, None)
    for sf in sf_range:
        n = 1 << sf
        s = xx.size // n
        if s < 4:
            continue
        fr = xx[: s * n].reshape(s, n)
        u = base_upchirp(n)
        noise_exp = (np.log(n) + 1.0) / n
        for direction, dc in (("up", np.conj(u)), ("down", u)):
            spec = np.abs(np.fft.fft(fr * dc, axis=-1)) ** 2
            top2 = np.sort(spec, axis=-1)[:, -2:].sum(axis=-1)
            frac = float(np.mean(top2 / np.maximum(
                spec.sum(axis=-1), 1e-30)))
            sc = frac / (2.0 * noise_exp)
            scores[(sf, direction)] = round(sc, 2)
            if sc > best[0]:
                best = (sc, sf, direction)
    detected = best[0] >= min_score
    return {"detected": bool(detected),
            "sf": best[1] if detected else None,
            "direction": best[2] if detected else None,
            "score": round(best[0], 2), "scores": scores}
