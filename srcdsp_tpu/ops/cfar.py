"""CFAR detection (beyond parity): constant false-alarm rate thresholding
over power series/spectra.

Pairs with ops.spectrum: feed a Welch PSD, a spectrogram row, or a matched-
filter power series and get detections at a calibrated false-alarm rate.

TPU-native form: the sliding training-window sums of cell-averaging CFAR
are computed with ONE cumulative sum (integral image) and four shifted
slices — no gather, no per-cell loop, vectorized over leading axes. Edge
cells use reflection padding so every cell sees a full training window
(alpha stays exact everywhere).

Calibration: for square-law-detected Gaussian noise (exponentially
distributed power — the |FFT|^2 case), CA-CFAR with T training cells has
threshold factor alpha = T * (pfa^(-1/T) - 1), giving EXACTLY the design
false-alarm probability independent of the (unknown) noise level. GO-CFAR
(greatest-of the two half-windows) is included for clutter edges.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.types import F32

__all__ = ["cfar_alpha", "ca_cfar", "go_cfar_split"]


def cfar_alpha(num_train: int, pfa: float) -> float:
    """CA-CFAR threshold multiplier for exponential (square-law) noise."""
    return float(num_train * (pfa ** (-1.0 / num_train) - 1.0))


def _window_means(power: jax.Array, guard: int, train: int):
    """(lead_mean, lag_mean): means of the `train` cells on each side of
    every cell, skipping `guard` cells, via reflection pad + cumsum."""
    w = guard + train
    if power.shape[-1] < w + 1:
        raise ValueError(f"need at least guard+train+1 = {w + 1} cells, "
                         f"got {power.shape[-1]}")
    p = jnp.concatenate([power[..., 1:w + 1][..., ::-1], power,
                         power[..., -w - 1:-1][..., ::-1]], axis=-1)
    c = jnp.cumsum(p.astype(F32), axis=-1)
    c = jnp.concatenate([jnp.zeros((*c.shape[:-1], 1), F32), c], axis=-1)
    n = power.shape[-1]
    # cell i sits at pad position i+w; sums over [i-g-t, i-g) and
    # (i+g, i+g+t] become four static slices of the exclusive cumsum
    lead = c[..., w - guard:w - guard + n] - c[..., 0:n]
    lag = (c[..., 2 * w + 1:2 * w + 1 + n]
           - c[..., w + guard + 1:w + guard + 1 + n])
    return lead / F32(train), lag / F32(train)


def ca_cfar(power: jax.Array, guard: int = 2, train: int = 16,
            pfa: float = 1e-3):
    """Cell-averaging CFAR. power: [..., N] non-negative (square-law).

    Returns (detections bool [..., N], threshold f32 [..., N]). The noise
    estimate per cell is the mean of `train` cells on BOTH sides (2*train
    total) outside `guard` guard cells; threshold = alpha * estimate with
    alpha calibrated for `pfa` under exponential noise.
    """
    lead, lag = _window_means(power, guard, train)
    noise = 0.5 * (lead + lag)
    alpha = F32(cfar_alpha(2 * train, pfa))
    thr = alpha * noise
    return power > thr, thr


def go_cfar_split(power: jax.Array, guard: int = 2, train: int = 16,
                  pfa: float = 1e-3):
    """Greatest-of CFAR: noise = max(lead half, lag half). Robust at
    clutter edges (a power step raises the threshold instead of leaking
    false alarms); alpha is calibrated per half-window."""
    lead, lag = _window_means(power, guard, train)
    noise = jnp.maximum(lead, lag)
    # GO-CFAR exact pfa has no closed form in elementary terms; the
    # standard practice (used here) is the per-half CA alpha, which is
    # slightly conservative (pfa_actual < pfa).
    alpha = F32(cfar_alpha(train, pfa))
    thr = alpha * noise
    return power > thr, thr
