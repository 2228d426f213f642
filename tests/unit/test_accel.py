"""Acceleration search: drifting-tone recovery the plain FFT cannot
make, parameter accuracy, and noise behavior."""

import numpy as np

from srcdsp_tpu.ops.accel import accel_grid, accel_search


def _drifting_tone(n, f0, r, rng, snr_db):
    t = np.arange(n, dtype=np.float64)
    x = np.exp(2j * np.pi * (f0 * t + 0.5 * r * t * t))
    sigma = np.sqrt(10 ** (-snr_db / 10) / 2)
    return (x + sigma * (rng.standard_normal(n)
                         + 1j * rng.standard_normal(n))
            ).astype(np.complex64)


def test_recovers_what_fft_smears(rng):
    n = 8192
    f0, r = 0.123, 100.0 / (n * n)     # drifts ~100 bins over the block
    x = _drifting_tone(n, f0, r, rng, snr_db=-12.0)
    # plain FFT: the smeared tone barely clears the floor
    spec = np.abs(np.fft.fft(x))
    fft_ratio = spec.max() / np.median(spec)
    res = accel_search(x, max_drift=120.0 / (n * n))
    assert res.ratio > 3 * fft_ratio, (res.ratio, fft_ratio)
    assert res.ratio > 18
    # and the accel peak is ACCURATE where the FFT cannot be (the
    # 100-bin smear loses ~20 dB of coherent gain)
    assert abs(res.freq - f0) < 1.0 / n
    assert abs(res.freq - f0) < 1.0 / n
    assert abs(res.drift - r) < 0.5 / (n * n)


def test_zero_drift_reduces_to_fft(rng):
    n = 4096
    x = _drifting_tone(n, -0.2, 0.0, rng, snr_db=0.0)
    res = accel_search(x, max_drift=8.0 / (n * n))
    assert abs(res.drift) < 0.5 / (n * n)
    assert abs(res.freq - (-0.2)) < 1.0 / n


def test_noise_floor_flat(rng):
    n = 4096
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64)
    res = accel_search(x, max_drift=8.0 / (n * n))
    assert res.ratio < 8.0            # exponential max-statistic range


def test_grid_pitch():
    g = accel_grid(1024, 16.0 / 1024 ** 2)
    assert g.size == 17 and g[8] == 0.0
    assert np.isclose(g[1] - g[0], 2.0 / 1024 ** 2)
