"""Link-quality metrics (srcdsp_tpu.metrics)."""

import numpy as np
import pytest

from srcdsp_tpu.metrics import (
    align_sequences, ber, evm_blind, evm_db, evm_rms, goertzel, mer_db,
    ser, tone_power_db,
)


def test_evm_known_snr():
    """EVM of a noisy QPSK cloud equals the injected noise fraction."""
    rng = np.random.default_rng(0)
    n = 200000
    ref = np.exp(1j * (np.pi / 4 + np.pi / 2 * rng.integers(0, 4, n)))
    sigma = 0.1
    rx = ref + sigma * (rng.standard_normal(n)
                        + 1j * rng.standard_normal(n)) / np.sqrt(2)
    got = evm_rms(rx, ref)
    assert abs(got - sigma) < 0.002
    assert abs(evm_db(rx, ref) - 20 * np.log10(sigma)) < 0.2
    assert abs(mer_db(rx, ref) + 20 * np.log10(sigma)) < 0.2


def test_evm_peak_normalization():
    ref = np.asarray([1 + 0j, 3 + 0j])
    rx = ref + np.asarray([0.3, 0.3])
    frac_rms = evm_rms(rx, ref)                     # den = sqrt(5)
    frac_peak = evm_rms(rx, ref, normalize="peak")  # den = 3
    assert abs(frac_rms - 0.3 / np.sqrt(5.0)) < 1e-12
    assert abs(frac_peak - 0.1) < 1e-12


def test_evm_blind_matches_reference_when_decisions_right():
    rng = np.random.default_rng(1)
    pts = np.exp(1j * (np.pi / 4 + np.pi / 2 * np.arange(4)))
    ref = pts[rng.integers(0, 4, 5000)]
    rx = ref + 0.05 * (rng.standard_normal(5000)
                       + 1j * rng.standard_normal(5000))
    assert abs(evm_blind(rx, pts) - evm_rms(rx, ref)) < 1e-9


def test_alignment_and_ber():
    rng = np.random.default_rng(2)
    tx = rng.integers(0, 2, 1000)
    rx = np.concatenate([rng.integers(0, 2, 7), tx])    # 7-late
    rx = rx.copy()
    rx[100:110] ^= 1                                    # 10 errors
    rate, lag, m = ber(tx, rx, max_lag=16)
    assert lag == 7
    assert m == 1000
    assert rate == 10 / 1000

    # negative lag: rx starts early (leading tx bits missing)
    rate, lag, m = ser(tx, tx[5:], max_lag=16)
    assert lag == -5 and rate == 0.0 and m == 995


def test_alignment_validates():
    lag, a, b = align_sequences(np.ones(4), np.ones(4), max_lag=0)
    assert lag == 0 and a.size == 4
    with pytest.raises(ValueError):                   # no overlap possible
        align_sequences(np.ones(2), np.ones(3), max_lag=-1)


def test_goertzel_exact_tone():
    n = 4096
    f = 0.1234567                     # off-grid on purpose
    x = 0.7 * np.exp(2j * np.pi * f * np.arange(n))
    amp = goertzel(x, f)
    assert abs(amp - 0.7) < 1e-3      # spectral leakage only
    # batch shape
    xb = np.stack([x, 2 * x])
    ab = goertzel(xb, f)
    assert ab.shape == (2,)
    assert abs(ab[1] / ab[0] - 2.0) < 1e-9

    db = tone_power_db(x, f)
    assert abs(db) < 0.05             # pure tone: ~0 dB of total power


def test_xcorr_integer_delay():
    rng = np.random.default_rng(10)
    b = (rng.standard_normal(512) + 1j * rng.standard_normal(512)
         ).astype(np.complex64)
    a = np.concatenate([np.zeros(37, np.complex64), b])[:512]
    from srcdsp_tpu.metrics import delay_estimate, xcorr
    lags, r = xcorr(a, b, max_lag=64)
    assert lags[np.argmax(np.abs(r))] == 37
    assert abs(delay_estimate(a, b, max_lag=64) - 37.0) < 0.1


def test_delay_estimate_subsample():
    """Fractional delay injected in the frequency domain is recovered to
    a few hundredths of a sample (band-limited signal)."""
    from srcdsp_tpu.metrics import delay_estimate
    rng = np.random.default_rng(11)
    m, n = 16384, 4096
    spec = np.zeros(m, np.complex128)
    band = slice(1, m // 8)                   # low-pass random signal
    spec[band] = (rng.standard_normal(m // 8 - 1)
                  + 1j * rng.standard_normal(m // 8 - 1))
    y = np.fft.ifft(spec)
    tau = 12.37
    f = np.fft.fftfreq(m)
    yd = np.fft.ifft(spec * np.exp(-2j * np.pi * f * tau))
    # interior crops: a is a true LINEAR fractional delay of b (the
    # circular wrap of the frequency-domain shift stays near the edges)
    b = y[4000:4000 + n]
    a = yd[4000:4000 + n]
    a = a + 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    got = delay_estimate(a.astype(np.complex64), b.astype(np.complex64),
                         max_lag=64)
    assert abs(got - tau) < 0.05, got
