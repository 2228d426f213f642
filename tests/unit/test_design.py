"""ops.design vs scipy.signal (firls / remez / freqz / group_delay)."""

import numpy as np
import pytest
import scipy.signal as sig

from srcdsp_tpu.ops.design import (
    bandpass, bandstop, equiripple, firls, freq_response, group_delay,
    highpass, kaiser_lowpass, kaiser_num_taps,
)


def test_firls_matches_scipy():
    """Exact-integral LS design == scipy.signal.firls (same normal eqs)."""
    n = 65
    bands = [0.0, 0.18, 0.24, 0.5]
    desired = [1.0, 1.0, 0.0, 0.0]
    for weights in (None, [1.0, 10.0]):
        h = firls(n, bands, desired, weights=weights)
        w = None if weights is None else weights
        ref = sig.firls(n, bands, desired, weight=w, fs=1.0)
        np.testing.assert_allclose(h, ref, atol=1e-9)


def test_firls_differentiator_style_slope():
    """A band whose desired amplitude ramps (D linear in f) — checks the
    f*cos integral path against scipy."""
    n = 41
    bands = [0.0, 0.2, 0.3, 0.5]
    desired = [0.0, 1.0, 0.0, 0.0]
    h = firls(n, bands, desired)
    ref = sig.firls(n, bands, desired, fs=1.0)
    np.testing.assert_allclose(h, ref, atol=1e-9)


def test_firls_validates():
    with pytest.raises(ValueError):
        firls(64, [0.0, 0.2, 0.3, 0.5], [1, 1, 0, 0])   # even taps
    with pytest.raises(ValueError):
        firls(65, [0.0, 0.3, 0.2, 0.5], [1, 1, 0, 0])   # non-monotone


def test_equiripple_near_remez():
    """Lawson IRLS converges to the Chebyshev solution: the achieved
    minimax ripple is within a few percent of scipy.signal.remez's."""
    n = 47
    bands = [0.0, 0.15, 0.22, 0.5]
    desired = [1.0, 1.0, 0.0, 0.0]
    h, rip = equiripple(n, bands, desired, return_ripple=True)

    ref = sig.remez(n, bands, [1.0, 0.0], fs=1.0)

    def band_ripple(taps):
        f, resp = freq_response(taps, nfreq=8192)
        a = np.abs(resp)
        pb = a[(f >= 0.0) & (f <= 0.15)]
        sb = a[(f >= 0.22) & (f <= 0.5)]
        return max(np.max(np.abs(pb - 1.0)), np.max(sb))

    ours, scipys = band_ripple(h), band_ripple(ref)
    assert ours < scipys * 1.05, f"ripple {ours:.3e} vs remez {scipys:.3e}"
    # and the reported ripple agrees with the measured one
    assert abs(rip - ours) < 0.15 * ours


def test_equiripple_weighted_stopband():
    """10x stopband weight trades passband flatness for attenuation."""
    n = 47
    bands = [0.0, 0.15, 0.22, 0.5]
    h1 = equiripple(n, bands, [1, 1, 0, 0])
    h2 = equiripple(n, bands, [1, 1, 0, 0], weights=[1.0, 10.0])

    def stop_atten(taps):
        f, resp = freq_response(taps, nfreq=4096)
        return np.max(np.abs(resp[(f >= 0.22)]))

    assert stop_atten(h2) < stop_atten(h1) * 0.5


def test_band_transforms():
    """highpass/bandpass/bandstop hit their pass/stop targets."""
    hp = highpass(129, 0.2)
    f, r = freq_response(hp, nfreq=4096)
    a = np.abs(r)
    assert np.max(a[f <= 0.15]) < 0.01
    assert np.allclose(a[f >= 0.25], 1.0, atol=0.01)

    bp = bandpass(129, 0.1, 0.2)
    f, r = freq_response(bp, nfreq=4096)
    a = np.abs(r)
    assert np.max(a[f <= 0.06]) < 0.01
    assert np.max(a[f >= 0.24]) < 0.01
    assert np.max(np.abs(a[(f >= 0.12) & (f <= 0.18)] - 1.0)) < 0.02

    bs = bandstop(129, 0.1, 0.2)
    f, r = freq_response(bs, nfreq=4096)
    a = np.abs(r)
    assert np.max(a[(f >= 0.12) & (f <= 0.18)]) < 0.02
    assert np.allclose(a[f <= 0.06], 1.0, atol=0.02)
    assert np.allclose(a[f >= 0.24], 1.0, atol=0.02)


def test_freq_response_matches_freqz():
    h = firls(41, [0.0, 0.2, 0.3, 0.5], [1, 1, 0, 0])
    f, r = freq_response(h, nfreq=512)
    _, rref = sig.freqz(h, worN=f, fs=1.0)  # same freqs (freqz's own grid
    np.testing.assert_allclose(r, rref, atol=1e-9)  # excludes fs/2)


def test_group_delay_linear_phase():
    """A symmetric (linear-phase) FIR has constant group delay (N-1)/2."""
    h = firls(41, [0.0, 0.2, 0.3, 0.5], [1, 1, 0, 0])
    f, tau = group_delay(h, nfreq=512)
    inband = ~np.isnan(tau) & (f < 0.45)
    np.testing.assert_allclose(tau[inband], 20.0, atol=1e-3)


def test_kaiser_sizing():
    """kaiser_lowpass meets its attenuation spec at the sized tap count."""
    atten, trans, cut = 60.0, 0.05, 0.2
    n = kaiser_num_taps(atten, trans)
    assert n % 2 == 1
    h = kaiser_lowpass(cut, trans, atten_db=atten)
    assert h.size == n
    f, r = freq_response(h, nfreq=8192)
    sb = np.abs(r[f >= cut + trans / 2])
    got_db = -20 * np.log10(np.max(sb) + 1e-30)
    assert got_db > atten - 3.0, f"stopband {got_db:.1f} dB < {atten}"
