"""Welch PSD / spectrogram tests (beyond-parity component)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal as sig

from srcdsp_tpu.ops.spectrum import (
    frame_signal, spectrogram, welch, welch_stream_finalize,
    welch_stream_init, welch_stream_update)


def _noise(n, seed=0, complex_=True):
    rng = np.random.default_rng(seed)
    if complex_:
        return (rng.standard_normal(n) + 1j * rng.standard_normal(n)
                ).astype(np.complex64)
    return rng.standard_normal(n).astype(np.float32)


def test_frame_signal_matches_strided():
    x = jnp.arange(40.0)
    fr = np.asarray(frame_signal(x, nfft=8, hop=4))
    assert fr.shape == (9, 8)
    for i in range(9):
        np.testing.assert_array_equal(fr[i], np.arange(40.0)[4 * i: 4 * i + 8])


def test_frame_signal_gather_fallback():
    x = jnp.arange(40.0)
    fr = np.asarray(frame_signal(x, nfft=8, hop=3))
    assert fr.shape == (11, 8)
    for i in range(11):
        np.testing.assert_array_equal(fr[i], np.arange(40.0)[3 * i: 3 * i + 8])


@pytest.mark.parametrize("scaling", ["density", "spectrum"])
@pytest.mark.parametrize("complex_", [True, False])
def test_welch_matches_scipy(scaling, complex_):
    x = _noise(4096, seed=1, complex_=complex_)
    nfft = 256
    got = np.asarray(welch(jnp.asarray(x), nfft, scaling=scaling))
    f_ref, p_ref = sig.welch(x, nperseg=nfft, noverlap=nfft // 2,
                             return_onesided=False, scaling=scaling,
                             detrend="constant")
    np.testing.assert_allclose(got, p_ref, rtol=2e-4, atol=1e-8)


def test_welch_tone_power_spectrum_scaling():
    """'spectrum' scaling: a unit-amplitude complex tone at a bin center
    integrates to amplitude^2 = 1 in its peak bin."""
    n, nfft = 8192, 256
    f0 = 32 / nfft
    x = np.exp(2j * np.pi * f0 * np.arange(n)).astype(np.complex64)
    p = np.asarray(welch(jnp.asarray(x), nfft, scaling="spectrum",
                         detrend=None))
    assert abs(p[32] - 1.0) < 1e-3
    mask = np.ones(nfft, bool)
    mask[30:35] = False
    assert p[mask].max() < 1e-4


def test_spectrogram_matches_scipy_stft_power():
    x = _noise(2048, seed=2)
    nfft, hop = 128, 64
    got = np.asarray(spectrogram(jnp.asarray(x), nfft, hop,
                                 scaling="density", detrend=None))
    _, _, s_ref = sig.spectrogram(
        x, window="hann", nperseg=nfft, noverlap=nfft - hop,
        return_onesided=False, scaling="density", detrend=False,
        mode="psd")
    # scipy returns [bins, frames]
    np.testing.assert_allclose(got, s_ref.T, rtol=2e-4, atol=1e-8)


def test_welch_streaming_matches_oneshot():
    x = _noise(8192, seed=3)
    nfft, hop = 256, 128
    one = np.asarray(welch(jnp.asarray(x), nfft, hop))
    st = welch_stream_init(nfft, hop)
    blocks = np.split(x, 8)
    for i, b in enumerate(blocks):
        st = welch_stream_update(st, jnp.asarray(b), nfft, hop,
                                 first=(i == 0))
    got = np.asarray(welch_stream_finalize(st, nfft))
    np.testing.assert_allclose(got, one, rtol=1e-5, atol=1e-9)


def test_welch_streaming_jit_fixed_blocks():
    x = _noise(8192, seed=4)
    nfft, hop = 128, 64
    upd = jax.jit(lambda s, b: welch_stream_update(s, b, nfft, hop))
    upd0 = jax.jit(lambda s, b: welch_stream_update(s, b, nfft, hop,
                                                    first=True))
    st = welch_stream_init(nfft, hop)
    blocks = np.split(x, 16)
    st = upd0(st, jnp.asarray(blocks[0]))
    for b in blocks[1:]:
        st = upd(st, jnp.asarray(b))
    got = np.asarray(welch_stream_finalize(st, nfft))
    one = np.asarray(welch(jnp.asarray(x), nfft, hop))
    np.testing.assert_allclose(got, one, rtol=1e-5, atol=1e-9)


def test_welch_multichannel():
    x = np.stack([_noise(4096, seed=5), _noise(4096, seed=6)])
    p = np.asarray(welch(jnp.asarray(x), 256))
    assert p.shape == (2, 256)
    for c in range(2):
        ref = np.asarray(welch(jnp.asarray(x[c]), 256))
        np.testing.assert_allclose(p[c], ref, rtol=1e-6)


def test_welch_planes_fft_tier():
    """The matmul-FFT (restricted-backend tier) plugs in via fft_fn."""
    from srcdsp_tpu.ops.fft_planes import make_fft_planes
    x = _noise(2048, seed=7)
    nfft = 256
    fft = make_fft_planes(nfft)
    got = np.asarray(welch(jnp.asarray(x), nfft, fft_fn=fft))
    ref = np.asarray(welch(jnp.asarray(x), nfft))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-6)
