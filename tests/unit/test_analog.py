"""Analog demod chains (FM/AM/SSB) — beyond-parity component tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srcdsp_tpu.chains.analog import (
    am_apply, am_init, am_modulate, deemphasis_coeffs, fm_apply, fm_init,
    fm_modulate, make_am_params, make_fm_params, make_ssb_params,
    onesided_taps, ssb_apply, ssb_init, ssb_modulate)
from srcdsp_tpu.ops.iir import np_iir_full
from srcdsp_tpu.testing.signals import complex_awgn


def _tone_snr(audio: np.ndarray, freq: float, skip: int) -> float:
    """SNR (dB) of a known-frequency tone in `audio`: LS-project onto
    cos/sin at `freq` (cycles/sample), subtract, compare powers."""
    a = np.asarray(audio, np.float64)[skip:]
    a = a - a.mean()
    n = a.shape[-1]
    k = np.arange(n)
    c, s = np.cos(2 * np.pi * freq * k), np.sin(2 * np.pi * freq * k)
    amp_c = 2 * np.dot(a, c) / n
    amp_s = 2 * np.dot(a, s) / n
    resid = a - amp_c * c - amp_s * s
    sig = (amp_c ** 2 + amp_s ** 2) / 2
    return 10 * np.log10(sig / max(np.mean(resid ** 2), 1e-30))


def test_deemphasis_unity_dc_and_rolloff():
    b, a = deemphasis_coeffs(tau_samples=10.0)
    # DC gain 1
    assert abs(b.sum() / a.sum() - 1.0) < 1e-12
    # -3 dB near 1/(2 pi tau) cycles/sample
    w = 2 * np.pi * (1 / (2 * np.pi * 10.0))
    h = b[0] / (1 - (-a[1]) * np.exp(-1j * w))
    assert abs(20 * np.log10(abs(h)) - (-3.0)) < 0.5


def test_fm_tone_roundtrip():
    decim, audio_decim = 4, 2
    n = 1 << 16
    f_audio = 0.004                      # cycles/sample at input rate
    k = np.arange(n)
    audio = np.sin(2 * np.pi * f_audio * k).astype(np.float32)
    dev_in = 0.02                        # cycles/sample at input rate
    x = fm_modulate(jnp.asarray(audio), dev=dev_in)
    params = make_fm_params(center_freq=0.0, decim=decim,
                            dev=dev_in * decim, audio_decim=audio_decim,
                            deemph_tau=None)
    st = fm_init(params)
    st, a = jax.jit(fm_apply)(params, st, x)
    got = np.asarray(a)
    f_out = f_audio * decim * audio_decim
    snr = _tone_snr(got, f_out, skip=256)
    assert snr > 40.0, snr


def test_fm_streaming_matches_oneshot():
    decim, audio_decim = 4, 2
    n = 1 << 14
    k = np.arange(n)
    audio = 0.7 * np.sin(2 * np.pi * 0.003 * k)
    x = fm_modulate(jnp.asarray(audio, jnp.float32), dev=0.02)
    params = make_fm_params(0.0, decim, dev=0.08, audio_decim=audio_decim,
                            deemph_tau=20.0, iir_block=128)
    st = fm_init(params)
    _, one = fm_apply(params, fm_init(params), x)
    blocks = np.split(np.asarray(x), 4)
    outs = []
    for b in blocks:
        st, a = fm_apply(params, st, jnp.asarray(b))
        outs.append(np.asarray(a))
    np.testing.assert_allclose(np.concatenate(outs), np.asarray(one),
                               rtol=0, atol=2e-5)


def test_fm_offset_channel_with_noise():
    decim, audio_decim = 4, 2
    n = 1 << 16
    k = np.arange(n)
    audio = np.sin(2 * np.pi * 0.004 * k).astype(np.float32)
    x = fm_modulate(jnp.asarray(audio), dev=0.02, center=0.17)
    x = x + complex_awgn(jax.random.PRNGKey(0), x.shape, power=1e-4)
    params = make_fm_params(center_freq=0.17, decim=decim, dev=0.08,
                            audio_decim=audio_decim, deemph_tau=None)
    st, a = jax.jit(fm_apply)(params, fm_init(params), x)
    snr = _tone_snr(np.asarray(a), 0.004 * decim * audio_decim, skip=256)
    assert snr > 30.0, snr


def test_fm_multichannel_vmap():
    decim, audio_decim = 4, 2
    n = 1 << 14
    k = np.arange(n)
    a0 = np.sin(2 * np.pi * 0.003 * k)
    a1 = np.sin(2 * np.pi * 0.005 * k)
    x = jnp.stack([fm_modulate(jnp.asarray(a0, jnp.float32), 0.02),
                   fm_modulate(jnp.asarray(a1, jnp.float32), 0.02)])
    params = make_fm_params(0.0, decim, dev=0.08, audio_decim=audio_decim,
                            deemph_tau=None)
    st = fm_init(params, channel_shape=(2,))
    st, a = jax.jit(fm_apply)(params, st, x)
    f = decim * audio_decim
    assert _tone_snr(np.asarray(a[0]), 0.003 * f, 256) > 35.0
    assert _tone_snr(np.asarray(a[1]), 0.005 * f, 256) > 35.0


def test_am_tone_roundtrip():
    decim, audio_decim = 4, 2
    n = 1 << 16
    k = np.arange(n)
    f_audio = 0.004
    audio = np.sin(2 * np.pi * f_audio * k).astype(np.float32)
    x = am_modulate(jnp.asarray(audio), depth=0.5, center=0.21)
    x = x + complex_awgn(jax.random.PRNGKey(1), x.shape, power=1e-5)
    params = make_am_params(center_freq=0.21, decim=decim,
                            audio_decim=audio_decim, dc_alpha=0.99)
    st, a = jax.jit(am_apply)(params, am_init(params), x)
    snr = _tone_snr(np.asarray(a), f_audio * decim * audio_decim, skip=2048)
    assert snr > 30.0, snr


def test_am_dc_removed():
    """Unmodulated carrier -> (near-)zero audio after the DC blocker."""
    n = 1 << 14
    x = am_modulate(jnp.zeros(n, jnp.float32), depth=0.5, center=0.1)
    params = make_am_params(0.1, decim=4, audio_decim=2, dc_alpha=0.99)
    _, a = jax.jit(am_apply)(params, am_init(params), x)
    tail = np.asarray(a)[1024:]
    assert np.max(np.abs(tail)) < 1e-3


def test_onesided_taps_reject_opposite_sideband():
    h = onesided_taps(192, bandwidth=0.2)
    w, hf = np.linspace(-0.5, 0.5, 2048, endpoint=False), None
    e = np.exp(-2j * np.pi * np.outer(w, np.arange(192)))
    hf = np.abs(e @ h)
    pass_band = hf[(w > 0.01) & (w < 0.09)]
    stop_band = hf[(w < -0.01) & (w > -0.4)]
    assert 20 * np.log10(stop_band.max() / pass_band.min()) < -40.0


@pytest.mark.parametrize("lower", [False, True])
def test_ssb_tone_roundtrip(lower):
    n = 1 << 15
    k = np.arange(n)
    f_audio = 0.01
    audio = np.sin(2 * np.pi * f_audio * k)
    x = jnp.asarray(ssb_modulate(audio, center=0.22, lower=lower))
    params = make_ssb_params(center_freq=0.22, decim=2, bandwidth=0.04,
                             lower=lower)
    st, a = jax.jit(ssb_apply)(params, ssb_init(params), x)
    snr = _tone_snr(np.asarray(a), f_audio * 2, skip=512)
    assert snr > 40.0, snr


def test_ssb_opposite_sideband_rejected():
    """A USB receiver tuned to the same carrier must reject an LSB signal."""
    n = 1 << 15
    audio = np.sin(2 * np.pi * 0.01 * np.arange(n))
    x = jnp.asarray(ssb_modulate(audio, center=0.22, lower=True))
    params = make_ssb_params(center_freq=0.22, decim=2, bandwidth=0.04,
                             lower=False)
    _, a = jax.jit(ssb_apply)(params, ssb_init(params), x)
    out = np.asarray(a)[512:]
    assert np.sqrt(np.mean(out ** 2)) < 0.02
