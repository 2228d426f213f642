"""FM stereo MPX decoder (chains/analog.py)."""

import numpy as np

import jax.numpy as jnp

from srcdsp_tpu.chains.analog import (
    fm_stereo_apply, fm_stereo_init, fm_stereo_mpx, make_fm_stereo_params,
)
from srcdsp_tpu.metrics import tone_power_db


def _tones(n, f1, f2, phase=0.0):
    k = np.arange(n)
    left = np.cos(2 * np.pi * f1 * k)
    right = np.cos(2 * np.pi * f2 * k + phase)
    return left, right


def test_stereo_separation():
    """Distinct L/R tones: each lands in its own channel with >20 dB
    separation (pilot-squared carrier regeneration, no PLL)."""
    fp, decim = 19.0 / 240.0, 4
    n = 1 << 15
    f1, f2 = 0.004, 0.0066
    left, right = _tones(n, f1, f2)
    mpx = fm_stereo_mpx(left, right, fp)
    p = make_fm_stereo_params(fp, audio_bw=0.06, audio_decim=decim)
    _, out = fm_stereo_apply(p, fm_stereo_init(p), jnp.asarray(mpx))
    out = np.asarray(out)[..., 512:]               # past the transients
    l_ch, r_ch = out[0], out[1]
    fd1, fd2 = f1 * decim, f2 * decim              # decimated-rate tones
    sep_l = tone_power_db(l_ch, fd1) - tone_power_db(l_ch, fd2)
    sep_r = tone_power_db(r_ch, fd2) - tone_power_db(r_ch, fd1)
    assert sep_l > 20.0, sep_l
    assert sep_r > 20.0, sep_r
    # amplitude preserved (~unit tones in, ~unit out)
    assert 0.7 < np.max(np.abs(l_ch)) < 1.3


def test_stereo_streaming_matches_oneshot():
    fp, decim = 19.0 / 240.0, 4
    n = 1 << 14
    left, right = _tones(n, 0.005, 0.008, phase=1.0)
    mpx = fm_stereo_mpx(left, right, fp)
    p = make_fm_stereo_params(fp, audio_bw=0.06, audio_decim=decim)
    _, one = fm_stereo_apply(p, fm_stereo_init(p), jnp.asarray(mpx))
    st = fm_stereo_init(p)
    outs = []
    for blk in np.split(mpx, 4):
        st, y = fm_stereo_apply(p, st, jnp.asarray(blk))
        outs.append(np.asarray(y))
    got = np.concatenate(outs, axis=-1)
    np.testing.assert_allclose(got, np.asarray(one), atol=2e-5)


def test_mono_compatibility():
    """L == R (mono broadcast): both outputs equal the common signal and
    the L-R path stays silent."""
    fp, decim = 19.0 / 240.0, 4
    n = 1 << 14
    k = np.arange(n)
    mono = np.cos(2 * np.pi * 0.005 * k)
    mpx = fm_stereo_mpx(mono, mono, fp)
    p = make_fm_stereo_params(fp, audio_bw=0.06, audio_decim=decim)
    _, out = fm_stereo_apply(p, fm_stereo_init(p), jnp.asarray(mpx))
    out = np.asarray(out)[..., 512:]
    np.testing.assert_allclose(out[0], out[1], atol=0.02)


def test_fm_stereo_rx_chain_streaming_and_deemph():
    """The full composite receiver (chains.analog.fm_stereo_rx): streamed
    blocks match one-shot, and de-emphasis attenuates a high tone more
    than a low one."""
    from srcdsp_tpu.chains.analog import (
        fm_modulate, fm_stereo_rx_apply, fm_stereo_rx_init,
        make_fm_stereo_rx)
    from srcdsp_tpu.metrics import goertzel

    decim, audio_decim, center, dev_in = 4, 4, 0.07, 0.02
    fp = 19.0 / 240.0
    n = 1 << 16
    k = np.arange(n)
    left = 0.5 * np.cos(2 * np.pi * 0.001 / decim * k)       # low tone
    right = 0.5 * np.cos(2 * np.pi * 0.009 / decim * k)      # high tone
    mpx = fm_stereo_mpx(left, right, fp / decim)
    iq = np.asarray(fm_modulate(jnp.asarray(mpx), dev=dev_in,
                                center=center)).astype(np.complex64)
    p = make_fm_stereo_rx(center, decim, dev=dev_in * decim, pilot=fp,
                          audio_decim=audio_decim, num_taps=96,
                          deemph_tau=8.0)
    _, one = fm_stereo_rx_apply(p, fm_stereo_rx_init(p), jnp.asarray(iq))
    st = fm_stereo_rx_init(p)
    outs = []
    for blk in np.split(iq, 4):
        st, y = fm_stereo_rx_apply(p, st, jnp.asarray(blk))
        outs.append(np.asarray(y))
    got = np.concatenate(outs, axis=-1)
    np.testing.assert_allclose(got, np.asarray(one), atol=3e-5)
    # de-emphasis: the right channel's high tone is attenuated relative
    # to the left channel's low tone (both entered the MPX at 0.5)
    out = np.asarray(one)[..., 512:]
    f_lo, f_hi = 0.001 * audio_decim, 0.009 * audio_decim
    a_lo = np.abs(goertzel(out[0], f_lo))          # absolute amplitudes
    a_hi = np.abs(goertzel(out[1], f_hi))
    assert 20 * np.log10(a_lo / a_hi) > 3.0, (a_lo, a_hi)
