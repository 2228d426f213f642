"""GMSK/MSK: modulator fixture properties + demod through the FSK chain.

GMSK is CPM with h=1/2 and a Gaussian frequency pulse; the framework's
FSK discriminator chain (chains/fsk.py) demodulates it directly — the
Gaussian ISI narrows the frequency eye but the sign at the symbol strobe
survives down to BT=0.3 (the GSM value).
"""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.chains.fsk import fsk_apply, fsk_init, make_fsk_params
from srcdsp_tpu.metrics import align_sequences
from srcdsp_tpu.testing.signals import gmsk_baseband, tone


def test_constant_envelope_and_msk_phase_steps():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 128)
    x = gmsk_baseband(bits, 8, bt=0.3)
    assert x.shape == (128 * 8,)
    np.testing.assert_allclose(np.abs(x), 1.0, atol=1e-6)   # CPM envelope

    # MSK special case: each bit advances the phase by exactly +-pi/2
    m = gmsk_baseband(bits, 8, bt=None)
    steps = np.diff(np.unwrap(np.angle(m))[::8]) / (np.pi / 2)
    np.testing.assert_allclose(steps, (2.0 * bits - 1.0)[: steps.size],
                               atol=1e-5)   # complex64 fixture rounding


def test_gaussian_pulse_narrows_spectrum():
    """BT=0.3 GMSK occupies less bandwidth than MSK (the point of the
    Gaussian filter): compare 99% occupied bandwidth."""
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 4096)

    def obw(x):
        s = np.abs(np.fft.fft(x * np.hanning(x.size))) ** 2
        s = np.fft.fftshift(s)
        c = np.cumsum(s) / s.sum()
        lo = np.searchsorted(c, 0.005)
        hi = np.searchsorted(c, 0.995)
        return (hi - lo) / x.size

    bw_msk = obw(gmsk_baseband(bits, 8, bt=None))
    bw_gmsk = obw(gmsk_baseband(bits, 8, bt=0.3))
    assert bw_gmsk < 0.8 * bw_msk, (bw_gmsk, bw_msk)


def _demod_gmsk(bits, decim, sps, center, bt, snr_db=None, rng=None):
    x = np.asarray(gmsk_baseband(bits, decim * sps, bt=bt))
    x = x * np.asarray(tone(x.size, center))
    if snr_db is not None:
        sigma = np.sqrt(1.0 / 10 ** (snr_db / 10) / 2)
        x = x + sigma * (rng.standard_normal(x.size)
                         + 1j * rng.standard_normal(x.size))
    # dev at the decimated rate: peak deviation is 0.25 cycles/bit
    # = 0.25/sps after decimation. GMSK's smooth frequency has a weak
    # O&M d^2 timing tone -> long accumulator memory (timing_forget)
    # so tau averages across blocks instead of wandering.
    p = make_fsk_params(center, 64, 0.4 / (decim * sps) * decim * 2,
                        decim, sps, dev=0.25 / sps, timing_forget=0.95)
    n = (x.size // (decim * sps * 8)) * (decim * sps * 8)
    xb = jnp.asarray(x[:n].astype(np.complex64)).reshape(8, -1)

    st = fsk_init(p)
    outs = []
    step = jax.jit(lambda s, b: fsk_apply(p, s, b))
    for k in range(8):
        st, (bhat, soft) = step(st, xb[k])
        outs.append(np.asarray(bhat))
    return np.concatenate(outs)


def test_fsk_chain_demods_gmsk_bt03_clean():
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, 512)
    got = _demod_gmsk(bits, decim=4, sps=8, center=0.11, bt=0.3)
    _, a, b = align_sequences(bits, got, max_lag=24)
    assert a.size > 450
    assert np.mean(a[8:] != b[8:]) == 0.0


def test_fsk_chain_demods_msk_noisy():
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, 1024)
    got = _demod_gmsk(bits, decim=4, sps=8, center=0.07, bt=None,
                      snr_db=12.0, rng=rng)
    _, a, b = align_sequences(bits, got, max_lag=24)
    assert a.size > 900
    ber = float(np.mean(a[8:] != b[8:]))
    assert ber < 0.01, ber
