"""Front-end impairment estimators/correctors tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srcdsp_tpu.ops.impairments import (
    cfo_fft_peak, cfo_kay, dc_offset, iq_imbalance_apply,
    iq_imbalance_correct, iq_imbalance_estimate, moments_init,
    moments_update, snr_m2m4)


def _circular(n, seed=0):
    rng = np.random.default_rng(seed)
    return ((rng.standard_normal(n) + 1j * rng.standard_normal(n))
            / np.sqrt(2)).astype(np.complex64)


def test_iq_imbalance_roundtrip():
    y = _circular(1 << 16, seed=1)
    g_true, phi_true = 1.12, 0.07
    bad = iq_imbalance_apply(jnp.asarray(y), g_true, phi_true)
    g, phi = iq_imbalance_estimate(bad)
    assert abs(float(g) - g_true) < 0.01, float(g)
    assert abs(float(phi) - phi_true) < 0.005, float(phi)
    fixed = iq_imbalance_correct(bad, g, phi)
    # image rejection: circularity statistic E[y^2] returns to ~0
    circ_bad = abs(complex(jnp.mean(bad ** 2)))
    circ_fixed = abs(complex(jnp.mean(fixed ** 2)))
    assert circ_bad > 0.05
    assert circ_fixed < 0.005, circ_fixed


def test_iq_imbalance_image_rejection_on_tone():
    """A tone at +f with IQ imbalance grows an image at -f; correction
    pushes the image back below -40 dBc."""
    n = 1 << 14
    k = np.arange(n)
    y = np.exp(2j * np.pi * 0.123 * k).astype(np.complex64)
    bad = iq_imbalance_apply(jnp.asarray(y), 1.1, 0.1)
    # estimate from noise-like stats needs a circular signal; a single
    # tone IS circular over full cycles, so the estimator still works
    g, phi = iq_imbalance_estimate(bad)
    fixed = iq_imbalance_correct(bad, g, phi)

    def image_dbc(v):
        spec = np.abs(np.fft.fft(np.asarray(v)))
        pk = int(round(0.123 * n))
        return 20 * np.log10(spec[n - pk] / spec[pk])

    assert image_dbc(bad) > -25.0
    assert image_dbc(fixed) < -40.0, image_dbc(fixed)


def test_moments_streaming_matches_oneshot():
    y = _circular(1 << 14, seed=2)
    bad = iq_imbalance_apply(jnp.asarray(y), 1.08, -0.05)
    st = moments_init()
    upd = jax.jit(moments_update)
    for blk in np.split(np.asarray(bad), 8):
        st = upd(st, jnp.asarray(blk))
    g_s, phi_s = iq_imbalance_estimate(st)
    g_o, phi_o = iq_imbalance_estimate(bad)
    np.testing.assert_allclose(float(g_s), float(g_o), rtol=1e-5)
    np.testing.assert_allclose(float(phi_s), float(phi_o), atol=1e-6)


def test_dc_offset():
    y = _circular(1 << 14, seed=3) + (0.05 - 0.02j)
    dc = dc_offset(jnp.asarray(y))
    assert abs(complex(dc) - (0.05 - 0.02j)) < 0.01


@pytest.mark.parametrize("f0", [0.001, 0.0304, -0.2, 0.437])
def test_cfo_kay(f0):
    n = 4096
    rng = np.random.default_rng(4)
    y = np.exp(2j * np.pi * f0 * np.arange(n))
    y = (y + 0.02 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
         ).astype(np.complex64)
    f = float(cfo_kay(jnp.asarray(y)))
    assert abs(f - f0) < 1e-4, f


def test_cfo_fft_peak_subbin():
    n = 4096
    f0 = 100.37 / n          # deliberately off-bin
    rng = np.random.default_rng(5)
    y = np.exp(2j * np.pi * f0 * np.arange(n))
    y = (y + 0.05 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
         ).astype(np.complex64)
    f = float(cfo_fft_peak(jnp.asarray(y)))
    # parabolic interpolation: well under half a bin (the no-interp floor)
    assert abs(f - f0) < 0.25 / n, (f, f0)


def test_cfo_fft_peak_negative_freq():
    n = 2048
    f0 = -0.17
    y = np.exp(2j * np.pi * f0 * np.arange(n)).astype(np.complex64)
    f = float(cfo_fft_peak(jnp.asarray(y)))
    assert abs(f - f0) < 1e-3


@pytest.mark.parametrize("snr_db", [5.0, 10.0, 20.0])
def test_snr_m2m4_psk(snr_db):
    n = 1 << 16
    rng = np.random.default_rng(6)
    s = np.exp(1j * (np.pi / 4 + np.pi / 2 * rng.integers(0, 4, n)))
    npow = 10 ** (-snr_db / 10)
    y = (s + np.sqrt(npow / 2) * (rng.standard_normal(n)
                                  + 1j * rng.standard_normal(n))
         ).astype(np.complex64)
    est_db = 10 * np.log10(float(snr_m2m4(jnp.asarray(y))))
    assert abs(est_db - snr_db) < 0.5, est_db


def test_snr_m2m4_16qam_kurtosis():
    from srcdsp_tpu.chains.qam import qam_constellation
    n = 1 << 16
    rng = np.random.default_rng(7)
    const = np.asarray(qam_constellation(16))
    s = const[rng.integers(0, 16, n)]
    ka = float(np.mean(np.abs(const) ** 4) / np.mean(np.abs(const) ** 2) ** 2)
    snr_db = 15.0
    npow = 10 ** (-snr_db / 10)
    y = (s + np.sqrt(npow / 2) * (rng.standard_normal(n)
                                  + 1j * rng.standard_normal(n))
         ).astype(np.complex64)
    est_db = 10 * np.log10(float(snr_m2m4(jnp.asarray(y),
                                          kurtosis_signal=ka)))
    assert abs(est_db - snr_db) < 1.0, est_db


def test_multichannel():
    y = np.stack([_circular(8192, seed=8), _circular(8192, seed=9)])
    bad = iq_imbalance_apply(jnp.asarray(y), 1.1, 0.08)
    g, phi = iq_imbalance_estimate(bad)
    assert g.shape == (2,) and phi.shape == (2,)
    fixed = iq_imbalance_correct(bad, g, phi)
    circ = np.abs(np.asarray(jnp.mean(fixed ** 2, axis=-1)))
    assert np.all(circ < 0.01)


def test_impulse_blanker_saves_the_link():
    """Strong sparse impulses on a QPSK stream: unblanked demod carries
    symbol errors, pulse blanking restores SER 0 (and flags ~the right
    number of samples)."""
    from srcdsp_tpu.chains.psk import (
        diff_decode, diff_encode, make_psk_params, psk_apply, psk_init)
    from srcdsp_tpu.chains.tx import linear_tx_apply, linear_tx_init, \
        make_linear_tx, psk_map
    from srcdsp_tpu.ops.impairments import blank_impulses

    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.integers(0, 4, 1024))
    rxp = make_psk_params(0.0, decim=1, sps=4, order=4)
    txp = make_linear_tx(0.0, rxp.taps, sps=4)
    _, x = linear_tx_apply(txp, linear_tx_init(txp),
                           psk_map(diff_encode(data, 4), 4))
    x = np.asarray(x)
    n_imp = 40
    pos = rng.choice(x.size, n_imp, replace=False)
    x_bad = x.copy()
    x_bad[pos] += 30.0 * np.exp(2j * np.pi * rng.random(n_imp))

    def ser(sig):
        _, (rx, _) = jax.jit(psk_apply)(rxp, psk_init(rxp),
                                        jnp.asarray(sig.astype(np.complex64)))
        d = np.asarray(diff_decode(rx, 4))
        b = np.asarray(data)
        return min(float(np.mean(b[24:24 + 900] != d[24 + lag:24 + lag + 900]))
                   for lag in range(0, 17))

    assert ser(x_bad) > 0.01
    cleaned, mask = blank_impulses(jnp.asarray(x_bad.astype(np.complex64)))
    nb = int(np.asarray(mask).sum())
    assert n_imp <= nb <= 3 * n_imp, nb       # flags the impulses, not much else
    assert ser(np.asarray(cleaned)) == 0.0
