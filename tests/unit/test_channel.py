"""Channel models (testing/channel.py): fading statistics, phase-noise
growth, SNR calibration, and closing the loop with the estimators."""

import numpy as np
from scipy.special import j0

import jax
import jax.numpy as jnp

from srcdsp_tpu.testing.channel import (
    add_noise_snr, jakes_fading, multipath_apply, phase_noise, rayleigh_taps,
)
from srcdsp_tpu.testing.signals import tone


def test_multipath_matches_convolve():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(512) + 1j * rng.standard_normal(512)
         ).astype(np.complex64)
    h = np.asarray([1.0, 0.4 - 0.2j, 0.1j], np.complex64)
    got = np.asarray(multipath_apply(jnp.asarray(h), jnp.asarray(x)))
    want = np.convolve(x, h)[:512]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_rayleigh_taps_pdp():
    """Tap powers follow the exponential PDP; total power ~ 1."""
    keys = jax.random.split(jax.random.PRNGKey(0), 4096)
    taps = jax.vmap(lambda k: rayleigh_taps(k, 6, decay=1.5))(keys)
    p = np.mean(np.abs(np.asarray(taps)) ** 2, axis=0)
    np.testing.assert_allclose(p.sum(), 1.0, atol=0.05)
    ratio = p[1:] / p[:-1]
    np.testing.assert_allclose(ratio, np.exp(-1 / 1.5), atol=0.08)


def test_jakes_fading_statistics():
    """Unit power, Rayleigh envelope moments, J0 autocorrelation."""
    keys = jax.random.split(jax.random.PRNGKey(1), 256)
    fd, n = 0.01, 2048
    g = np.asarray(jax.vmap(lambda k: jakes_fading(k, n, fd))(keys))
    np.testing.assert_allclose(np.mean(np.abs(g) ** 2), 1.0, atol=0.05)
    # Rayleigh: E|g| = sqrt(pi/4) for unit power
    np.testing.assert_allclose(np.mean(np.abs(g)), np.sqrt(np.pi / 4),
                               atol=0.03)
    # autocorrelation ~ J0(2 pi fd tau) at a few lags
    for lag in (10, 25, 50):
        r = np.mean(g[:, lag:] * np.conj(g[:, :-lag])).real
        np.testing.assert_allclose(r, j0(2 * np.pi * fd * lag), atol=0.08)


def test_phase_noise_wiener_growth():
    keys = jax.random.split(jax.random.PRNGKey(2), 512)
    lw, n = 1e-5, 4096
    pn = np.asarray(jax.vmap(lambda k: phase_noise(k, n, lw))(keys))
    np.testing.assert_allclose(np.abs(pn), 1.0, atol=1e-5)
    th = np.unwrap(np.angle(pn), axis=-1)
    v = np.var(th, axis=0)
    want = 2 * np.pi * lw * np.arange(1, n + 1)
    sl = slice(500, 4000)
    np.testing.assert_allclose(v[sl] / want[sl], 1.0, atol=0.2)


def test_add_noise_snr_calibrated():
    x = tone(1 << 16, 0.1)
    y = add_noise_snr(jax.random.PRNGKey(3), x, 20.0)
    err = np.asarray(y) - np.asarray(x)
    snr = 10 * np.log10(np.mean(np.abs(np.asarray(x)) ** 2)
                        / np.mean(np.abs(err) ** 2))
    assert abs(snr - 20.0) < 0.3, snr


def test_estimators_recover_injected_impairments():
    """Close the loop with ops.impairments: injected CFO and IQ imbalance
    are recovered by the framework's own estimators."""
    from srcdsp_tpu.ops.impairments import (
        cfo_fft_peak, iq_imbalance_apply, iq_imbalance_estimate)
    x = tone(1 << 14, 0.0123)
    eps = float(cfo_fft_peak(add_noise_snr(jax.random.PRNGKey(4), x, 30.0)))
    assert abs(eps - 0.0123) < 1e-4
    rng = np.random.default_rng(5)
    z = (rng.standard_normal(1 << 15) + 1j * rng.standard_normal(1 << 15)
         ).astype(np.complex64) / np.sqrt(2)
    y = iq_imbalance_apply(jnp.asarray(z), g=1.12, phi=0.08)
    g_hat, phi_hat = iq_imbalance_estimate(y)
    assert abs(float(g_hat) - 1.12) < 0.02
    assert abs(float(phi_hat) - 0.08) < 0.01
