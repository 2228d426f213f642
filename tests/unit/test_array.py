"""Array processing (array.py): steering, covariance, Bartlett/MVDR/MUSIC,
beamforming SINR."""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.array import (
    bartlett_spectrum, beamform, cov_finalize, cov_init, cov_update,
    mvdr_spectrum, mvdr_weights, music_spectrum, sample_covariance,
    ula_steering,
)


def _scene(e=8, n=4096, thetas=(-0.35, 0.6), powers=(1.0, 1.0),
           noise=0.1, seed=0):
    """Two far-field tones + white noise on an E-element half-lambda ULA."""
    rng = np.random.default_rng(seed)
    a = np.asarray(ula_steering(e, 0.5, jnp.asarray(thetas)))   # [S, E]
    x = np.zeros((e, n), np.complex128)
    for s, p in enumerate(powers):
        sig = np.sqrt(p / 2) * (rng.standard_normal(n)
                                + 1j * rng.standard_normal(n))
        x += a[s][:, None] * sig[None, :]
    x += np.sqrt(noise / 2) * (rng.standard_normal((e, n))
                               + 1j * rng.standard_normal((e, n)))
    return jnp.asarray(x.astype(np.complex64)), a


def test_steering_properties():
    a = np.asarray(ula_steering(8, 0.5, jnp.asarray([0.0, 0.3])))
    np.testing.assert_allclose(a[0], 1.0, atol=1e-6)      # broadside: all 1
    np.testing.assert_allclose(np.abs(a), 1.0, atol=1e-6)
    # element phase progression at theta: -2pi*0.5*sin(theta)*e
    ph = np.angle(a[1][1])
    np.testing.assert_allclose(ph, -2 * np.pi * 0.5 * np.sin(0.3), atol=1e-5)


def test_streaming_covariance_matches_oneshot():
    x, _ = _scene(n=2048)
    r1 = np.asarray(sample_covariance(x, loading=0.01))
    st = cov_init(8)
    for blk in jnp.split(x, 4, axis=-1):
        st = cov_update(st, blk)
    r2 = np.asarray(cov_finalize(st, loading=0.01))
    np.testing.assert_allclose(r2, r1, atol=1e-4)
    # Hermitian PSD
    np.testing.assert_allclose(r1, r1.conj().T, atol=1e-5)
    assert np.linalg.eigvalsh(r1).min() > 0


def _peaks(spec, grid, k):
    """Indices of the k largest local maxima."""
    s = np.asarray(spec)
    loc = np.flatnonzero((s[1:-1] > s[:-2]) & (s[1:-1] > s[2:])) + 1
    return grid[loc[np.argsort(s[loc])[::-1][:k]]]


def test_doa_spectra_find_both_sources():
    thetas = (-0.35, 0.6)
    x, _ = _scene(thetas=thetas, n=8192)
    r = sample_covariance(x, loading=1e-3)
    grid = np.linspace(-1.2, 1.2, 961)
    steer = ula_steering(8, 0.5, jnp.asarray(grid))
    for name, spec, tol in (
            ("bartlett", bartlett_spectrum(r, steer), 0.05),
            ("mvdr", mvdr_spectrum(r, steer), 0.01),
            ("music", music_spectrum(r, steer, 2), 0.005)):
        got = np.sort(_peaks(spec, grid, 2))
        want = np.sort(np.asarray(thetas))
        np.testing.assert_allclose(got, want, atol=tol, err_msg=name)


def test_mvdr_beamformer_nulls_interferer():
    """Point at source 0: unit gain there, interferer suppressed."""
    thetas = (-0.35, 0.6)
    x, a = _scene(thetas=thetas, powers=(1.0, 10.0), n=8192, noise=0.01)
    r = sample_covariance(x, loading=1e-4)
    w = mvdr_weights(r, jnp.asarray(a[0].astype(np.complex64)))
    # distortionless toward the look direction
    g_look = np.abs(np.vdot(np.asarray(w), a[0]))
    np.testing.assert_allclose(g_look, 1.0, atol=1e-3)
    # interferer gain deeply suppressed relative to look gain
    g_int = np.abs(np.vdot(np.asarray(w), a[1]))
    assert 20 * np.log10(g_int / g_look) < -25.0
    y = beamform(w, x)
    assert y.shape == (8192,)


def test_music_sharper_than_bartlett():
    x, _ = _scene(thetas=(-0.05, 0.08), n=16384, noise=0.05)  # close pair
    r = sample_covariance(x, loading=1e-4)
    grid = np.linspace(-0.4, 0.4, 1601)
    steer = ula_steering(8, 0.5, jnp.asarray(grid))
    mus = music_spectrum(r, steer, 2)
    got = np.sort(_peaks(mus, grid, 2))
    np.testing.assert_allclose(got, [-0.05, 0.08], atol=0.01)
    # bartlett cannot resolve the pair (single fat lobe)
    bart = np.asarray(bartlett_spectrum(r, steer))
    loc = np.flatnonzero((bart[1:-1] > bart[:-2]) & (bart[1:-1] > bart[2:]))
    assert loc.size < 2


def test_batched_covariance_vmap():
    x, _ = _scene(n=1024)
    xb = jnp.stack([x, 2.0 * x])
    r = sample_covariance(xb)
    assert r.shape == (2, 8, 8)
    np.testing.assert_allclose(np.asarray(r[1]), 4.0 * np.asarray(r[0]),
                               rtol=1e-4)
