"""Farrow arbitrary-ratio resampler tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srcdsp_tpu.ops.farrow import (
    farrow_apply, farrow_capacity, farrow_init, make_farrow_ratio,
    np_farrow)


def _collect(x, l_out, m_in, nblocks=1, channel_shape=()):
    st = farrow_init(channel_shape)
    f = jax.jit(lambda s, b: farrow_apply(s, b, l_out, m_in))
    outs = []
    for blk in np.split(np.asarray(x), nblocks, axis=-1):
        st, (y, valid) = f(st, jnp.asarray(blk))
        v = np.asarray(valid)
        outs.append(np.asarray(y)[..., v])
    return np.concatenate(outs, axis=-1)


def test_ratio_reduction():
    assert make_farrow_ratio(48000, 44100) == (160, 147)
    assert make_farrow_ratio(3, 4) == (3, 4)


@pytest.mark.parametrize("l_out,m_in", [(160, 147), (147, 160), (1, 3),
                                        (3, 1), (1000, 997)])
def test_matches_sequential_twin(l_out, m_in):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(2048) + 1j * rng.standard_normal(2048)
         ).astype(np.complex64)
    got = _collect(x, l_out, m_in)
    ref = np_farrow(x, l_out, m_in)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_cubic_exact_on_polynomials():
    """Lagrange-3 reproduces degree-<=3 signals exactly: resampling the
    cubic n^3 yields t^3 at every fractional output point."""
    n = 512
    t_in = np.arange(n, dtype=np.float64)
    x = ((t_in / n) ** 3).astype(np.float32)
    l_out, m_in = 7, 3
    st = farrow_init(dtype=jnp.float32)
    st, (y, valid) = farrow_apply(st, jnp.asarray(x), l_out, m_in)
    got = np.asarray(y)[np.asarray(valid)]
    m = np.arange(got.size)
    t_out = m * m_in / l_out
    # first outputs interpolate inside the zero tail; skip past them
    ref = (t_out / n) ** 3
    sl = slice(4, None)
    np.testing.assert_allclose(got[sl], ref[sl], rtol=0, atol=2e-6)


def test_streaming_matches_oneshot_bit_exact():
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)
         ).astype(np.complex64)
    l_out, m_in = 160, 147
    one = _collect(x, l_out, m_in, nblocks=1)
    # 8-block streaming must be BIT-exact (integer phase, same windows)
    many = _collect(x, l_out, m_in, nblocks=8)
    np.testing.assert_array_equal(one, many)


def test_tone_quality_441_to_48():
    f0 = 0.05
    n = 1 << 14
    x = np.exp(2j * np.pi * f0 * np.arange(n)).astype(np.complex64)
    l_out, m_in = make_farrow_ratio(48000, 44100)
    y = _collect(x, l_out, m_in, nblocks=4)[64:]
    # output tone frequency scales by m_in/l_out
    f_out = f0 * m_in / l_out
    k = np.arange(y.size)
    ref = np.exp(2j * np.pi * f_out * k)
    # remove the constant phase from the skipped prefix
    rot = np.vdot(ref, y)
    rot /= abs(rot)
    err = y - ref * rot
    snr = 10 * np.log10(np.mean(np.abs(y) ** 2) / np.mean(np.abs(err) ** 2))
    assert snr > 60.0, snr


def test_counts_and_capacity():
    n, l_out, m_in = 1000, 7, 13
    x = np.zeros(n, np.complex64)
    st = farrow_init()
    st, (y, valid) = farrow_apply(st, jnp.asarray(x), l_out, m_in)
    assert y.shape[-1] == farrow_capacity(n, l_out, m_in)
    n_out = int(np.asarray(valid).sum())
    # ~ n*L/M outputs
    assert abs(n_out - n * l_out / m_in) <= 2
    # valid lanes form a prefix
    v = np.asarray(valid)
    assert np.all(v[: n_out]) and not np.any(v[n_out:])


def test_multichannel_vmap():
    rng = np.random.default_rng(2)
    x = (rng.standard_normal((3, 1024))
         + 1j * rng.standard_normal((3, 1024))).astype(np.complex64)
    got = _collect(x, 8, 5, channel_shape=(3,))
    for c in range(3):
        ref = np_farrow(x[c], 8, 5)
        np.testing.assert_allclose(got[c], ref, atol=2e-6)
