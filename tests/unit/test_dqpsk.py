"""pi/4-DQPSK chain (srcdsp_tpu.chains.dqpsk)."""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.chains.dqpsk import (
    dqpsk_baseband, dqpsk_demod_stream, dqpsk_slice, make_dqpsk_params,
)
from srcdsp_tpu.metrics import align_sequences
from srcdsp_tpu.testing.signals import tone


def _ser_skip_ref(tx, rx, max_lag=24, skip=1):
    """SER ignoring the first `skip` aligned symbols: the first
    differential decision differences against the filter-transient
    reference (the diff_decode convention), and with very small blocks
    the O&M timing accumulator needs a few blocks to converge."""
    lag, a, b = align_sequences(tx, rx, max_lag=max_lag)
    return float(np.mean(a[skip:] != b[skip:])), lag, a.size - skip


def _make_capture(dibits, decim, sps, center, rng=None, snr_db=None):
    bb = dqpsk_baseband(dibits, decim * sps)
    x = np.asarray(bb) * np.asarray(tone(bb.shape[-1], center))
    if snr_db is not None:
        p = np.mean(np.abs(x) ** 2)
        sigma = np.sqrt(p / 10 ** (snr_db / 10) / 2)
        x = x + sigma * (rng.standard_normal(x.shape)
                         + 1j * rng.standard_normal(x.shape))
    return x.astype(np.complex64)


def test_slice_exact_angles():
    z = np.exp(1j * (2 * np.arange(4) + 1) * np.pi / 4)
    got = np.asarray(dqpsk_slice(jnp.asarray(z.astype(np.complex64))))
    np.testing.assert_array_equal(got, np.arange(4))
    # well inside each quadrant too
    for d in range(4):
        for eps in (-0.3, 0.3):
            zz = np.exp(1j * ((2 * d + 1) * np.pi / 4 + eps))
            assert int(dqpsk_slice(jnp.asarray(np.complex64(zz)))) == d


def test_clean_roundtrip_ser0():
    rng = np.random.default_rng(0)
    decim, sps, center = 4, 8, 0.11
    dibits = rng.integers(0, 4, 256)
    x = _make_capture(dibits, decim, sps, center)
    n = (x.size // (decim * sps * 8)) * (decim * sps * 8)
    p = make_dqpsk_params(center, decim, sps)
    idx, z = jax.jit(
        lambda v: dqpsk_demod_stream(p, v, n // 8))(jnp.asarray(x[:n]))
    rate, lag, m = _ser_skip_ref(dibits, np.asarray(idx))
    assert m > 200
    assert rate == 0.0, f"SER {rate} at lag {lag}"


def test_cfo_tolerance_without_carrier_recovery():
    """A residual CFO that rotates the constellation through many full
    turns over the capture (fatal for a fixed coherent slicer) only
    biases the differential angle by well under pi/4 per symbol."""
    rng = np.random.default_rng(1)
    decim, sps, center = 4, 8, 0.11
    dibits = rng.integers(0, 4, 256)
    cfo = 0.0005         # cycles/sample -> 2pi*0.0005*32 = 0.10 rad/symbol
    x = _make_capture(dibits, decim, sps, center + cfo)
    n = (x.size // (decim * sps * 8)) * (decim * sps * 8)
    p = make_dqpsk_params(center, decim, sps)   # demod at NOMINAL center
    idx, _ = dqpsk_demod_stream(p, jnp.asarray(x[:n]), n // 8)
    rate, _, m = _ser_skip_ref(dibits, np.asarray(idx))
    assert m > 200 and rate == 0.0
    # sanity: the capture really does sweep several full constellation turns
    assert cfo * n > 3.0


def test_noisy_ser_low():
    rng = np.random.default_rng(2)
    decim, sps, center = 4, 8, 0.07
    dibits = rng.integers(0, 4, 512)
    x = _make_capture(dibits, decim, sps, center, rng=rng, snr_db=18.0)
    n = (x.size // (decim * sps * 8)) * (decim * sps * 8)
    p = make_dqpsk_params(center, decim, sps)
    idx, _ = dqpsk_demod_stream(p, jnp.asarray(x[:n]), n // 8)
    rate, _, m = _ser_skip_ref(dibits, np.asarray(idx))
    assert m > 400 and rate < 0.01, f"SER {rate}"


def test_streaming_agrees_after_timing_convergence():
    """Block size changes the O&M timing accumulator's early trajectory
    (per-block forgetting factor), so exact streaming equality holds only
    after convergence: both splits must decode SER 0 and agree
    symbol-for-symbol past the convergence region."""
    rng = np.random.default_rng(3)
    decim, sps, center = 4, 8, 0.11
    dibits = rng.integers(0, 4, 128)
    x = _make_capture(dibits, decim, sps, center)
    n = (x.size // (decim * sps * 16)) * (decim * sps * 16)
    p = make_dqpsk_params(center, decim, sps)
    i1, _ = dqpsk_demod_stream(p, jnp.asarray(x[:n]), n)           # 1 block
    i16, _ = dqpsk_demod_stream(p, jnp.asarray(x[:n]), n // 16)    # 16
    for got in (i1, i16):
        rate, _, m = _ser_skip_ref(dibits, np.asarray(got), skip=8)
        assert m > 100 and rate == 0.0
    np.testing.assert_array_equal(np.asarray(i1)[32:], np.asarray(i16)[32:])


def test_vmap_channels():
    rng = np.random.default_rng(4)
    decim, sps, center = 4, 8, 0.11
    dibits = rng.integers(0, 4, (3, 128))
    x = np.stack([_make_capture(dibits[c], decim, sps, center)
                  for c in range(3)])
    n = (x.shape[-1] // (decim * sps * 8)) * (decim * sps * 8)
    p = make_dqpsk_params(center, decim, sps)
    idx, _ = dqpsk_demod_stream(p, jnp.asarray(x[:, :n]), n // 8,
                                channel_shape=(3,))
    for c in range(3):
        rate, _, m = _ser_skip_ref(dibits[c], np.asarray(idx)[c], skip=12)
        assert m > 100 and rate == 0.0, c
