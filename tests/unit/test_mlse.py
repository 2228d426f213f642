"""MLSE equalizer (chains/mlse.py): trellis detection over ISI channels."""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.chains.mlse import make_mlse, mlse_equalize
from srcdsp_tpu.demap import psk_points


def _channel_out(h, sym):
    return np.convolve(sym, np.asarray(h))[: sym.size]


def test_flat_channel_is_nearest_point():
    tr = make_mlse([1.0], order=4)
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 4, 128)
    pts = np.asarray(psk_points(4))
    y = pts[idx] + 0.05 * (rng.standard_normal(128)
                           + 1j * rng.standard_normal(128))
    got = np.asarray(mlse_equalize(tr, jnp.asarray(y.astype(np.complex64))))
    np.testing.assert_array_equal(got, idx)


def test_spectral_null_channel_clean():
    """h = [0.5, 0.71, 0.5] has a deep in-band null: raw slicing is
    hopeless, MLSE recovers the exact sequence."""
    h = np.asarray([0.5, 0.7071, 0.5])
    tr = make_mlse(h, order=2)
    rng = np.random.default_rng(1)
    idx = rng.integers(0, 2, 512)
    pts = np.asarray(psk_points(2))
    y = _channel_out(h, pts[idx])
    raw = np.argmin(np.abs(y[:, None] - pts[None, :]), axis=1)
    assert np.mean(raw[4:] != idx[4:]) > 0.15       # slicer fails
    got = np.asarray(mlse_equalize(tr, jnp.asarray(y.astype(np.complex64))))
    np.testing.assert_array_equal(got[4:], idx[4:])


def test_noisy_isi_bpsk():
    """12 dB symbol SNR on the null channel: MLSE holds a low BER where
    the memoryless slicer is stuck at ~25%."""
    h = np.asarray([0.5, 0.7071, 0.5])
    tr = make_mlse(h, order=2)
    rng = np.random.default_rng(2)
    idx = rng.integers(0, 2, 8192)
    pts = np.asarray(psk_points(2))
    y = _channel_out(h, pts[idx])
    sigma = np.sqrt(np.mean(np.abs(y) ** 2) / 10 ** 1.2 / 2)
    y = y + sigma * (rng.standard_normal(y.size)
                     + 1j * rng.standard_normal(y.size))
    raw = np.argmin(np.abs(y[:, None] - pts[None, :]), axis=1)
    raw_ber = float(np.mean(raw[4:] != idx[4:]))
    got = np.asarray(mlse_equalize(tr, jnp.asarray(y.astype(np.complex64))))
    ber = float(np.mean(got[4:] != idx[4:]))
    assert raw_ber > 0.15, raw_ber
    assert ber < 0.02, (ber, raw_ber)


def test_qpsk_memory_one():
    h = np.asarray([1.0, 0.6j])
    tr = make_mlse(h, order=4)
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 4, 1024)
    pts = np.asarray(psk_points(4))
    y = _channel_out(h, pts[idx])
    y = y + 0.05 * (rng.standard_normal(y.size)
                    + 1j * rng.standard_normal(y.size))
    got = np.asarray(mlse_equalize(tr, jnp.asarray(y.astype(np.complex64))))
    assert np.mean(got[2:] != idx[2:]) == 0.0
