"""Batched Pallas FFT kernel vs numpy and the XLA plane FFT (interpret)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srcdsp_tpu.kernels.fft_pallas import ifft_pallas, make_fft_kernel
from srcdsp_tpu.ops.fft_planes import make_fft_planes


def _snr_db(ref, got):
    err = ref - got
    return 10 * np.log10(np.mean(np.abs(ref) ** 2)
                         / (np.mean(np.abs(err) ** 2) + 1e-30))


@pytest.mark.parametrize("n,n2,b_frames", [(4096, 128, 4), (2048, 128, 2),
                                           (1024, 128, 8)])
def test_matches_numpy(n, n2, b_frames):
    k = make_fft_kernel(n, n2=n2, b_frames=b_frames, interpret=True)
    rng = np.random.default_rng(0)
    bt = 2 * b_frames
    x = (rng.standard_normal((bt, n)) + 1j * rng.standard_normal((bt, n)))
    xr = jnp.asarray(x.real.astype(np.float32))
    xi = jnp.asarray(x.imag.astype(np.float32))
    yr, yi = k.fn(xr, xi)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    ref = np.fft.fft(x.astype(np.complex64), axis=-1)
    assert _snr_db(ref, got) > 110


def test_matches_plane_fft():
    k = make_fft_kernel(4096, b_frames=4, interpret=True)
    plane = make_fft_planes(4096)
    rng = np.random.default_rng(1)
    xr = jnp.asarray(rng.standard_normal((8, 4096)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((8, 4096)).astype(np.float32))
    yr, yi = k.fn(xr, xi)
    pr, pi = plane(xr, xi)
    assert _snr_db(np.asarray(pr), np.asarray(yr)) > 120
    assert _snr_db(np.asarray(pi), np.asarray(yi)) > 120


def test_transposed_digit_layout():
    """natural_order=False returns X[k1 + n1*k2] at frame row k1, lane k2."""
    k = make_fft_kernel(1024, n2=128, b_frames=2, natural_order=False,
                        interpret=True)
    n1 = k.n1
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 1024)).astype(np.float32)
    yr, yi = k.fn(jnp.asarray(x), jnp.zeros_like(jnp.asarray(x)))
    got = (np.asarray(yr) + 1j * np.asarray(yi)).reshape(2, n1, 128)
    ref = np.fft.fft(x.astype(np.complex64), axis=-1).reshape(2, 128, n1)
    assert _snr_db(ref.swapaxes(-1, -2), got) > 110


def test_ifft_round_trip():
    k = make_fft_kernel(2048, b_frames=2, interpret=True)
    rng = np.random.default_rng(3)
    xr = jnp.asarray(rng.standard_normal((4, 2048)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((4, 2048)).astype(np.float32))
    yr, yi = k.fn(xr, xi)
    rr, ri = ifft_pallas(k, yr, yi)
    assert _snr_db(np.asarray(xr), np.asarray(rr)) > 110
    assert _snr_db(np.asarray(xi), np.asarray(ri)) > 110


def test_in_kernel_unscramble_interpret():
    """natural_order='kernel' (interpret-only: Mosaic rejects the final
    sublane-to-lane shape cast on hardware — see make_fft_kernel docs)."""
    k = make_fft_kernel(4096, b_frames=4, natural_order="kernel",
                        interpret=True)
    rng = np.random.default_rng(5)
    x = (rng.standard_normal((8, 4096)) + 1j * rng.standard_normal((8, 4096)))
    yr, yi = k.fn(jnp.asarray(x.real.astype(np.float32)),
                  jnp.asarray(x.imag.astype(np.float32)))
    got = np.asarray(yr) + 1j * np.asarray(yi)
    ref = np.fft.fft(x.astype(np.complex64), axis=-1)
    assert _snr_db(ref, got) > 110
