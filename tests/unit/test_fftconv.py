"""Overlap-save FFT convolution: equivalence with direct FIR + block joins."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from srcdsp_tpu.ops import fftconv, fir
from srcdsp_tpu.ops.window import lowpass
from tests.conftest import snr_db


def _rand_iq(rng, *shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(np.complex64)


@pytest.mark.parametrize("num_taps,fft_size", [(129, 512), (64, 256), (257, 4096)])
def test_fftconv_equals_direct_fir(rng, num_taps, fft_size):
    h = lowpass(num_taps, 0.15)
    hop = fftconv.default_hop(num_taps, fft_size)
    n = hop * 8
    x = _rand_iq(rng, n)
    y_fft = fftconv.fftconv_full(h, jnp.asarray(x), fft_size)
    y_dir = fir.fir_full(h, jnp.asarray(x))
    assert snr_db(np.asarray(y_dir), np.asarray(y_fft)) > 100.0


def test_fftconv_block_joins_bit_exact(rng):
    h = lowpass(129, 0.15)
    fft_size = 1024
    hop = fftconv.default_hop(129, fft_size)  # 896
    blocks = [hop, 3 * hop, 2 * hop]
    n = sum(blocks)
    x = _rand_iq(rng, n)

    whole = fftconv.fftconv_full(h, jnp.asarray(x), fft_size)

    H = fftconv.make_freq_response(h, fft_size)
    st = fftconv.fftconv_init(129, fft_size)
    apply_j = jax.jit(lambda s, xb: fftconv.fftconv_apply(H, 129, s, xb))
    outs, off = [], 0
    for b in blocks:
        st, y = apply_j(st, jnp.asarray(x[off:off + b]))
        outs.append(np.asarray(y))
        off += b
    np.testing.assert_array_equal(np.concatenate(outs), np.asarray(whole))


def test_fftconv_multichannel(rng):
    h = lowpass(65, 0.2)
    x = _rand_iq(rng, 16, 1920)  # 1920 = hop for fft 2048? no — use explicit hop
    hop = 960
    y = fftconv.fftconv_full(h, jnp.asarray(x), 1024, hop=hop)
    y_dir = fir.fir_full(h, jnp.asarray(x))
    assert snr_db(np.asarray(y_dir), np.asarray(y)) > 100.0


def test_bad_hop_rejected():
    with pytest.raises(ValueError):
        fftconv.fftconv_init(129, 1024, hop=1000)
