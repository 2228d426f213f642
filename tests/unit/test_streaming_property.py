"""THE core streaming property (SURVEY.md §4.2): block-size invariance.

For every stateful op: processing a signal in arbitrary block splits, with
carried state, must equal whole-signal processing — bit-exactly where the
op's contract says so (BASELINE.json: "bit-exact block joins").
Randomized splits, multiple seeds.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srcdsp_tpu.ops.fftconv import fftconv_apply, fftconv_init, make_freq_response
from srcdsp_tpu.ops.fir import fir_apply, fir_full, fir_init
from srcdsp_tpu.ops.nco import freq_to_word, nco_apply, nco_init
from srcdsp_tpu.ops.resample import resample_apply, resample_init, resample_full
from srcdsp_tpu.ops.window import lowpass
from srcdsp_tpu.chains.channelizer import (
    channelize_apply, channelize_full, channelizer_init, design_prototype)
from srcdsp_tpu.testing.signals import complex_awgn


def _random_splits(rng, total: int, quantum: int):
    """Random partition of `total` into blocks, each a multiple of quantum."""
    units = total // quantum
    cuts = sorted(rng.choice(np.arange(1, units), size=min(5, units - 1),
                             replace=False)) if units > 1 else []
    bounds = [0] + [c * quantum for c in cuts] + [total]
    return [(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)]


@pytest.mark.parametrize("decim", [1, 4])
def test_fir_fixed_block_streaming_bit_exact(decim):
    """Fixed-size blocks (the production pattern): bit-exact joins — the
    same compiled conv reproduces every output's reduction order."""
    taps = jnp.asarray(lowpass(37, 0.1))
    x = complex_awgn(jax.random.PRNGKey(3), (decim * 512,))
    blk = decim * 64
    whole = np.asarray(fir_full(taps, x, decim=decim))
    st = fir_init(37)
    parts = []
    for a in range(0, x.shape[-1], blk):
        st, y = fir_apply(taps, st, x[a:a + blk], decim=decim)
        parts.append(y)
    np.testing.assert_array_equal(np.asarray(jnp.concatenate(parts)), whole)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("decim", [1, 4])
def test_fir_block_invariance(seed, decim):
    """Varying block sizes: ULP-exact (XLA may re-associate the conv
    reduction differently per input shape)."""
    rng = np.random.default_rng(seed)
    taps = jnp.asarray(lowpass(37, 0.1))
    x = complex_awgn(jax.random.PRNGKey(seed), (decim * 512,))
    whole = np.asarray(fir_full(taps, x, decim=decim))
    st = fir_init(37)
    parts = []
    for a, b in _random_splits(rng, x.shape[-1], decim):
        st, y = fir_apply(taps, st, x[a:b], decim=decim)
        parts.append(y)
    got = np.asarray(jnp.concatenate(parts))
    np.testing.assert_allclose(got, whole, rtol=0, atol=2e-6)


@pytest.mark.parametrize("seed", [0, 1])
def test_nco_block_invariance(seed):
    rng = np.random.default_rng(seed)
    word = freq_to_word(0.177)
    x = complex_awgn(jax.random.PRNGKey(seed + 10), (1024,))
    _, whole = nco_apply(word, nco_init(), x)
    st = nco_init()
    parts = []
    for a, b in _random_splits(rng, 1024, 1):
        st, y = nco_apply(word, st, x[a:b])
        parts.append(y)
    np.testing.assert_array_equal(
        np.asarray(jnp.concatenate(parts)), np.asarray(whole))


@pytest.mark.parametrize("up,down", [(3, 4), (7, 3)])
def test_resample_block_invariance(up, down):
    """Joins are ULP-exact, not bit-exact: each output's window and tap
    order are identical across splits, but XLA's conv may re-associate the
    reduction differently for different input shapes (~1 ULP)."""
    rng = np.random.default_rng(up * 10 + down)
    taps = jnp.asarray(lowpass(31, 0.25 / max(up, down)))
    quantum = down  # N*up % down == 0 guaranteed when N % down == 0
    x = complex_awgn(jax.random.PRNGKey(99), (quantum * 256,))
    whole = np.asarray(resample_full(taps, x, up, down))
    st = resample_init(31, up)
    parts = []
    for a, b in _random_splits(rng, x.shape[-1], quantum):
        st, y = resample_apply(taps, st, x[a:b], up, down)
        parts.append(y)
    got = np.asarray(jnp.concatenate(parts))
    np.testing.assert_allclose(got, whole, rtol=0, atol=2e-7)


def test_fftconv_block_invariance():
    rng = np.random.default_rng(7)
    taps = lowpass(129, 0.1)
    fft_size = 512
    hr = make_freq_response(taps, fft_size)
    hop = fft_size - 128
    x = complex_awgn(jax.random.PRNGKey(5), (hop * 16,))
    st = fftconv_init(129, fft_size, hop=hop)
    _, whole = fftconv_apply(hr, 129, st, x, hop=hop)
    st = fftconv_init(129, fft_size, hop=hop)
    parts = []
    for a, b in _random_splits(rng, x.shape[-1], hop):
        st, y = fftconv_apply(hr, 129, st, x[a:b], hop=hop)
        parts.append(y)
    # ULP-exact: same frames, same twiddles, but XLA's batched FFT may
    # round differently for different batch sizes
    np.testing.assert_allclose(np.asarray(jnp.concatenate(parts)),
                               np.asarray(whole), rtol=0, atol=1e-6)


def test_channelizer_block_invariance():
    rng = np.random.default_rng(11)
    m = 8
    h = design_prototype(m, taps_per_phase=4)
    x = complex_awgn(jax.random.PRNGKey(6), (m * 128,))
    whole = channelize_full(h, x, m)
    st = channelizer_init(h, m)
    parts = []
    for a, b in _random_splits(rng, x.shape[-1], m):
        st, y = channelize_apply(h, st, x[a:b], m)
        parts.append(y)
    np.testing.assert_array_equal(
        np.asarray(jnp.concatenate(parts, axis=-1)), np.asarray(whole))
