"""FIR / decimating FIR vs scipy, plus streaming block-join exactness."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.signal as sps

from srcdsp_tpu.ops import fir
from srcdsp_tpu.ops.window import lowpass
from tests.conftest import snr_db


def _rand_iq(rng, *shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(np.complex64)


@pytest.mark.parametrize("num_taps,decim", [(64, 1), (64, 2), (33, 4), (1, 1), (128, 8)])
def test_fir_matches_scipy(rng, num_taps, decim):
    h = lowpass(num_taps, 0.2) if num_taps > 1 else np.array([0.7], np.float32)
    x = _rand_iq(rng, 4096)
    y = fir.fir_full(h, jnp.asarray(x), decim=decim)
    ref = sps.lfilter(h.astype(np.float64), [1.0], x.astype(np.complex128))[::decim]
    assert snr_db(ref, np.asarray(y)) > 120.0


def test_fir_complex_taps(rng):
    h = (lowpass(48, 0.25) * np.exp(2j * np.pi * 0.1 * np.arange(48))).astype(np.complex64)
    x = _rand_iq(rng, 2048)
    y = fir.fir_full(h, jnp.asarray(x))
    ref = sps.lfilter(h.astype(np.complex128), [1.0], x.astype(np.complex128))
    assert snr_db(ref, np.asarray(y)) > 110.0


def test_fir_multichannel(rng):
    h = lowpass(32, 0.2)
    x = _rand_iq(rng, 4, 1024)
    y = fir.fir_full(h, jnp.asarray(x), decim=2)
    for c in range(4):
        ref = sps.lfilter(h.astype(np.float64), [1.0], x[c].astype(np.complex128))[::2]
        assert snr_db(ref, np.asarray(y[c])) > 120.0


@pytest.mark.parametrize("decim,blocks", [(1, [512, 512]), (2, [256, 768]),
                                          (4, [128, 128, 512, 256]), (2, [1024])])
def test_fir_block_joins_bit_exact(rng, decim, blocks):
    """THE core streaming property: block-split output == whole-signal output,
    bit-for-bit (BASELINE.json: 'bit-exact block joins')."""
    h = lowpass(64, 0.2)
    n = sum(blocks)
    x = _rand_iq(rng, n)

    whole = fir.fir_full(h, jnp.asarray(x), decim=decim)

    st = fir.fir_init(64)
    outs = []
    apply_j = jax.jit(lambda s, xb: fir.fir_apply(h, s, xb, decim=decim))
    off = 0
    for b in blocks:
        st, y = apply_j(st, jnp.asarray(x[off:off + b]))
        outs.append(np.asarray(y))
        off += b
    streamed = np.concatenate(outs)
    np.testing.assert_array_equal(streamed, np.asarray(whole))


def test_fir_rejects_misaligned_block():
    h = lowpass(16, 0.2)
    st = fir.fir_init(16)
    with pytest.raises(ValueError):
        fir.fir_apply(h, st, jnp.zeros(100, jnp.complex64), decim=3)


def test_fir_per_channel_taps_vmap():
    """Per-channel tap sets via vmap (reference: per-channel C++ objects)."""
    taps = jnp.stack([jnp.asarray(lowpass(32, c)) for c in (0.1, 0.2, 0.3)])
    x = jnp.asarray(np.random.default_rng(0).standard_normal((3, 256))
                    + 1j * np.random.default_rng(1).standard_normal((3, 256))
                    ).astype(jnp.complex64)
    y = jax.vmap(lambda t, xc: fir.fir_full(t, xc))(taps, x)
    for c in range(3):
        yc = fir.fir_full(taps[c], x[c])
        np.testing.assert_allclose(np.asarray(y[c]), np.asarray(yc), atol=1e-6)
