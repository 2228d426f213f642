"""NCO: frequency accuracy, phase continuity, bit-exact block joins."""

import numpy as np
import jax.numpy as jnp
import pytest

from srcdsp_tpu.ops import nco
from tests.conftest import snr_db


def test_phasor_matches_float64_model():
    f = 0.112
    word = nco.freq_to_word(f)
    fq = float(word) / 2**32  # quantized frequency actually synthesized
    st = nco.nco_init()
    _, w = nco.nco_phasor(word, st, 4096)
    k = np.arange(4096, dtype=np.float64)
    ref = np.exp(2j * np.pi * ((fq * k) % 1.0))
    assert snr_db(ref, np.asarray(w)) > 100.0


def test_negative_freq():
    word = nco.freq_to_word(-0.25)
    st = nco.nco_init()
    _, w = nco.nco_phasor(word, st, 64)
    ref = np.exp(-2j * np.pi * 0.25 * np.arange(64))
    assert snr_db(ref, np.asarray(w)) > 100.0


@pytest.mark.parametrize("blocks", [[1000, 24], [7, 7, 7, 1003], [512, 512]])
def test_block_joins_bit_exact(blocks):
    """u32 accumulator makes any block split produce identical bits."""
    word = nco.freq_to_word(0.0371)
    n = sum(blocks)
    st = nco.nco_init()
    _, whole = nco.nco_phasor(word, st, n)

    st = nco.nco_init()
    outs = []
    for b in blocks:
        st, w = nco.nco_phasor(word, st, b)
        outs.append(np.asarray(w))
    np.testing.assert_array_equal(np.concatenate(outs), np.asarray(whole))


def test_long_stream_no_drift():
    """After 100M samples (in u32 arithmetic), phase is still exact."""
    word = nco.freq_to_word(0.3)
    st = nco.nco_init()
    # jump ahead 100e6 samples by repeated application of the state update
    big = nco.NcoState(phase=(st.phase + jnp.uint32(100_000_000) * jnp.asarray(word)))
    _, w = nco.nco_phasor(word, big, 16)
    expected_phase = (int(word) * 100_000_000) % 2**32
    k = np.arange(16, dtype=np.float64)
    ref = np.exp(2j * np.pi * (((expected_phase + int(word) * k) % 2**32) / 2**32))
    assert snr_db(ref, np.asarray(w)) > 90.0


def test_mix_shifts_frequency(rng):
    from srcdsp_tpu.testing.signals import tone
    x = tone(2048, 0.1)
    st = nco.nco_init()
    _, y = nco.nco_apply(nco.freq_to_word(0.2), st, x)
    spec = np.fft.fft(np.asarray(y))
    peak = np.argmax(np.abs(spec)) / 2048
    assert abs(peak - 0.3) < 1e-3


def test_per_channel_freqs():
    words = nco.freq_to_word(np.array([0.1, -0.1, 0.25]))
    st = nco.nco_init(channel_shape=(3,))
    _, w = nco.nco_phasor(jnp.asarray(words), st, 256)
    assert w.shape == (3, 256)
    for c, f in enumerate([0.1, -0.1, 0.25]):
        ref = np.exp(2j * np.pi * ((f * np.arange(256)) % 1.0))
        assert snr_db(ref, np.asarray(w[c])) > 90.0
