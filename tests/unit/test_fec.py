"""Convolutional encoder + Viterbi decoder vs an independent Python twin."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srcdsp_tpu.fec import (
    bpsk_soft, conv_encode, depuncture, make_conv_code, puncture,
    viterbi_decode, viterbi_decode_hard)

K3 = (3, (0o7, 0o5))          # classic (7,5) rate-1/2
K7 = (7, (0o133, 0o171))      # NASA/CCSDS rate-1/2


def encode_loop(k, gens, bits, terminate=True):
    """Bit-by-bit shift-register encoder (independent reference)."""
    u = list(int(b) for b in bits)
    if terminate:
        u += [0] * (k - 1)
    reg = 0
    out = []
    for bit in u:
        reg = ((reg >> 1) | (bit << (k - 1)))  # newest bit in MSB
        for g in gens:
            out.append(bin(reg & g).count("1") & 1)
    return np.array(out, np.int32)


@pytest.mark.parametrize("k,gens", [K3, K7])
def test_encoder_matches_loop(k, gens):
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 200)
    code = make_conv_code(k, gens)
    got = np.asarray(conv_encode(code, jnp.asarray(bits)))
    ref = encode_loop(k, gens, bits)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("k,gens", [K3, K7])
def test_clean_roundtrip(k, gens):
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, 500)
    code = make_conv_code(k, gens)
    coded = conv_encode(code, jnp.asarray(bits))
    dec = viterbi_decode(code, bpsk_soft(coded))
    np.testing.assert_array_equal(np.asarray(dec), bits)


def test_hard_decision_roundtrip():
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, 300)
    code = make_conv_code(*K7)
    coded = conv_encode(code, jnp.asarray(bits))
    dec = viterbi_decode_hard(code, coded)
    np.testing.assert_array_equal(np.asarray(dec), bits)


def test_hard_corrects_bit_errors():
    """K=7 corrects scattered hard errors well below the code's capability."""
    rng = np.random.default_rng(4)
    bits = rng.integers(0, 2, 1000)
    code = make_conv_code(*K7)
    coded = np.array(conv_encode(code, jnp.asarray(bits)))
    # flip ~1% of coded bits, spaced out (free distance 10 -> corrects
    # any 4 errors per constraint span)
    flips = rng.choice(coded.size, coded.size // 100, replace=False)
    coded[flips] ^= 1
    dec = viterbi_decode_hard(code, jnp.asarray(coded))
    np.testing.assert_array_equal(np.asarray(dec), bits)


def test_soft_beats_uncoded_at_low_snr():
    """Coded BER 0 over 4000 bits at Eb/N0 ~ 6 dB where uncoded has errors."""
    rng = np.random.default_rng(5)
    bits = rng.integers(0, 2, 4000)
    code = make_conv_code(*K7)
    coded = conv_encode(code, jnp.asarray(bits))
    # rate 1/2: Es/N0 = Eb/N0 - 3 dB. Eb/N0 = 6 dB -> sigma = 1/sqrt(2*Es/N0)
    ebn0 = 10 ** (6 / 10)
    sigma = float(1.0 / np.sqrt(2 * ebn0 * 0.5))
    soft = bpsk_soft(coded, jax.random.key(0), sigma)
    dec = viterbi_decode(code, soft)
    assert int(np.sum(np.asarray(dec) != bits)) == 0
    # uncoded BPSK at the same Eb/N0 has BER ~ 2e-3: expect errors
    unc = bpsk_soft(jnp.asarray(bits), jax.random.key(1), sigma / np.sqrt(2))
    hard = np.asarray(unc) < 0
    assert int(np.sum(hard != bits)) > 0


def test_batch_vmap():
    rng = np.random.default_rng(6)
    bits = rng.integers(0, 2, (4, 200))
    code = make_conv_code(*K3)
    coded = conv_encode(code, jnp.asarray(bits))
    assert coded.shape == (4, (200 + 2) * 2)
    dec = viterbi_decode(code, bpsk_soft(coded))
    np.testing.assert_array_equal(np.asarray(dec), bits)
    # jit + vmap compose
    dec2 = jax.jit(jax.vmap(lambda s: viterbi_decode(code, s)))(
        bpsk_soft(coded))
    np.testing.assert_array_equal(np.asarray(dec2), bits)


def test_punctured_rate_23():
    """Rate-2/3 punctured from K=7 rate-1/2 decodes via erasure insertion."""
    rng = np.random.default_rng(7)
    bits = rng.integers(0, 2, 600)
    code = make_conv_code(*K7)
    pattern = (1, 1, 0, 1)  # standard rate-2/3: drop every 3rd of 4
    coded = conv_encode(code, jnp.asarray(bits))
    sent = puncture(coded, pattern)
    assert sent.shape[-1] == coded.shape[-1] * 3 // 4
    soft = depuncture(bpsk_soft(sent), pattern)
    assert soft.shape == coded.shape
    dec = viterbi_decode(code, soft)
    np.testing.assert_array_equal(np.asarray(dec), bits)


def test_unterminated_mode():
    rng = np.random.default_rng(8)
    bits = rng.integers(0, 2, 400)
    code = make_conv_code(*K7)
    coded = conv_encode(code, jnp.asarray(bits), terminate=False)
    dec = np.asarray(viterbi_decode(code, bpsk_soft(coded),
                                    terminated=False))
    # free-running traceback: all but the last ~5K bits must be exact
    guard = 5 * code.k
    np.testing.assert_array_equal(dec[:-guard], bits[:-guard])
