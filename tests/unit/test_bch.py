"""Binary BCH codec (bch.py): generator/structure checks against
published code parameters, an independent polynomial-division encode
twin, full t-error correction, >t detection, and the POCSAG (31,21)
instance."""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.bch import bch_decode, bch_encode, make_bch_code


def _encode_twin(gen: np.ndarray, msg_bits: np.ndarray, n: int) -> np.ndarray:
    """Independent systematic encoder: long division of m(x)*x^{n-k}
    by g(x) with python ints."""
    r = len(gen) - 1
    g = 0
    for b in gen:
        g = (g << 1) | int(b)
    val = 0
    for b in msg_bits:
        val = (val << 1) | int(b)
    val <<= r
    for shift in range(len(msg_bits) - 1, -1, -1):
        if val & (1 << (shift + r)):
            val ^= g << shift
    return np.asarray([(val >> (r - 1 - i)) & 1 for i in range(r)],
                      np.int32)


def test_published_code_parameters():
    # (31,21) t=2 — POCSAG; (31,16) t=3; (63,45) t=3; (255,239) t=2
    for m, t, n, k in [(5, 2, 31, 21), (5, 3, 31, 16),
                       (6, 3, 63, 45), (8, 2, 255, 239)]:
        code = make_bch_code(m, t)
        assert (code.n, code.k) == (n, k), (m, t, code.n, code.k)
    # the POCSAG generator is the published 0x769 (x^10+x^9+x^8+x^6+
    # x^5+x^3+1, often written 1100101001 1 -> 0x769 includes x^10)
    code = make_bch_code(5, 2)
    g = 0
    for b in code.gen:
        g = (g << 1) | int(b)
    assert g == 0x769, hex(g)


def test_encode_matches_long_division_twin():
    code = make_bch_code(5, 2)
    rng = np.random.default_rng(0)
    msgs = rng.integers(0, 2, (16, code.k)).astype(np.int32)
    cw = np.asarray(bch_encode(code, jnp.asarray(msgs)))
    for i in range(len(msgs)):
        np.testing.assert_array_equal(cw[i, :code.k], msgs[i])
        np.testing.assert_array_equal(
            cw[i, code.k:], _encode_twin(code.gen, msgs[i], code.n))
    # every codeword's syndrome is zero (decode clean)
    dec, ok = bch_decode(code, jnp.asarray(cw))
    assert bool(np.all(np.asarray(ok)))
    np.testing.assert_array_equal(np.asarray(dec), msgs)


def test_corrects_up_to_t_and_flags_beyond():
    rng = np.random.default_rng(1)
    for m, t in [(5, 2), (6, 3)]:
        code = make_bch_code(m, t)
        msgs = rng.integers(0, 2, (32, code.k)).astype(np.int32)
        cw = np.asarray(bch_encode(code, jnp.asarray(msgs)))
        bad = cw.copy()
        for i in range(len(bad)):
            ne = rng.integers(1, t + 1)
            pos = rng.choice(code.n, ne, replace=False)
            bad[i, pos] ^= 1
        dec, ok = bch_decode(code, jnp.asarray(bad))
        assert bool(np.all(np.asarray(ok))), (m, t)
        np.testing.assert_array_equal(np.asarray(dec), msgs)

        # t+2 errors: must not silently pass as a DIFFERENT message —
        # either flagged not-ok or (rarely) decoded to a valid codeword;
        # count silent miscorrections to the true message as impossible
        worse = cw.copy()
        for i in range(len(worse)):
            pos = rng.choice(code.n, t + 2, replace=False)
            worse[i, pos] ^= 1
        dec2, ok2 = bch_decode(code, jnp.asarray(worse))
        wrong_and_ok = np.asarray(ok2) & np.any(
            np.asarray(dec2) != msgs, axis=-1)
        flagged = ~np.asarray(ok2)
        # every word is either flagged or decoded to SOME codeword;
        # none may claim ok while equal to the original message with
        # t+2 flips outside the correction radius
        silently_right = np.asarray(ok2) & np.all(
            np.asarray(dec2) == msgs, axis=-1)
        assert not np.any(silently_right)
        assert np.all(flagged | wrong_and_ok)


def test_pocsag_batch_jit():
    code = make_bch_code(5, 2)
    rng = np.random.default_rng(2)
    msgs = rng.integers(0, 2, (64, 21)).astype(np.int32)
    enc = jax.jit(lambda v: bch_encode(code, v))
    dec = jax.jit(lambda v: bch_decode(code, v))
    cw = enc(jnp.asarray(msgs))
    bad = np.asarray(cw).copy()
    bad[:, 3] ^= 1
    bad[:, 27] ^= 1
    out, ok = dec(jnp.asarray(bad))
    assert bool(np.all(np.asarray(ok)))
    np.testing.assert_array_equal(np.asarray(out), msgs)


def test_shortened_code():
    """Shortened (26, 16) from (31, 21): roundtrip, correction, and a
    'correction' into the implicit zero prefix is rejected."""
    code = make_bch_code(5, 2)
    s = 5
    rng = np.random.default_rng(3)
    msgs = rng.integers(0, 2, (16, code.k - s)).astype(np.int32)
    cw = np.asarray(bch_encode(code, jnp.asarray(msgs), shorten=s))
    assert cw.shape[-1] == code.n - s
    bad = cw.copy()
    bad[:, 2] ^= 1
    bad[:, 19] ^= 1
    dec, ok = bch_decode(code, jnp.asarray(bad), shorten=s)
    assert bool(np.all(np.asarray(ok)))
    np.testing.assert_array_equal(np.asarray(dec), msgs)
