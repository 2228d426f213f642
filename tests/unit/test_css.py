"""CSS (chirp spread spectrum) unit tests: chirp algebra, demod under
noise, sync estimation, and the bit-layer primitives against
independently-written scalar twins."""

import numpy as np
import pytest

from srcdsp_tpu.chains import css


# ---------------------------------------------------------------------------
# chirp algebra
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("sf", [5, 7, 8])
def test_all_shifts_demod_exact(sf):
    p = css.make_css_params(sf=sf)
    ks = np.arange(p.n)
    x = css.css_modulate(p, ks)
    got, pk = css.css_demod(p, x)
    np.testing.assert_array_equal(np.asarray(got), ks)
    # dechirped tone is full-scale: |peak| == N (coherent sum)
    np.testing.assert_allclose(np.abs(np.asarray(pk)), p.n, rtol=1e-3)


def test_cyclic_shift_identity():
    # x_k[n] == u[(n+k) mod N] exactly (the even-N phase transparency)
    n = 64
    u = css.base_upchirp(n)
    for k in [1, 7, 33, 63]:
        np.testing.assert_allclose(
            css.chirp_symbol(n, k), np.roll(u, -k), atol=1e-6)


def test_shift_orthogonality():
    # distinct shifts are orthogonal: dechirped DFT cross-bin is 0
    p = css.make_css_params(sf=6)
    x = css.css_modulate(p, [5])
    spec = np.fft.fft(np.asarray(css.css_frames(p, x)))[0]
    mags = np.abs(spec)
    assert np.argmax(mags) == 5
    others = np.delete(mags, 5)
    assert others.max() < 1e-2 * mags[5]


def test_demod_awgn_processing_gain(rng):
    # SF=8: despreading gain 10log10(256) ~ 24 dB; at -10 dB chip SNR
    # the post-FFT tone sits ~14 dB over the noise floor -> 0 errors
    p = css.make_css_params(sf=8)
    ks = rng.integers(0, p.n, 300)
    x = css.css_modulate(p, ks)
    snr = 10 ** (-10 / 10)
    noise = (rng.standard_normal(x.size) + 1j * rng.standard_normal(x.size))
    x = x + (noise * np.sqrt(1 / (2 * snr))).astype(np.complex64)
    got, _ = css.css_demod(p, x)
    assert np.array_equal(np.asarray(got), ks)


# ---------------------------------------------------------------------------
# sync
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("t0,cfo", [(0, 0.0), (37, 3.3), (200, -5.7),
                                    (511, 12.25)])
def test_sync_recovers_timing_and_cfo(rng, t0, cfo):
    p = css.make_css_params(sf=8)
    pre = css.css_preamble(p)
    pay = css.css_modulate(p, rng.integers(0, p.n, 8))
    sig = np.concatenate([pre, pay])
    # delay by t0, apply CFO (bins) and a random phase, add mild noise
    n_total = t0 + sig.size + 3 * p.n
    x = np.zeros(n_total, np.complex64)
    x[t0: t0 + sig.size] = sig
    ph = 2 * np.pi * (cfo / p.n) * np.arange(n_total) + 1.234
    x = x * np.exp(1j * ph).astype(np.complex64)
    x += (0.05 * (rng.standard_normal(n_total)
                  + 1j * rng.standard_normal(n_total))).astype(np.complex64)
    s = css.css_sync(p, x)
    assert s.ok
    assert s.start == t0 + css.preamble_len(p)
    assert abs(s.cfo_bins - cfo) < 0.1


def test_sync_rejects_noise(rng):
    p = css.make_css_params(sf=7)
    x = (rng.standard_normal(40 * p.n)
         + 1j * rng.standard_normal(40 * p.n)).astype(np.complex64)
    assert not css.css_sync(p, x).ok


# ---------------------------------------------------------------------------
# bit layer vs independent scalar twins
# ---------------------------------------------------------------------------

def _gray_twin(k: int) -> int:
    """Independent per-bit Gray: g_i = b_i ^ b_{i+1} (MSB untouched)."""
    out = 0
    prev = 0
    for i in range(15, -1, -1):
        b = (k >> i) & 1
        out |= (b ^ prev) << i
        prev = b
    return out


def test_gray_matches_twin_and_adjacent_property():
    for k in range(256):
        assert int(css.gray_decode_shift(np.array([k]))[0]) == _gray_twin(k)
    # round trip + the CSS-critical property: +-1 shift errors flip ONE bit
    w = np.arange(256)
    k = css.gray_encode_shift(w)
    np.testing.assert_array_equal(css.gray_decode_shift(k), w)
    for kk in range(255):
        d = _gray_twin(kk) ^ _gray_twin(kk + 1)
        assert bin(d).count("1") == 1


def test_hamming_distance_and_correction():
    # exhaustive: cr=3 -> d_min 3; cr=4 -> d_min 4 (SEC-DED)
    for cr, dmin in [(1, 2), (2, 2), (3, 3), (4, 4)]:
        nibs = np.array([[int(b) for b in f"{v:04b}"] for v in range(16)])
        cws = css.hamming_encode_nibbles(nibs, cr)
        dists = [
            int((cws[i] ^ cws[j]).sum())
            for i in range(16) for j in range(i + 1, 16)]
        assert min(dists) == dmin, (cr, min(dists))
    # every single-bit error corrected at cr >= 3
    for cr in (3, 4):
        nibs = np.array([[int(b) for b in f"{v:04b}"] for v in range(16)])
        cws = css.hamming_encode_nibbles(nibs, cr)
        for pos in range(4 + min(cr, 3)):   # data + the 3 syndrome parities
            bad = cws.copy()
            bad[:, pos] ^= 1
            np.testing.assert_array_equal(
                css.hamming_decode_nibbles(bad, cr), nibs)


def test_interleaver_roundtrip_and_spread():
    sf, cr = 7, 4
    rng = np.random.default_rng(0)
    cw = rng.integers(0, 2, (sf, 4 + cr))
    sym = css.diag_interleave(cw, sf)
    np.testing.assert_array_equal(css.diag_deinterleave(sym, sf), cw)
    # one corrupted SYMBOL touches each codeword at most once
    sym2 = sym.copy()
    sym2[3] ^= 1
    diff = css.diag_deinterleave(sym2, sf) ^ cw
    assert diff.sum(axis=1).max() == 1


def test_whitening_msequence_properties():
    seq = css.whitening_seq(511)
    # maximal 9-bit LFSR: balance (256 ones / 255 zeros) and full period
    assert seq.sum() == 256
    long = css.whitening_seq(1022)
    np.testing.assert_array_equal(long[:511], long[511:])
    assert css.whitening_seq(100, seed=0x0A1).sum() > 0   # any nonzero seed


def test_crc16_known_vector():
    # CRC-16/CCITT-FALSE("123456789") = 0x29B1 (public check value)
    bits = np.unpackbits(np.frombuffer(b"123456789", np.uint8))
    assert css.crc16_ccitt(bits) == 0x29B1


def test_frame_codec_roundtrip_and_error_correction(rng):
    p = css.make_css_params(sf=8, cr=4)
    payload = bytes(rng.integers(0, 256, 19, dtype=np.uint8))
    shifts = css.css_encode_frame(p, payload)
    assert shifts.size == css.css_frame_nsym(p, len(payload))
    out, ok = css.css_decode_frame(p, shifts, len(payload))
    assert ok and out == payload
    # +-1 bin error on any single symbol is transparent (Gray -> 1 bit
    # -> interleaver isolates it -> Hamming corrects it)
    for i in [0, 3, shifts.size - 1]:
        bad = shifts.copy()
        bad[i] = (bad[i] + 1) % p.n
        out, ok = css.css_decode_frame(p, bad, len(payload))
        assert ok and out == payload
    # ONE trashed symbol is still transparent — the diagonal interleaver
    # spreads it to <=1 bit per codeword by construction
    bad = shifts.copy()
    bad[1] ^= 0x55
    out, ok = css.css_decode_frame(p, bad, len(payload))
    assert ok and out == payload
    # but TWO trashed symbols in one block put 2 errors into some
    # codeword — beyond Hamming's power — and must FAIL the CRC
    bad[2] ^= 0x55
    out, ok = css.css_decode_frame(p, bad, len(payload))
    assert not ok


def test_batch_soft_decode_matches_per_frame(rng):
    from srcdsp_tpu.chains.css import css_decode_frames_soft_batch

    p = css.make_css_params(sf=8, cr=4)
    plen = 12
    nsym = css.css_frame_nsym(p, plen)
    pls = [bytes(rng.integers(0, 256, plen, dtype=np.uint8))
           for _ in range(8)]
    tx = css.css_modulate(p, np.concatenate(
        [css.css_encode_frame(p, pl) for pl in pls]))
    sigma = np.sqrt(10 ** (12 / 10) / 2)
    x = (tx + sigma * (rng.standard_normal(tx.size)
                       + 1j * rng.standard_normal(tx.size))
         ).astype(np.complex64)
    llrs = css.css_soft_llrs(p, x).reshape(8, nsym, p.sf)
    outs, oks = css_decode_frames_soft_batch(p, llrs, plen)
    for i, pl in enumerate(pls):
        ref_out, ref_ok = css.css_decode_frame_soft(p, llrs[i], plen)
        assert bool(oks[i]) == ref_ok and outs[i] == ref_out
    assert oks.all() and outs == pls
