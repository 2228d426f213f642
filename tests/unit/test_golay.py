"""Extended Golay (24,12,8): exhaustive correction power and the
detected-uncorrectable boundary."""

from itertools import combinations

import numpy as np

from srcdsp_tpu.golay import golay_decode, golay_encode, make_golay


def test_construction_and_roundtrip(rng):
    code = make_golay()                 # d_min == 8 asserted inside
    data = rng.integers(0, 2, (64, 12))
    cw = np.asarray(golay_encode(code, data))
    assert cw.shape == (64, 24)
    np.testing.assert_array_equal(cw[:, :12], data)   # systematic
    out, ncorr, ok = golay_decode(code, cw)
    np.testing.assert_array_equal(np.asarray(out), data)
    assert np.all(np.asarray(ncorr) == 0) and np.all(np.asarray(ok))


def test_all_3_error_patterns_corrected(rng):
    code = make_golay()
    data = rng.integers(0, 2, (3, 12))
    cw = np.asarray(golay_encode(code, data))
    for row in range(3):
        pats = []
        for k in (1, 2, 3):
            pats += [list(p) for p in combinations(range(24), k)]
        bad = np.tile(cw[row], (len(pats), 1))
        for i, p in enumerate(pats):
            bad[i, p] ^= 1
        out, ncorr, ok = golay_decode(code, bad)
        np.testing.assert_array_equal(
            np.asarray(out), np.tile(data[row], (len(pats), 1)))
        assert np.all(np.asarray(ok))
        ks = np.asarray([len(p) for p in pats])
        np.testing.assert_array_equal(np.asarray(ncorr), ks)


def test_weight4_detected_uncorrectable(rng):
    code = make_golay()
    cw = np.asarray(golay_encode(code, rng.integers(0, 2, (1, 12))))[0]
    n_flagged = 0
    for _ in range(200):
        pos = rng.choice(24, 4, replace=False)
        bad = cw.copy()
        bad[pos] ^= 1
        _, _, ok = golay_decode(code, bad[None, :])
        n_flagged += int(not bool(np.asarray(ok)[0]))
    # every weight-4 error lands in an uncorrectable coset (the code
    # is perfect at radius 3 over the even-weight extension)
    assert n_flagged == 200


def test_cli_fec_golay_roundtrip(rng, tmp_path):
    from srcdsp_tpu.cli import main as cli_main

    bits = rng.integers(0, 2, 120).astype(np.uint8)
    binf = str(tmp_path / "info.u8")
    bits.tofile(binf)
    enc = str(tmp_path / "coded.u8")
    cli_main(["fecenc", binf, enc, "--code", "golay"])
    coded = np.fromfile(enc, np.uint8)
    assert coded.size == 240                   # 10 codewords
    # flip 3 bits in one codeword and 1 in another: both correct
    coded[24 * 2 + 3] ^= 1
    coded[24 * 2 + 11] ^= 1
    coded[24 * 2 + 20] ^= 1
    coded[24 * 7 + 0] ^= 1
    coded.tofile(enc)
    dec = str(tmp_path / "dec.u8")
    cli_main(["fecdec", enc, dec, "--code", "golay", "--hard"])
    out = np.fromfile(dec, np.uint8)
    np.testing.assert_array_equal(out, bits)


def test_golay_bpsk_link_gain(rng):
    """Channel-level: at an SNR where raw BPSK runs ~1% BER, Golay
    hard-decision decoding delivers error-free blocks (expected ~2-3
    errors per 24-bit word, inside the 3-error power)."""
    code = make_golay()
    nw = 256
    data = rng.integers(0, 2, (nw, 12))
    cw = np.asarray(golay_encode(code, data)).astype(np.float64)
    ebno_lin = 10 ** (4.3 / 10)              # ~1% raw BER for BPSK
    sigma = np.sqrt(1.0 / (2 * ebno_lin))
    y = (1.0 - 2.0 * cw) + sigma * rng.standard_normal(cw.shape)
    hard = (y < 0).astype(np.int64)
    raw_ber = float((hard != cw).mean())
    assert 0.002 < raw_ber < 0.03, raw_ber
    out, ncorr, ok = golay_decode(code, hard)
    block_err = float((np.asarray(out) != data).any(axis=1).mean())
    # coded block error far below the uncoded word-error rate
    uncoded_wer = 1.0 - (1.0 - raw_ber) ** 12
    assert block_err < uncoded_wer / 5.0, (block_err, uncoded_wer)
