"""GPS C/A codes + acquisition (chains/gps.py): published-value and
Gold-property checks on the generator (an independent bit-loop twin of
the dsss LFSR machinery), then a full 2-D acquisition on a synthetic
buried capture with off-grid Doppler and a nav-bit sign flip."""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.chains.gps import (acquire_ca, ca_code, fine_acquire,
                                   make_gps_acq, sample_ca)


def _bits(chips):
    return ((1.0 - chips) / 2.0).astype(int)


def test_ca_code_published_values_and_balance():
    # first 10 chips, published octal: PRN1 1440, PRN2 1620, PRN3 1710,
    # PRN4 1744
    expect = {1: "1100100000", 2: "1110010000",
              3: "1111001000", 4: "1111100100"}
    for prn, bits in expect.items():
        c = ca_code(prn)
        assert c.shape == (1023,)
        assert set(np.unique(c)) <= {-1.0, 1.0}
        got = "".join(str(b) for b in _bits(c[:10]))
        assert got == bits, (prn, got)
    # every C/A code is balanced: 512 ones -> chip sum = -1
    for prn in range(1, 33):
        assert ca_code(prn).sum() == -1.0, prn


def test_ca_codes_are_gold_three_valued():
    # autocorrelation: peak 1023, off-peak in {-65, -1, 63};
    # cross-correlation (all shifts): only {-65, -1, 63}
    allowed = {-65.0, -1.0, 63.0}
    c7 = ca_code(7)
    f = np.fft.fft(c7)
    ac = np.round(np.real(np.fft.ifft(f * np.conj(f))))
    assert ac[0] == 1023
    assert set(np.unique(ac[1:])) <= allowed
    for other in (1, 13, 29):
        co = ca_code(other)
        cc = np.round(np.real(np.fft.ifft(
            np.fft.fft(c7) * np.conj(np.fft.fft(co)))))
        assert set(np.unique(cc)) <= allowed, other
    # distinct codes
    assert not np.array_equal(ca_code(5), ca_code(6))


def test_ca_acquisition_finds_buried_signal():
    prn, sps, nb = 7, 2, 8
    acq = make_gps_acq(prn, sps=sps)
    n = acq.n
    true_p = 777
    true_f = 3.3 / (2 * n)              # off-grid (grid is k/(2N))
    rng = np.random.default_rng(3)

    base = np.roll(sample_ca(ca_code(prn), sps), true_p)
    signs = np.ones(nb)
    signs[4:] = -1.0                    # one nav-bit flip mid-capture
    chips = np.concatenate([s * base for s in signs])
    t = np.arange(nb * n)
    x = chips * np.exp(2j * np.pi * true_f * t)
    # chip SNR -20 dB: signal power 1, complex noise power 100
    x = x + (rng.standard_normal(x.shape)
             + 1j * rng.standard_normal(x.shape)) * np.sqrt(50.0)
    x = jnp.asarray(x.astype(np.complex64))

    dop = np.arange(-10, 11) / (2.0 * n)
    res = jax.jit(lambda v: acquire_ca(acq, v, dop))(x)
    assert int(res["p_idx"]) == true_p
    assert abs(float(res["doppler"]) - true_f) <= 0.5 / (2 * n)
    assert float(res["ratio"]) > 10.0

    fine = fine_acquire(acq, res)
    assert abs(float(fine["code_phase"]) - true_p) < 0.5
    assert abs(float(fine["doppler"]) - true_f) < 0.3 / (2 * n)

    # an absent PRN on the same capture stays below threshold
    acq20 = make_gps_acq(20, sps=sps)
    res20 = jax.jit(lambda v: acquire_ca(acq20, v, dop))(x)
    assert float(res20["ratio"]) < 5.0


def test_plane_form_matches_complex_acquisition():
    """acquire_ca_planes (the on-chip tier: zero complex dtypes, two
    real matmuls) finds the same peak cell and an equal metric."""
    from srcdsp_tpu.chains.gps import acquire_ca_planes

    prn, sps, nb = 13, 2, 4
    acq = make_gps_acq(prn, sps=sps)
    n = acq.n
    rng = np.random.default_rng(7)
    base = np.roll(sample_ca(ca_code(prn), sps), 505)
    chips = np.tile(base, nb)
    t = np.arange(nb * n)
    truef = -2.0 / (2 * n)
    x = chips * np.exp(2j * np.pi * truef * t)
    x = (x + np.sqrt(20.0) * (rng.standard_normal(x.shape)
                              + 1j * rng.standard_normal(x.shape))
         ).astype(np.complex64)
    dop = np.arange(-6, 7) / (2.0 * n)
    res_c = jax.jit(lambda v: acquire_ca(acq, v, dop))(jnp.asarray(x))
    res_p = jax.jit(lambda a, b: acquire_ca_planes(acq, a, b, dop))(
        jnp.asarray(x.real.astype(np.float32)),
        jnp.asarray(x.imag.astype(np.float32)))
    assert int(res_p["p_idx"]) == int(res_c["p_idx"]) == 505
    assert int(res_p["d_idx"]) == int(res_c["d_idx"])
    np.testing.assert_allclose(np.asarray(res_p["metric"]),
                               np.asarray(res_c["metric"]), rtol=2e-3)


def test_track_and_nav_bits():
    """Full coarse -> fine -> track chain on a nav-modulated buried
    signal: nav bits recovered exactly (mod polarity), TLM preamble
    found at the right place."""
    from srcdsp_tpu.chains.gps import (NAV_PREAMBLE, nav_preamble_detect,
                                       track_ca)

    prn, sps = 3, 2
    acq = make_gps_acq(prn, sps=sps)
    n = acq.n
    rng = np.random.default_rng(11)
    # 3 nav bits of padding, then preamble + random payload (50 bps =
    # 20 ms/bit); 16 bits total = 320 ms
    nav = np.concatenate([[0, 1, 0], NAV_PREAMBLE,
                          rng.integers(0, 2, 5)]).astype(np.int32)
    nb = nav.size * 20
    true_p, true_f = 1234, 2.7 / (2 * n)
    base = np.roll(sample_ca(ca_code(prn), sps), true_p)
    sgn = np.repeat(1.0 - 2.0 * nav, 20)               # per-ms signs
    chips = np.concatenate([s * base for s in sgn])
    t = np.arange(nb * n)
    # arbitrary constant carrier phase: exercises the tracker's
    # nav-immune phi0 alignment (review finding — real captures never
    # start at phase 0)
    x = chips * np.exp(1j * (2 * np.pi * true_f * t + 1.2))
    x = (x + np.sqrt(20.0) * (rng.standard_normal(x.shape)
                              + 1j * rng.standard_normal(x.shape))
         ).astype(np.complex64)
    xj = jnp.asarray(x)

    dop = np.arange(-8, 9) / (2.0 * n)
    res = acquire_ca(acq, xj, dop)
    assert int(res["p_idx"]) == true_p
    fine = fine_acquire(acq, res)
    trk = track_ca(acq, xj, res, fine)
    assert int(trk["bit_phase"]) == 0
    bits = np.asarray(trk["bits"])
    assert bits.size == nav.size
    same = int((bits == nav).sum())
    assert same in (0, nav.size), same          # exact mod polarity
    stream = bits if same == nav.size else 1 - bits
    hits = nav_preamble_detect(stream)
    assert (3, 1) in hits or (3, -1) in nav_preamble_detect(bits)
    assert float(trk["cn0_db_hz"]) > 35.0


def test_track_with_code_doppler():
    """A drifting code clock (the carrier-coupled chip-rate offset):
    without compensation the prompt decorrelates; with the
    code_doppler argument the bits come back exact."""
    from srcdsp_tpu.chains.gps import track_ca

    prn, sps = 9, 2
    acq = make_gps_acq(prn, sps=sps)
    n = acq.n
    rng = np.random.default_rng(21)
    nav = rng.integers(0, 2, 12).astype(np.int32)
    nb = nav.size * 20
    true_p = 77
    drift = 0.02                          # samples/block (exaggerated)
    cs = sample_ca(ca_code(prn), sps)
    sgn = np.repeat(1.0 - 2.0 * nav, 20)
    blocks = []
    for b in range(nb):
        sh = true_p + int(round(b * drift))
        blocks.append(sgn[b] * np.roll(cs, sh))
    x = np.concatenate(blocks)
    x = (x + np.sqrt(10.0) * (rng.standard_normal(x.shape)
                              + 1j * rng.standard_normal(x.shape))
         ).astype(np.complex64)
    xj = jnp.asarray(x)
    res = {"p_idx": jnp.asarray(true_p), "metric": jnp.zeros((1, n)),
           "d_idx": jnp.asarray(0), "doppler": jnp.asarray(0.0)}
    fine = {"doppler": jnp.asarray(0.0)}
    trk = track_ca(acq, xj, res, fine, code_doppler=drift)
    bits = np.asarray(trk["bits"])
    same = int((bits == nav).sum())
    assert same in (0, nav.size), same
