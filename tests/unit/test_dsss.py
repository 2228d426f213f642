"""DSSS spread/acquire/despread (srcdsp_tpu.chains.dsss)."""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.chains.dsss import (
    dsss_acquire, dsss_demod_bpsk, dsss_despread, dsss_spread,
    make_dsss_params, pn_msequence,
)


def test_msequence_properties():
    """Length-63 m-sequence: balance and the exact two-valued cyclic
    autocorrelation R(0)=63, R(tau!=0)=-1."""
    c = pn_msequence((6, 1), 6)
    assert c.size == 63
    assert c.sum() == -1.0              # 32 ones (-1) vs 31 zeros (+1)
    for tau in range(63):
        r = float(np.dot(c, np.roll(c, tau)))
        assert r == (63.0 if tau == 0 else -1.0), tau


def test_spread_despread_roundtrip_phase0():
    p = make_dsss_params()
    rng = np.random.default_rng(0)
    sym = 1.0 - 2.0 * rng.integers(0, 2, 17).astype(np.float32)
    x = dsss_spread(p, jnp.asarray(sym))
    assert x.shape[-1] == 17 * 63
    # pad one extra frame (despread capacity drops the last frame)
    xp = jnp.concatenate([x, jnp.zeros(63)])
    out = dsss_despread(p, xp, jnp.asarray(0))
    np.testing.assert_allclose(np.asarray(out), sym, atol=1e-6)


def test_acquire_matches_loop_twin():
    """The all-shifts matmul metric equals the per-phase loop."""
    p = make_dsss_params()
    rng = np.random.default_rng(1)
    sym = 1.0 - 2.0 * rng.integers(0, 2, 12).astype(np.float32)
    x = np.asarray(dsss_spread(p, jnp.asarray(sym)))
    d = 20
    y = np.concatenate([np.zeros(d, np.float32), x])[: 10 * 63]

    got = int(dsss_acquire(make_dsss_params(), jnp.asarray(y)))

    chips = np.asarray(p.chips)
    nf = y.size // 63 - 1
    w = y[: nf * 63].reshape(nf, 63)
    metric = np.zeros(63)
    for ph in range(63):
        row = np.roll(chips, -ph)
        metric[ph] = np.abs(w @ row).sum()
    assert got == int(np.argmax(metric))
    assert got == (63 - d) % 63         # code index of chip y[0]


def test_e2e_processing_gain():
    """BPSK through an unknown delay, carrier phase, and -8 dB chip SNR:
    acquisition finds the phase and demod is error-free (SF=63 gives
    ~18 dB processing gain -> ~+10 dB symbol SNR)."""
    p = make_dsss_params()
    rng = np.random.default_rng(2)
    nsym = 40
    bits = rng.integers(0, 2, nsym).astype(np.int32)
    bits[0] = 0                                       # +1 pilot
    sym = (1.0 - 2.0 * bits).astype(np.float32)
    x = np.asarray(dsss_spread(p, jnp.asarray(sym)))  # [nsym*63]

    d = int(rng.integers(0, 63))
    theta = 1.1
    n = x.size + 2 * 63
    y = np.zeros(n, np.complex64)
    y[d: d + x.size] = x * np.exp(1j * theta)
    snr_chip_db = -8.0
    sigma = 10 ** (-snr_chip_db / 20) / np.sqrt(2)
    y += sigma * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    y = y.astype(np.complex64)

    acquire = jax.jit(lambda v: dsss_acquire(p, v))
    phase = acquire(jnp.asarray(y))
    assert int(phase) == (63 - d) % 63

    bits_hat, soft = jax.jit(lambda v, ph: dsss_demod_bpsk(p, v, ph))(
        jnp.asarray(y), phase)
    got = np.asarray(bits_hat)[:nsym]
    np.testing.assert_array_equal(got, bits)


def test_complex_constellation_spread():
    """QPSK symbols spread/despread exactly (complex path)."""
    p = make_dsss_params()
    rng = np.random.default_rng(3)
    qpsk = np.exp(1j * (np.pi / 4 + np.pi / 2 *
                        rng.integers(0, 4, 9))).astype(np.complex64)
    x = dsss_spread(p, jnp.asarray(qpsk))
    xp = jnp.concatenate([x, jnp.zeros(63, dtype=x.dtype)])
    out = dsss_despread(p, xp, jnp.asarray(0))
    np.testing.assert_allclose(np.asarray(out), qpsk, atol=1e-5)


def test_rake_beats_single_finger_on_multipath():
    """Two-path channel at low chip SNR: the single-finger demod carries
    errors, the 2-finger RAKE (fingers found from the acquisition metric)
    is error-free and improves the post-despread SNR."""
    from srcdsp_tpu.chains.dsss import (
        dsss_demod_bpsk, dsss_finger_search, dsss_rake_demod)

    p = make_dsss_params((6, 1), 6)                 # SF = 63
    rng = np.random.default_rng(0)
    nsym = 400
    bits = rng.integers(0, 2, nsym)
    bits[0] = 0                                      # +1 pilot
    tx = np.asarray(dsss_spread(p, jnp.asarray(1.0 - 2.0 * bits,
                                               jnp.float32)))
    d2 = 5
    path2 = 0.8 * np.exp(1j * 1.1) * np.concatenate(
        [np.zeros(d2), tx[:-d2]])
    x = tx.astype(np.complex64) + path2
    x += (4.0 * (rng.standard_normal(x.size)
                 + 1j * rng.standard_normal(x.size))).astype(np.complex64)

    xj = jnp.asarray(x.astype(np.complex64))
    base = dsss_acquire(p, xj)
    metric = np.asarray(dsss_finger_search(p, xj))
    # the two fingers are the two biggest metric peaks, d2 chips apart
    top2 = np.argsort(metric)[::-1][:2]
    # a path delayed by d chips peaks at (base - d) mod SF: phase is the
    # code index of chip x[0], which the delay pushes BACK d steps
    rel = sorted((int(base) - int(t)) % p.sf for t in top2)
    assert rel == [0, d2], (base, top2, rel)

    b1, s1 = dsss_demod_bpsk(p, xj, base)
    br, sr = dsss_rake_demod(p, xj, base, delays=rel)
    b1, br = np.asarray(b1), np.asarray(br)
    n = min(nsym, b1.size, br.size)   # rake drops one tail symbol
    e1 = int((b1[:n] != bits[:n]).sum())
    er = int((br[:n] != bits[:n]).sum())
    assert e1 >= 3, "channel too clean: single finger had no errors"
    assert er <= 1 and er < e1 / 3, (e1, er)      # MRC repairs the link
    # MRC raises the decision-variable SNR
    def dv_snr(s):
        s = np.asarray(s)[:n] * (1.0 - 2.0 * bits[:n])
        return float(np.mean(s) ** 2 / (np.var(s) + 1e-12))
    # theoretical MRC gain 1+0.8^2 = 1.64x; finger-gain estimation
    # noise eats some (measured 1.44x at this draw)
    assert dv_snr(sr) > 1.3 * dv_snr(s1), (dv_snr(sr), dv_snr(s1))


def test_gold_family_three_valued_cross_correlation():
    """Preferred-pair Gold family (order 5): every pairwise periodic
    cross-correlation takes only the three Gold values {-1, -t, t-2}
    with t = 2^((n+2)//2) + 1 = 9 — the bounded-interference CDMA
    property. Also: family size 2^n + 1, each code balanced-ish."""
    from srcdsp_tpu.chains.dsss import gold_family

    fam = gold_family([5, 2], [5, 4, 3, 2], 5)
    n = 31
    assert fam.shape == (33, n)
    t = 2 ** ((5 + 2) // 2) + 1            # 9
    allowed = {-1.0, -float(t), float(t - 2.0)}
    import numpy as _np
    f = _np.fft.fft(fam.astype(_np.float64), axis=-1)
    for i in range(fam.shape[0] - 1):
        # periodic cross-correlations of code i with all later codes at
        # every shift, via the FFT (integer-valued up to float rounding)
        cc = _np.fft.ifft(f[i][None, :] * _np.conj(f[i + 1:])).real
        assert _np.max(_np.abs(cc - _np.rint(cc))) < 1e-6
        vals = set(_np.rint(cc).ravel().tolist())
        assert vals <= allowed, (i, sorted(vals)[:5])


def test_gold_cdma_two_users_separate():
    """Two users on different Gold codes, synchronous CDMA: each
    despreads its own data with the other active (classic code-division
    separation; an m-sequence-only system has no such code book)."""
    from srcdsp_tpu.chains.dsss import (dsss_despread, dsss_spread,
                                        gold_family, make_dsss_params)

    fam = gold_family([6, 1], [6, 5, 2, 1], 6)
    pa = make_dsss_params(chips=fam[3])
    pb = make_dsss_params(chips=fam[17])
    rng = np.random.default_rng(0)
    ba = 1.0 - 2.0 * rng.integers(0, 2, 256).astype(np.float32)
    bb = 1.0 - 2.0 * rng.integers(0, 2, 256).astype(np.float32)
    x = (np.asarray(dsss_spread(pa, jnp.asarray(ba)))
         + np.asarray(dsss_spread(pb, jnp.asarray(bb))))
    x = x + 0.2 * rng.standard_normal(x.shape).astype(np.float32)
    za = np.asarray(dsss_despread(pa, jnp.asarray(x), jnp.asarray(0)))
    zb = np.asarray(dsss_despread(pb, jnp.asarray(x), jnp.asarray(0)))
    # despread emits N//SF - 1 symbols (static capacity drops the tail)
    assert np.array_equal(np.sign(za.real), ba[: za.size])
    assert np.array_equal(np.sign(zb.real), bb[: zb.size])
