"""Blind signal survey (chains/blindscan.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.chains.blindscan import baud_estimate, classify_mpsk, scan
from srcdsp_tpu.chains.tx import linear_tx_apply, linear_tx_init, \
    make_linear_tx, psk_map
from srcdsp_tpu.ops.window import root_raised_cosine
from srcdsp_tpu.testing.signals import fsk_baseband, tone


def _psk_burst(key, nsym, order, sps, center, amp=1.0):
    idx = jax.random.randint(jax.random.PRNGKey(key), (nsym,), 0, order)
    txp = make_linear_tx(center, root_raised_cosine(sps, 8, beta=0.35), sps)
    _, y = linear_tx_apply(txp, linear_tx_init(txp), psk_map(idx, order))
    return amp * np.asarray(y)


def test_scan_finds_three_signals():
    rng = np.random.default_rng(0)
    n = 1 << 16
    x = 0.02 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    x = x.astype(np.complex64)
    x[: n] += _psk_burst(1, n // 8, 4, 8, 0.15)[:n]
    fsk = np.asarray(fsk_baseband(jnp.asarray(rng.integers(0, 2, n // 16)),
                                  16, 0.01)) * 0.7
    x[: fsk.size] += fsk * np.asarray(tone(fsk.size, -0.22))
    x += 0.5 * np.asarray(tone(n, 0.35))
    dets = scan(x, nfft=4096)
    # top-3 by power are the three signals; a few CPFSK sidelobe
    # fragments may legitimately clear the floor too
    assert len(dets) <= 8, dets
    centers = sorted(d.center for d in dets[:3])   # strongest three
    np.testing.assert_allclose(centers, [-0.22, 0.15, 0.35], atol=0.01)
    # the QPSK detection's bandwidth ~ (1+beta)/sps = 0.169
    qpsk = min(dets, key=lambda d: abs(d.center - 0.15))
    assert 0.1 < qpsk.bandwidth < 0.25, qpsk
    tone_det = min(dets, key=lambda d: abs(d.center - 0.35))
    assert tone_det.bandwidth < 0.01                 # CW is narrow


def test_baud_estimate_qpsk():
    x = _psk_burst(2, 4096, 4, 8, 0.0)
    baud, line_db = baud_estimate(x, f_lo=0.02)
    assert line_db > 10.0, line_db
    np.testing.assert_allclose(baud, 1 / 8, rtol=0.01)


def test_baud_estimate_off_center_after_mixdown():
    x = _psk_burst(3, 4096, 4, 6, 0.19)
    x = x * np.asarray(tone(x.size, -0.19))          # mix detection down
    baud, line_db = baud_estimate(x, f_lo=0.02)
    assert line_db > 10.0
    np.testing.assert_allclose(baud, 1 / 6, rtol=0.01)


def test_classify_mpsk_orders():
    rng = np.random.default_rng(4)
    for order, want in ((2, 2), (4, 4)):
        x = _psk_burst(10 + order, 2048, order, 4, 0.07)
        x += 0.05 * (rng.standard_normal(x.size)
                     + 1j * rng.standard_normal(x.size))
        got, report = classify_mpsk(x)
        assert got == want, (order, report)
    cw = np.asarray(tone(4096, 0.11))
    got, _ = classify_mpsk(cw)
    assert got == 1


def test_detect_css_finds_sf_blind(rng):
    from srcdsp_tpu.chains import css
    from srcdsp_tpu.chains.blindscan import detect_css

    p = css.make_css_params(sf=8)
    ks = rng.integers(0, p.n, 60)
    x = css.css_modulate(p, ks)
    # arbitrary timing offset + CFO + -5 dB chip SNR
    x = np.concatenate([np.zeros(173, np.complex64), x])
    x = x * np.exp(2j * np.pi * 0.013 * np.arange(x.size))
    sigma = np.sqrt(10 ** (5 / 10) / 2)
    x = (x + sigma * (rng.standard_normal(x.size)
                      + 1j * rng.standard_normal(x.size))
         ).astype(np.complex64)
    res = detect_css(x)
    assert res["detected"] and res["sf"] == 8
    assert res["direction"] == "up"


def test_detect_css_rejects_noise_and_psk(rng):
    from srcdsp_tpu.chains.blindscan import detect_css

    n = 1 << 14
    noise = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
             ).astype(np.complex64)
    assert not detect_css(noise)["detected"]
    # a narrowband PSK signal concentrates WITHOUT dechirping but must
    # not fool the chirp detector more than... it does concentrate!
    # (any narrowband tone-like signal has concentrated windows). The
    # discriminator: for real chirps the UP hypothesis beats the raw
    # spectrum; for narrowband signals dechirping SPREADS them, so the
    # chirp score at the winning SF must exceed the dechirped-noise
    # bound while PSK's dechirped spectrum is sweep-spread
    sym = 1.0 - 2.0 * rng.integers(0, 2, 2048).astype(np.float64)
    up = np.repeat(sym, 8)
    psk = (up * np.exp(2j * np.pi * 0.01 * np.arange(up.size))
           ).astype(np.complex64)
    res = detect_css(psk)
    assert not res["detected"], res
