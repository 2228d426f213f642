"""Adaptive equalizer (block LMS / CMA) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srcdsp_tpu.chains.equalizer import (
    cma_equalize, eq_init, lms_equalize, make_eq_frames, psk_slicer)


def _qpsk(n, seed=0):
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, 4, n)
    return (np.exp(1j * (np.pi / 4 + np.pi / 2 * idx)).astype(np.complex64),
            idx)


def _channel(s, h, snr_db=None, seed=1):
    x = np.convolve(s, h)[: len(s)].astype(np.complex64)
    if snr_db is not None:
        rng = np.random.default_rng(seed)
        p = np.mean(np.abs(x) ** 2)
        n = (rng.standard_normal(len(x)) + 1j * rng.standard_normal(len(x)))
        x = x + np.sqrt(p * 10 ** (-snr_db / 10) / 2) * n.astype(np.complex64)
    return x


def test_frames_match_delay_line():
    x = jnp.asarray(np.arange(1, 20, dtype=np.complex64))
    fr = np.asarray(make_eq_frames(x, ntaps=4, sps=1))
    # row n = [x[n+3], x[n+2], x[n+1], x[n]]
    assert fr.shape == (16, 4)
    np.testing.assert_array_equal(fr[0], [4, 3, 2, 1])
    np.testing.assert_array_equal(fr[5], [9, 8, 7, 6])


def test_frames_fractionally_spaced():
    x = jnp.asarray(np.arange(1, 22, dtype=np.complex64))
    fr = np.asarray(make_eq_frames(x, ntaps=5, sps=2))
    assert fr.shape == (8, 5)
    np.testing.assert_array_equal(fr[0], [5, 4, 3, 2, 1])
    np.testing.assert_array_equal(fr[1], [7, 6, 5, 4, 3])


def test_psk_slicer():
    y = jnp.asarray([1.1 + 0.1j, -0.2 + 0.9j, 0.05 - 1.2j], jnp.complex64)
    got = np.asarray(psk_slicer(y, 4))
    np.testing.assert_allclose(got, [1, 1j, -1j], atol=1e-6)


def test_lms_training_converges_and_opens_eye():
    s, idx = _qpsk(4096, seed=2)
    h = np.array([1.0, 0.45 - 0.2j, -0.25 + 0.1j], np.complex64)
    x = _channel(s, h, snr_db=30)
    st = eq_init(11)
    st, y, mse = jax.jit(
        lambda st, x, d: lms_equalize(x, st, mu=0.1, block=64, d=d))(
        st, jnp.asarray(x), jnp.asarray(s))
    assert float(mse[-1]) < 0.03, float(mse[-1])
    # equalized output is delayed by ntaps//2 = 5 symbols
    tail = np.asarray(y)[2048:]
    dec = np.asarray(psk_slicer(jnp.asarray(tail), 4, offset=np.pi / 4))
    np.testing.assert_allclose(dec, s[2048 - 5: -5], atol=1e-5)


def test_lms_dd_holds_after_training():
    s, _ = _qpsk(6144, seed=3)
    h = np.array([1.0, 0.4 - 0.15j, -0.2j], np.complex64)
    x = _channel(s, h, snr_db=28)
    st = eq_init(11)
    # train on the first quarter, then decision-directed on the rest
    n_tr = 1536
    st, y1, _ = lms_equalize(jnp.asarray(x[: n_tr]), st, mu=0.1, block=64,
                             d=jnp.asarray(s[: n_tr]))
    st, y2, mse2 = lms_equalize(jnp.asarray(x[n_tr:]), st, mu=0.02, block=64,
                                offset=np.pi / 4)
    assert float(mse2[-1]) < 0.03
    # DD output keeps the training delay of 5 symbols
    dec = np.asarray(psk_slicer(jnp.asarray(np.asarray(y2)[512:]), 4,
                                offset=np.pi / 4))
    np.testing.assert_allclose(dec, s[n_tr + 512 - 5: -5], atol=1e-5)


def test_cma_blind_opens_constant_modulus():
    s, _ = _qpsk(16384, seed=4)
    h = np.array([1.0, 0.35 - 0.2j, -0.15 + 0.1j], np.complex64)
    x = _channel(s, h, snr_db=30)
    st = eq_init(11)
    st, y, mse = jax.jit(
        lambda st, x: cma_equalize(x, st, mu=0.05, block=64))(
        st, jnp.asarray(x))
    tail = np.asarray(y)[8192:]
    # modulus converges to 1
    assert abs(float(np.mean(np.abs(tail))) - 1.0) < 0.05
    assert float(np.std(np.abs(tail))) < 0.08
    # blind output carries an unknown (lag, phase): find both from the
    # data (lag by peak cross-correlation, phase by LS) then decisions
    # must match the sent symbols
    ref = s[8192:]
    lags = range(0, 11)
    corr = [abs(np.vdot(ref[: 4096 - lag], tail[lag: 4096])) for lag in lags]
    lag = int(np.argmax(corr))
    a, b = tail[lag: 4096], ref[: 4096 - lag]
    rot = np.vdot(b, a)
    rot /= abs(rot)
    dec = np.asarray(psk_slicer(jnp.asarray(a / rot), 4, offset=np.pi / 4))
    err = np.mean(np.abs(dec - b) > 0.1)
    assert err < 0.001, err


def test_fractionally_spaced_lms():
    """T/2-spaced equalizer absorbs a fractional-delay channel."""
    s, _ = _qpsk(4096, seed=5)
    # upsample x2 with a simple linear-interp pulse, through a channel
    up = np.zeros(2 * len(s), np.complex64)
    up[::2] = s
    pulse = np.array([0.5, 1.0, 0.5], np.complex64)
    x2 = np.convolve(up, pulse)[1: 1 + 2 * len(s)]
    h = np.array([1.0, 0.0, 0.3 - 0.2j], np.complex64)
    x2 = _channel(x2, h, snr_db=30, seed=6)
    st = eq_init(16)
    st, y, mse = lms_equalize(jnp.asarray(x2), st, mu=0.04, block=64,
                              sps=2, d=jnp.asarray(s))
    assert float(mse[-1]) < 0.03, float(mse[-1])


def test_streaming_matches_oneshot():
    s, _ = _qpsk(2048, seed=7)
    h = np.array([1.0, 0.3 + 0.2j], np.complex64)
    x = _channel(s, h, snr_db=35)
    # pre-shift d once on the whole capture, pass delay=0 per the
    # streaming note in lms_equalize's docstring
    d = np.concatenate([np.zeros(4, np.complex64), s[:-4]])
    st = eq_init(9)
    _, y_one, _ = lms_equalize(jnp.asarray(x), st, mu=0.03, block=64,
                               d=jnp.asarray(d), delay=0)
    st2 = eq_init(9)
    ys = []
    for i in range(4):
        sl = slice(i * 512, (i + 1) * 512)
        st2, y, _ = lms_equalize(jnp.asarray(x[sl]), st2, mu=0.03, block=64,
                                 d=jnp.asarray(d[sl]), delay=0)
        ys.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(ys), np.asarray(y_one),
                               atol=1e-5)


def test_multichannel_vmap():
    s0, _ = _qpsk(2048, seed=8)
    s1, _ = _qpsk(2048, seed=9)
    h = np.array([1.0, 0.4 - 0.1j], np.complex64)
    x = np.stack([_channel(s0, h, 30, 10), _channel(s1, h, 30, 11)])
    d = np.stack([s0, s1])
    st = eq_init(9, channel_shape=(2,))
    st, y, mse = jax.jit(
        lambda st, x, d: lms_equalize(x, st, mu=0.1, block=64, d=d))(
        st, jnp.asarray(x), jnp.asarray(d))
    assert y.shape == (2, 2048)
    assert float(np.asarray(mse)[0, -1]) < 0.03
    assert float(np.asarray(mse)[1, -1]) < 0.03


def test_rls_converges_faster_than_lms():
    """Same multipath channel, same training symbols: RLS reaches low
    residual within ~5L symbols; block-LMS at a stable mu is still far at
    that point (the defining RLS trade)."""
    from srcdsp_tpu.chains.equalizer import rls_equalize, rls_init

    rng = np.random.default_rng(0)
    nsym, L = 512, 11
    idx = rng.integers(0, 4, nsym)
    s = np.exp(1j * (2 * np.pi * (idx + 0.5) / 4)).astype(np.complex64)
    h = np.asarray([0.25, 1.0, 0.35 - 0.2j, 0.15j], np.complex64)
    x = np.convolve(s, h)[:nsym].astype(np.complex64)
    x += 0.02 * (rng.standard_normal(nsym)
                 + 1j * rng.standard_normal(nsym)).astype(np.complex64)

    st, y, err = rls_equalize(jnp.asarray(x), rls_init(L), lam=0.995,
                              d=jnp.asarray(s))
    err = np.asarray(err)
    settle = 5 * L
    assert np.mean(err[settle:settle + 64]) < 0.01, \
        np.mean(err[settle:settle + 64])

    st_l = eq_init(L)
    st_l, y_l, mse_l = lms_equalize(jnp.asarray(x), st_l, mu=0.05,
                                    block=16, d=jnp.asarray(s))
    lms_at_settle = float(np.asarray(mse_l)[settle // 16])
    assert lms_at_settle > 5 * np.mean(err[settle:settle + 64]), \
        (lms_at_settle, np.mean(err[settle:settle + 64]))

    # converged taps open the eye: SER 0 on the tail after delay align
    dly = L // 2
    got = np.asarray(y)[settle:]
    want = s[settle - dly: s.size - dly]
    ang = np.round((np.angle(got / want[:got.size])) / (np.pi / 2))
    errs = np.sum(ang.astype(int) % 4 != 0)
    assert errs == 0, errs


def test_rls_streaming_matches_oneshot():
    from srcdsp_tpu.chains.equalizer import rls_equalize, rls_init

    rng = np.random.default_rng(1)
    nsym, L = 256, 7
    s = np.exp(1j * 2 * np.pi * rng.integers(0, 4, nsym) / 4
               ).astype(np.complex64)
    x = np.convolve(s, [1.0, 0.4]).astype(np.complex64)[:nsym]
    _, y1, e1 = rls_equalize(jnp.asarray(x), rls_init(L), d=jnp.asarray(s))
    st = rls_init(L)
    ys = []
    for lo in (0, 128):
        st, y, _ = rls_equalize(jnp.asarray(x[lo:lo + 128]), st,
                                d=jnp.asarray(s[lo:lo + 128]), delay=0)
        ys.append(np.asarray(y))
    # delay=0 per call + manual pre-shift == oneshot default shift? use
    # delay=0 both ways for the comparison
    _, y0, _ = rls_equalize(jnp.asarray(x), rls_init(L), d=jnp.asarray(s),
                            delay=0)
    np.testing.assert_allclose(np.concatenate(ys), np.asarray(y0),
                               atol=1e-4)


def test_dfe_cancels_long_postcursor():
    """A channel with a heavy postcursor tail: a linear LMS equalizer of
    the same total tap budget stays noisy (it must invert the channel),
    the DFE cancels the tail with decisions and converges much lower."""
    from srcdsp_tpu.chains.equalizer import dfe_equalize, dfe_init

    rng = np.random.default_rng(7)
    nsym = 4096
    idx = rng.integers(0, 4, nsym)
    s = np.exp(1j * (2 * np.pi * (idx + 0.5) / 4)).astype(np.complex64)
    h = np.asarray([1.0, 0.0, 0.55, 0.0, 0.4, 0.0, 0.3], np.complex64)
    x = np.convolve(s, h)[:nsym].astype(np.complex64)
    x += 0.03 * (rng.standard_normal(nsym)
                 + 1j * rng.standard_normal(nsym)).astype(np.complex64)

    st, y, err = dfe_equalize(jnp.asarray(x), dfe_init(nff=9, nfb=8),
                              mu=0.02, d=jnp.asarray(s))
    tail_err = float(np.mean(np.asarray(err)[-512:]))

    st_l = eq_init(17)                       # same total taps, linear
    _, _, mse_l = lms_equalize(jnp.asarray(x), st_l, mu=0.02, block=16,
                               d=jnp.asarray(s))
    lin_err = float(np.asarray(mse_l)[-4:].mean())
    assert tail_err < 0.02, tail_err
    assert tail_err < 0.5 * lin_err, (tail_err, lin_err)

    # and decisions are clean on the tail (delay = nff//2)
    dly = 9 // 2
    got = np.asarray(y)[-1024:]
    want = s[-1024 - dly:-dly]
    ang = np.round(np.angle(got / want) / (np.pi / 2)).astype(int) % 4
    assert np.mean(ang != 0) == 0.0
