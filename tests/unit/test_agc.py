"""AGC envelope normalizer: convergence, streaming, silence safety."""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.ops.agc import agc_apply, agc_full, agc_init, make_agc_params


def _tone(n, f, amp):
    t = np.arange(n)
    return (amp * np.exp(2j * np.pi * f * t)).astype(np.complex64)


def test_normalizes_amplitude_step():
    """A 10x amplitude step settles back to the target RMS."""
    params = make_agc_params(alpha=0.99, target=1.0)
    x = np.concatenate([_tone(4096, 0.1, 0.2), _tone(4096, 0.1, 2.0)])
    y = np.asarray(agc_full(params, jnp.asarray(x)))
    # steady state of each segment (skip ~5 time constants = 500 samples)
    rms1 = np.sqrt(np.mean(np.abs(y[2048:4096]) ** 2))
    rms2 = np.sqrt(np.mean(np.abs(y[6144:]) ** 2))
    assert abs(rms1 - 1.0) < 0.05, rms1
    assert abs(rms2 - 1.0) < 0.05, rms2


def test_streaming_matches_oneshot():
    params = make_agc_params(alpha=0.995)
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(8192) + 1j * rng.standard_normal(8192)
         ).astype(np.complex64) * 0.3
    whole = np.asarray(agc_full(params, jnp.asarray(x)))
    st = agc_init(params)
    outs = []
    for i in range(0, 8192, 2048):
        st, y = agc_apply(params, st, jnp.asarray(x[i:i + 2048]))
        outs.append(np.asarray(y))
    got = np.concatenate(outs)
    err = whole - got
    snr = 10 * np.log10(np.mean(np.abs(whole) ** 2)
                        / (np.mean(np.abs(err) ** 2) + 1e-30))
    assert snr > 90, snr


def test_silence_does_not_blow_up():
    params = make_agc_params(alpha=0.99, floor=1e-6)
    y = np.asarray(agc_full(params, jnp.zeros(1024, jnp.complex64)))
    assert np.all(np.isfinite(y))
    assert np.all(np.abs(y) == 0.0)


def test_multichannel():
    params = make_agc_params(alpha=0.99)
    x = np.stack([_tone(4096, 0.1, 0.5), _tone(4096, -0.2, 3.0)])
    y = np.asarray(agc_full(params, jnp.asarray(x)))
    for c in range(2):
        rms = np.sqrt(np.mean(np.abs(y[c, 2048:]) ** 2))
        assert abs(rms - 1.0) < 0.05, (c, rms)


def test_jit_streaming():
    params = make_agc_params(alpha=0.99)
    x = _tone(4096, 0.05, 0.1)

    @jax.jit
    def run(st, xb):
        return agc_apply(params, st, xb)

    st = agc_init(params)
    st, y1 = run(st, jnp.asarray(x[:2048]))
    st, y2 = run(st, jnp.asarray(x[2048:]))
    rms = np.sqrt(np.mean(np.abs(np.asarray(y2)[1024:]) ** 2))
    assert abs(rms - 1.0) < 0.05
