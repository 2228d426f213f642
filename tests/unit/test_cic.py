"""CIC decimator/interpolator tests (beyond-parity component)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srcdsp_tpu.ops.cic import (
    cic_compensator, cic_decim_apply, cic_decim_init, cic_gain,
    cic_interp_apply, cic_interp_init, np_cic_decim)


def _boxcar_n(rate, order, delay=1):
    """N-fold convolution of a boxcar of length R*M — the CIC's exact
    FIR-equivalent impulse response."""
    h = np.ones(rate * delay)
    out = np.array([1.0])
    for _ in range(order):
        out = np.convolve(out, h)
    return out


@pytest.mark.parametrize("rate,order,delay",
                         [(4, 3, 1), (8, 4, 1), (5, 2, 2), (16, 5, 1)])
def test_decim_matches_sequential_twin_bit_exact(rate, order, delay):
    rng = np.random.default_rng(0)
    x = rng.integers(-32768, 32768, 4 * 64 * rate).astype(np.int32)
    st = cic_decim_init(order, delay)
    st, y = jax.jit(lambda s, v: cic_decim_apply(s, v, rate))(
        st, jnp.asarray(x))
    ref = np_cic_decim(x, rate, order, delay)
    np.testing.assert_array_equal(np.asarray(y), ref)


def test_decim_streaming_bit_exact():
    rate, order, delay = 8, 4, 1
    rng = np.random.default_rng(1)
    x = rng.integers(-32768, 32768, 8 * 128).astype(np.int32)
    st = cic_decim_init(order, delay)
    f = jax.jit(lambda s, v: cic_decim_apply(s, v, rate))
    outs = []
    for blk in np.split(x, 8):
        st, y = f(st, jnp.asarray(blk))
        outs.append(np.asarray(y))
    one = np_cic_decim(x, rate, order, delay)
    np.testing.assert_array_equal(np.concatenate(outs), one)


def test_decim_int32_wrap_still_exact():
    """Bit growth past 2^31 wraps mod 2^32 in BOTH forms (the hardware
    modular-arithmetic property) — outputs stay bit-identical."""
    rate, order = 16, 5          # gain 16^5 = 2^20; full-scale int16 wraps
    x = np.full(64 * rate, 32767, np.int32)
    st = cic_decim_init(order)
    _, y = cic_decim_apply(st, jnp.asarray(x), rate)
    ref = np_cic_decim(x, rate, order)
    np.testing.assert_array_equal(np.asarray(y), ref)


def test_decim_impulse_is_boxcar_power():
    rate, order, delay = 4, 3, 1
    n = 16 * rate
    x = np.zeros(n, np.int32)
    x[0] = 1
    st = cic_decim_init(order, delay)
    _, y = cic_decim_apply(st, jnp.asarray(x), rate)
    h = _boxcar_n(rate, order, delay)
    full = np.convolve(x.astype(np.float64), h)[:n]
    np.testing.assert_array_equal(np.asarray(y),
                                  full[rate - 1::rate].astype(np.int32))


def test_dc_gain():
    rate, order, delay = 8, 3, 2
    x = np.ones(32 * rate, np.int32)
    _, y = cic_decim_apply(cic_decim_init(order, delay), jnp.asarray(x), rate)
    assert int(np.asarray(y)[-1]) == cic_gain(rate, order, delay)


def test_interp_impulse_and_gain():
    rate, order = 4, 3
    x = np.zeros(32, np.int32)
    x[0] = 1
    st = cic_interp_init(order)
    _, y = cic_interp_apply(st, jnp.asarray(x), rate)
    h = _boxcar_n(rate, order)
    got = np.asarray(y)
    np.testing.assert_array_equal(got[:h.size], h.astype(np.int32))
    assert np.all(got[h.size:] == 0)


def test_interp_streaming_bit_exact():
    rate, order = 4, 3
    rng = np.random.default_rng(2)
    x = rng.integers(-1000, 1000, 256).astype(np.int32)
    st = cic_interp_init(order)
    f = jax.jit(lambda s, v: cic_interp_apply(s, v, rate))
    outs = []
    for blk in np.split(x, 4):
        st, y = f(st, jnp.asarray(blk))
        outs.append(np.asarray(y))
    st2 = cic_interp_init(order)
    _, one = cic_interp_apply(st2, jnp.asarray(x), rate)
    np.testing.assert_array_equal(np.concatenate(outs), np.asarray(one))


def test_multichannel_vmap_shape_and_exactness():
    rate, order = 8, 3
    rng = np.random.default_rng(3)
    x = rng.integers(-32768, 32768, (3, 64 * rate)).astype(np.int32)
    st = cic_decim_init(order, channel_shape=(3,))
    _, y = jax.jit(lambda s, v: cic_decim_apply(s, v, rate))(
        st, jnp.asarray(x))
    assert y.shape == (3, 64)
    for c in range(3):
        np.testing.assert_array_equal(np.asarray(y[c]),
                                      np_cic_decim(x[c], rate, order))


def test_float_path_close_to_int():
    """f32 state also works (for float front ends); matches int within
    accumulation error over a short run."""
    rate, order = 4, 2
    rng = np.random.default_rng(4)
    x = rng.standard_normal(64 * rate).astype(np.float32)
    st = cic_decim_init(order, dtype=jnp.float32)
    _, y = cic_decim_apply(st, jnp.asarray(x), rate)
    ref = np_cic_decim(x, rate, order, dtype=np.float64)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-3)


def test_compensator_flattens_droop():
    rate, order, delay = 8, 4, 1
    cutoff = 0.2                 # cycles/sample at the low rate
    comp = cic_compensator(129, rate, order, delay, cutoff=cutoff)
    # cascade frequency response at the LOW rate: CIC droop x compensator
    f = np.linspace(1e-4, cutoff * 0.9, 200)
    droop = (np.sin(np.pi * f * delay) /
             (rate * delay * np.sin(np.pi * f / rate))) ** order
    k = np.arange(comp.size) - (comp.size - 1) / 2.0
    comp_h = (comp[None, :] *
              np.exp(-2j * np.pi * np.outer(f, k))).sum(axis=1)
    cascade_db = 20 * np.log10(np.abs(droop * comp_h))
    # raw droop at band edge is significant; compensated is flat
    raw_edge_db = 20 * np.log10(abs(droop[-1]))
    assert raw_edge_db < -0.5
    assert np.max(np.abs(cascade_db)) < 0.1, np.max(np.abs(cascade_db))
