"""Half-band decimator tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srcdsp_tpu.ops.fir import fir_full
from srcdsp_tpu.ops.halfband import (
    cascade_apply, cascade_init, design_halfband, halfband_decim,
    halfband_init, np_halfband_decim)


def _noise(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) + 1j * rng.standard_normal(n)
            ).astype(np.complex64)


@pytest.mark.parametrize("t", [7, 11, 31, 63])
def test_design_structure(t):
    h = design_halfband(t)
    c = (t - 1) // 2
    # even taps zero except... the off-center EVEN-index taps are the
    # nonzeros (c odd); ODD-index taps besides the center are zero
    odd_idx = np.arange(1, t, 2)
    odd_idx = odd_idx[odd_idx != c]
    assert np.all(h[odd_idx] == 0.0)
    assert h[c] != 0.0
    # symmetric, unit DC gain
    np.testing.assert_allclose(h, h[::-1], atol=1e-15)
    np.testing.assert_allclose(h.sum(), 1.0, atol=1e-12)
    # half-band property: zero-phase amplitudes are COMPLEMENTARY,
    # A(f) + A(0.5 - f) = 1 (exact for the zero-even-tap structure)
    f = np.linspace(0.0, 0.5, 101)
    amp = (h[None, :] * np.cos(2 * np.pi * np.outer(f, np.arange(t) - c))
           ).sum(axis=1)
    amp_m = (h[None, :] * np.cos(2 * np.pi * np.outer(0.5 - f,
                                                      np.arange(t) - c))
             ).sum(axis=1)
    np.testing.assert_allclose(amp + amp_m, 1.0, atol=1e-12)


def test_split_matches_full_rate_fir():
    """The polyphase split equals the plain decimating FIR bit-for-bit in
    semantics (same reduction, fewer MACs)."""
    h = design_halfband(31)
    x = _noise(4096, seed=1)
    st = halfband_init(h)
    st, y = jax.jit(lambda s, v: halfband_decim(h, s, v))(st, jnp.asarray(x))
    ref = np_halfband_decim(h, np.asarray(x).astype(np.complex128))
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5)
    # and against the framework's own general decimating FIR
    ref2 = np.asarray(fir_full(jnp.asarray(h), jnp.asarray(x), decim=2))
    np.testing.assert_allclose(np.asarray(y), ref2, atol=1e-5)


def test_streaming_matches_oneshot():
    h = design_halfband(31)
    x = _noise(4096, seed=2)
    st = halfband_init(h)
    f = jax.jit(lambda s, v: halfband_decim(h, s, v))
    outs = []
    for blk in np.split(np.asarray(x), 8):
        st, y = f(st, jnp.asarray(blk))
        outs.append(np.asarray(y))
    _, one = halfband_decim(h, halfband_init(h), jnp.asarray(x))
    np.testing.assert_allclose(np.concatenate(outs), np.asarray(one),
                               atol=1e-6)


def test_cascade_decimates_by_8():
    stages = [design_halfband(31), design_halfband(19), design_halfband(11)]
    n = 1 << 14
    # tone inside the final passband survives; tone near the first
    # stopband dies
    k = np.arange(n)
    good = np.exp(2j * np.pi * 0.01 * k).astype(np.complex64)
    bad = np.exp(2j * np.pi * 0.45 * k).astype(np.complex64)
    sts = cascade_init(stages)
    sts, yg = cascade_apply(stages, sts, jnp.asarray(good))
    sts2 = cascade_init(stages)
    _, yb = cascade_apply(stages, sts2, jnp.asarray(bad))
    assert yg.shape[-1] == n // 8
    pg = float(jnp.mean(jnp.abs(yg[256:]) ** 2))
    pb = float(jnp.mean(jnp.abs(yb[256:]) ** 2))
    assert pg > 0.9
    assert 10 * np.log10(pb / pg) < -60.0


def test_cascade_streaming():
    stages = [design_halfband(23), design_halfband(11)]
    x = _noise(4096, seed=3)
    sts = cascade_init(stages)
    f = jax.jit(lambda s, v: cascade_apply(stages, s, v))
    outs = []
    for blk in np.split(np.asarray(x), 4):
        sts, y = f(sts, jnp.asarray(blk))
        outs.append(np.asarray(y))
    _, one = cascade_apply(stages, cascade_init(stages), jnp.asarray(x))
    np.testing.assert_allclose(np.concatenate(outs), np.asarray(one),
                               atol=1e-6)


def test_multichannel():
    h = design_halfband(19)
    x = np.stack([_noise(1024, seed=4), _noise(1024, seed=5)])
    st = halfband_init(h, channel_shape=(2,))
    st, y = halfband_decim(h, st, jnp.asarray(x))
    assert y.shape == (2, 512)
    for c in range(2):
        ref = np_halfband_decim(h, x[c].astype(np.complex128))
        np.testing.assert_allclose(np.asarray(y[c]), ref, atol=1e-5)
