"""DDC convenience chain (ops/ddc.py)."""

import numpy as np

import jax.numpy as jnp

from srcdsp_tpu.metrics import goertzel
from srcdsp_tpu.ops.ddc import ddc_apply, ddc_init, make_ddc
from srcdsp_tpu.testing.signals import np_tone


def test_auto_decim_and_tune():
    """A narrowband channel at +0.21: the DDC picks a large decimation,
    brings the channel to baseband, preserves an in-band tone, and kills
    an out-of-band neighbor."""
    ddc = make_ddc(center=0.21, bandwidth=0.004, atten_db=70.0)
    assert ddc.decim >= 64, ddc.decim
    n = ddc.decim * 4096
    x = np_tone(n, 0.21 + 0.0012)                 # in-band (+0.0012)
    x = x + 0.9 * np_tone(n, 0.21 + 0.02)         # neighbor, out of band
    st = ddc_init(ddc)
    _, y = ddc_apply(ddc, st, jnp.asarray(x))
    y = np.asarray(y)[256:]
    f_in = 0.0012 * ddc.decim
    a_in = np.abs(goertzel(y, f_in))
    np.testing.assert_allclose(a_in, 1.0, rtol=0.05)
    # neighbor aliases somewhere — total residual power beyond the tone
    p_resid = np.mean(np.abs(y) ** 2) - a_in ** 2 / 1.0
    assert 10 * np.log10(max(p_resid, 1e-30) / 0.81) < -55.0


def test_streaming_matches_oneshot():
    ddc = make_ddc(center=-0.1, bandwidth=0.01)
    n = ddc.decim * 1024
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64)
    _, one = ddc_apply(ddc, ddc_init(ddc), jnp.asarray(x))
    st = ddc_init(ddc)
    outs = []
    for blk in np.split(x, 4):
        st, y = ddc_apply(ddc, st, jnp.asarray(blk))
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(outs), np.asarray(one),
                               atol=3e-6)


def test_too_wide_raises():
    import pytest
    with pytest.raises(ValueError):
        make_ddc(0.0, bandwidth=0.6)
    with pytest.raises(ValueError):
        make_ddc(0.1, bandwidth=0.45)   # can't even decimate by 2
