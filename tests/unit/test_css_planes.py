"""Plane-form CSS demod vs the complex-tier reference."""

import numpy as np
import jax
import jax.numpy as jnp

from srcdsp_tpu.chains import css
from srcdsp_tpu.chains.css_planes import make_css_demod_planes


import pytest


@pytest.mark.parametrize("direct", [True, False])
def test_planes_match_complex_tier(rng, direct):
    p = css.make_css_params(sf=8)
    ks = rng.integers(0, p.n, 512)
    x = css.css_modulate(p, ks)
    # noisy + rotated: decisions must still match the complex tier
    x = x * np.exp(1j * 0.77)
    x += (0.2 * (rng.standard_normal(x.size)
                 + 1j * rng.standard_normal(x.size))).astype(np.complex64)
    frames = x.reshape(-1, p.n)
    ref, _ = css.css_demod(p, x)
    demod = jax.jit(make_css_demod_planes(p, direct=direct))
    got, mag = demod(jnp.asarray(frames.real.astype(np.float32)),
                     jnp.asarray(frames.imag.astype(np.float32)))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    assert np.all(np.asarray(mag) > 0)


def test_planes_exact_clean_all_shifts():
    p = css.make_css_params(sf=6)
    ks = np.arange(p.n)
    x = css.css_modulate(p, ks).reshape(-1, p.n)
    demod = jax.jit(make_css_demod_planes(p))
    got, mag = demod(jnp.asarray(x.real.astype(np.float32)),
                     jnp.asarray(x.imag.astype(np.float32)))
    np.testing.assert_array_equal(np.asarray(got), ks)
    # clean full-scale tone: |peak|^2 == N^2
    np.testing.assert_allclose(np.asarray(mag), float(p.n) ** 2, rtol=1e-3)


def test_llr_planes_match_complex_tier(rng):
    p = css.make_css_params(sf=8, cr=4)
    payload = bytes(rng.integers(0, 256, 24, dtype=np.uint8))
    tx = css.css_modulate(p, css.css_encode_frame(p, payload))
    sigma = np.sqrt(10 ** (12 / 10) / 2)       # near the waterline
    x = (tx + sigma * (rng.standard_normal(tx.size)
                       + 1j * rng.standard_normal(tx.size))
         ).astype(np.complex64)
    ref = css.css_soft_llrs(p, x)
    from srcdsp_tpu.chains.css_planes import make_css_llr_planes
    fn = jax.jit(make_css_llr_planes(p))
    fr = x.reshape(-1, p.n)
    got = np.asarray(fn(jnp.asarray(fr.real.astype(np.float32)),
                        jnp.asarray(fr.imag.astype(np.float32))))
    # values match to float tolerance AND the decoded frame agrees
    np.testing.assert_allclose(got, ref, rtol=2e-4,
                               atol=2e-3 * np.abs(ref).max())
    out_r, ok_r = css.css_decode_frame_soft(p, ref, len(payload))
    out_g, ok_g = css.css_decode_frame_soft(p, got, len(payload))
    assert ok_r == ok_g and out_r == out_g
