"""Plane-form fused op vs the complex-path reference (SURVEY.md C2–C4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srcdsp_tpu.ops.fir import fir_full
from srcdsp_tpu.ops.nco import NcoState, freq_to_word, nco_apply, nco_init
from srcdsp_tpu.ops.planes import (
    fir_decim_planes, fused_mix_fir_decim_planes, mix_planes, nco_planes,
    phase_coef_matrix, plane_hist_len,
)
from srcdsp_tpu.ops.window import lowpass
from srcdsp_tpu.testing.signals import complex_awgn


def _planes(x):
    return (jnp.real(x)[None, :].astype(jnp.float32),
            jnp.imag(x)[None, :].astype(jnp.float32))


def test_nco_planes_matches_complex():
    word = freq_to_word(0.0371)
    c, s = nco_planes(jnp.asarray(0, jnp.uint32), word, 1024)
    _, w = nco_apply(word, nco_init(), jnp.ones(1024, jnp.complex64))
    np.testing.assert_allclose(np.asarray(c[0]), np.real(np.asarray(w)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s[0]), np.imag(np.asarray(w)), atol=1e-6)


@pytest.mark.parametrize("t,m", [(64, 2), (64, 4), (63, 4), (33, 8), (8, 1)])
def test_fir_decim_planes_matches_fir_full(t, m):
    taps = lowpass(t, 0.4 / max(m, 2))
    x = complex_awgn(jax.random.PRNGKey(0), (m * 256,))
    h = plane_hist_len(t, m)
    xr, xi = _planes(jnp.concatenate([jnp.zeros(h, jnp.complex64), x]))
    coef = jnp.asarray(phase_coef_matrix(taps, m))
    yr, yi = fir_decim_planes(coef, xr, xi, m)
    ref = np.asarray(fir_full(jnp.asarray(taps), x, decim=m))
    got = np.asarray(yr[0]) + 1j * np.asarray(yi[0])
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 2e-6, f"rel L2 {rel:.2e}"


def test_fused_matches_two_stage():
    t, m, f = 64, 4, 0.123
    taps = lowpass(t, 0.1)
    word = freq_to_word(f)
    x = complex_awgn(jax.random.PRNGKey(1), (m * 512,))
    # reference: complex mix then fir
    _, mixed = nco_apply(word, nco_init(), x)
    ref = np.asarray(fir_full(jnp.asarray(taps), mixed, decim=m))
    # planes: history-prepended; history mixed with row_offset = -H
    h = plane_hist_len(t, m)
    xr, xi = _planes(jnp.concatenate([jnp.zeros(h, jnp.complex64), x]))
    coef = jnp.asarray(phase_coef_matrix(taps, m))
    # phase of sample 0 of x must be word0 + 0; history occupies rows first,
    # so pass word0 shifted back by H samples
    word0 = jnp.asarray((-h * int(word)) % (1 << 32), jnp.uint32)
    yr, yi = jax.jit(
        lambda r, i: fused_mix_fir_decim_planes(coef, word0, word, r, i, m)
    )(xr, xi)
    got = np.asarray(yr[0]) + 1j * np.asarray(yi[0])
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 2e-6, f"rel L2 {rel:.2e}"


def test_fused_streaming_chunks_bit_exact():
    """Two chunked calls == one big call, bit-exact (u32 phase + exact halo)."""
    t, m, f = 32, 2, 0.0567
    taps = lowpass(t, 0.2)
    word = freq_to_word(f)
    n = m * 512
    x = complex_awgn(jax.random.PRNGKey(2), (n,))
    h = plane_hist_len(t, m)
    coef = jnp.asarray(phase_coef_matrix(taps, m))
    xp = jnp.concatenate([jnp.zeros(h, jnp.complex64), x])
    xr, xi = _planes(xp)
    word0 = jnp.asarray((-h * int(word)) % (1 << 32), jnp.uint32)
    yr_a, yi_a = fused_mix_fir_decim_planes(coef, word0, word, xr, xi, m)
    # chunked: second call's history = tail of first chunk's raw input
    half = n // 2
    xr1, xi1 = _planes(xp[: h + half])
    xr2, xi2 = _planes(xp[half: h + n])
    yr1, yi1 = fused_mix_fir_decim_planes(coef, word0, word, xr1, xi1, m)
    yr2, yi2 = fused_mix_fir_decim_planes(coef, word0, word, xr2, xi2, m,
                                          row_offset=half)
    np.testing.assert_array_equal(
        np.asarray(jnp.concatenate([yr1, yr2], axis=-1)), np.asarray(yr_a))
    np.testing.assert_array_equal(
        np.asarray(jnp.concatenate([yi1, yi2], axis=-1)), np.asarray(yi_a))


def test_planes_from_int16_matches_host_conversion():
    from srcdsp_tpu.ops.planes import planes_from_int16
    from srcdsp_tpu.types import np_int16_to_complex64
    rng = np.random.default_rng(0)
    iq = rng.integers(-32768, 32768, size=(1, 2048), dtype=np.int16)
    xr, xi = planes_from_int16(jnp.asarray(iq))
    ref = np_int16_to_complex64(iq)
    np.testing.assert_array_equal(np.asarray(xr), ref.real)
    np.testing.assert_array_equal(np.asarray(xi), ref.imag)


def test_planes_to_int16_roundtrip_bit_exact():
    from srcdsp_tpu.ops.planes import planes_from_int16, planes_to_int16
    from srcdsp_tpu.types import np_complex64_to_int16
    rng = np.random.default_rng(1)
    xr = jnp.asarray(np.clip(rng.standard_normal((1, 512)) * 0.4, -1, 1)
                     .astype(np.float32))
    xi = jnp.asarray(np.clip(rng.standard_normal((1, 512)) * 0.4, -1, 1)
                     .astype(np.float32))
    iq = planes_to_int16(xr, xi)
    ref = np_complex64_to_int16(np.asarray(xr) + 1j * np.asarray(xi))
    np.testing.assert_array_equal(np.asarray(iq), ref)
    # and back
    r2, i2 = planes_from_int16(iq)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(xr), atol=0.5 / 32767 + 1e-7)
