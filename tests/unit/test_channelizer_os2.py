"""2x-oversampled channelizer tests: the NPR path (SURVEY.md C10)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srcdsp_tpu.chains.channelizer import (
    channelize_os2_apply, channelize_os2_full, channelizer_init,
    design_prototype, synthesize_os2_apply, synthesizer_os2_init,
)
from srcdsp_tpu.ops.fir import fir_full
from srcdsp_tpu.ops.nco import TWO_PI
from srcdsp_tpu.ops.window import root_raised_cosine
from srcdsp_tpu.testing.signals import complex_awgn, tone


def test_os2_equals_mix_filter_decimate_halfM():
    m = 8
    h = design_prototype(m, taps_per_phase=8)
    x = complex_awgn(jax.random.PRNGKey(0), (m * 64,))
    y = channelize_os2_full(h, x, m)
    n = jnp.arange(x.shape[-1], dtype=jnp.float32)
    for ch in [0, 1, 3, 5, 7]:
        mixed = x * jnp.exp(-1j * TWO_PI * ch * n / m)
        ref = np.asarray(fir_full(jnp.asarray(h), mixed, decim=m // 2))
        got = np.asarray(y[ch])
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 1e-4, f"channel {ch}: rel {rel:.2e}"


def test_os2_streaming_block_joins_exact():
    m = 8
    h = design_prototype(m, taps_per_phase=4)
    x = complex_awgn(jax.random.PRNGKey(1), (m * 48,))
    whole = channelize_os2_full(h, x, m)
    st = channelizer_init(h, m)
    parts = []
    nb = 4
    n = x.shape[-1] // nb
    for i in range(nb):
        st, yb = channelize_os2_apply(h, st, x[..., i * n:(i + 1) * n], m)
        parts.append(yb)
    np.testing.assert_array_equal(
        np.asarray(jnp.concatenate(parts, axis=-1)), np.asarray(whole))


def test_os2_npr_reconstruction_broadband():
    """The property the critically-sampled bank cannot deliver: broadband
    noise reconstructs through analysis+synthesis."""
    m = 8
    # root-Nyquist prototype at M samples/symbol: near power-complementary
    h = root_raised_cosine(m, 16, beta=0.75).astype(np.float32)
    h = h / h.sum()
    x = complex_awgn(jax.random.PRNGKey(2), (m * 512,))
    ya = channelize_os2_full(h, x, m)
    st = synthesizer_os2_init(h, m)
    _, xhat = synthesize_os2_apply(h, st, ya, m)
    xr = np.asarray(xhat)
    xin = np.asarray(x)
    t = len(h)
    corr = [np.abs(np.vdot(xin[: -3 * t], xr[d: d + len(xin) - 3 * t]))
            for d in range(2 * t)]
    d = int(np.argmax(corr))
    a = xin[t: -3 * t]
    b = xr[t + d: t + d + len(a)]
    g = np.vdot(b, a) / np.vdot(b, b)
    err = a - g * b
    snr = 10 * np.log10(np.mean(np.abs(a) ** 2) / np.mean(np.abs(err) ** 2))
    assert snr > 40.0, f"broadband NPR reconstruction SNR {snr:.1f} dB"
