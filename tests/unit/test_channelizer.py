"""Polyphase channelizer tests (SURVEY.md C10)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srcdsp_tpu.chains.channelizer import (
    channelize_apply, channelize_full, channelizer_init, design_prototype,
    synthesize_apply, synthesizer_init,
)
from srcdsp_tpu.ops.fir import fir_full
from srcdsp_tpu.ops.nco import TWO_PI
from srcdsp_tpu.testing.signals import complex_awgn, tone


def test_channelizer_equals_mix_filter_decimate():
    """Defining property: channel m == decim_M(FIR_h(x * e^{-j2pi m n/M}))."""
    m = 8
    h = design_prototype(m, taps_per_phase=8)
    key = jax.random.PRNGKey(0)
    x = complex_awgn(key, (m * 64,))
    y = channelize_full(h, x, m)
    n = jnp.arange(x.shape[-1], dtype=jnp.float32)
    for ch in [0, 1, 3, 7]:
        mixed = x * jnp.exp(-1j * TWO_PI * ch * n / m)
        ref = np.asarray(fir_full(jnp.asarray(h), mixed, decim=m))
        got = np.asarray(y[ch])
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 1e-4, f"channel {ch}: relative L2 error {rel:.2e}"


def test_channelizer_tone_lands_in_its_channel():
    m = 16
    h = design_prototype(m, taps_per_phase=8)
    ch = 5
    x = tone(m * 128, freq=ch / m)
    y = np.asarray(channelize_full(h, x, m))
    power = (np.abs(y[:, 32:]) ** 2).mean(axis=-1)  # skip filter warmup
    assert power.argmax() == ch
    others = np.delete(power, ch)
    assert 10 * np.log10(power[ch] / others.max()) > 50.0


def test_channelizer_streaming_block_joins_exact():
    m = 8
    h = design_prototype(m, taps_per_phase=4)
    x = complex_awgn(jax.random.PRNGKey(1), (m * 96,))
    y_full = channelize_full(h, x, m)
    st = channelizer_init(h, m)
    parts = []
    nb = 4
    n = x.shape[-1] // nb
    for i in range(nb):
        st, yb = channelize_apply(h, st, x[..., i * n:(i + 1) * n], m)
        parts.append(yb)
    y_blk = jnp.concatenate(parts, axis=-1)
    np.testing.assert_array_equal(np.asarray(y_full), np.asarray(y_blk))


def test_channelizer_batched_leading_axes():
    m = 4
    h = design_prototype(m, taps_per_phase=4)
    x = complex_awgn(jax.random.PRNGKey(2), (3, m * 32))
    y = channelize_full(h, x, m)
    assert y.shape == (3, m, 32)
    y0 = channelize_full(h, x[0], m)
    np.testing.assert_array_equal(np.asarray(y[0]), np.asarray(y0))


def test_synthesis_reconstructs():
    """synthesize(channelize(x)) ~= delayed x for in-band content.

    Critically-sampled DFT banks do not cancel transition-band aliasing
    (that needs the 2x-oversampled variant), so the fidelity contract is
    for content inside channel passbands — which is also what the demod
    workloads (BASELINE config 5) consume.
    """
    m = 8
    h = design_prototype(m, taps_per_phase=16, atten_db=90.0)
    x = tone(m * 256, freq=0.25) + 0.5 * tone(m * 256, freq=-0.375, phase0=0.2)
    ya = channelize_full(h, x, m)
    st = synthesizer_init(h, m)
    _, xhat = synthesize_apply(h, st, ya, m)
    xr = np.asarray(xhat)
    xin = np.asarray(x)
    # find the integer delay with peak correlation, then measure SNR
    t = len(h)
    corr = [np.abs(np.vdot(xin[: -2 * t], xr[d: d + len(xin) - 2 * t]))
            for d in range(2 * t)]
    d = int(np.argmax(corr))
    a = xin[t: -2 * t]
    b = xr[t + d: t + d + len(a)]
    g = np.vdot(b, a) / np.vdot(b, b)  # scalar gain/phase fit
    err = a - g * b
    snr = 10 * np.log10(np.mean(np.abs(a) ** 2) / np.mean(np.abs(err) ** 2))
    assert snr > 40.0, f"reconstruction SNR {snr:.1f} dB"
