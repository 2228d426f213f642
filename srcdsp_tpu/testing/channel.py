"""Channel models (beyond parity): reproducible impairment injection.

Partners of the estimation/correction side (ops.impairments, chains.ofdm's
CFO machinery, chains.equalizer): everything here is a pure function of a
`jax.random` key — deterministic, jit-able, usable both as test fixtures
and for Monte-Carlo link simulation at TPU speed (the fading generator is
one [M, N] sinusoid matmul; vmap the key for thousands of realizations).

Contents: static multipath application, exponential-PDP Rayleigh tap
draws, time-varying flat Rayleigh fading with the Jakes Doppler spectrum
(Pop-Beaulieu sum-of-sinusoids), Wiener (free-running oscillator) phase
noise, and SNR-calibrated AWGN.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.testing.signals import complex_awgn
from srcdsp_tpu.types import CF32, F32

__all__ = [
    "multipath_apply", "rayleigh_taps", "jakes_fading", "phase_noise",
    "add_noise_snr",
]


def multipath_apply(h: jax.Array, x: jax.Array) -> jnp.ndarray:
    """Static FIR channel: y[n] = sum_k h[k] x[n-k], same length as x
    (causal, zero initial state). h: [L] complex taps — runs through
    ops.fir's complex-tap feature-mixing conv."""
    from srcdsp_tpu.ops.fir import fir_full
    return fir_full(jnp.asarray(h, CF32), x.astype(CF32))


def rayleigh_taps(key: jax.Array, num_taps: int, decay: float = 1.0
                  ) -> jnp.ndarray:
    """One static Rayleigh multipath realization with an exponential
    power-delay profile: E|h[k]|^2 ~ exp(-k/decay), normalized to unit
    total power. Tap 0 is NOT line-of-sight (pure Rayleigh)."""
    pdp = np.exp(-np.arange(num_taps) / decay)
    pdp = pdp / pdp.sum()
    g = complex_awgn(key, (num_taps,), power=1.0)
    return (g * jnp.asarray(np.sqrt(pdp), F32)).astype(CF32)


def jakes_fading(key: jax.Array, n: int, doppler: float, num_sin: int = 16
                 ) -> jnp.ndarray:
    """Time-varying flat Rayleigh fading g[n], unit average power, with
    the Jakes Doppler spectrum (max Doppler `doppler` cycles/sample).

    Pop-Beaulieu sum-of-sinusoids: M sinusoids at f_m = fd*cos(alpha_m)
    with random phases per quadrature — wide-sense stationary, unit power,
    autocorrelation -> J0(2*pi*fd*tau). One [M, N]-shaped cos evaluation
    + a reduction; vmap over keys for Monte-Carlo."""
    k1, k2, k3 = jax.random.split(key, 3)
    m = num_sin
    # distinct arrival angles per realization (random offset breaks the
    # deterministic-angle correlation artifacts of classic Jakes)
    alpha = (2 * jnp.pi * (jnp.arange(m, dtype=F32) + 0.5) / (4 * m)
             + jax.random.uniform(k1, (m,), F32, 0.0, 2 * np.pi / (4 * m)))
    fm = doppler * jnp.cos(alpha)                       # [M]
    t = jnp.arange(n, dtype=F32)
    phi_i = jax.random.uniform(k2, (m, 1), F32, 0.0, 2 * np.pi)
    phi_q = jax.random.uniform(k3, (m, 1), F32, 0.0, 2 * np.pi)
    arg = 2 * jnp.pi * fm[:, None] * t[None, :]
    gi = jnp.sum(jnp.cos(arg + phi_i), axis=0)
    gq = jnp.sum(jnp.cos(arg + phi_q), axis=0)
    return (jnp.sqrt(1.0 / m) * (gi + 1j * gq)).astype(CF32)


def phase_noise(key: jax.Array, n: int, linewidth: float) -> jnp.ndarray:
    """Free-running-oscillator (Wiener) phase noise multiplier e^{j theta},
    theta a random walk with Var[theta[n]] = 2*pi*linewidth*n (linewidth =
    3 dB width in cycles/sample; typical values 1e-6..1e-4)."""
    std = np.sqrt(2.0 * np.pi * linewidth)
    steps = std * jax.random.normal(key, (n,), F32)
    theta = jnp.cumsum(steps)
    return jnp.exp(1j * theta).astype(CF32)


def add_noise_snr(key: jax.Array, x: jax.Array, snr_db: float) -> jnp.ndarray:
    """AWGN at `snr_db` below the MEASURED signal power of x."""
    p = jnp.mean(jnp.abs(x) ** 2)
    return (x + complex_awgn(key, x.shape, power=1.0)
            * jnp.sqrt(p * 10.0 ** (-snr_db / 10.0))).astype(CF32)
