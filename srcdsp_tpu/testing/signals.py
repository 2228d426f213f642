"""Signal generators (SURVEY.md C7): tones, noise, modulated symbol streams.

The reference ships stateful C++ generator classes for test vectors. Here
they are pure functions of a `jax.random` key or sample index — deterministic
by construction, reproducible across hosts, and usable as both test fixtures
and live sources.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.types import CF32, F32
from srcdsp_tpu.ops.nco import TWO_PI


def tone(n: int, freq: float, phase0: float = 0.0, amplitude: float = 1.0,
         channel_shape: tuple = ()) -> jnp.ndarray:
    """Complex exponential at `freq` cycles/sample: a*exp(j*2pi*(f*n + p0))."""
    k = jnp.arange(n, dtype=F32)
    ph = (freq * k + phase0) % 1.0
    x = amplitude * jnp.exp(1j * TWO_PI * ph)
    return jnp.broadcast_to(x.astype(CF32), (*channel_shape, n))


def complex_awgn(key: jax.Array, shape: tuple, power: float = 1.0) -> jnp.ndarray:
    """Circular complex white Gaussian noise with total power `power`."""
    kr, ki = jax.random.split(key)
    s = jnp.sqrt(power / 2.0)
    return (s * jax.random.normal(kr, shape) +
            1j * s * jax.random.normal(ki, shape)).astype(CF32)


def random_bits(key: jax.Array, shape: tuple) -> jnp.ndarray:
    return jax.random.bernoulli(key, 0.5, shape).astype(jnp.int32)


def fsk_baseband(bits: jnp.ndarray, sps: int, dev: float) -> jnp.ndarray:
    """CPFSK baseband: frequency +/-dev (cycles/sample) per bit, phase-continuous.

    bits: [..., Nsym] of {0,1} -> [..., Nsym*sps] complex64.
    """
    f = (2.0 * bits.astype(F32) - 1.0) * dev            # [..., Nsym]
    f = jnp.repeat(f, sps, axis=-1)                      # [..., N]
    ph = jnp.cumsum(f, axis=-1) - f                      # phase BEFORE each step
    return jnp.exp(1j * TWO_PI * (ph % 1.0)).astype(CF32)


def psk_symbols(key: jax.Array, nsym: int, order: int = 4,
                channel_shape: tuple = ()) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Random M-PSK symbols. Returns (symbol indices [..., n], complex symbols)."""
    idx = jax.random.randint(key, (*channel_shape, nsym), 0, order)
    # Gray-agnostic: symbol m -> exp(j*2pi*(m + 0.5)/M) for QPSK-style offset
    off = 0.5 if order == 4 else 0.0
    sym = jnp.exp(1j * TWO_PI * (idx.astype(F32) + off) / order).astype(CF32)
    return idx, sym


def upsample_pulse(symbols: jnp.ndarray, sps: int, pulse: jnp.ndarray) -> jnp.ndarray:
    """Zero-stuff symbols by sps and pulse-shape (linear modulation TX)."""
    from srcdsp_tpu.ops.resample import resample_full
    return resample_full(pulse, symbols, up=sps, down=1)


def np_tone(n: int, freq: float, phase0: float = 0.0, amplitude: float = 1.0) -> np.ndarray:
    k = np.arange(n, dtype=np.float64)
    return (amplitude * np.exp(2j * np.pi * ((freq * k + phase0) % 1.0))).astype(np.complex64)


def gmsk_baseband(bits, sps: int, bt: float | None = 0.3,
                  span: int = 3) -> np.ndarray:
    """GMSK/MSK baseband: Gaussian-filtered CPM with h = 1/2.

    bits: [..., Nsym] of {0,1} -> [..., Nsym*sps] complex64, constant
    envelope. Each bit steps the phase by +-pi/2 in total (+-0.25
    cycles), spread over `span` bit periods by the Gaussian frequency
    pulse with the given BT product (bt=None selects the rectangular
    pulse = pure MSK, where the step completes within its own bit).
    numpy host-side fixture, like the other generators here.
    """
    bits = np.asarray(bits)
    nrz = 2.0 * bits.astype(np.float64) - 1.0
    if bt is None:
        p = np.ones(sps) / sps * 0.25            # MSK: rect pulse
    else:
        from srcdsp_tpu.ops.window import gaussian_freq_pulse
        p = gaussian_freq_pulse(sps, bt, span)   # integrates to h/2 cycles
    up = np.zeros((*nrz.shape[:-1], nrz.shape[-1] * sps))
    up[..., ::sps] = nrz
    freq = np.empty_like(up)                     # cycles/sample
    pad = np.zeros((*up.shape[:-1], p.size - 1))
    full = np.concatenate([up, pad], axis=-1)
    for idx0 in np.ndindex(*up.shape[:-1]):
        freq[idx0] = np.convolve(full[idx0], p)[: up.shape[-1]]  # causal
    phase = np.cumsum(freq, axis=-1) - freq
    return np.exp(2j * np.pi * phase).astype(np.complex64)


def zadoff_chu(root: int, length: int) -> np.ndarray:
    """Zadoff-Chu CAZAC sequence (LTE/NR sync-style preambles).

    x[n] = exp(-j*pi*root*n*(n + N%2) / N). With gcd(root, N) == 1 the
    sequence has constant modulus AND zero cyclic autocorrelation at every
    nonzero lag — the ideal preamble for chains.framesync correlators.
    """
    if np.gcd(root, length) != 1:
        raise ValueError(f"gcd(root={root}, N={length}) must be 1")
    n = np.arange(length, dtype=np.float64)
    ph = root * n * (n + (length % 2)) / length
    return np.exp(-1j * np.pi * ph).astype(np.complex64)


def chirp(n: int, f0: float, f1: float, amplitude: float = 1.0) -> np.ndarray:
    """Linear FM (LFM) chirp sweeping f0 -> f1 cycles/sample over n
    samples (f64 host phase, exact). The classic pulse-compression
    waveform: a matched filter (chains.framesync) compresses it by the
    time-bandwidth product with ~-13 dB Doppler-free sidelobes."""
    k = np.arange(n, dtype=np.float64)
    ph = f0 * k + (f1 - f0) * k * k / (2.0 * n)
    return (amplitude * np.exp(2j * np.pi * ph)).astype(np.complex64)


def ook_baseband(bits, sps: int, depth: float = 1.0,
                 rise: int = 0) -> np.ndarray:
    """OOK/ASK baseband fixture: bits: [..., Nbit] {0,1} ->
    [..., Nbit*sps] complex64 with on-level 1 and off-level (1-depth)
    (depth=1 is pure on-off keying). rise>0 smooths edges with a
    length-rise boxcar (edge-filtered transmitters). numpy host-side,
    like the other generators here."""
    bits = np.asarray(bits)
    amp = (1.0 - depth) + depth * bits.astype(np.float64)
    env = np.repeat(amp, sps, axis=-1)
    if rise > 1:
        k = np.ones(rise) / rise
        pad = np.concatenate([env[..., :1]] * (rise - 1) + [env], axis=-1)
        env = np.apply_along_axis(
            lambda v: np.convolve(v, k, mode="valid"), -1, pad)
    return env.astype(np.complex64)


def manchester_encode(bits) -> np.ndarray:
    """IEEE-convention Manchester line code: 1 -> (1,0), 0 -> (0,1).
    bits: [..., Nbit] -> chips [..., 2*Nbit] {0,1} int."""
    bits = np.asarray(bits).astype(np.int64)
    chips = np.stack([bits, 1 - bits], axis=-1)
    return chips.reshape(*bits.shape[:-1], 2 * bits.shape[-1])
