"""CIC (cascaded integrator-comb) decimator / interpolator (beyond parity).

CIC filters are the standard first decimation stage in SDR front ends
(reference family scope: FIR/decimating filters only — BASELINE.json). A
hardware CIC is prized for being multiplier-free; on TPU multiplies are
free and SEQUENTIAL loops are the enemy, so the TPU-native form keeps the
CIC's exact semantics while turning both halves into vector ops:

- N integrator stages: each is a prefix sum. `jnp.cumsum` over the block
  plus a carried scalar accumulator per stage reproduces the per-sample
  recurrence EXACTLY — in int32 the cumsum wraps mod 2^32 (two's
  complement), which is precisely the hardware CIC's modular-arithmetic
  trick, so bit growth never corrupts the result as long as the comb
  section's subtraction also wraps (it does: int32 subtract).
- Decimate by R: a strided slice at the integrator output (phase = last
  sample of each group of R, the standard convention).
- N comb stages at the LOW rate: y[m] - y[m-M] with an M-sample carried
  tail per stage — a shift-and-subtract, fully vectorized.

DC gain is (R*M)^N. The impulse response equals the N-fold convolution of
a boxcar of length R*M (verified against that FIR-equivalent in tests).

The interpolator is the transpose: combs at the low rate, zero-stuff by R,
integrators at the high rate.

On-chip note: cumsum, strided reshape-slices, and int32 arithmetic are all
in the axon-verified op set; the op is restricted-backend friendly.

`cic_compensator` designs the usual inverse-sinc^N FIR that flattens the
CIC's passband droop, for use with `ops.fir` at the decimated rate.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.types import F32

__all__ = [
    "CicState", "cic_decim_init", "cic_decim_apply", "cic_gain",
    "cic_interp_init", "cic_interp_apply", "cic_compensator",
    "np_cic_decim",
]


class CicState(NamedTuple):
    """integ: [..., N] per-stage accumulators (entry values for the next
    block); combs: [..., N, M] per-stage delay lines at the comb rate."""

    integ: jax.Array
    combs: jax.Array


def cic_gain(rate: int, order: int, delay: int = 1) -> int:
    """DC gain (R*M)^N — divide by this to normalize."""
    return (rate * delay) ** order


def _integrators(x: jax.Array, carry: jax.Array
                 ) -> tuple[jax.Array, jax.Array]:
    """N cascaded running sums over the last axis. carry: [..., N] entry
    accumulators; returns (y, new_carry). Exact in int32 (wraps) and in
    f32 within accumulation error."""
    n = carry.shape[-1]
    y = x
    outs = []
    for i in range(n):
        y = jnp.cumsum(y, axis=-1) + carry[..., i:i + 1]
        outs.append(y[..., -1:])
    return y, jnp.concatenate(outs, axis=-1)


def _combs(y: jax.Array, tails: jax.Array) -> tuple[jax.Array, jax.Array]:
    """N cascaded y[m] - y[m-M] stages. tails: [..., N, M] carried history;
    returns (out, new_tails)."""
    n, m = tails.shape[-2], tails.shape[-1]
    new_tails = []
    for i in range(n):
        full = jnp.concatenate([tails[..., i, :], y], axis=-1)
        new_tails.append(full[..., full.shape[-1] - m:][..., None, :])
        y = full[..., m:] - full[..., :-m]
    return y, jnp.concatenate(new_tails, axis=-2)


def cic_decim_init(order: int, delay: int = 1, channel_shape: tuple = (),
                   dtype=jnp.int32) -> CicState:
    return CicState(
        integ=jnp.zeros((*channel_shape, order), dtype),
        combs=jnp.zeros((*channel_shape, order, delay), dtype))


def cic_decim_apply(state: CicState, x: jax.Array, rate: int
                    ) -> tuple[CicState, jax.Array]:
    """x: [..., B] with B % rate == 0 -> y: [..., B/rate].

    Streaming-exact: concatenated block outputs equal the one-shot run
    (bit-exact in int32; tested). Output is NOT gain-normalized — scale by
    1/cic_gain(...) downstream (after the int path, to keep it exact).
    """
    b = x.shape[-1]
    if b % rate != 0:
        raise ValueError(f"block length {b} not divisible by rate {rate}")
    x = x.astype(state.integ.dtype)
    y, integ = _integrators(x, state.integ)
    # phase convention: sample the LAST integrator output of each group
    y = y.reshape(*y.shape[:-1], b // rate, rate)[..., rate - 1]
    y, combs = _combs(y, state.combs)
    return CicState(integ=integ, combs=combs), y


def cic_interp_init(order: int, delay: int = 1, channel_shape: tuple = (),
                    dtype=jnp.int32) -> CicState:
    return CicState(
        integ=jnp.zeros((*channel_shape, order), dtype),
        combs=jnp.zeros((*channel_shape, order, delay), dtype))


def cic_interp_apply(state: CicState, x: jax.Array, rate: int
                     ) -> tuple[CicState, jax.Array]:
    """x: [..., B] -> y: [..., B*rate] (transpose structure: combs at the
    low rate, zero-stuff, integrators at the high rate)."""
    x = x.astype(state.integ.dtype)
    y, combs = _combs(x, state.combs)
    up = jnp.zeros((*y.shape, rate), y.dtype).at[..., 0].set(y)
    up = up.reshape(*y.shape[:-1], y.shape[-1] * rate)
    out, integ = _integrators(up, state.integ)
    return CicState(integ=integ, combs=combs), out


def cic_compensator(num_taps: int, rate: int, order: int, delay: int = 1,
                    cutoff: float = 0.25) -> np.ndarray:
    """Inverse-sinc^N compensation FIR for the decimated rate.

    Frequency-sampled design: target |H| = (x/sin x)^N up to `cutoff`
    (cycles/sample at the LOW rate), rolled off to 0 past it; linear-phase
    taps via IDFT + Hamming window. Cascade CIC -> this FIR flattens the
    passband droop to < 0.1 dB over [0, cutoff*0.9] (tested).
    """
    if num_taps % 2 == 0:
        raise ValueError("num_taps must be odd (type-I linear phase)")
    ngrid = 16 * num_taps
    f = np.linspace(0.0, 0.5, ngrid)
    # CIC droop at the low rate: sin(pi f M)/ (RM sin(pi f / R)) per stage
    arg_n = np.pi * f * delay
    arg_d = np.pi * f / rate
    with np.errstate(invalid="ignore", divide="ignore"):
        droop = np.where(
            f == 0.0, 1.0,
            (np.sin(arg_n) / (rate * delay * np.sin(arg_d))) ** order)
    target = np.where(f <= cutoff, 1.0 / np.abs(droop), 0.0)
    # weighted least squares on the symmetric-tap basis: passband exact,
    # transition band (cutoff .. 1.25*cutoff) don't-care, stopband -> 0
    w = np.where(f <= cutoff, 10.0, np.where(f <= 1.25 * cutoff, 0.0, 1.0))
    half = (num_taps - 1) // 2
    m = np.arange(1, half + 1)
    basis = np.concatenate(
        [np.ones((ngrid, 1)), 2.0 * np.cos(2 * np.pi * np.outer(f, m))],
        axis=1)                                  # [ngrid, half+1]
    sw = np.sqrt(w)[:, None]
    a, *_ = np.linalg.lstsq(basis * sw, target * sw[:, 0], rcond=None)
    taps = np.concatenate([a[::-1][:half], a])   # symmetric, length T
    # normalize DC gain to 1 (droop(0) is 1 by construction)
    taps /= taps.sum()
    return taps.astype(np.float32)


def np_cic_decim(x: np.ndarray, rate: int, order: int, delay: int = 1,
                 dtype=np.int32) -> np.ndarray:
    """Per-sample sequential twin (hardware-style loop) for tests.

    int32 arithmetic wraps exactly like the block form's cumsum."""
    x = np.asarray(x, dtype)
    with np.errstate(over="ignore"):
        y = x
        for _ in range(order):
            y = np.cumsum(y, axis=-1, dtype=dtype)
        y = y[..., rate - 1::rate]
        m = delay
        for _ in range(order):
            pad = np.concatenate(
                [np.zeros((*y.shape[:-1], m), dtype), y], axis=-1)
            y = pad[..., m:] - pad[..., :-m]
    return y
