"""Symbol-timing synchronization shared by the demod chains (SURVEY.md C8/C9).

The reference recovers symbol timing with a per-sample feedback loop carrying
a fractional-sample phase (SURVEY.md §3.1c) — an inherently sequential
recurrence. A per-sample loop is poison on a vector machine, so the
TPU-native design is the classic *feedforward* block synchronizer of
Oerder & Meyr (square-law timing tone estimation):

    C      = sum_n s[n] * exp(-j*2*pi*n/sps)        (one reduction, VPU)
    tau    = -sps/(2*pi) * angle(C)  (mod sps)       (peak-energy offset)

where s[n] is a non-negative timing metric (|x|^2 for linear modulations,
squared discriminator output for FSK). Block-to-block continuity comes from
carrying the *complex* accumulator C with a one-pole forgetting factor — the
angle average is then properly circular, and because every block length is a
multiple of sps, the local-index exponential is phase-continuous across
blocks by construction.

Symbol values are read at t_k = k*sps + tau by linear interpolation — a
vectorized gather, no scan anywhere.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from srcdsp_tpu.ops.nco import TWO_PI
from srcdsp_tpu.types import CF32, F32


class TimingState(NamedTuple):
    """Carried timing-tone accumulator (complex) and an sps+1-sample tail.

    `acc` is the exponentially-forgotten sum of s[n]*exp(-j*2*pi*n/sps):
    its angle encodes the current symbol-timing offset. `last` is the final
    sps+1 samples of the previous block, so every interpolated read lands on
    already-seen samples — the sampler runs one symbol behind the input, a
    constant streaming group delay.
    """

    acc: jax.Array   # [...] complex64 timing-tone accumulator
    last: jax.Array  # [..., sps+1] same dtype as the sampled signal


def timing_init(sps: int, channel_shape: tuple = (), dtype=CF32) -> TimingState:
    return TimingState(
        acc=jnp.zeros(channel_shape, dtype=CF32),
        last=jnp.zeros((*channel_shape, sps + 1), dtype=dtype),
    )


def timing_estimate(state_acc: jax.Array, metric: jax.Array, sps: int,
                    forget: float = 0.5) -> tuple[jax.Array, jax.Array]:
    """Update the timing accumulator from one block's timing metric.

    metric: [..., N] non-negative timing metric, N % sps == 0.
    Returns (new_acc, tau) with tau in [0, sps) per channel.
    """
    n = metric.shape[-1]
    if n % sps != 0:
        raise ValueError(f"block length {n} not divisible by sps {sps}")
    # reduce the index mod sps BEFORE the float angle: for million-sample
    # blocks, 2*pi*k/sps at k ~ 1e6 loses ~0.1 rad to f32 rounding (the C++
    # oracle and the plane-form path use the same reduction)
    k = jnp.mod(jnp.arange(n, dtype=F32), F32(sps))
    tone = jnp.exp(-1j * (TWO_PI / sps) * k).astype(CF32)
    c = jnp.sum(metric.astype(F32) * tone, axis=-1)
    acc = (F32(forget) * state_acc + c).astype(CF32)
    tau = (-sps / TWO_PI) * jnp.angle(acc)
    tau = jnp.mod(tau, F32(sps))
    return acc, tau


def phase_unwrap(prev_phase: jax.Array, tau: jax.Array, sps: int) -> jax.Array:
    """Pick the xin-phase ≡ tau+1 (mod sps) nearest the carried phase.

    `timing_sample`'s raw phase = mod(tau+1, sps) wraps when tau jitters
    across the 0/sps boundary (rectangular pulses put tau there), which
    slips the whole strobe grid by one symbol mid-stream. Streaming chains
    instead carry the previous block's phase and unwrap the new estimate
    toward it: the grid stays continuous under estimate jitter, and a
    deliberate one-symbol slip happens only after a cumulative drift of a
    full symbol (the correct behavior under a sustained clock offset).

    prev_phase: [...] carried phase, or < 0 on the first block (take the
    raw estimate). Returns phase in [0, 2*sps - 1], valid for
    `timing_sample_phase`.
    """
    raw = jnp.mod(tau + 1.0, F32(sps))
    half = F32(0.5 * sps)
    delta = jnp.mod(raw - prev_phase + half, F32(sps)) - half
    phase = jnp.where(prev_phase < 0, raw, prev_phase + delta)
    # fold back into the sampler's valid window (a real one-symbol slip)
    phase = jnp.where(phase < 0, phase + sps, phase)
    phase = jnp.where(phase > 2 * sps - 1, phase - sps, phase)
    return phase.astype(F32)


def timing_sample(last: jax.Array, x: jax.Array, tau: jax.Array, sps: int
                  ) -> tuple[jax.Array, jax.Array]:
    """Read one value per symbol at offset tau (mod sps) by linear interpolation.

    x: [..., N] with N % sps == 0; tau: [...] in [0, sps) in x-index phase
    (the O&M estimate from `timing_estimate` over this same block);
    last: [..., sps+1] tail of the previous block. Reads index into
    xin = [last | x]; sample positions are chosen ≡ tau (mod sps) in x's
    local index phase, delayed one symbol so interpolation never needs
    future samples. Returns (new_last, symbols [..., N/sym]).

    NOTE: the raw phase wraps when tau jitters across the 0/sps boundary;
    streaming chains that must hold a continuous strobe grid should carry
    the phase via `phase_unwrap` and call `timing_sample_phase` instead.
    """
    phase = jnp.mod(tau + 1.0, F32(sps))
    return timing_sample_phase(last, x, phase, sps)


def timing_sample_phase(last: jax.Array, x: jax.Array, phase: jax.Array,
                        sps: int) -> tuple[jax.Array, jax.Array]:
    """timing_sample with the xin-phase given directly (see phase_unwrap).

    phase: [...] in [0, 2*sps - 1]; positions k*sps + phase stay in
    [0, N + sps - 1] for every k, so i0 + 1 is always in bounds.
    """
    n = x.shape[-1]
    nsym = n // sps
    xin = jnp.concatenate([last, x], axis=-1)  # [..., N + sps + 1]
    # x[n] sits at xin index n + sps + 1, so x-phase tau corresponds to
    # xin-phase (tau + 1) mod sps.
    t = jnp.arange(nsym, dtype=F32) * sps + phase[..., None]  # [..., Nsym]
    i0 = jnp.floor(t).astype(jnp.int32)
    frac = (t - i0.astype(F32)).astype(F32)
    lo = jnp.take_along_axis(xin, jnp.broadcast_to(i0, (*xin.shape[:-1], nsym)), axis=-1)
    hi = jnp.take_along_axis(xin, jnp.broadcast_to(i0 + 1, (*xin.shape[:-1], nsym)), axis=-1)
    sym = lo * (1.0 - frac) + hi * frac
    return x[..., -(sps + 1):], sym
