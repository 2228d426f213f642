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
    """Carried timing-tone accumulator (complex) and the last input sample.

    `acc` is the exponentially-forgotten sum of s[n]*exp(-j*2*pi*n/sps):
    its angle encodes the current symbol-timing offset. `last` is the final
    sample of the previous block so interpolated reads at t in [0, 1) can
    straddle the block boundary.
    """

    acc: jax.Array   # [...] complex64 timing-tone accumulator
    last: jax.Array  # [..., 1] same dtype as the sampled signal


def timing_init(channel_shape: tuple = (), dtype=CF32) -> TimingState:
    return TimingState(
        acc=jnp.zeros(channel_shape, dtype=CF32),
        last=jnp.zeros((*channel_shape, 1), dtype=dtype),
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
    k = jnp.arange(n, dtype=F32)
    tone = jnp.exp(-1j * (TWO_PI / sps) * k).astype(CF32)
    c = jnp.sum(metric.astype(F32) * tone, axis=-1)
    acc = (F32(forget) * state_acc + c).astype(CF32)
    tau = (-sps / TWO_PI) * jnp.angle(acc)
    tau = jnp.mod(tau, F32(sps))
    return acc, tau


def timing_sample(last: jax.Array, x: jax.Array, tau: jax.Array, sps: int
                  ) -> tuple[jax.Array, jax.Array]:
    """Read one value per symbol at t_k = k*sps + tau by linear interpolation.

    x: [..., N] with N % sps == 0; tau: [...] in [0, sps).
    Positions index into [last | x] (length N+1), so position 0 is the final
    sample of the *previous* block — symbol count is exactly N/sps per block
    regardless of tau. Returns (new_last, symbols [..., N/sps]).
    """
    n = x.shape[-1]
    nsym = n // sps
    xin = jnp.concatenate([last, x], axis=-1)  # [..., N+1]
    t = jnp.arange(nsym, dtype=F32)[..., :] * sps + tau[..., None]  # [..., Nsym]
    i0 = jnp.floor(t).astype(jnp.int32)
    frac = (t - i0.astype(F32)).astype(F32)
    lo = jnp.take_along_axis(xin, jnp.broadcast_to(i0, (*xin.shape[:-1], nsym)), axis=-1)
    hi = jnp.take_along_axis(xin, jnp.broadcast_to(i0 + 1, (*xin.shape[:-1], nsym)), axis=-1)
    sym = lo * (1.0 - frac) + hi * frac
    return x[..., -1:], sym
