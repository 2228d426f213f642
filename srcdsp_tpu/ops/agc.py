"""Automatic gain control (beyond-parity component).

The classic AGC is a per-sample feedback loop (gain updated from the last
output's power) — another TPU-hostile scalar recurrence. The TPU-native
form here is a feedforward envelope normalizer with the SAME steady-state
behavior: a one-pole IIR lowpass tracks the instantaneous power, and the
output is scaled by target/sqrt(envelope). The power smoother is a LINEAR
recurrence, so it reuses the exact block state-space machinery of
ops.iir (MXU Toeplitz per block + associative scan across blocks) instead
of a scan — the composability this framework's primitives are built for.

Streaming: state is the IIR smoother's carried state; block outputs match
the whole-signal run like every other T2 op. The attack/decay constant is
alpha (pole of the smoother): time constant ~ 1/(1-alpha) samples.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.ops.iir import (IirParams, IirState, iir_apply, iir_init,
                                make_iir_params)
from srcdsp_tpu.types import F32


class AgcParams(NamedTuple):
    smoother: IirParams   # one-pole power lowpass
    target: float         # desired RMS amplitude
    floor: float          # power floor (no gain blow-up on silence)


class AgcState(NamedTuple):
    env: IirState


def make_agc_params(alpha: float = 0.99, target: float = 1.0,
                    floor: float = 1e-6, block: int = 128) -> AgcParams:
    """One-pole envelope smoother y[n] = (1-alpha) p[n] + alpha y[n-1]."""
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    smoother = make_iir_params(np.array([1.0 - alpha]),
                               np.array([1.0, -alpha]), block=block)
    return AgcParams(smoother=smoother, target=float(target),
                     floor=float(floor))


def agc_init(params: AgcParams, channel_shape: tuple = ()) -> AgcState:
    return AgcState(env=iir_init(params.smoother, channel_shape, dtype=F32))


def agc_apply(params: AgcParams, state: AgcState, x: jax.Array
              ) -> tuple[AgcState, jax.Array]:
    """Normalize one block. x: [..., N] complex, N % smoother block == 0."""
    p = (jnp.real(x) ** 2 + jnp.imag(x) ** 2).astype(F32)
    env_s, env = iir_apply(params.smoother, state.env, p)
    gain = params.target * jax.lax.rsqrt(jnp.maximum(env, params.floor))
    return AgcState(env=env_s), x * gain.astype(x.dtype)


def agc_full(params: AgcParams, x: jax.Array) -> jax.Array:
    """Whole-signal convenience (from rest)."""
    _, y = agc_apply(params, agc_init(params, x.shape[:-1]), x)
    return y
