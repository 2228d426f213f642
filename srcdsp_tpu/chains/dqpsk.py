"""pi/4-DQPSK demodulator (TETRA/PDC/IS-54 style), beyond parity.

Reuses the PSK front end (NCO mix -> RRC matched filter -> O&M timing,
chains/psk.py:97-118) but replaces carrier recovery entirely: the dibit
rides the phase DIFFERENCE between consecutive symbols
(delta = (2d+1)*pi/4, d in 0..3), so the demod is one conjugate product
z[k] = y[k] * conj(y[k-1]) and an angle slice. No V&V, no phase
accumulator, no slip states — and a residual CFO only biases every
delta by the same constant, tolerated up to pi/4 per symbol (the e2e
test demodulates error-free at a CFO that rotates the constellation
continuously, where a coherent fixed-rotation slicer falls apart).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.chains.psk import PskParams, make_psk_params
from srcdsp_tpu.chains.sync import (
    TimingState, timing_estimate, timing_init, timing_sample,
)
from srcdsp_tpu.ops import fir_apply, fir_init, nco_apply, nco_init
from srcdsp_tpu.ops.fir import FirState
from srcdsp_tpu.ops.nco import NcoState, TWO_PI
from srcdsp_tpu.types import CF32, F32


class DqpskState(NamedTuple):
    nco: NcoState
    fir: FirState
    timing: TimingState
    prev: jax.Array        # [...] complex64: last symbol of previous block


def make_dqpsk_params(center_freq: float, decim: int, sps: int,
                      rrc_beta: float = 0.35, rrc_span: int = 8) -> PskParams:
    """Same front-end parameters as M-PSK (order fixed at 4)."""
    return make_psk_params(center_freq, decim, sps, order=4,
                           rrc_beta=rrc_beta, rrc_span=rrc_span)


def dqpsk_init(params: PskParams, channel_shape: tuple = ()) -> DqpskState:
    return DqpskState(
        nco=nco_init(channel_shape),
        fir=fir_init(int(params.taps.shape[-1]), channel_shape),
        timing=timing_init(params.sps, channel_shape, dtype=CF32),
        prev=jnp.zeros(channel_shape, dtype=CF32),
    )


def dqpsk_slice(z: jax.Array) -> jax.Array:
    """Map conjugate products to dibits: angle (2d+1)*pi/4 -> d."""
    idx = jnp.floor(jnp.angle(z) * (4.0 / TWO_PI) * 2.0).astype(jnp.int32)
    # angle in (-pi, pi] -> floor(angle/(pi/4)) in {-4..3}; (2d+1) quadrant
    # boundaries sit ON multiples of pi/2, so d = (floor + 4) // 2 mod 4
    # maps (0,pi/2)->0, (pi/2,pi)->1, (-pi,-pi/2)->2, (-pi/2,0)->3
    return jnp.mod((idx + 4) // 2 + 2, 4)


def dqpsk_apply(params: PskParams, state: DqpskState, x: jax.Array,
                ) -> tuple[DqpskState, tuple[jax.Array, jax.Array]]:
    """Demodulate one block. x: [..., N], N % (decim*sps) == 0.

    Returns (state, (dibits [..., Nsym] int32, z [..., Nsym] complex64))
    where z is the conjugate-product soft symbol (its angle carries the
    decision; magnitude ~ symbol power). The first symbol of the first
    block differences against 0 and is a reference, like diff_decode.
    """
    nco_s, mixed = nco_apply(params.freq_word, state.nco, x)
    fir_s, bb = fir_apply(params.taps, state.fir, mixed, decim=params.decim)
    power = (jnp.real(bb) ** 2 + jnp.imag(bb) ** 2).astype(F32)
    acc, tau = timing_estimate(state.timing.acc, power, params.sps)
    t_last, sym = timing_sample(state.timing.last, bb, tau, params.sps)
    prev = jnp.concatenate(
        [state.prev[..., None], sym[..., :-1]], axis=-1)
    z = (sym * jnp.conj(prev)).astype(CF32)
    dibits = dqpsk_slice(z)
    new_state = DqpskState(nco=nco_s, fir=fir_s,
                           timing=TimingState(acc=acc, last=t_last),
                           prev=sym[..., -1])
    return new_state, (dibits, z)


def dqpsk_demod_stream(params: PskParams, x: jax.Array, block: int,
                       channel_shape: tuple = ()):
    """Whole-capture convenience: scan dqpsk_apply over `block` chunks."""
    s = x.shape[-1]
    if s % block != 0:
        raise ValueError(f"capture length {s} not divisible by block {block}")
    nb = s // block
    blocks = jnp.moveaxis(x.reshape(*x.shape[:-1], nb, block), -2, 0)

    def step(st, xb):
        st, out = dqpsk_apply(params, st, xb)
        return st, out

    _, (idx, z) = jax.lax.scan(step, dqpsk_init(params, channel_shape),
                               blocks)
    idx = jnp.moveaxis(idx, 0, -2).reshape(*x.shape[:-1], -1)
    z = jnp.moveaxis(z, 0, -2).reshape(*x.shape[:-1], -1)
    return idx, z


def dqpsk_baseband(dibits: np.ndarray, sps_total: int,
                   rrc_beta: float = 0.35, rrc_span: int = 8) -> np.ndarray:
    """Transmit fixture: pi/4-DQPSK pulse-shaped baseband at sps_total
    samples/symbol (phase starts at 0; symbol k advances by
    (2*dibits[k]+1)*pi/4)."""
    from srcdsp_tpu.ops.window import root_raised_cosine

    d = np.asarray(dibits)
    dphi = (2.0 * d + 1.0) * (np.pi / 4.0)
    phases = np.cumsum(dphi, axis=-1)
    syms = np.exp(1j * phases).astype(np.complex64)
    up = np.zeros((*syms.shape[:-1], syms.shape[-1] * sps_total),
                  np.complex64)
    up[..., ::sps_total] = syms
    h = root_raised_cosine(sps_total, rrc_span, beta=rrc_beta)
    pad = np.zeros((*up.shape[:-1], h.size - 1), np.complex64)
    full = np.concatenate([up, pad], axis=-1)
    out = np.empty_like(full)
    for idx0 in np.ndindex(*full.shape[:-1]):
        out[idx0] = np.convolve(full[idx0], h)[: full.shape[-1]]
    return out * np.float32(sps_total)


__all__ = [
    "DqpskState", "make_dqpsk_params", "dqpsk_init", "dqpsk_apply",
    "dqpsk_demod_stream", "dqpsk_slice", "dqpsk_baseband",
]
