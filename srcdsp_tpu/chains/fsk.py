"""FSK demodulator chain (SURVEY.md C8; BASELINE.json config 4).

Reference shape (SURVEY.md §3.1c): mix -> channel filter -> atan2 frequency
discriminator -> symbol-timing loop -> bit slicer, one C++ object per
channel. TPU-native form:

- mix + filter + decimate: the framework's fused front-end (ops.nco +
  ops.fir; single Pallas kernel on the fast path);
- discriminator: d[n] = angle(x[n] * conj(x[n-1])) / (2*pi) — instantaneous
  frequency in cycles/sample, vectorized over the whole block with one
  carried sample;
- symbol timing: feedforward Oerder&Meyr block synchronizer (chains.sync) —
  no per-sample loop anywhere;
- channels: leading axes on params/state, vmapped or sharded, never objects.

All shapes are static; `fsk_apply` jits and scans cleanly.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.chains.sync import TimingState, timing_estimate, timing_init, timing_sample
from srcdsp_tpu.ops.fir import FirState, fir_apply, fir_init
from srcdsp_tpu.ops.nco import NcoState, TWO_PI, freq_to_word, nco_apply, nco_init
from srcdsp_tpu.ops.window import lowpass
from srcdsp_tpu.types import CF32, F32


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FskParams:
    """Per-chain parameters. Array fields may carry leading channel axes;
    `decim`/`sps`/`dev` are static metadata (shape-determining under jit)."""

    freq_word: jax.Array   # uint32 NCO tuning word(s): shift channel to 0
    taps: jax.Array        # [T] float32 channel-filter taps (shared)
    decim: int = dataclasses.field(metadata=dict(static=True))
    sps: int = dataclasses.field(metadata=dict(static=True))
    dev: float = dataclasses.field(metadata=dict(static=True))
    # Timing-accumulator memory (chains.sync forgetting factor). 0.5 acquires
    # in ~2 blocks — right for strong timing tones (square-pulse FSK). Smooth
    # CPM (GMSK BT<=0.5) has a weak d^2 tone: use ~0.9-1.0 so the estimate
    # averages over many blocks instead of wandering and slipping symbols.
    timing_forget: float = dataclasses.field(default=0.5, metadata=dict(static=True))


class FskState(NamedTuple):
    nco: NcoState
    fir: FirState
    disc_last: jax.Array   # [..., 1] complex64: last filtered sample
    timing: TimingState


def make_fsk_params(center_freq: float, num_taps: int, cutoff: float,
                    decim: int, sps: int, dev: float,
                    window: str = "hamming",
                    timing_forget: float = 0.5) -> FskParams:
    """Host-side constructor: design taps, quantize the NCO word.

    center_freq: channel offset in cycles/sample at the *input* rate; the NCO
    mixes by -center_freq so the channel lands at baseband.
    """
    return FskParams(
        freq_word=jnp.asarray(freq_to_word(-center_freq)),
        taps=jnp.asarray(lowpass(num_taps, cutoff, window=window)),
        decim=decim, sps=sps, dev=dev, timing_forget=timing_forget,
    )


def fsk_init(params: FskParams, channel_shape: tuple = ()) -> FskState:
    return FskState(
        nco=nco_init(channel_shape),
        fir=fir_init(int(params.taps.shape[-1]), channel_shape),
        disc_last=jnp.zeros((*channel_shape, 1), dtype=CF32),
        timing=timing_init(params.sps, channel_shape, dtype=F32),
    )


def discriminate(last: jax.Array, x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Instantaneous frequency in cycles/sample: angle(x[n]*conj(x[n-1]))/2pi.

    `last` carries x[-1] of the previous block so d has one entry per input
    sample with no block-boundary seam.
    """
    xin = jnp.concatenate([last, x], axis=-1)
    d = jnp.angle(xin[..., 1:] * jnp.conj(xin[..., :-1])) * F32(1.0 / TWO_PI)
    return x[..., -1:], d.astype(F32)


def fsk_apply(params: FskParams, state: FskState, x: jax.Array,
              ) -> tuple[FskState, tuple[jax.Array, jax.Array]]:
    """Demodulate one block. x: [..., N], N % (decim*sps) == 0.

    Returns (state, (bits [..., Nsym] int32, soft [..., Nsym] float32)) where
    soft is the interpolated discriminator output in cycles/sample — divide
    by `params.dev` for a normalized +/-1 decision variable.
    """
    nco_s, mixed = nco_apply(params.freq_word, state.nco, x)
    fir_s, bb = fir_apply(params.taps, state.fir, mixed, decim=params.decim)
    disc_last, d = discriminate(state.disc_last, bb)
    acc, tau = timing_estimate(state.timing.acc, d * d, params.sps,
                               forget=params.timing_forget)
    t_last, soft = timing_sample(state.timing.last, d, tau, params.sps)
    bits = (soft > 0).astype(jnp.int32)
    new_state = FskState(
        nco=nco_s, fir=fir_s, disc_last=disc_last,
        timing=TimingState(acc=acc, last=t_last),
    )
    return new_state, (bits, soft)


def fsk_demod_stream(params: FskParams, x: jax.Array, block: int,
                     channel_shape: tuple = ()) -> tuple[jax.Array, jax.Array]:
    """Whole-capture convenience: scan fsk_apply over blocks of `block` samples.

    x: [..., S] with S % block == 0 and block % (decim*sps) == 0.
    """
    s = x.shape[-1]
    if s % block != 0:
        raise ValueError(f"capture length {s} not divisible by block {block}")
    nb = s // block
    blocks = jnp.moveaxis(x.reshape(*x.shape[:-1], nb, block), -2, 0)

    def step(st, xb):
        st, (bits, soft) = fsk_apply(params, st, xb)
        return st, (bits, soft)

    _, (bits, soft) = jax.lax.scan(step, fsk_init(params, channel_shape), blocks)
    bits = jnp.moveaxis(bits, 0, -2).reshape(*x.shape[:-1], -1)
    soft = jnp.moveaxis(soft, 0, -2).reshape(*x.shape[:-1], -1)
    return bits, soft


def np_discriminate(x: np.ndarray) -> np.ndarray:
    """numpy twin of the discriminator (zero history), for tests/oracle."""
    xin = np.concatenate([np.zeros((*x.shape[:-1], 1), x.dtype), x], axis=-1)
    return (np.angle(xin[..., 1:] * np.conj(xin[..., :-1])) / (2 * np.pi)).astype(np.float32)
