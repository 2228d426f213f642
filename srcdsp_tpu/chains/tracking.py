"""Tracking-mode demod chains: closed-loop timing/carrier recovery
(SURVEY.md §3.1c parity — the reference's per-sample feedback loops).

The feedforward estimators in chains.fsk / chains.psk average one tau /
one phase per block — the right call for a stationary clock, and fully
vectorized. When the symbol clock *drifts inside a block* (oscillator
wander, Doppler), a block average smears and the feedforward picks slide
off the eye. These chains swap in the per-symbol scan loops of
chains.sync_loop (Gardner TED + 2nd-order loop; M-power Costas), which
track the instantaneous offset at symbol granularity — the scan runs at
1/sps the sample rate, the cheapest recurrence that still tracks.

Two timing modes:

- `psk_track_apply` / `fsk_track_apply` (bounded wander): fixed
  N/(decim*sps) symbols per block — the right call for oscillator wander
  that never accumulates a whole symbol.
- `psk_track_ragged_apply` / `fsk_track_ragged_apply` (skip/stuff,
  UNBOUNDED sustained ppm offsets): the Gardner strobe free-runs at
  sps + freq samples/strobe, so a fast clock emits more symbols and a
  slow one fewer. Static shapes under jit are preserved by emitting into
  a fixed CAPACITY (gardner_free_cap) with a per-strobe validity mask —
  the TPU-native ragged-output pattern. `compact_ragged` squeezes the
  masked stream on the host at the sink.

Used by the CLI's --tracking flag and tests/e2e/test_tracking.py (drifting
-clock fixture where feedforward degrades and tracking holds SER 0).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from srcdsp_tpu.chains.fsk import FskParams, discriminate
from srcdsp_tpu.chains.psk import PskParams, constellation_offset, psk_slice
from srcdsp_tpu.chains.sync_loop import (
    CostasState, GardnerFreeState, GardnerState, costas_init, costas_scan,
    gardner_free_init, gardner_free_scan, gardner_init, gardner_scan,
)
from srcdsp_tpu.ops.fir import FirState, fir_apply, fir_init
from srcdsp_tpu.ops.nco import NcoState, nco_apply, nco_init
from srcdsp_tpu.types import CF32, F32


class PskTrackState(NamedTuple):
    nco: NcoState
    fir: FirState
    tail: jax.Array        # [..., sps] carried post-filter samples
    gardner: GardnerState
    costas: CostasState


def psk_track_init(params: PskParams, channel_shape: tuple = (),
                   tau0: float = 0.0) -> PskTrackState:
    return PskTrackState(
        nco=nco_init(channel_shape),
        fir=fir_init(int(params.taps.shape[-1]), channel_shape),
        tail=jnp.zeros((*channel_shape, params.sps), dtype=CF32),
        gardner=gardner_init(channel_shape, tau0=tau0),
        costas=costas_init(channel_shape),
    )


def psk_track_apply(params: PskParams, state: PskTrackState, x: jax.Array,
                    kp: float = 0.2, ki: float = 0.02
                    ) -> tuple[PskTrackState, tuple[jax.Array, jax.Array]]:
    """Demodulate one block with closed-loop timing + carrier tracking.

    x: [..., N], N % (decim*sps) == 0. Returns (state, (idx, soft)) with
    exactly N/(decim*sps) symbols per block: gardner_scan emits one fewer
    strobe than its input holds symbols (the last needs the mid+next
    sample), so the chain carries an sps-sample tail and prepends it — the
    next block's first strobe re-covers the carried symbol, and no symbol
    is ever dropped at a block seam (a mid-stream deletion would silently
    shear every later symbol against the tx sequence).
    """
    off = constellation_offset(params.order)
    nco_s, mixed = nco_apply(params.freq_word, state.nco, x)
    fir_s, bb = fir_apply(params.taps, state.fir, mixed, decim=params.decim)
    xin = jnp.concatenate([state.tail, bb], axis=-1)
    g_s, sym = gardner_scan(state.gardner, xin, params.sps, kp=kp, ki=ki)
    c_s, soft = costas_scan(state.costas, sym, params.order, offset=off)
    idx = psk_slice(soft, params.order, off)
    return PskTrackState(nco=nco_s, fir=fir_s,
                         tail=xin[..., xin.shape[-1] - params.sps:],
                         gardner=g_s, costas=c_s), (idx, soft)


class FskTrackState(NamedTuple):
    nco: NcoState
    fir: FirState
    disc_last: jax.Array   # [..., 1] complex64
    tail: jax.Array        # [..., sps] carried discriminator samples
    gardner: GardnerState


def fsk_track_init(params: FskParams, channel_shape: tuple = (),
                   tau0: float = 0.0) -> FskTrackState:
    return FskTrackState(
        nco=nco_init(channel_shape),
        fir=fir_init(int(params.taps.shape[-1]), channel_shape),
        disc_last=jnp.zeros((*channel_shape, 1), dtype=CF32),
        tail=jnp.zeros((*channel_shape, params.sps), dtype=CF32),
        gardner=gardner_init(channel_shape, tau0=tau0),
    )


def fsk_track_apply(params: FskParams, state: FskTrackState, x: jax.Array,
                    kp: float = 0.05, ki: float = 0.002
                    ) -> tuple[FskTrackState, tuple[jax.Array, jax.Array]]:
    """FSK demod with Gardner timing on the discriminator output.

    The Gardner error e = Re{(d_k - d_{k-1}) * conj(d_mid)} applies to the
    real NRZ-shaped discriminator stream directly (imag = 0). Same carried
    sps-tail as psk_track_apply: exactly N/(decim*sps) bits per block.
    Default gains are gentler than the PSK loop's: the discriminator's
    data-dependent transition spikes act as TED self-noise, and a hot
    integrator (ki) accumulates their bias into a false frequency.
    """
    nco_s, mixed = nco_apply(params.freq_word, state.nco, x)
    fir_s, bb = fir_apply(params.taps, state.fir, mixed, decim=params.decim)
    disc_last, d = discriminate(state.disc_last, bb)
    # normalize to ~+-1 before the TED: the Gardner error scales with the
    # SQUARE of the signal amplitude, and the discriminator swings only
    # +-dev — unnormalized, the loop gain would be dev^2 (~1e-3) too small
    # to track anything
    d = d * F32(1.0 / params.dev)
    xin = jnp.concatenate([state.tail, d.astype(CF32)], axis=-1)
    g_s, sym = gardner_scan(state.gardner, xin, params.sps, kp=kp, ki=ki)
    soft = jnp.real(sym).astype(F32)
    bits = (soft > 0).astype(jnp.int32)
    return FskTrackState(nco=nco_s, fir=fir_s, disc_last=disc_last,
                         tail=xin[..., xin.shape[-1] - params.sps:],
                         gardner=g_s), (bits, soft)


class PskTrackRaggedState(NamedTuple):
    nco: NcoState
    fir: FirState
    tail: jax.Array        # [..., sps] carried post-filter samples
    gardner: GardnerFreeState
    costas: CostasState


def psk_track_ragged_init(params: PskParams, channel_shape: tuple = (),
                          tau0: float = 0.0) -> PskTrackRaggedState:
    return PskTrackRaggedState(
        nco=nco_init(channel_shape),
        fir=fir_init(int(params.taps.shape[-1]), channel_shape),
        tail=jnp.zeros((*channel_shape, params.sps), dtype=CF32),
        gardner=gardner_free_init(channel_shape, tau0=tau0),
        costas=costas_init(channel_shape),
    )


def psk_track_ragged_apply(params: PskParams, state: PskTrackRaggedState,
                           x: jax.Array, kp: float = 0.2, ki: float = 0.02,
                           max_dev: float = 0.05
                           ) -> tuple[PskTrackRaggedState,
                                      tuple[jax.Array, jax.Array, jax.Array]]:
    """Skip/stuff PSK demod: tolerates unbounded sustained clock offsets.

    x: [..., N], N % decim == 0. Returns (state, (idx, soft, valid)) with
    CAPACITY gardner_free_cap(N/decim, sps, max_dev) symbols per block and
    a validity mask — the true symbol count per block follows the actual
    clock (skip/stuff), invalid lanes hold frozen values. Feed (idx, valid)
    to compact_ragged at the sink.
    """
    off = constellation_offset(params.order)
    nco_s, mixed = nco_apply(params.freq_word, state.nco, x)
    fir_s, bb = fir_apply(params.taps, state.fir, mixed, decim=params.decim)
    xin = jnp.concatenate([state.tail, bb], axis=-1)
    g_s, (sym, valid) = gardner_free_scan(state.gardner, xin, params.sps,
                                          kp=kp, ki=ki, max_dev=max_dev)
    c_s, soft = costas_scan(state.costas, sym, params.order, offset=off,
                            valid=valid)
    idx = psk_slice(soft, params.order, off)
    return PskTrackRaggedState(nco=nco_s, fir=fir_s,
                               tail=xin[..., xin.shape[-1] - params.sps:],
                               gardner=g_s, costas=c_s), (idx, soft, valid)


class FskTrackRaggedState(NamedTuple):
    nco: NcoState
    fir: FirState
    disc_last: jax.Array
    tail: jax.Array
    gardner: GardnerFreeState


def fsk_track_ragged_init(params: FskParams, channel_shape: tuple = (),
                          tau0: float = 0.0) -> FskTrackRaggedState:
    return FskTrackRaggedState(
        nco=nco_init(channel_shape),
        fir=fir_init(int(params.taps.shape[-1]), channel_shape),
        disc_last=jnp.zeros((*channel_shape, 1), dtype=CF32),
        tail=jnp.zeros((*channel_shape, params.sps), dtype=CF32),
        gardner=gardner_free_init(channel_shape, tau0=tau0),
    )


def fsk_track_ragged_apply(params: FskParams, state: FskTrackRaggedState,
                           x: jax.Array, kp: float = 0.05, ki: float = 0.002,
                           max_dev: float = 0.05
                           ) -> tuple[FskTrackRaggedState,
                                      tuple[jax.Array, jax.Array, jax.Array]]:
    """Skip/stuff FSK demod (see psk_track_ragged_apply)."""
    nco_s, mixed = nco_apply(params.freq_word, state.nco, x)
    fir_s, bb = fir_apply(params.taps, state.fir, mixed, decim=params.decim)
    disc_last, d = discriminate(state.disc_last, bb)
    d = d * F32(1.0 / params.dev)
    xin = jnp.concatenate([state.tail, d.astype(CF32)], axis=-1)
    g_s, (sym, valid) = gardner_free_scan(state.gardner, xin, params.sps,
                                          kp=kp, ki=ki, max_dev=max_dev)
    soft = jnp.real(sym).astype(F32)
    bits = (soft > 0).astype(jnp.int32)
    return FskTrackRaggedState(nco=nco_s, fir=fir_s, disc_last=disc_last,
                               tail=xin[..., xin.shape[-1] - params.sps:],
                               gardner=g_s), (bits, soft, valid)


def compact_ragged(vals, valid):
    """Host-side sink: squeeze a masked capacity stream to the true symbols.

    vals/valid: numpy-convertible [..., K] from one or more blocks
    (concatenate blocks along the last axis first). 1-D returns an array;
    with leading channel dims returns a list per channel (counts differ —
    that is the point of skip/stuff)."""
    import numpy as np
    v = np.asarray(vals)
    m = np.asarray(valid).astype(bool)
    if v.ndim == 1:
        return v[m]
    flat_v = v.reshape(-1, v.shape[-1])
    flat_m = m.reshape(-1, m.shape[-1])
    return [fv[fm] for fv, fm in zip(flat_v, flat_m)]
