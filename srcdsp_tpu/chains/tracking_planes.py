"""On-chip (axon-subset) forms of the closed-loop tracking chains.

chains/tracking.py and chains/sync_loop.py are the complex-API tracking
loops (SURVEY.md §3.1c parity: the reference's per-sample feedback
loops). The axon TPU backend has no complex64, so those run CPU/standard
-TPU tier only — the one systematic tier gap left after round 3. This
module is the restricted-op-set twin: (re, im) f32 PLANES everywhere,
`jnp.arctan2` for angles, repeated complex squaring for the M-power
detector, and `lax.scan` + traced-index gathers for the per-symbol
recurrences — all of which lower on axon since the 2026-08-19 backend
broadening (verify skill support matrix).

Same loop math, same gains, same state semantics as the complex forms:
outputs match to f32 rounding (tested vs chains/tracking.py on the same
fixtures), and the carried-tail block-seam convention is identical (no
symbol drops at seams).

Front end: any plane source — ops.planes.fused_mix_fir_decim_planes
(XLA plane path) here; the fused Pallas kernels can feed the same loops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from srcdsp_tpu.chains.fsk import FskParams
from srcdsp_tpu.chains.fsk_planes import discriminate_planes
from srcdsp_tpu.chains.psk import PskParams, constellation_offset
from srcdsp_tpu.chains.psk_planes import _cpow
from srcdsp_tpu.chains.sync_loop import (CostasState, GardnerState,
                                         costas_init, gardner_free_cap,
                                         gardner_init)
from srcdsp_tpu.ops.nco import TWO_PI
from srcdsp_tpu.ops.planes import (U32, fused_mix_fir_decim_planes,
                                   phase_coef_matrix)
from srcdsp_tpu.types import F32


def _interp_planes(x, t):
    """Linear interpolation of plane x[..., N] at per-channel positions t
    (sync_loop._interp on one real plane)."""
    i0 = jnp.floor(t).astype(jnp.int32)
    frac = (t - i0.astype(F32)).astype(F32)
    n = x.shape[-1]
    i0 = jnp.clip(i0, 0, n - 2)
    lo = jnp.take_along_axis(x, i0[..., None], axis=-1)[..., 0]
    hi = jnp.take_along_axis(x, (i0 + 1)[..., None], axis=-1)[..., 0]
    return lo * (1.0 - frac) + hi * frac


def gardner_scan_planes(state: GardnerState, xr: jax.Array, xi: jax.Array,
                        sps: int, kp: float = 0.5, ki: float = 0.02
                        ) -> tuple[GardnerState,
                                   tuple[jax.Array, jax.Array]]:
    """Plane twin of sync_loop.gardner_scan. xr/xi: [..., N], N % sps == 0.
    Returns (state, (sr, si) [..., N/sps - 1])."""
    nsym = xr.shape[-1] // sps - 1

    def step(carry, k):
        tau, freq, pr, pi = carry
        base = k.astype(F32) * sps
        yr = _interp_planes(xr, base + tau)
        yi = _interp_planes(xi, base + tau)
        ymr = _interp_planes(xr, base + tau - sps / 2.0)
        ymi = _interp_planes(xi, base + tau - sps / 2.0)
        # Re{(y - prev) * conj(ymid)}
        e = (yr - pr) * ymr + (yi - pi) * ymi
        freq2 = freq - ki * e
        tau2 = jnp.clip(tau - kp * e + freq2, -sps / 2.0, 1.5 * sps)
        return (tau2, freq2, yr, yi), (yr, yi)

    z = jnp.zeros(state.tau.shape, F32)
    (tau, freq, _, _), (sr, si) = jax.lax.scan(
        step, (state.tau, state.freq, z, z), jnp.arange(nsym))
    return GardnerState(tau=tau, freq=freq), (
        jnp.moveaxis(sr, 0, -1), jnp.moveaxis(si, 0, -1))


def costas_scan_planes(state: CostasState, sr: jax.Array, si: jax.Array,
                       order: int, kp: float = 0.1, ki: float = 0.01,
                       offset: float = 0.0,
                       valid: jax.Array | None = None
                       ) -> tuple[CostasState, tuple[jax.Array, jax.Array]]:
    """Plane twin of sync_loop.costas_scan (M-power detector via repeated
    complex squaring + arctan2). sr/si: [..., K] symbol-rate planes."""
    import numpy as np

    rot_r = F32(np.cos(-TWO_PI * offset))
    rot_i = F32(np.sin(-TWO_PI * offset))

    def step(carry, sv):
        ph, fr = carry
        s_r, s_i, v = sv
        c = jnp.cos(ph)
        s = jnp.sin(ph)
        yr = s_r * c + s_i * s          # s * e^{-j ph}
        yi = s_i * c - s_r * s
        pr, pi = _cpow(yr, yi, order)
        er = pr * rot_r - pi * rot_i    # y^M * rot
        ei = pr * rot_i + pi * rot_r
        e = jnp.arctan2(ei, er) / order
        fr2 = jnp.where(v, fr + ki * e, fr)
        ph2 = jnp.where(v, ph + kp * e + fr2, ph)
        return (ph2, fr2), (yr, yi)

    sr_t = jnp.moveaxis(sr, -1, 0)
    si_t = jnp.moveaxis(si, -1, 0)
    v_t = (jnp.ones(sr_t.shape, bool) if valid is None
           else jnp.moveaxis(valid, -1, 0))
    (ph, fr), (yr, yi) = jax.lax.scan(step, (state.phase, state.freq),
                                      (sr_t, si_t, v_t))
    return CostasState(phase=jnp.mod(ph, F32(TWO_PI)), freq=fr), (
        jnp.moveaxis(yr, 0, -1), jnp.moveaxis(yi, 0, -1))


class GardnerFreePlanesState(NamedTuple):
    """Plane twin of sync_loop.GardnerFreeState (prev as planes)."""

    pos: jax.Array
    freq: jax.Array
    prev_r: jax.Array
    prev_i: jax.Array


def gardner_free_init_planes(channel_shape: tuple = (),
                             tau0: float = 0.0) -> GardnerFreePlanesState:
    z = jnp.zeros(channel_shape, F32)
    return GardnerFreePlanesState(pos=jnp.full(channel_shape, tau0, F32),
                                  freq=z, prev_r=z, prev_i=z)


def gardner_free_scan_planes(state: GardnerFreePlanesState, xr: jax.Array,
                             xi: jax.Array, sps: int, kp: float = 0.5,
                             ki: float = 0.02, max_dev: float = 0.05
                             ) -> tuple[GardnerFreePlanesState,
                                        tuple[jax.Array, jax.Array,
                                              jax.Array]]:
    """Plane twin of sync_loop.gardner_free_scan (skip/stuff timing with
    a static output CAPACITY + validity mask). xr/xi: [..., sps + N]
    (caller prepends its carried sps tail). Returns
    (state, (sr, si, valid))."""
    nbuf = xr.shape[-1]
    n = nbuf - sps
    kcap = gardner_free_cap(n, sps, max_dev)
    limit = F32(nbuf - 2)
    fmax = F32(max_dev * sps)

    def step(carry, _):
        pos, freq, pr, pi = carry
        yr = _interp_planes(xr, pos)
        yi = _interp_planes(xi, pos)
        ymr = _interp_planes(xr, pos - (sps + freq) / 2.0)
        ymi = _interp_planes(xi, pos - (sps + freq) / 2.0)
        e = (yr - pr) * ymr + (yi - pi) * ymi
        valid = pos <= limit
        freq2 = jnp.where(valid, jnp.clip(freq - ki * e, -fmax, fmax), freq)
        adv = jnp.clip(sps + freq2 - kp * e, 0.5 * sps, 1.5 * sps)
        pos2 = jnp.where(valid, pos + adv, pos)
        pr2 = jnp.where(valid, yr, pr)
        pi2 = jnp.where(valid, yi, pi)
        return (pos2, freq2, pr2, pi2), (yr, yi, valid)

    (pos, freq, pr, pi), (sr, si, valid) = jax.lax.scan(
        step, (state.pos, state.freq, state.prev_r, state.prev_i), None,
        length=kcap)
    return GardnerFreePlanesState(pos=pos - n, freq=freq, prev_r=pr,
                                  prev_i=pi), (
        jnp.moveaxis(sr, 0, -1), jnp.moveaxis(si, 0, -1),
        jnp.moveaxis(valid, 0, -1))


def psk_slice_planes(yr: jax.Array, yi: jax.Array, order: int,
                     offset: float = 0.0) -> jax.Array:
    """Nearest-constellation-index slicer on planes (chains.psk.psk_slice
    twin: index = round(angle/2pi*M - offset) mod M)."""
    ang = jnp.arctan2(yi, yr) * F32(order / TWO_PI)
    return jnp.mod(jnp.round(ang - F32(offset)).astype(jnp.int32), order)


class PskTrackPlanesState(NamedTuple):
    word: jax.Array        # [C, 1] u32 NCO phase word at the block start
    hist: jax.Array        # [C, 2, H] carried raw-input planes
    tail_r: jax.Array      # [C, sps] carried post-filter planes
    tail_i: jax.Array
    gardner: GardnerState
    costas: CostasState


def psk_track_planes_init(params: PskParams, num_channels: int,
                          tau0: float = 0.0) -> PskTrackPlanesState:
    m = phase_coef_matrix(params.taps, params.decim)
    h = (m.shape[1] - 1) * params.decim
    return PskTrackPlanesState(
        word=jnp.zeros((num_channels, 1), U32),
        hist=jnp.zeros((num_channels, 2, h), F32),
        tail_r=jnp.zeros((num_channels, params.sps), F32),
        tail_i=jnp.zeros((num_channels, params.sps), F32),
        gardner=gardner_init((num_channels,), tau0=tau0),
        costas=costas_init((num_channels,)),
    )


def psk_track_planes_apply(params: PskParams, state: PskTrackPlanesState,
                           x_planes: jax.Array, kp: float = 0.2,
                           ki: float = 0.02
                           ) -> tuple[PskTrackPlanesState,
                                      tuple[jax.Array, jax.Array,
                                            jax.Array]]:
    """Plane twin of tracking.psk_track_apply: closed-loop timing +
    carrier on the axon op subset. x_planes: [C, 2, N] raw input planes,
    N % (decim*sps) == 0. Returns (state, (idx, soft_r, soft_i)) with
    exactly N/(decim*sps) symbols per block (same carried-tail seam
    convention as the complex form — no drops, no duplicates)."""
    coef = jnp.asarray(phase_coef_matrix(params.taps, params.decim))
    off = constellation_offset(params.order)
    cch = x_planes.shape[0]
    xin = jnp.concatenate([state.hist, x_planes], axis=-1)
    h = state.hist.shape[-1]
    dword = jnp.broadcast_to(
        jnp.asarray(params.freq_word, U32).reshape(-1, 1), (cch, 1))
    # history prefix starts h samples before the carried block-start word
    w0 = state.word - U32(h) * dword

    def one(xr1, xi1, w01, dw1):
        return fused_mix_fir_decim_planes(coef, w01, dw1, xr1[None],
                                          xi1[None], params.decim)

    br, bi = jax.vmap(one)(xin[:, 0], xin[:, 1], w0[:, 0], dword[:, 0])
    br = br[:, 0]
    bi = bi[:, 0]
    xr = jnp.concatenate([state.tail_r, br], axis=-1)
    xi = jnp.concatenate([state.tail_i, bi], axis=-1)
    g_s, (sr, si) = gardner_scan_planes(state.gardner, xr, xi, params.sps,
                                        kp=kp, ki=ki)
    c_s, (yr, yi) = costas_scan_planes(state.costas, sr, si, params.order,
                                       offset=off)
    idx = psk_slice_planes(yr, yi, params.order, off)
    n = x_planes.shape[-1]
    return PskTrackPlanesState(
        word=state.word + U32(n) * dword,
        hist=xin[..., xin.shape[-1] - h:],
        tail_r=xr[..., xr.shape[-1] - params.sps:],
        tail_i=xi[..., xi.shape[-1] - params.sps:],
        gardner=g_s, costas=c_s), (idx, yr, yi)


class FskTrackPlanesState(NamedTuple):
    word: jax.Array        # [C, 1] u32 NCO phase word at the block start
    hist: jax.Array        # [C, 2, H] carried raw-input planes
    disc_r: jax.Array      # [C, 1] previous baseband sample
    disc_i: jax.Array
    tail: jax.Array        # [C, sps] carried discriminator samples
    gardner: GardnerState


def fsk_track_planes_init(params: FskParams, num_channels: int,
                          tau0: float = 0.0) -> FskTrackPlanesState:
    m = phase_coef_matrix(params.taps, params.decim)
    h = (m.shape[1] - 1) * params.decim
    z1 = jnp.zeros((num_channels, 1), F32)
    return FskTrackPlanesState(
        word=jnp.zeros((num_channels, 1), U32),
        hist=jnp.zeros((num_channels, 2, h), F32),
        disc_r=z1, disc_i=z1,
        tail=jnp.zeros((num_channels, params.sps), F32),
        gardner=gardner_init((num_channels,), tau0=tau0),
    )


def fsk_track_planes_apply(params: FskParams, state: FskTrackPlanesState,
                           x_planes: jax.Array, kp: float = 0.05,
                           ki: float = 0.002
                           ) -> tuple[FskTrackPlanesState,
                                      tuple[jax.Array, jax.Array]]:
    """Plane twin of tracking.fsk_track_apply: Gardner timing on the
    discriminator stream (imag plane = 0 through the TED). x_planes:
    [C, 2, N], N % (decim*sps) == 0 -> (state, (bits, soft))."""
    coef = jnp.asarray(phase_coef_matrix(params.taps, params.decim))
    cch = x_planes.shape[0]
    xin = jnp.concatenate([state.hist, x_planes], axis=-1)
    h = state.hist.shape[-1]
    dword = jnp.broadcast_to(
        jnp.asarray(params.freq_word, U32).reshape(-1, 1), (cch, 1))
    w0 = state.word - U32(h) * dword

    def one(xr1, xi1, w01, dw1):
        return fused_mix_fir_decim_planes(coef, w01, dw1, xr1[None],
                                          xi1[None], params.decim)

    br, bi = jax.vmap(one)(xin[:, 0], xin[:, 1], w0[:, 0], dword[:, 0])
    d, pr, pi = discriminate_planes(br[:, 0], bi[:, 0],
                                    state.disc_r, state.disc_i)
    d = d * F32(1.0 / params.dev)
    xr = jnp.concatenate([state.tail, d], axis=-1)
    zi = jnp.zeros_like(xr)
    g_s, (sr, _) = gardner_scan_planes(state.gardner, xr, zi, params.sps,
                                       kp=kp, ki=ki)
    bits = (sr > 0).astype(jnp.int32)
    n = x_planes.shape[-1]
    return FskTrackPlanesState(
        word=state.word + U32(n) * dword,
        hist=xin[..., xin.shape[-1] - h:],
        disc_r=pr, disc_i=pi,
        tail=xr[..., xr.shape[-1] - params.sps:],
        gardner=g_s), (bits, sr)


class PskTrackRaggedPlanesState(NamedTuple):
    word: jax.Array
    hist: jax.Array
    tail_r: jax.Array
    tail_i: jax.Array
    gardner: GardnerFreePlanesState
    costas: CostasState


def psk_track_ragged_planes_init(params: PskParams, num_channels: int,
                                 tau0: float = 0.0
                                 ) -> PskTrackRaggedPlanesState:
    m = phase_coef_matrix(params.taps, params.decim)
    h = (m.shape[1] - 1) * params.decim
    return PskTrackRaggedPlanesState(
        word=jnp.zeros((num_channels, 1), U32),
        hist=jnp.zeros((num_channels, 2, h), F32),
        tail_r=jnp.zeros((num_channels, params.sps), F32),
        tail_i=jnp.zeros((num_channels, params.sps), F32),
        gardner=gardner_free_init_planes((num_channels,), tau0=tau0),
        costas=costas_init((num_channels,)),
    )


def psk_track_ragged_planes_apply(params: PskParams,
                                  state: PskTrackRaggedPlanesState,
                                  x_planes: jax.Array, kp: float = 0.2,
                                  ki: float = 0.02, max_dev: float = 0.05
                                  ) -> tuple[PskTrackRaggedPlanesState,
                                             tuple[jax.Array, jax.Array,
                                                   jax.Array, jax.Array]]:
    """Plane twin of tracking.psk_track_ragged_apply (skip/stuff: the
    strobe free-runs, so sustained ppm offsets change the emitted symbol
    COUNT — static capacity + validity mask). Returns
    (state, (idx, soft_r, soft_i, valid)); feed (idx, valid) to
    tracking.compact_ragged at the sink."""
    coef = jnp.asarray(phase_coef_matrix(params.taps, params.decim))
    off = constellation_offset(params.order)
    cch = x_planes.shape[0]
    xin = jnp.concatenate([state.hist, x_planes], axis=-1)
    h = state.hist.shape[-1]
    dword = jnp.broadcast_to(
        jnp.asarray(params.freq_word, U32).reshape(-1, 1), (cch, 1))
    w0 = state.word - U32(h) * dword

    def one(xr1, xi1, w01, dw1):
        return fused_mix_fir_decim_planes(coef, w01, dw1, xr1[None],
                                          xi1[None], params.decim)

    br, bi = jax.vmap(one)(xin[:, 0], xin[:, 1], w0[:, 0], dword[:, 0])
    xr = jnp.concatenate([state.tail_r, br[:, 0]], axis=-1)
    xi = jnp.concatenate([state.tail_i, bi[:, 0]], axis=-1)
    g_s, (sr, si, valid) = gardner_free_scan_planes(
        state.gardner, xr, xi, params.sps, kp=kp, ki=ki, max_dev=max_dev)
    c_s, (yr, yi) = costas_scan_planes(state.costas, sr, si, params.order,
                                       offset=off, valid=valid)
    idx = psk_slice_planes(yr, yi, params.order, off)
    n = x_planes.shape[-1]
    return PskTrackRaggedPlanesState(
        word=state.word + U32(n) * dword,
        hist=xin[..., xin.shape[-1] - h:],
        tail_r=xr[..., xr.shape[-1] - params.sps:],
        tail_i=xi[..., xi.shape[-1] - params.sps:],
        gardner=g_s, costas=c_s), (idx, yr, yi, valid)


class FskTrackRaggedPlanesState(NamedTuple):
    word: jax.Array
    hist: jax.Array
    disc_r: jax.Array
    disc_i: jax.Array
    tail: jax.Array
    gardner: GardnerFreePlanesState


def fsk_track_ragged_planes_init(params: FskParams, num_channels: int,
                                 tau0: float = 0.0
                                 ) -> FskTrackRaggedPlanesState:
    m = phase_coef_matrix(params.taps, params.decim)
    h = (m.shape[1] - 1) * params.decim
    z1 = jnp.zeros((num_channels, 1), F32)
    return FskTrackRaggedPlanesState(
        word=jnp.zeros((num_channels, 1), U32),
        hist=jnp.zeros((num_channels, 2, h), F32),
        disc_r=z1, disc_i=z1,
        tail=jnp.zeros((num_channels, params.sps), F32),
        gardner=gardner_free_init_planes((num_channels,), tau0=tau0),
    )


def fsk_track_ragged_planes_apply(params: FskParams,
                                  state: FskTrackRaggedPlanesState,
                                  x_planes: jax.Array, kp: float = 0.05,
                                  ki: float = 0.002, max_dev: float = 0.05
                                  ) -> tuple[FskTrackRaggedPlanesState,
                                             tuple[jax.Array, jax.Array,
                                                   jax.Array]]:
    """Plane twin of tracking.fsk_track_ragged_apply."""
    coef = jnp.asarray(phase_coef_matrix(params.taps, params.decim))
    cch = x_planes.shape[0]
    xin = jnp.concatenate([state.hist, x_planes], axis=-1)
    h = state.hist.shape[-1]
    dword = jnp.broadcast_to(
        jnp.asarray(params.freq_word, U32).reshape(-1, 1), (cch, 1))
    w0 = state.word - U32(h) * dword

    def one(xr1, xi1, w01, dw1):
        return fused_mix_fir_decim_planes(coef, w01, dw1, xr1[None],
                                          xi1[None], params.decim)

    br, bi = jax.vmap(one)(xin[:, 0], xin[:, 1], w0[:, 0], dword[:, 0])
    d, pr, pi = discriminate_planes(br[:, 0], bi[:, 0],
                                    state.disc_r, state.disc_i)
    d = d * F32(1.0 / params.dev)
    xr = jnp.concatenate([state.tail, d], axis=-1)
    zi = jnp.zeros_like(xr)
    g_s, (sr, _, valid) = gardner_free_scan_planes(
        state.gardner, xr, zi, params.sps, kp=kp, ki=ki, max_dev=max_dev)
    bits = (sr > 0).astype(jnp.int32)
    n = x_planes.shape[-1]
    return FskTrackRaggedPlanesState(
        word=state.word + U32(n) * dword,
        hist=xin[..., xin.shape[-1] - h:],
        disc_r=pr, disc_i=pi,
        tail=xr[..., xr.shape[-1] - params.sps:],
        gardner=g_s), (bits, sr, valid)
