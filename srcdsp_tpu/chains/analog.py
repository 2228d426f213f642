"""Analog demodulation chains: FM, AM, SSB (beyond-parity component).

The reference family (BASELINE.json north-star) stops at digital demods
(FSK/PSK); every fielded software radio also carries the analog trio. Each
chain here composes the existing T2 primitives — NCO mix, streaming FIR
decimator, quadrature discriminator, block state-space IIR — so the whole
receive path stays a pure `(state, block) -> (state, block)` function with
carried pytree state, jit/vmap/scan-ready like every other chain.

TPU-native notes:
- FM discrimination reuses `chains.fsk.discriminate` (vectorized
  angle-of-conjugate-product, seam-correct across blocks) — no per-sample
  phase loop.
- De-emphasis is the classic one-pole RC lowpass; a per-sample IIR is the
  most TPU-hostile loop there is, so it runs through `ops.iir`'s exact
  block state-space form (MXU Toeplitz matmul + tiny carried state).
- AM envelope is |x| (elementwise, fuses into the surrounding ops); the DC
  component (carrier) is removed by the `ops.iir` DC blocker.
- SSB runs a ONE-SIDED complex-tap channel filter (the analytic/Hilbert
  band select) directly in the existing feature-mix conv path — complex
  taps are first-class in `ops.fir.complex_conv` — then a product
  detector (take Re after the mix). No separate Hilbert transformer stage.

Rates: input blocks at the capture rate; the channel FIR decimates by
`decim`; the audio FIR decimates by `audio_decim`; de-emphasis runs at the
audio rate. Block length N must satisfy N % decim == 0,
(N/decim) % audio_decim == 0 and, for FM, the audio-rate block length
N/(decim*audio_decim) must be a multiple of the de-emphasis IIR block
(default 128).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.chains.fsk import discriminate
from srcdsp_tpu.ops.fir import FirState, fir_apply, fir_init
from srcdsp_tpu.ops.iir import (IirParams, IirState, iir_apply, iir_init,
                                dc_block_coeffs, make_iir_params)
from srcdsp_tpu.ops.nco import NcoState, freq_to_word, nco_apply, nco_init
from srcdsp_tpu.ops.window import lowpass
from srcdsp_tpu.types import CF32, F32

TWO_PI = float(2.0 * np.pi)


# ---------- coefficient helpers ----------

def deemphasis_coeffs(tau_samples: float) -> tuple[np.ndarray, np.ndarray]:
    """One-pole de-emphasis H(z) = (1-a)/(1 - a z^-1), a = exp(-1/tau).

    tau_samples: RC time constant in samples AT THE AUDIO RATE (e.g. 75 us
    broadcast de-emphasis at 48 kHz audio -> tau_samples = 75e-6 * 48e3).
    Unity gain at DC.
    """
    a = float(np.exp(-1.0 / float(tau_samples)))
    return np.array([1.0 - a]), np.array([1.0, -a])


def onesided_taps(num_taps: int, bandwidth: float, lower: bool = False,
                  window: str = "hamming") -> np.ndarray:
    """Complex taps passing [0, +bandwidth) (USB) or (-bandwidth, 0] (LSB).

    A real lowpass prototype of cutoff bandwidth/2 heterodyned by
    +/-bandwidth/2 — the single-sideband channel filter, applied by the
    complex-tap branch of ops.fir.complex_conv (SURVEY C2).
    """
    proto = lowpass(num_taps, bandwidth / 2.0, window=window)
    n = np.arange(num_taps) - (num_taps - 1) / 2.0
    sign = -1.0 if lower else 1.0
    return (proto * np.exp(1j * sign * np.pi * bandwidth * n)).astype(
        np.complex64)


# ---------- FM ----------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FmParams:
    freq_word: jax.Array        # u32 NCO word (mixes channel to baseband)
    chan_taps: jax.Array        # real lowpass, channel select
    audio_taps: jax.Array       # real lowpass, audio select
    deemph: IirParams | None    # one-pole de-emphasis at the audio rate
    decim: int = dataclasses.field(metadata=dict(static=True))
    dev: float = dataclasses.field(metadata=dict(static=True))
    #                             ^ cycles/sample at the DECIMATED rate
    audio_decim: int = dataclasses.field(metadata=dict(static=True))


class FmState(NamedTuple):
    nco: NcoState
    chan: FirState
    disc_last: jax.Array
    audio: FirState
    deemph: IirState | None


def make_fm_params(center_freq: float, decim: int, dev: float,
                   audio_decim: int = 4, num_taps: int = 128,
                   audio_taps: int = 64, cutoff: float | None = None,
                   deemph_tau: float | None = None,
                   iir_block: int = 128) -> FmParams:
    """center_freq in cycles/sample at the input rate; dev in cycles/sample
    at the decimated rate; deemph_tau in samples at the audio rate (None
    disables de-emphasis)."""
    cut = cutoff if cutoff is not None else 0.4 / decim
    de = None
    if deemph_tau is not None:
        b, a = deemphasis_coeffs(deemph_tau)
        de = make_iir_params(b, a, block=iir_block)
    return FmParams(
        freq_word=jnp.asarray(freq_to_word(-center_freq)),
        chan_taps=jnp.asarray(lowpass(num_taps, cut)),
        decim=int(decim), dev=float(dev),
        audio_taps=jnp.asarray(lowpass(audio_taps, 0.4 / audio_decim)),
        audio_decim=int(audio_decim), deemph=de)


def fm_init(params: FmParams, channel_shape: tuple = ()) -> FmState:
    return FmState(
        nco=nco_init(channel_shape),
        chan=fir_init(int(params.chan_taps.shape[-1]), channel_shape),
        disc_last=jnp.zeros((*channel_shape, 1), CF32),
        audio=fir_init(int(params.audio_taps.shape[-1]), channel_shape,
                       dtype=CF32),
        deemph=(iir_init(params.deemph, channel_shape, dtype=F32)
                if params.deemph is not None else None))


def fm_apply(params: FmParams, state: FmState, x: jax.Array
             ) -> tuple[FmState, jax.Array]:
    """x: [..., N] complex IQ -> audio [..., N/(decim*audio_decim)] f32,
    normalized so a full-deviation tone peaks at +-1."""
    nco_s, mixed = nco_apply(params.freq_word, state.nco, x)
    chan_s, bb = fir_apply(params.chan_taps, state.chan, mixed,
                           decim=params.decim)
    disc_last, d = discriminate(state.disc_last, bb)      # cycles/sample
    audio_in = d * F32(1.0 / params.dev)
    aud_s, a = fir_apply(params.audio_taps, state.audio, audio_in,
                         decim=params.audio_decim)
    a = jnp.real(a).astype(F32)
    de_s = state.deemph
    if params.deemph is not None:
        de_s, a = iir_apply(params.deemph, state.deemph, a)
        a = jnp.real(a).astype(F32)
    return FmState(nco=nco_s, chan=chan_s, disc_last=disc_last,
                   audio=aud_s, deemph=de_s), a


# ---------- AM ----------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AmParams:
    freq_word: jax.Array
    chan_taps: jax.Array
    audio_taps: jax.Array
    dcblock: IirParams
    decim: int = dataclasses.field(metadata=dict(static=True))
    audio_decim: int = dataclasses.field(metadata=dict(static=True))


class AmState(NamedTuple):
    nco: NcoState
    chan: FirState
    dc: IirState
    audio: FirState


def make_am_params(center_freq: float, decim: int, audio_decim: int = 4,
                   num_taps: int = 128, audio_taps: int = 64,
                   cutoff: float | None = None, dc_alpha: float = 0.999,
                   iir_block: int = 128) -> AmParams:
    cut = cutoff if cutoff is not None else 0.4 / decim
    b, a = dc_block_coeffs(dc_alpha)
    return AmParams(
        freq_word=jnp.asarray(freq_to_word(-center_freq)),
        chan_taps=jnp.asarray(lowpass(num_taps, cut)),
        decim=int(decim),
        audio_taps=jnp.asarray(lowpass(audio_taps, 0.4 / audio_decim)),
        audio_decim=int(audio_decim),
        dcblock=make_iir_params(b, a, block=iir_block))


def am_init(params: AmParams, channel_shape: tuple = ()) -> AmState:
    return AmState(
        nco=nco_init(channel_shape),
        chan=fir_init(int(params.chan_taps.shape[-1]), channel_shape),
        dc=iir_init(params.dcblock, channel_shape, dtype=F32),
        audio=fir_init(int(params.audio_taps.shape[-1]), channel_shape))


def am_apply(params: AmParams, state: AmState, x: jax.Array
             ) -> tuple[AmState, jax.Array]:
    """Envelope detector: |baseband| -> DC block -> audio decimate.

    Non-coherent (carrier phase/small CFO do not matter). x: [..., N]
    complex IQ -> audio [..., N/(decim*audio_decim)] f32. Block length at
    the decimated rate must be a multiple of the DC-block IIR block."""
    nco_s, mixed = nco_apply(params.freq_word, state.nco, x)
    chan_s, bb = fir_apply(params.chan_taps, state.chan, mixed,
                           decim=params.decim)
    env = jnp.abs(bb).astype(F32)
    dc_s, ac = iir_apply(params.dcblock, state.dc, env)
    ac = jnp.real(ac).astype(F32)
    aud_s, a = fir_apply(params.audio_taps, state.audio, ac,
                         decim=params.audio_decim)
    return AmState(nco=nco_s, chan=chan_s, dc=dc_s, audio=aud_s), \
        jnp.real(a).astype(F32)


# ---------- SSB ----------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SsbParams:
    freq_word: jax.Array
    chan_taps: jax.Array        # COMPLEX one-sided band select
    decim: int = dataclasses.field(metadata=dict(static=True))


class SsbState(NamedTuple):
    nco: NcoState
    chan: FirState


def make_ssb_params(center_freq: float, decim: int, bandwidth: float,
                    lower: bool = False, num_taps: int = 192) -> SsbParams:
    """center_freq: suppressed-carrier frequency (cycles/sample, input
    rate). bandwidth: audio bandwidth in cycles/sample at the INPUT rate.
    lower=True selects LSB."""
    return SsbParams(
        freq_word=jnp.asarray(freq_to_word(-center_freq)),
        chan_taps=jnp.asarray(onesided_taps(num_taps, 2.0 * bandwidth,
                                            lower=lower)),
        decim=int(decim))


def ssb_init(params: SsbParams, channel_shape: tuple = ()) -> SsbState:
    return SsbState(
        nco=nco_init(channel_shape),
        chan=fir_init(int(params.chan_taps.shape[-1]), channel_shape))


def ssb_apply(params: SsbParams, state: SsbState, x: jax.Array
              ) -> tuple[SsbState, jax.Array]:
    """Product detector: mix the suppressed carrier to 0, select one
    sideband with the complex-tap filter, emit Re — the demodulated audio.
    x: [..., N] complex IQ -> audio [..., N/decim] f32."""
    nco_s, mixed = nco_apply(params.freq_word, state.nco, x)
    chan_s, an = fir_apply(params.chan_taps, state.chan, mixed,
                           decim=params.decim)
    return SsbState(nco=nco_s, chan=chan_s), \
        (2.0 * jnp.real(an)).astype(F32)


# ---------- modulators (test fixtures) ----------

def fm_modulate(audio: jax.Array, dev: float, center: float = 0.0
                ) -> jnp.ndarray:
    """Audio in [-1, 1] -> complex FM baseband at the same rate:
    exp(j 2 pi cumsum(center + dev * audio))."""
    inst = center + dev * jnp.asarray(audio, F32)
    ph = jnp.cumsum(inst, axis=-1)
    return jnp.exp(1j * (TWO_PI * ph)).astype(CF32)


def am_modulate(audio: jax.Array, depth: float = 0.5, center: float = 0.0
                ) -> jnp.ndarray:
    """(1 + depth*audio) * carrier. audio in [-1, 1], depth < 1."""
    n = jnp.asarray(audio).shape[-1]
    k = jnp.arange(n, dtype=F32)
    carrier = jnp.exp(1j * (TWO_PI * center * k)).astype(CF32)
    return ((1.0 + depth * jnp.asarray(audio, F32)) * carrier).astype(CF32)


def ssb_modulate(audio: np.ndarray, center: float, lower: bool = False
                 ) -> np.ndarray:
    """USB/LSB fixture: analytic signal of audio (one-sided spectrum via
    FFT masking — host-side numpy, fixtures only) shifted to `center`."""
    a = np.asarray(audio, np.float64)
    n = a.shape[-1]
    spec = np.fft.fft(a)
    mask = np.zeros(n)
    mask[0] = 1.0
    if n % 2 == 0:
        mask[n // 2] = 1.0
        mask[1:n // 2] = 2.0
    else:
        mask[1:(n + 1) // 2] = 2.0
    analytic = np.fft.ifft(spec * mask)
    if lower:
        analytic = np.conj(analytic)
    k = np.arange(n)
    return (analytic * np.exp(2j * np.pi * center * k)).astype(np.complex64)


# ---------- FM stereo (MPX) ----------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StereoParams:
    """FM stereo multiplex decoder (beyond parity): recovers L/R from the
    composite MPX (the discriminator output BEFORE audio decimation):
    mono (L+R)/2 at baseband, a pilot tone at f_p, and the (L-R)/2 DSB
    subcarrier at 2 f_p.

    The pilot is extracted by a one-sided (analytic) complex-tap bandpass
    — the SSB machinery — so squaring its unit phasor regenerates the
    38 kHz carrier with the right phase; the mono and demux paths run
    through a pure-delay FIR matching the pilot filter's group delay so
    the carrier phase stays aligned."""

    pilot_taps: jax.Array      # [Tp] complex one-sided bandpass at +f_p
    delay_taps: jax.Array      # [Tp] delta at the pilot filter's delay
    audio_taps: jax.Array      # [Ta] real lowpass for mono / L-R
    audio_decim: int = dataclasses.field(metadata=dict(static=True))


class StereoState(NamedTuple):
    pilot: FirState
    delay: FirState
    mono: FirState
    lr: FirState


def make_fm_stereo_params(f_pilot: float, audio_bw: float,
                          audio_decim: int, pilot_ntaps: int = 257,
                          audio_ntaps: int = 128) -> StereoParams:
    """f_pilot / audio_bw in cycles/sample at the MPX rate. pilot_ntaps
    should be odd (exact integer group delay)."""
    if pilot_ntaps % 2 == 0:
        raise ValueError("pilot_ntaps must be odd")
    proto = lowpass(pilot_ntaps, f_pilot * 0.15)
    n = np.arange(pilot_ntaps) - (pilot_ntaps - 1) / 2.0
    pil = (proto * np.exp(2j * np.pi * f_pilot * n)).astype(np.complex64)
    delta = np.zeros(pilot_ntaps, np.float32)
    delta[(pilot_ntaps - 1) // 2] = 1.0
    return StereoParams(
        pilot_taps=jnp.asarray(pil),
        delay_taps=jnp.asarray(delta),
        audio_taps=jnp.asarray(lowpass(audio_ntaps, audio_bw)),
        audio_decim=int(audio_decim))


def fm_stereo_init(params: StereoParams, channel_shape: tuple = ()
                   ) -> StereoState:
    tp = int(params.pilot_taps.shape[-1])
    ta = int(params.audio_taps.shape[-1])
    return StereoState(pilot=fir_init(tp, channel_shape),
                       delay=fir_init(tp, channel_shape),
                       mono=fir_init(ta, channel_shape),
                       lr=fir_init(ta, channel_shape))


def fm_stereo_apply(params: StereoParams, state: StereoState,
                    mpx: jax.Array) -> tuple[StereoState, jax.Array]:
    """mpx: [..., N] real composite -> [..., 2, N/audio_decim] f32 (L, R).

    carrier38 = (analytic pilot / |analytic pilot|)^2 — squaring the unit
    phasor doubles its frequency AND phase, so the regenerated subcarrier
    tracks the transmitter's pilot exactly (no PLL loop needed)."""
    x = mpx.astype(CF32)
    p_s, pil = fir_apply(params.pilot_taps, state.pilot, x)
    d_s, xd = fir_apply(params.delay_taps, state.delay, x)
    u = pil / (jnp.abs(pil) + F32(1e-12))
    c38 = u * u                                      # e^{j 2 theta}
    demux = 2.0 * jnp.real(xd * jnp.conj(c38))
    m_s, mono = fir_apply(params.audio_taps, state.mono, jnp.real(xd),
                          decim=params.audio_decim)
    l_s, lr = fir_apply(params.audio_taps, state.lr, demux,
                        decim=params.audio_decim)
    mono = jnp.real(mono).astype(F32)
    lr = jnp.real(lr).astype(F32)
    out = jnp.stack([mono + lr, mono - lr], axis=-2)
    return StereoState(pilot=p_s, delay=d_s, mono=m_s, lr=l_s), out


def fm_stereo_mpx(left: np.ndarray, right: np.ndarray, f_pilot: float,
                  pilot_level: float = 0.1) -> np.ndarray:
    """Composite MPX fixture: (L+R)/2 + pilot + (L-R)/2 * cos(2*pi*2fp*n),
    phase-coherent pilot/subcarrier (the broadcast convention)."""
    left = np.asarray(left, np.float64)
    right = np.asarray(right, np.float64)
    n = np.arange(left.size)
    return ((left + right) / 2.0
            + pilot_level * np.cos(2 * np.pi * f_pilot * n)
            + (left - right) / 2.0 * np.cos(2 * np.pi * 2 * f_pilot * n)
            ).astype(np.float32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FmStereoRxParams:
    """Full broadcast-FM stereo receiver: the FM front end (NCO + channel
    select + discriminator) feeding the MPX stereo decoder, with optional
    per-channel de-emphasis — the chain the CLI's `fm --stereo` wires up."""

    freq_word: jax.Array
    chan_taps: jax.Array
    stereo: StereoParams
    deemph: IirParams | None
    decim: int = dataclasses.field(metadata=dict(static=True))
    dev: float = dataclasses.field(metadata=dict(static=True))


class FmStereoRxState(NamedTuple):
    nco: NcoState
    chan: FirState
    disc_last: jax.Array
    stereo: StereoState
    deemph: IirState | None     # stacked [2] channel axis when present


def make_fm_stereo_rx(center_freq: float, decim: int, dev: float,
                      pilot: float, audio_decim: int = 4,
                      num_taps: int = 128, cutoff: float | None = None,
                      deemph_tau: float | None = None,
                      iir_block: int = 128) -> FmStereoRxParams:
    """pilot in cycles/sample at the POST-decim (MPX) rate; dev at the
    decimated rate (like make_fm_params); deemph_tau in samples at the
    audio rate."""
    cut = cutoff if cutoff is not None else 0.4 / decim
    de = None
    if deemph_tau is not None:
        b, a = deemphasis_coeffs(deemph_tau)
        de = make_iir_params(b, a, block=iir_block)
    return FmStereoRxParams(
        freq_word=jnp.asarray(freq_to_word(-center_freq)),
        chan_taps=jnp.asarray(lowpass(num_taps, cut)),
        stereo=make_fm_stereo_params(pilot, audio_bw=pilot * 0.75,
                                     audio_decim=audio_decim),
        deemph=de, decim=int(decim), dev=float(dev))


def fm_stereo_rx_init(params: FmStereoRxParams, channel_shape: tuple = ()
                      ) -> FmStereoRxState:
    return FmStereoRxState(
        nco=nco_init(channel_shape),
        chan=fir_init(int(params.chan_taps.shape[-1]), channel_shape),
        disc_last=jnp.zeros((*channel_shape, 1), CF32),
        stereo=fm_stereo_init(params.stereo, channel_shape),
        deemph=(iir_init(params.deemph, (*channel_shape, 2), dtype=F32)
                if params.deemph is not None else None))


def fm_stereo_rx_apply(params: FmStereoRxParams, state: FmStereoRxState,
                       x: jax.Array) -> tuple[FmStereoRxState, jax.Array]:
    """x: [..., N] complex IQ -> [..., 2, N/(decim*audio_decim)] f32 L/R."""
    nco_s, mixed = nco_apply(params.freq_word, state.nco, x)
    chan_s, bb = fir_apply(params.chan_taps, state.chan, mixed,
                           decim=params.decim)
    disc_last, d = discriminate(state.disc_last, bb)
    st_s, lr = fm_stereo_apply(params.stereo, state.stereo,
                               d * F32(1.0 / params.dev))
    de_s = state.deemph
    if params.deemph is not None:
        de_s, lr = iir_apply(params.deemph, state.deemph, lr)
        lr = jnp.real(lr).astype(F32)
    return FmStereoRxState(nco=nco_s, chan=chan_s, disc_last=disc_last,
                           stereo=st_s, deemph=de_s), lr
