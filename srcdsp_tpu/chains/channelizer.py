"""Polyphase analysis channelizer (SURVEY.md C10; BASELINE.json config 5).

Splits one wideband stream into M critically-sampled channels. The reference
composes its resampler/FFT primitives per channel (SURVEY.md C10); running M
mix+filter+decimate chains costs M× the work of the polyphase bank, which
computes ALL channels for one prototype-filter pass plus one small FFT per
output frame.

Math (the defining property, tested exactly): with prototype h (length
T = P*M) and channel m centered at +m/M cycles/sample,

    y_m[k] = sum_j h[j] x[kM-j] e^{+j*2*pi*m*j/M}
           = decimate_M( FIR_h( x[n] * e^{-j*2*pi*m*n/M} ) )[k]     (exact)

TPU-native factorization: window the last T input samples of each output
frame by reversed h, fold the T axis to [P, M] and sum over P (VPU), then one
length-M IFFT across the fold axis per frame (batched `jnp.fft` — feeds the
TPU as a [K, M] batch, K frames at once). Streaming state is the last T-1
input samples; block joins are exact because frames advance by exactly M
samples and every block length is a multiple of M.

The channelizer's distributed form (time-sharded input -> channel-sharded
output via all_to_all) lives in srcdsp_tpu.dist.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.ops.window import lowpass
from srcdsp_tpu.types import CF32, F32


class ChannelizerState(NamedTuple):
    """Carried input tail: the last T-1 wideband samples."""

    tail: jax.Array  # [..., T-1] complex64


def design_prototype(num_channels: int, taps_per_phase: int = 8,
                     cutoff_scale: float = 1.0, atten_db: float = 70.0) -> np.ndarray:
    """Kaiser lowpass prototype, length P*M, cutoff at the channel half-width."""
    t = taps_per_phase * num_channels
    return lowpass(t, cutoff_scale * 0.5 / num_channels, window="kaiser",
                   atten_db=atten_db)


def pad_prototype(taps, num_channels: int) -> jnp.ndarray:
    """Zero-pad taps to a multiple of M (no-op on the math)."""
    h = jnp.asarray(taps)
    pad = (-h.shape[0]) % num_channels
    return jnp.pad(h, (0, pad))


def channelizer_init(taps, num_channels: int, channel_shape: tuple = (),
                     dtype=CF32) -> ChannelizerState:
    t = pad_prototype(taps, num_channels).shape[0]
    return ChannelizerState(tail=jnp.zeros((*channel_shape, t - 1), dtype=dtype))


def channelize_apply(taps, state: ChannelizerState, x: jax.Array,
                     num_channels: int) -> tuple[ChannelizerState, jax.Array]:
    """Channelize one block. x: [..., N], N % M == 0 -> y: [..., M, N//M].

    y[..., m, k] is channel m (center +m/M cycles/sample) at rate fs/M.
    """
    m = num_channels
    h = pad_prototype(taps, m).astype(F32)
    t = h.shape[0]
    p = t // m
    n = x.shape[-1]
    if n % m != 0:
        raise ValueError(f"block length {n} not divisible by num_channels {m}")
    k = n // m
    xin = jnp.concatenate([state.tail, x], axis=-1)  # [..., N + T - 1]
    # frame_k[j] = x[kM - j] = reverse(xin[kM : kM + T])
    idx = jnp.arange(k)[:, None] * m + jnp.arange(t)[None, :]  # [K, T]
    frames = xin[..., idx][..., ::-1]                           # [..., K, T]
    w = frames * h                                              # window by h
    v = w.reshape(*w.shape[:-1], p, m).sum(axis=-2)             # [..., K, M]
    y = (jnp.fft.ifft(v, axis=-1) * m).astype(CF32)             # [..., K, M]
    new_tail = xin[..., xin.shape[-1] - (t - 1):]
    return ChannelizerState(tail=new_tail), jnp.swapaxes(y, -1, -2)


def channelize_full(taps, x: jax.Array, num_channels: int) -> jax.Array:
    """Whole-signal channelizer from rest (one-shot convenience)."""
    state = channelizer_init(taps, num_channels, channel_shape=x.shape[:-1],
                             dtype=x.dtype)
    _, y = channelize_apply(taps, state, x, num_channels)
    return y


def synthesize_apply(taps, state: ChannelizerState, y: jax.Array,
                     num_channels: int) -> tuple[ChannelizerState, jax.Array]:
    """Polyphase synthesis bank: combine M channel streams into one wideband.

    y: [..., M, K] channel streams -> x: [..., M*K] wideband at rate fs.

        x[sM+q] = M * sum_l f_q[l] v[s-l, q],   f_q[l] = h[lM+q],
        v[k, q] = sum_m y[m, k] e^{+j*2*pi*m*q/M}   (= M * ifft over m)

    i.e. each channel is upsampled by M, interpolated by the prototype, and
    mixed to +m/M — evaluated per output phase q so the filter runs at the
    *low* rate. With the analysis bank's prototype, synthesize(channelize(x))
    reconstructs x to the prototype's stopband floor (critically-sampled
    banks are near-perfect, not exact). State carries the last P-1 phase
    frames as [..., (P-1)*M].
    """
    m = num_channels
    h = pad_prototype(taps, m).astype(F32)
    t = h.shape[0]
    p = t // m
    kk = y.shape[-1]
    lead = y.shape[:-2]
    v = (jnp.fft.ifft(jnp.swapaxes(y, -1, -2), axis=-1) * m)     # [..., K, M]
    hist = state.tail.reshape(*lead, p - 1, m)
    vin = jnp.concatenate([hist, v], axis=-2)                    # [..., K+P-1, M]
    # fr[..., k, l, q] = vin[k + P-1-l, q]  ->  out[k, q] = sum_l f_q[l] fr
    idx = jnp.arange(kk)[:, None] + (p - 1 - jnp.arange(p))[None, :]  # [K, P]
    fr = vin[..., idx, :]                                        # [..., K, P, M]
    fq = h.reshape(p, m)                                         # f_q[l] = fq[l, q]
    out = jnp.einsum("...klq,lq->...kq", fr, fq)                 # [..., K, M]
    x = (out * m).astype(CF32).reshape(*lead, kk * m)
    new_tail = vin[..., kk:, :].reshape(*lead, (p - 1) * m)
    return ChannelizerState(tail=new_tail), x


def synthesizer_init(taps, num_channels: int, channel_shape: tuple = (),
                     dtype=CF32) -> ChannelizerState:
    m = num_channels
    t = pad_prototype(taps, m).shape[0]
    p = t // m
    return ChannelizerState(
        tail=jnp.zeros((*channel_shape, (p - 1) * m), dtype=dtype))


# ---------------------------------------------------------------------------
# 2x-oversampled bank: near-perfect reconstruction (NPR) for broadband
# content. Critically-sampled DFT banks cannot cancel transition-band
# aliasing; decimating by M/2 instead of M keeps every channel's full
# transition band unaliased, at 2x the output rate. Frames advance by M/2
# samples, which introduces the per-frame phase twiddle (-1)^(m*k) relative
# to the critically-sampled bank (channel m, frame k).
# ---------------------------------------------------------------------------


def channelize_os2_apply(taps, state: ChannelizerState, x: jax.Array,
                         num_channels: int) -> tuple[ChannelizerState, jax.Array]:
    """2x-oversampled analysis. x: [..., N], N % (M/2) == 0 -> [..., M, 2N/M].

    y[..., m, k] = sum_j h[j] x[k*M/2 - j] e^{+j*2*pi*m*j/M} * (-1)^{m*k}
                 = decimate_{M/2}( FIR_h( x * e^{-j*2*pi*m*n/M} ) )[k]
    """
    m = num_channels
    if m % 2 != 0:
        raise ValueError("oversampled bank needs even num_channels")
    hop = m // 2
    h = pad_prototype(taps, m).astype(F32)
    t = h.shape[0]
    p = t // m
    n = x.shape[-1]
    if n % hop != 0:
        raise ValueError(f"block length {n} not divisible by hop {hop}")
    k = n // hop
    xin = jnp.concatenate([state.tail, x], axis=-1)
    idx = jnp.arange(k)[:, None] * hop + jnp.arange(t)[None, :]
    frames = xin[..., idx][..., ::-1]                 # frame_k[j] = x[k*hop - j]
    w = frames * h
    v = w.reshape(*w.shape[:-1], p, m).sum(axis=-2)   # [..., K, M]
    y = (jnp.fft.ifft(v, axis=-1) * m)                # [..., K, M]
    # twiddle (-1)^{m*k}: for odd frames, negate odd channels
    kk = jnp.arange(k)[:, None]
    mm = jnp.arange(m)[None, :]
    tw = jnp.where((kk * mm) % 2 == 1, -1.0, 1.0)
    y = (y * tw).astype(CF32)
    new_tail = xin[..., xin.shape[-1] - (t - 1):]
    return ChannelizerState(tail=new_tail), jnp.swapaxes(y, -1, -2)


def channelize_os2_full(taps, x: jax.Array, num_channels: int) -> jax.Array:
    state = channelizer_init(taps, num_channels, channel_shape=x.shape[:-1],
                             dtype=x.dtype)
    _, y = channelize_os2_apply(taps, state, x, num_channels)
    return y


def synthesize_os2_apply(taps, state: ChannelizerState, y: jax.Array,
                         num_channels: int) -> tuple[ChannelizerState, jax.Array]:
    """2x-oversampled synthesis: inverse layout of channelize_os2.

    y: [..., M, K] (K frames at rate 2*fs/M) -> x: [..., K*M/2] wideband.
    With the same root-Nyquist-ish prototype, synthesize_os2(channelize_os2(x))
    reconstructs broadband x to the prototype's design floor — the NPR path.

        x[n] = (2/M) * sum_k f[n - k*M/2] * v_k[n mod M],
        v_k[q] = sum_m y[m, k] (-1)^{m*k} e^{+j*2*pi*m*q/M}

    evaluated per output phase q at the low rate. State carries 2(P-1)+1
    phase frames as [..., (2P-1)*M].
    """
    m = num_channels
    hop = m // 2
    h = pad_prototype(taps, m).astype(F32)
    t = h.shape[0]
    p = t // m
    kk = y.shape[-1]
    lead = y.shape[:-2]
    # channel -> phase transform (y is true per-channel baseband; the
    # analysis twiddle is already folded into it, so none is applied here)
    yt = jnp.swapaxes(y, -1, -2)                       # [..., K, M]
    v = (jnp.fft.ifft(yt, axis=-1) * m)                # [..., K, M] phase frames
    # x[n] = (2/M) sum_k f[n - k*hop] v_k[n mod M]; frame k contributes to
    # outputs n in [k*hop, k*hop + T). Per output sample s (global):
    # x[s] = (2/M) sum_{l} f[s - (ks - l)*hop] v_{ks-l}[s mod M] ... evaluate
    # by accumulating over the 2P frame lags that overlap each hop.
    lags = 2 * p                                       # T / hop
    hist = state.tail.reshape(*lead, lags - 1, m)
    vin = jnp.concatenate([hist, v], axis=-2)          # [..., K + 2P - 1, M]
    # output chunk for frame k: samples [k*hop, (k+1)*hop): uses frames
    # k-l for l = 0..lags-1; its phase q = (k*hop + r) mod M depends on
    # parity of k. Build per-frame output of hop samples:
    idxf = jnp.arange(kk)[:, None] + (lags - 1 - jnp.arange(lags))[None, :]
    fr = vin[..., idxf, :]                             # [..., K, lags, M]
    r = jnp.arange(hop)
    kpar = jnp.arange(kk) % 2                          # frame parity
    # q index for sample r of frame k: (k*hop + r) % M = (parity*hop + r) % M
    q_even = r % m                                     # parity 0
    q_odd = (hop + r) % m                              # parity 1
    # filter index for lag l, sample r, frame k: j = (k*hop + r) - (k-l)*hop
    #   = l*hop + r  -> f[l*hop + r]
    fmat = h[(jnp.arange(lags)[:, None] * hop + r[None, :])]   # [lags, hop]
    ge = jnp.take(fr, q_even, axis=-1)                 # [..., K, lags, hop]
    go = jnp.take(fr, q_odd, axis=-1)
    acc_e = jnp.einsum("...klr,lr->...kr", ge, fmat)
    acc_o = jnp.einsum("...klr,lr->...kr", go, fmat)
    par = kpar[..., :, None]
    out = jnp.where(par == 0, acc_e, acc_o)            # [..., K, hop]
    # DC-gain calibration: sum_l h[l*hop + r] ~= 1/hop for a unit-DC proto
    x = (out * hop).astype(CF32).reshape(*lead, kk * hop)
    new_tail = vin[..., kk:, :].reshape(*lead, (lags - 1) * m)
    return ChannelizerState(tail=new_tail), x


def synthesizer_os2_init(taps, num_channels: int, channel_shape: tuple = (),
                         dtype=CF32) -> ChannelizerState:
    m = num_channels
    t = pad_prototype(taps, m).shape[0]
    p = t // m
    return ChannelizerState(
        tail=jnp.zeros((*channel_shape, (2 * p - 1) * m), dtype=dtype))
