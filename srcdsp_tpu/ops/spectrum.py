"""Spectral estimation: Welch PSD, spectrogram, streaming accumulator
(beyond-parity component — the reference family stops at the raw FFT).

TPU-native choices:
- Framing is GATHER-FREE when nfft % hop == 0 (the usual case, e.g. 50%
  overlap): the signal reshapes to [S/hop, hop] and each frame is a
  concatenation of nfft/hop consecutive rows — built from nfft/hop shifted
  2-D slices + one concat, all axon-supported ops, no gather/dynamic_slice
  (same trick as ops/fftconv_planes' frame build). Other hops fall back to
  a `take` gather (standard-backend tier).
- The FFT is pluggable: `jnp.fft.fft` by default (XLA tier); pass
  `ops.fft_planes.make_fft_planes(nfft)` output via `fft_fn` for the
  matmul-FFT on the restricted backend (it takes/returns (re, im) planes).
- Welch averaging is one batched matmul-shaped reduce over frames; the
  streaming form carries (psd_sum, n_frames, tail) so unbounded captures
  stream block-by-block with bounded memory — `welch_stream_*` matches the
  one-shot result exactly when block % hop == 0.

Scaling follows scipy.signal.welch conventions (fs=1): 'density' divides
by sum(w^2), 'spectrum' by sum(w)^2; one-shot twins are tested against
scipy for both, real and complex inputs.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.types import CF32, F32

__all__ = [
    "frame_signal", "welch", "spectrogram",
    "WelchState", "welch_stream_init", "welch_stream_update",
    "welch_stream_finalize",
]


def frame_signal(x: jax.Array, nfft: int, hop: int) -> jax.Array:
    """[..., S] -> [..., F, nfft] overlapping frames, F = (S-nfft)//hop + 1.

    Gather-free when nfft % hop == 0 (r = nfft/hop shifted slices of the
    [S/hop, hop] reshape, concatenated on the last axis)."""
    s = x.shape[-1]
    if s < nfft:
        raise ValueError(f"signal length {s} < nfft {nfft}")
    nframes = (s - nfft) // hop + 1
    if nfft % hop == 0:
        r = nfft // hop
        rows = s // hop
        xr = x[..., : rows * hop].reshape(*x.shape[:-1], rows, hop)
        pieces = [xr[..., i: i + nframes, :] for i in range(r)]
        return jnp.concatenate(pieces, axis=-1)
    idx = (jnp.arange(nframes)[:, None] * hop + jnp.arange(nfft)[None, :])
    return jnp.take(x, idx, axis=-1)


def _win(window, nfft: int) -> jnp.ndarray:
    if isinstance(window, str):
        if window == "hann":
            w = _hann_periodic(nfft)
        elif window == "hamming":
            w = np.hamming(nfft)
        elif window == "boxcar":
            w = np.ones(nfft)
        else:
            raise ValueError(f"unknown window {window!r}")
        return jnp.asarray(w, F32)
    w = jnp.asarray(window, F32)
    if w.shape != (nfft,):
        raise ValueError(f"window shape {w.shape} != ({nfft},)")
    return w


def _hann_periodic(n: int) -> np.ndarray:
    # scipy.signal.get_window('hann', n) — periodic symmetric-sum form
    return 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)


def _frame_ffts(x: jax.Array, nfft: int, hop: int, window,
                detrend: str | None, fft_fn) -> tuple[jax.Array, int]:
    w = _win(window, nfft)
    fr = frame_signal(x, nfft, hop)
    if detrend == "constant":
        fr = fr - jnp.mean(fr, axis=-1, keepdims=True)
    fr = fr * w
    if fft_fn is None:
        spec = jnp.fft.fft(fr, axis=-1)
        p = (jnp.real(spec) ** 2 + jnp.imag(spec) ** 2).astype(F32)
    else:
        re, im = fft_fn(jnp.real(fr).astype(F32), jnp.imag(fr).astype(F32))
        p = (re ** 2 + im ** 2).astype(F32)
    return p, fr.shape[-2]


def _scale(window, nfft: int, scaling: str) -> float:
    w = np.asarray(_win(window, nfft))
    if scaling == "density":
        return float(1.0 / np.sum(w ** 2))
    if scaling == "spectrum":
        return float(1.0 / np.sum(w) ** 2)
    raise ValueError(f"unknown scaling {scaling!r}")


def welch(x: jax.Array, nfft: int, hop: int | None = None,
          window="hann", detrend: str | None = "constant",
          scaling: str = "density",
          fft_fn: Callable | None = None) -> jax.Array:
    """Welch PSD over the last axis -> [..., nfft] (two-sided, fftshift NOT
    applied; bin k = frequency k/nfft cycles/sample). fs=1: multiply by
    1/fs for physical units. Matches scipy.signal.welch(...,
    return_onesided=False, boundary=None) on its shared grid (tested)."""
    hop = hop if hop is not None else nfft // 2
    p, _ = _frame_ffts(x, nfft, hop, window, detrend, fft_fn)
    return jnp.mean(p, axis=-2) * F32(_scale(window, nfft, scaling))


def spectrogram(x: jax.Array, nfft: int, hop: int | None = None,
                window="hann", detrend: str | None = None,
                scaling: str = "density",
                fft_fn: Callable | None = None) -> jax.Array:
    """Power spectrogram -> [..., F, nfft] (frames-major, two-sided)."""
    hop = hop if hop is not None else nfft // 2
    p, _ = _frame_ffts(x, nfft, hop, window, detrend, fft_fn)
    return p * F32(_scale(window, nfft, scaling))


# ---------- streaming Welch ----------

class WelchState(NamedTuple):
    psd_sum: jax.Array    # [..., nfft] running sum of frame powers
    count: jax.Array      # [] or [...] frame count (f32; exact for < 2^24)
    tail: jax.Array       # [..., nfft - hop] carried overlap samples


def welch_stream_init(nfft: int, hop: int | None = None,
                      channel_shape: tuple = (), dtype=CF32) -> WelchState:
    hop = hop if hop is not None else nfft // 2
    return WelchState(
        psd_sum=jnp.zeros((*channel_shape, nfft), F32),
        count=jnp.zeros(channel_shape, F32),
        tail=jnp.zeros((*channel_shape, nfft - hop), dtype))


def welch_stream_update(state: WelchState, x: jax.Array, nfft: int,
                        hop: int | None = None, window="hann",
                        detrend: str | None = "constant",
                        fft_fn: Callable | None = None,
                        first: bool = False) -> WelchState:
    """Accumulate one block. Requires block length % hop == 0 and
    hop | nfft; the carried (nfft - hop)-sample tail makes the framing
    seam-free, so the finalized PSD equals the one-shot `welch` on the
    concatenated capture EXACTLY — pass first=True on the initial block
    (a static flag: it drops the frames that would overlap the zero-filled
    initial tail, which the one-shot never sees)."""
    hop = hop if hop is not None else nfft // 2
    n = x.shape[-1]
    if n % hop != 0:
        raise ValueError(f"block length {n} not divisible by hop {hop}")
    if nfft % hop != 0:
        raise ValueError(f"streaming form requires hop | nfft "
                         f"(got nfft={nfft}, hop={hop})")
    xin = jnp.concatenate([state.tail, x], axis=-1)
    p, nf = _frame_ffts(xin, nfft, hop, window, detrend, fft_fn)
    if first:
        skip = (nfft - hop) // hop   # frames touching the zero prefix
        p = p[..., skip:, :]
        nf -= skip
    tail_len = nfft - hop
    new_tail = xin[..., xin.shape[-1] - tail_len:] if tail_len > 0 \
        else state.tail
    return WelchState(psd_sum=state.psd_sum + jnp.sum(p, axis=-2),
                      count=state.count + F32(nf),
                      tail=new_tail)


def welch_stream_finalize(state: WelchState, nfft: int, window="hann",
                          scaling: str = "density") -> jax.Array:
    return (state.psd_sum / state.count[..., None]
            * F32(_scale(window, nfft, scaling)))
