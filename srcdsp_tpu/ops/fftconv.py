"""FFT transforms / overlap-save FFT convolution (SURVEY.md C6).

The reference carries a templated radix FFT and uses it for long-filter
convolution (BASELINE.json: "FFT transforms"; config 3 pits 4096-pt
overlap-save against direct FIR). TPU-native form: `jnp.fft` — XLA's native
FFT — over a batch of overlapped frames, with the frequency response
precomputed once. The batch dimension (frames x channels) is what feeds the
TPU well; a lone 4096-pt FFT is tiny.

Semantics: identical causal FIR-from-rest as ops.fir (y[n] = sum h[k] x[n-k]),
so the two paths are interchangeable and config 3 is a fair fight.

Streaming: carried tail = last (fft_size - hop) input samples; each frame is
[tail | new samples], the first (fft_size - hop) samples of every IFFT are
circular-convolution garbage and are discarded. hop defaults to
fft_size - (num_taps - 1), the maximum valid hop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from srcdsp_tpu.types import CF32


class FftConvState(NamedTuple):
    """Carried overlap: last (fft_size - hop) input samples."""

    tail: jax.Array  # [..., fft_size - hop] complex64


def default_hop(num_taps: int, fft_size: int) -> int:
    return fft_size - (num_taps - 1)


def make_freq_response(taps, fft_size: int) -> jnp.ndarray:
    """Precompute H = FFT(taps zero-padded to fft_size). Host-side, once."""
    h = jnp.asarray(taps).astype(CF32)
    if h.shape[0] > fft_size:
        raise ValueError(f"num_taps {h.shape[0]} > fft_size {fft_size}")
    return jnp.fft.fft(h, n=fft_size).astype(CF32)


def fftconv_init(num_taps: int, fft_size: int, channel_shape: tuple = (),
                 hop: int | None = None, dtype=CF32) -> FftConvState:
    hop = default_hop(num_taps, fft_size) if hop is None else hop
    _check_hop(num_taps, fft_size, hop)
    return FftConvState(tail=jnp.zeros((*channel_shape, fft_size - hop), dtype=dtype))


def _check_hop(num_taps: int, fft_size: int, hop: int) -> None:
    if not 0 < hop <= fft_size - (num_taps - 1):
        raise ValueError(
            f"hop must be in (0, fft_size - num_taps + 1] = (0, "
            f"{fft_size - num_taps + 1}], got {hop}")


def fftconv_apply(freq_response: jnp.ndarray, num_taps: int,
                  state: FftConvState, x: jax.Array, hop: int | None = None
                  ) -> tuple[FftConvState, jax.Array]:
    """Filter one block via overlap-save. x: [..., N], N % hop == 0 -> [..., N]."""
    F = freq_response.shape[-1]
    hop = default_hop(num_taps, F) if hop is None else hop
    _check_hop(num_taps, F, hop)
    overlap = F - hop
    n = x.shape[-1]
    if n % hop != 0:
        raise ValueError(f"block length {n} not divisible by hop {hop}")
    k = n // hop
    xin = jnp.concatenate([state.tail, x], axis=-1)  # [..., overlap + N]
    # overlapping frames [..., K, F]: frame j starts at j*hop
    idx = jnp.arange(k)[:, None] * hop + jnp.arange(F)[None, :]
    frames = xin[..., idx]
    spec = jnp.fft.fft(frames, axis=-1) * freq_response
    y = jnp.fft.ifft(spec, axis=-1)[..., overlap:]  # drop circular wrap
    y = y.reshape(*x.shape[:-1], n).astype(CF32)
    new_tail = xin[..., xin.shape[-1] - overlap:]
    return FftConvState(tail=new_tail), y


def fftconv_full(taps, x: jax.Array, fft_size: int, hop: int | None = None) -> jax.Array:
    """Whole-signal overlap-save filter from rest (one-shot convenience)."""
    taps = jnp.asarray(taps)
    H = make_freq_response(taps, fft_size)
    state = fftconv_init(taps.shape[0], fft_size, channel_shape=x.shape[:-1], hop=hop)
    _, y = fftconv_apply(H, taps.shape[0], state, x, hop=hop)
    return y
