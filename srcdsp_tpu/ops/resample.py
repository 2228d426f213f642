"""Rational L/M resampler (SURVEY.md C5).

The reference is a C++ polyphase template class stepping a phase counter per
output sample (BASELINE.json: "rational resampling"). TPU-native form: one
`lax.conv_general_dilated` call per block with ``lhs_dilation=L`` (zero-stuff
upsample) and ``window_strides=M`` (decimate) — XLA lowers the polyphase
structure onto the MXU itself; no per-sample phase bookkeeping exists at all.

Semantics (mirrored by the C++ oracle): with u the zero-stuffed upsample of
x (u[i*L] = x[i], else 0) and causal filtering from rest,

    y[j] = sum_k h[k] u[j*M - k]

Output rate is fs*L/M; design h at rate fs*L with gain L for unit passband.

Streaming: taps are zero-padded (a pure no-op on the math) to T' with
(T'-1) % L == 0, so the u-domain history of T'-1 samples is *exactly*
(T'-1)/L input-domain samples — the carried tail. Output-phase continuity is
guaranteed by requiring N*L % M == 0 per block, which keeps every block
boundary aligned to an exact output sample.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from srcdsp_tpu.ops.fir import complex_conv
from srcdsp_tpu.types import CF32


class ResampleState(NamedTuple):
    """Carried input-domain tail: last (T'-1)/L input samples."""

    tail: jax.Array  # [..., (T'-1)/L] complex64


def _padded_len(num_taps: int, up: int) -> int:
    """Smallest T' >= num_taps with (T'-1) % up == 0."""
    return num_taps + (-(num_taps - 1)) % up


def pad_taps(taps, up: int) -> jnp.ndarray:
    taps = jnp.asarray(taps)
    return jnp.pad(taps, (0, _padded_len(taps.shape[0], up) - taps.shape[0]))


def resample_init(num_taps: int, up: int, channel_shape: tuple = (),
                  dtype=CF32) -> ResampleState:
    ntail = (_padded_len(num_taps, up) - 1) // up
    return ResampleState(tail=jnp.zeros((*channel_shape, ntail), dtype=dtype))


def resample_apply(taps, state: ResampleState, x: jax.Array, up: int, down: int,
                   precision=jax.lax.Precision.HIGHEST
                   ) -> tuple[ResampleState, jax.Array]:
    """Resample one block. x: [..., N], N*up % down == 0 -> y: [..., N*up//down].

    `taps` may be the original (unpadded) design; padding to T' is applied
    here and changes nothing numerically.
    """
    n = x.shape[-1]
    if (n * up) % down != 0:
        raise ValueError(f"N*L={n}*{up} not divisible by M={down}")
    h = pad_taps(taps, up)
    ntail = (h.shape[0] - 1) // up
    if state.tail.shape[-1] != ntail:
        raise ValueError(f"state tail {state.tail.shape[-1]} != expected {ntail}")
    xin = jnp.concatenate([state.tail, x], axis=-1)
    # Padding (0, up-1) extends the dilated lhs through the u-domain zeros
    # that trail the last real sample — outputs near the block end may
    # straddle them; they are true zeros of u, not future samples.
    y = complex_conv(xin, h, stride=down, lhs_dilation=up,
                     padding=((0, up - 1),), precision=precision)
    # xin = [tail, x] always holds at least ntail samples, so this is correct
    # even for blocks shorter than the tail.
    new_tail = xin[..., xin.shape[-1] - ntail:]
    return ResampleState(tail=new_tail), y


def resample_full(taps, x: jax.Array, up: int, down: int,
                  precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Whole-signal resample from rest (one-shot convenience)."""
    h = jnp.asarray(taps)
    state = resample_init(h.shape[0], up, channel_shape=x.shape[:-1], dtype=x.dtype)
    _, y = resample_apply(taps, state, x, up, down, precision=precision)
    return y
