"""Half-band FIR decimators and decimate-by-2^k cascades (beyond parity).

A half-band lowpass (cutoff exactly 0.25 cycles/sample) has every even-
indexed tap zero except the center — so a decimate-by-2 stage costs half
the MACs of a general FIR, and a 2^k decimator is k cascaded half-bands,
each running at half the previous rate: total work ~2x the FINAL-rate
FIR instead of 2^k x. This is the textbook front-end structure the
reference family's plain decimating FIR (SURVEY C3) leaves on the table.

TPU-native form: the zero taps are exploited STRUCTURALLY, not by sparse
arithmetic — the polyphase split of a half-band decimator is

    y[m] = (h_odd * x_even)[m] + c * x_odd[m - D]

one dense FIR over the even-sample stream (all the nonzero off-center
taps) plus a scaled, delayed copy of the odd-sample stream. Both pieces
are existing `ops.fir` machinery on half-rate streams; streaming state is
the even-stream FIR tail plus a (D+1)-sample odd-stream delay carry.

Design: windowed-sinc at cutoff 0.25 lands the even-tap zeros EXACTLY
(sin(pi k / 2) = 0 at even k), so no special design routine is needed —
`design_halfband` window-designs and then zeroes them explicitly to make
the structure exact by construction.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.ops.fir import FirState, fir_apply, fir_init
from srcdsp_tpu.ops.window import _kaiser_beta, kaiser
from srcdsp_tpu.types import CF32, F32

__all__ = [
    "design_halfband", "HalfbandState", "halfband_init", "halfband_decim",
    "HalfbandCascade", "cascade_init", "cascade_apply", "np_halfband_decim",
]


def design_halfband(num_taps: int, atten_db: float = 70.0) -> np.ndarray:
    """Kaiser-windowed half-band lowpass. num_taps must be ≡ 3 (mod 4)
    (odd length, even center index, center-adjacent taps nonzero).
    Even taps (except the center) are exactly zero."""
    if num_taps % 4 != 3:
        raise ValueError(f"half-band length must be 4k+3, got {num_taps}")
    n = np.arange(num_taps) - (num_taps - 1) / 2.0
    h = np.sinc(n / 2.0) / 2.0                 # ideal cutoff 0.25
    h *= kaiser(num_taps, _kaiser_beta(atten_db))
    # enforce the exact half-band structure (window leaves ~1e-17 dust)
    c = (num_taps - 1) // 2
    mask = np.zeros(num_taps, bool)
    mask[1 - c % 2::2] = True                  # odd offsets from center
    mask[c] = True
    h = np.where(mask, h, 0.0)
    # normalize the two halves separately: center tap EXACTLY 0.5 (the
    # complementarity axis A(f) + A(0.5-f) = 1 pivots on it) and the
    # off-center taps summing to 0.5 (DC gain exactly 1)
    h[c] = 0.0
    h *= 0.5 / h.sum()
    h[c] = 0.5
    return h.astype(np.float64)


class HalfbandState(NamedTuple):
    even: FirState     # dense FIR tail on the even-sample stream
    odd: jax.Array     # [..., D+1] carried odd-sample delay line


def _split_taps(h: np.ndarray) -> tuple[np.ndarray, float, int]:
    """h (4k+3 half-band) -> (dense taps on the even stream [k+1... ],
    center coefficient, odd-stream delay D in half-rate samples)."""
    t = len(h)
    c = (t - 1) // 2
    # t = 4k+3 makes the center index c = 2k+1 ODD, so the off-center
    # nonzero taps (odd offsets from c) sit at EVEN absolute indices:
    # the even-k terms of y[m] = sum_k h[k] x[2m-k] form a causal FIR on
    # the even-sample stream, and the center term is x_odd delayed by
    # (c+1)/2 = (t+1)/4 half-rate samples.
    dense = h[0::2]                            # all off-center nonzeros
    center = float(h[c])
    d = (c - 1) // 2                           # odd-stream delay is d+1
    return dense.astype(np.float64), center, d


def halfband_init(h: np.ndarray, channel_shape: tuple = (),
                  dtype=CF32) -> HalfbandState:
    dense, _, d = _split_taps(h)
    return HalfbandState(
        even=fir_init(len(dense), channel_shape, dtype=dtype),
        odd=jnp.zeros((*channel_shape, d + 1), dtype))


def halfband_decim(h: np.ndarray, state: HalfbandState, x: jax.Array,
                   ) -> tuple[HalfbandState, jax.Array]:
    """Decimate by 2 with the polyphase half-band split.

    x: [..., N], N even -> y: [..., N/2]. Streaming-exact: block splits
    concatenate to the one-shot (same invariant as fir_apply)."""
    dense, center, d = _split_taps(np.asarray(h))
    n = x.shape[-1]
    if n % 2 != 0:
        raise ValueError(f"block length {n} must be even")
    lead = x.shape[:-1]
    pairs = x.reshape(*lead, n // 2, 2)
    x_even = pairs[..., 0]
    x_odd = pairs[..., 1]
    ev_state, y_even = fir_apply(jnp.asarray(dense), state.even, x_even)
    odd_full = jnp.concatenate([state.odd, x_odd], axis=-1)
    y_odd = odd_full[..., : n // 2]            # = x_odd[m - (d+1)]
    new_state = HalfbandState(
        even=ev_state, odd=odd_full[..., odd_full.shape[-1] - (d + 1):])
    return new_state, (y_even + F32(center) * y_odd).astype(x.dtype)


class HalfbandCascade(NamedTuple):
    taps: tuple        # per-stage designs (np arrays)


def cascade_init(stages: Sequence[np.ndarray], channel_shape: tuple = (),
                 dtype=CF32) -> tuple[HalfbandState, ...]:
    return tuple(halfband_init(h, channel_shape, dtype) for h in stages)


def cascade_apply(stages: Sequence[np.ndarray],
                  states: Sequence[HalfbandState], x: jax.Array
                  ) -> tuple[tuple[HalfbandState, ...], jax.Array]:
    """Decimate by 2^len(stages): each half-band runs at half the rate of
    the previous. Block length must divide by 2^k."""
    new_states = []
    y = x
    for h, st in zip(stages, states):
        st2, y = halfband_decim(h, st, y)
        new_states.append(st2)
    return tuple(new_states), y


def np_halfband_decim(h: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Reference: full-rate causal FIR then keep every 2nd output
    (phase 0) — the mathematical definition the split must match."""
    t = len(h)
    xin = np.concatenate([np.zeros(t - 1, x.dtype), x])
    full = np.convolve(xin, h, mode="valid")
    return full[0::2]
