"""Preamble correlation / burst detection (beyond-parity component).

Finds known-preamble bursts in a sample stream: normalized matched-filter
correlation + local-max peak detection, the front door of any packetized
SDR receiver. TPU-native form:

- the matched filter is ops.fir with complex taps conj(p[::-1]) — one
  MXU conv, streaming state carried like every FIR;
- the normalizer is a second FIR (moving energy over the same T-sample
  window), so score[n] = |corr[n]| / (||p|| sqrt(E[n])) is a true
  normalized correlation in [0, 1] regardless of input level;
- peak decisions are a 3-tap comparison emitted as a MASK over static
  shapes; the host compacts mask -> global sample indices at the sink
  (the same ragged-output pattern as chains.tracking's skip/stuff mode).

Seam correctness: deciding "is score[g] a local max" needs score[g+1], so
each block defers its last score and decides it first thing next block —
the emitted decisions for a block of N samples cover global scores
[g0-1, g0+N-1) and no peak is ever missed or doubled at a block seam
(tested by a seam-straddling burst in tests/unit/test_framesync.py).

Index convention: a preamble whose FIRST sample sits at global input index
s peaks at score index s + T - 1 (the causal matched-filter delay);
`peak_to_burst_start` undoes it.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.ops.fir import FirState, fir_apply, fir_init
from srcdsp_tpu.types import CF32, F32


class FrameSyncParams(NamedTuple):
    mf_taps: jax.Array      # [T] complex: conj(preamble[::-1])
    en_taps: jax.Array      # [T] real ones (moving energy window)
    pnorm: float            # ||preamble||_2
    threshold: float        # normalized-score threshold in (0, 1)


class FrameSyncState(NamedTuple):
    corr: FirState
    energy: FirState
    prev2: jax.Array        # [..., 2] carried scores (seam-correct peaks)
    base: jax.Array         # [] int32: global score index of block start


def make_frame_sync_params(preamble, threshold: float = 0.6
                           ) -> FrameSyncParams:
    p = jnp.asarray(preamble, CF32)
    if p.ndim != 1:
        raise ValueError(f"preamble must be 1-D, got {p.shape}")
    return FrameSyncParams(
        mf_taps=jnp.conj(p[::-1]),
        en_taps=jnp.ones(p.shape[0], F32),
        pnorm=float(np.sqrt(np.sum(np.abs(np.asarray(p)) ** 2))),
        threshold=float(threshold),
    )


def frame_sync_init(params: FrameSyncParams,
                    channel_shape: tuple = ()) -> FrameSyncState:
    t = int(params.mf_taps.shape[0])
    return FrameSyncState(
        corr=fir_init(t, channel_shape),
        energy=fir_init(t, channel_shape, dtype=F32),
        prev2=jnp.zeros((*channel_shape, 2), F32),
        base=jnp.zeros((), jnp.int32),
    )


def frame_sync_apply(params: FrameSyncParams, state: FrameSyncState,
                     x: jax.Array
                     ) -> tuple[FrameSyncState,
                                tuple[jax.Array, jax.Array, jax.Array]]:
    """Score one block. x: [..., N] complex.

    Returns (state, (score, mask, first_idx)): decisions for the N global
    score positions [base-1, base+N-1) — score[i] is the normalized
    correlation at global index first_idx + i and mask[i] is True where it
    is an over-threshold local maximum. Compact on the host with
    peak_indices(). The first block's leading decision (global index -1,
    always False) pads the stream so shapes stay static.
    """
    n = x.shape[-1]
    corr_s, c = fir_apply(params.mf_taps, state.corr, x)
    p2 = (jnp.real(x) ** 2 + jnp.imag(x) ** 2).astype(F32)
    en_s, e = fir_apply(params.en_taps, state.energy, p2)
    e = jnp.real(e).astype(F32)
    score = jnp.abs(c).astype(F32) / (
        params.pnorm * jnp.sqrt(jnp.maximum(e, 0.0)) + F32(1e-12))
    ext = jnp.concatenate([state.prev2, score], axis=-1)   # [..., N+2]
    mid = ext[..., 1:n + 1]
    mask = ((mid > params.threshold)
            & (mid > ext[..., 0:n])
            & (mid >= ext[..., 2:n + 2]))
    first_idx = state.base - 1
    return FrameSyncState(corr=corr_s, energy=en_s,
                          prev2=ext[..., n:n + 2],
                          base=state.base + n), (mid, mask, first_idx)


def peak_indices(masks, first_idxs):
    """Host-side sink: global score indices of detected peaks.

    masks: list of [N] bool blocks (1-D single channel); first_idxs: the
    matching first_idx of each block."""
    out = []
    for m, f in zip(masks, first_idxs):
        w = np.nonzero(np.asarray(m))[0]
        out.extend((int(f) + w).tolist())
    return np.asarray(out, np.int64)


def peak_to_burst_start(peak_idx, num_taps: int):
    """Global input index of the preamble's first sample for a peak."""
    return peak_idx - (num_taps - 1)
