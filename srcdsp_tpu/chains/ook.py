"""Noncoherent OOK/ASK demodulation (beyond-parity component).

On-off keying is the remaining basic modulation family the chain layer
didn't cover (FSK/PSK/QAM/CPM/OFDM all exist): garage remotes, tire
sensors, ADS-B and most sub-GHz ISM links are OOK/ASK, and an SDR
framework's demod menu is expected to include it. The classic receiver
is a per-sample loop (envelope detector -> integrate-and-dump -> compare
against a slicer threshold tracked by another loop). The TPU-native form
here is loop-free, mirroring the FSK chain's structure:

- **Envelope**: |x| (noncoherent — carrier phase and small CFO drop out;
  a front-end DDC can precede this for off-center channels).
- **Matched filter**: the sps-sample boxcar (integrate-and-dump's linear
  form) as ONE exclusive-cumsum difference with a carried (sps-1) tail —
  the cfar.py trick, exact and streaming-safe.
- **Symbol timing**: the chain reuses chains/sync.py's O&M square-law
  machinery verbatim (rectangular pulses have sinc excess bandwidth, so
  the squared matched-filter output carries a strong 1/T tone).
- **Threshold**: two-means slicing — carried exponentially-forgotten
  {low, high} cluster sums updated from each block's strobes (a fixed
  two-iteration Lloyd refinement from the block midpoint; masked sums,
  no sorting, static shapes).

Streaming follows the T2 contract: block outputs agree with the one-shot
run once timing/threshold accumulators converge (same contract as the
FSK/PSK chains). Manchester decoding (IEEE convention, 10 -> 1) with
blind half-bit alignment is provided for protocols that line-code.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from srcdsp_tpu.chains.sync import (TimingState, phase_unwrap,
                                    timing_estimate, timing_init,
                                    timing_sample_phase)
from srcdsp_tpu.types import CF32, F32

__all__ = [
    "OokParams", "OokState", "make_ook_params", "ook_init", "ook_apply",
    "ook_demod_full", "manchester_decode",
]


class OokParams(NamedTuple):
    sps: int               # samples per bit (per half-bit if Manchester)
    timing_forget: float   # O&M accumulator memory
    level_forget: float    # threshold cluster-sum memory


class OokState(NamedTuple):
    mf_tail: jax.Array     # [..., sps-1] envelope tail for the boxcar
    timing: TimingState
    phase: jax.Array       # [...] carried strobe phase (< 0 = first block).
    #   Rectangular pulses put tau at ~sps-1, right on the mod-sps wrap;
    #   without carrying the phase, per-block jitter (tau 6.998 -> 7.027)
    #   wraps mod(tau+1, sps) from ~8.0 to ~0.03 and slips the strobe grid
    #   by a whole symbol mid-stream (the round-2 red streaming test).
    lo_sum: jax.Array      # [...] forgotten sum of low-cluster strobes
    lo_n: jax.Array        # [...] forgotten low-cluster count
    hi_sum: jax.Array
    hi_n: jax.Array


def make_ook_params(sps: int, timing_forget: float = 0.5,
                    level_forget: float = 0.9) -> OokParams:
    if sps < 2:
        raise ValueError(f"sps must be >= 2, got {sps}")
    if not 0.0 <= timing_forget < 1.0 or not 0.0 <= level_forget < 1.0:
        raise ValueError("forget factors must be in [0, 1)")
    return OokParams(sps=int(sps), timing_forget=float(timing_forget),
                     level_forget=float(level_forget))


def ook_init(params: OokParams, channel_shape: tuple = ()) -> OokState:
    z = jnp.zeros(channel_shape, F32)
    return OokState(
        mf_tail=jnp.zeros(channel_shape + (params.sps - 1,), F32),
        timing=timing_init(params.sps, channel_shape, dtype=F32),
        phase=jnp.full(channel_shape, -1.0, F32),
        lo_sum=z, lo_n=z, hi_sum=z, hi_n=z,
    )


def _boxcar(tail: jax.Array, env: jax.Array, sps: int
            ) -> tuple[jax.Array, jnp.ndarray]:
    """Moving sum of the last sps samples (streaming): one cumsum over
    [tail | env] differenced at lag sps. Exact for integer-valued
    envelopes; for arbitrary floats the f32 hi-lo difference carries ~1 ulp
    of the running-sum magnitude, so a block split can differ from the
    one-shot run in the low bits. Returns (new_tail, mf[N])."""
    ext = jnp.concatenate([tail, env], axis=-1)        # [..., N + sps - 1]
    c = jnp.cumsum(ext.astype(F32), axis=-1)
    n = env.shape[-1]
    hi = jax.lax.slice_in_dim(c, sps - 1, sps - 1 + n, axis=-1)
    lo = jnp.pad(jax.lax.slice_in_dim(c, 0, n - 1, axis=-1),
                 [(0, 0)] * (c.ndim - 1) + [(1, 0)])
    return ext[..., -(sps - 1):], hi - lo


def ook_apply(params: OokParams, state: OokState, x: jax.Array
              ) -> tuple[OokState, tuple[jnp.ndarray, jnp.ndarray]]:
    """Demodulate one block. x: [..., N] complex, N % sps == 0.

    Returns (state, (bits [..., N/sps] int32, strobes [..., N/sps] f32)) —
    strobes are the matched-filter symbol samples (for soft decoding /
    diagnostics), bits the thresholded decisions.
    """
    sps = params.sps
    env = jnp.abs(jnp.asarray(x, CF32)).astype(F32)
    tail, mf = _boxcar(state.mf_tail, env, sps)
    # O&M timing on the squared matched-filter output (strong 1/T line).
    acc, tau = timing_estimate(state.timing.acc, mf * mf, sps,
                               forget=params.timing_forget)
    # Unwrap toward the carried phase so the strobe grid stays continuous
    # across blocks even when tau jitters over the 0/sps wrap.
    phase = phase_unwrap(state.phase, tau, sps)
    last, strobes = timing_sample_phase(state.timing.last, mf, phase, sps)
    # Two-means threshold: seed at the block midpoint, one Lloyd pass on
    # this block, then blend into the carried cluster sums.
    mid = 0.5 * (jnp.max(strobes, axis=-1) + jnp.min(strobes, axis=-1))
    hi_m = strobes > mid[..., None]
    blk_hi = jnp.sum(jnp.where(hi_m, strobes, F32(0.0)), axis=-1)
    blk_hi_n = jnp.sum(hi_m.astype(F32), axis=-1)
    blk_lo = jnp.sum(jnp.where(hi_m, F32(0.0), strobes), axis=-1)
    blk_lo_n = jnp.sum((~hi_m).astype(F32), axis=-1)
    g = F32(params.level_forget)
    lo_sum = g * state.lo_sum + blk_lo
    lo_n = g * state.lo_n + blk_lo_n
    hi_sum = g * state.hi_sum + blk_hi
    hi_n = g * state.hi_n + blk_hi_n
    thr = 0.5 * (lo_sum / jnp.maximum(lo_n, F32(1.0))
                 + hi_sum / jnp.maximum(hi_n, F32(1.0)))
    bits = (strobes > thr[..., None]).astype(jnp.int32)
    st = OokState(mf_tail=tail,
                  timing=TimingState(acc=acc, last=last), phase=phase,
                  lo_sum=lo_sum, lo_n=lo_n, hi_sum=hi_sum, hi_n=hi_n)
    return st, (bits, strobes)


def ook_demod_full(params: OokParams, x: jax.Array
                   ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Whole-signal convenience (from rest)."""
    _, out = ook_apply(params, ook_init(params, jnp.shape(x)[:-1]), x)
    return out


def manchester_decode(chips: jax.Array) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Decode IEEE-802.3-convention Manchester half-bit chips (10 -> 1,
    01 -> 0) with blind alignment: of the two possible pairings, pick the
    one with more valid (unequal) chip pairs. chips: [..., L] int.
    Returns (bits [..., L//2] int32, valid_fraction [...] f32). The
    offset-0 candidate decodes L//2 complete pairs; the offset-1
    candidate decodes (L-1)//2 and is zero-padded to the same length,
    so an exactly-aligned even-length stream keeps its final bit.
    Validity is compared over each candidate's own complete pairs.
    """
    chips = jnp.asarray(chips, jnp.int32)
    length = chips.shape[-1]
    nbit = length // 2
    if length < 3:
        raise ValueError("need at least 3 chips for blind alignment")

    def pair(off):
        avail = (length - off) // 2            # complete pairs at this offset
        c = jax.lax.slice_in_dim(chips, off, off + 2 * avail, axis=-1)
        c = c.reshape(*c.shape[:-1], avail, 2)
        bits = c[..., 0]                       # 10 -> 1, 01 -> 0
        valid = jnp.mean((c[..., 0] != c[..., 1]).astype(F32), axis=-1)
        if avail < nbit:
            bits = jnp.pad(bits, [(0, 0)] * (bits.ndim - 1)
                           + [(0, nbit - avail)])
        return bits, valid

    b0, v0 = pair(0)
    b1, v1 = pair(1)
    use1 = v1 > v0
    bits = jnp.where(use1[..., None], b1, b0)
    return bits.astype(jnp.int32), jnp.where(use1, v1, v0)
