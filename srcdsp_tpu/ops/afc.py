"""Band-edge AFC: automatic frequency control with a pull-in range of
the full symbol bandwidth (beyond parity — the acquisition-range
companion to the Costas tracker, whose M-th-power detector aliases
beyond +-Rs/(2M)).

The classic band-edge FLL runs a per-sample feedback loop; the
TPU-native form here is BLOCK-feedback, matching the framework's
per-block philosophy (cf. the O&M timing and V&V carrier estimators):

- two one-sided complex-tap FIRs (the SSB machinery) sit on the upper
  and lower band edges of the pulse-shaped signal;
- per block, the normalized power imbalance e = (Pu - Pl)/(Pu + Pl) is
  an S-curve in the residual CFO spanning the whole signal bandwidth;
- one frequency update per block (freq += k * e * bw/2), applied by a
  TRACED NCO tuning word — phase stays continuous through the carried
  u32 accumulator while the frequency changes block to block.

Converges in a handful of blocks from offsets several times the Costas
range, then hands a near-zero-CFO stream to any chain (which tracks the
residual). Slow Doppler ramps are followed for free (the loop re-centers
every block).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.ops.fir import FirState, fir_apply, fir_init
from srcdsp_tpu.ops.nco import NcoState, freq_to_word_traced, nco_apply, nco_init
from srcdsp_tpu.ops.window import lowpass
from srcdsp_tpu.types import F32

__all__ = ["AfcParams", "AfcState", "make_afc", "afc_init", "afc_apply"]


class AfcParams(NamedTuple):
    upper_taps: jax.Array    # [T] complex one-sided edge filter (+)
    lower_taps: jax.Array    # [T] complex one-sided edge filter (-)
    bw: float                # signal bandwidth, cycles/sample
    gain: float              # loop gain; 0.1 converges in ~5 blocks with
                             # no overshoot (>=0.3 oscillates: the S-curve
                             # saturates at +-1, measured)


class AfcState(NamedTuple):
    freq: jax.Array          # [] f32 current frequency estimate
    nco: NcoState
    up: FirState
    lo: FirState


def make_afc(symbol_rate: float, beta: float = 0.35, num_taps: int = 64,
             gain: float = 0.1) -> AfcParams:
    """symbol_rate in cycles/sample (1/sps); beta = excess bandwidth of
    the pulse shaping. The edge filters sit at +-(1+beta)*Rs/2 with a
    bandwidth of beta*Rs (covering the rolloff skirt, where the power
    gradient lives)."""
    bw = (1.0 + beta) * symbol_rate
    edge = bw / 2.0
    ebw = max(beta * symbol_rate, symbol_rate / 8.0)
    if edge + ebw / 2.0 >= 0.5:
        raise ValueError(
            f"band-edge filter would alias: (1+beta)*Rs/2 + edge_bw/2 = "
            f"{edge + ebw / 2.0:.3f} >= 0.5 — increase the oversampling")
    proto = lowpass(num_taps, ebw / 2.0)
    n = np.arange(num_taps) - (num_taps - 1) / 2.0
    up = (proto * np.exp(2j * np.pi * edge * n)).astype(np.complex64)
    lo = (proto * np.exp(-2j * np.pi * edge * n)).astype(np.complex64)
    return AfcParams(upper_taps=jnp.asarray(up), lower_taps=jnp.asarray(lo),
                     bw=float(bw), gain=float(gain))


def afc_init(params: AfcParams, freq0: float = 0.0) -> AfcState:
    t = int(params.upper_taps.shape[-1])
    return AfcState(freq=jnp.asarray(np.float32(freq0)),
                    nco=nco_init(), up=fir_init(t), lo=fir_init(t))


def afc_apply(params: AfcParams, state: AfcState, x: jax.Array
              ) -> tuple[AfcState, tuple[jax.Array, jax.Array]]:
    """One block: derotate by the CURRENT estimate, measure the band-edge
    imbalance, update the estimate once. Returns (state, (y, freq)) —
    y is the derotated block (residual CFO decays over blocks), freq the
    estimate BEFORE this block's update (the value that produced y).
    """
    # traced tuning word: phase continuity lives in the carried u32
    word = freq_to_word_traced(-state.freq)
    nco_s, y = nco_apply(word, state.nco, x)
    up_s, u = fir_apply(params.upper_taps, state.up, y)
    lo_s, l = fir_apply(params.lower_taps, state.lo, y)
    pu = jnp.mean(jnp.abs(u) ** 2)
    pl = jnp.mean(jnp.abs(l) ** 2)
    e = (pu - pl) / (pu + pl + F32(1e-20))
    freq2 = state.freq + F32(params.gain * params.bw / 2.0) * e.astype(F32)
    return AfcState(freq=freq2, nco=nco_s, up=up_s, lo=lo_s), \
        (y, state.freq)
