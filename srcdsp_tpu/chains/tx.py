"""Transmit chains (beyond parity): streaming device-side modulators.

The reference is demod-focused; its transmit side is the signal-generator
classes (SURVEY.md C7 — stateful C++ sources). This module promotes
transmission to a first-class streaming chain, mirroring the rx chains'
`(state, block) -> (state, block)` contract so a TX path jits, scans,
vmaps and shards exactly like an RX path:

- **Linear modulations** (PSK / QAM / any complex symbol stream):
  zero-stuff polyphase interpolation through the pulse-shaping filter
  (ops.resample carried-tail streaming) + u32-phase NCO upconversion —
  the exact transpose of the rx front end, one conv + one multiply.
- **CPM** (CPFSK / MSK / GMSK): the frequency pulse is quantized to
  **int32 phase-increment words at design time**; the per-sample word
  stream is a shift-and-add over the NRZ bits (nrz is +-1, so every
  product is just +-word — exact integer arithmetic, no conv rounding),
  then integrated by a wrapping int32 cumsum with a carried accumulator
  (the ops.nco trick applied to a *varying* frequency). Streaming joins
  are bit-exact for ANY block split: float pulse shaping cannot promise
  that (XLA conv reduction order varies with block shape), integer words
  can.

Constellation conventions match the rx chains (chains.psk / chains.qam),
so tx -> channel -> rx roundtrips are SER 0 by construction.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.chains.psk import constellation_offset
from srcdsp_tpu.chains.qam import qam_constellation
from srcdsp_tpu.ops.nco import NcoState, TWO_PI, freq_to_word, nco_apply, nco_init
from srcdsp_tpu.ops.resample import ResampleState, resample_apply, resample_init
from srcdsp_tpu.types import CF32, F32

__all__ = [
    "psk_map", "qam_map", "bits_to_indices",
    "LinearTxParams", "LinearTxState", "make_linear_tx", "linear_tx_init",
    "linear_tx_apply",
    "CpmTxParams", "CpmTxState", "make_cpfsk_tx", "make_gmsk_tx",
    "gaussian_freq_pulse", "cpm_tx_init", "cpm_tx_apply",
]


# ---------------------------------------------------------------------------
# Symbol mappers (pure, conventions shared with the rx slicers)
# ---------------------------------------------------------------------------

def psk_map(idx: jax.Array, order: int) -> jax.Array:
    """Index m -> exp(j*2*pi*(m+off)/M); off matches chains.psk's slicer."""
    off = constellation_offset(order)
    ph = (idx.astype(F32) + F32(off)) / F32(order)
    return jnp.exp(1j * TWO_PI * ph).astype(CF32)


def qam_map(idx: jax.Array, order: int) -> jax.Array:
    """Gray symbol index -> unit-average-power square-QAM point."""
    return jnp.take(qam_constellation(order), idx, axis=-1)


def bits_to_indices(bits: jax.Array, bits_per_symbol: int) -> jax.Array:
    """Pack bits MSB-first into symbol indices. [..., N*b] -> [..., N]."""
    n = bits.shape[-1]
    if n % bits_per_symbol != 0:
        raise ValueError(f"{n} bits not divisible by {bits_per_symbol}")
    b = bits.astype(jnp.int32).reshape(*bits.shape[:-1], -1, bits_per_symbol)
    w = (2 ** np.arange(bits_per_symbol - 1, -1, -1)).astype(np.int32)
    return jnp.sum(b * jnp.asarray(w), axis=-1)


# ---------------------------------------------------------------------------
# Linear TX: symbols -> pulse-shaped, upconverted IQ
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LinearTxParams:
    """Pulse-shaping interpolator + upconverter. `taps` is the pulse (e.g.
    ops.window.root_raised_cosine) at `sps` samples/symbol; `freq_word` is
    the +center upconversion tuning word."""

    freq_word: jax.Array
    taps: jax.Array
    sps: int = dataclasses.field(metadata=dict(static=True))


class LinearTxState(NamedTuple):
    rs: ResampleState
    nco: NcoState


def make_linear_tx(center_freq: float, taps, sps: int) -> LinearTxParams:
    return LinearTxParams(
        freq_word=jnp.asarray(freq_to_word(center_freq)),
        taps=jnp.asarray(taps), sps=sps,
    )


def linear_tx_init(params: LinearTxParams, channel_shape: tuple = ()
                   ) -> LinearTxState:
    return LinearTxState(
        rs=resample_init(int(params.taps.shape[-1]), params.sps, channel_shape),
        nco=nco_init(channel_shape),
    )


def linear_tx_apply(params: LinearTxParams, state: LinearTxState,
                    symbols: jax.Array) -> tuple[LinearTxState, jax.Array]:
    """Modulate one block. symbols: [..., Nsym] complex -> [..., Nsym*sps]."""
    rs, shaped = resample_apply(params.taps, state.rs,
                                symbols.astype(CF32), up=params.sps, down=1)
    nco, out = nco_apply(params.freq_word, state.nco, shaped)
    return LinearTxState(rs=rs, nco=nco), out


# ---------------------------------------------------------------------------
# CPM TX: bits -> frequency pulse -> exact fixed-point phase integration
# ---------------------------------------------------------------------------

_SCALE = float(1 << 32)
_INV_SCALE = float(2.0 ** -32)


def gaussian_freq_pulse(sps: int, bt: float = 0.3, span: int = 3,
                        h: float = 0.5) -> np.ndarray:
    """Gaussian CPM frequency pulse (cycles/sample), integrating to h/2
    cycles per bit — the same pulse as testing.signals.gmsk_baseband."""
    tt = (np.arange(span * sps) - (span * sps - 1) / 2.0) / sps
    sigma = np.sqrt(np.log(2.0)) / (2.0 * np.pi * bt)
    g = np.exp(-0.5 * (tt / sigma) ** 2)
    p = np.convolve(np.ones(sps), g)
    return (p / p.sum() * (h / 2.0)).astype(np.float64)


def _pulse_words(pulse: np.ndarray, sps: int) -> np.ndarray:
    """Quantize a frequency pulse to int32 phase-increment words, reshaped
    [nspan, sps] (nspan = bits the pulse straddles). The largest tap is
    nudged so each bit advances the phase by EXACTLY round(sum(p) * 2^32)
    words — MSK phase steps stay exactly +-h turns in the modular algebra.
    """
    p = np.asarray(pulse, np.float64)
    nspan = -(-p.size // sps)
    p = np.pad(p, (0, nspan * sps - p.size))
    w = np.round(p * _SCALE).astype(np.int64)
    w[np.argmax(np.abs(w))] += np.round(p.sum() * _SCALE).astype(np.int64) - w.sum()
    if np.abs(w).max() >= 2 ** 31:
        raise ValueError("pulse too large: |tap| must stay below 0.5 cycles")
    return w.reshape(nspan, sps).astype(np.int32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CpmTxParams:
    """`words` is the frequency pulse as int32 phase-increment words
    [nspan, sps] (2^-32 turns/sample, design-time quantized); a bit's total
    phase advance is exactly sum(words) ~= h/2 turns. `freq_word`
    upconverts to `center`."""

    freq_word: jax.Array
    words: jax.Array
    sps: int = dataclasses.field(metadata=dict(static=True))


class CpmTxState(NamedTuple):
    hist: jax.Array    # [..., nspan-1] int32 NRZ history (+-1)
    phase: jax.Array   # [...] int32 accumulated phase word (2^-32 turns)
    nco: NcoState


def make_cpfsk_tx(center_freq: float, sps: int, dev: float) -> CpmTxParams:
    """Square-pulse CPFSK: instantaneous frequency +/-dev cycles/sample
    (matches testing.signals.fsk_baseband)."""
    return CpmTxParams(
        freq_word=jnp.asarray(freq_to_word(center_freq)),
        words=jnp.asarray(_pulse_words(np.full(sps, dev), sps)), sps=sps,
    )


def make_gmsk_tx(center_freq: float, sps: int, bt: float = 0.3,
                 span: int = 3) -> CpmTxParams:
    return CpmTxParams(
        freq_word=jnp.asarray(freq_to_word(center_freq)),
        words=jnp.asarray(_pulse_words(gaussian_freq_pulse(sps, bt, span),
                                       sps)),
        sps=sps,
    )


def cpm_tx_init(params: CpmTxParams, channel_shape: tuple = ()) -> CpmTxState:
    nspan = int(params.words.shape[0])
    return CpmTxState(
        hist=jnp.zeros((*channel_shape, nspan - 1), dtype=jnp.int32),
        phase=jnp.zeros(channel_shape, dtype=jnp.int32),
        nco=nco_init(channel_shape),
    )


def cpm_tx_apply(params: CpmTxParams, state: CpmTxState, bits: jax.Array
                 ) -> tuple[CpmTxState, jax.Array]:
    """Modulate one block. bits: [..., Nsym] {0,1} -> [..., Nsym*sps].

    All phase arithmetic is int32 (wrapping two's-complement == modular
    turns): word[m*sps + r] = sum_j nrz[m-j] * words[j, r], every product
    just +-words (exact), integrated by a wrapping cumsum with the carried
    accumulator. Output is bit-identical under ANY block split and phase
    error never accumulates over unbounded streams.
    """
    nsym = bits.shape[-1]
    nspan = int(params.words.shape[0])
    nrz = (2 * bits.astype(jnp.int32) - 1)
    ext = jnp.concatenate([state.hist, nrz], axis=-1)  # [..., nspan-1+Nsym]
    # [..., Nsym, sps] int32; j runs over the bits the pulse straddles
    w = sum(ext[..., nspan - 1 - j:nspan - 1 - j + nsym, None]
            * params.words[j] for j in range(nspan))
    w = w.reshape(*w.shape[:-2], nsym * params.sps)
    csum = jnp.cumsum(w, axis=-1)
    ph_words = state.phase[..., None] + csum - w          # phase BEFORE step
    ph = ph_words.astype(F32) * F32(_INV_SCALE)           # turns in [-0.5, 0.5)
    bb = jnp.exp(1j * TWO_PI * ph).astype(CF32)
    nco, out = nco_apply(params.freq_word, state.nco, bb)
    return CpmTxState(hist=ext[..., ext.shape[-1] - (nspan - 1):],
                      phase=state.phase + csum[..., -1],
                      nco=nco), out
