"""NCO mixer (SURVEY.md C4): numerically-controlled oscillator + mix.

The reference is a per-sample phase accumulator with a sin/cos lookup and a
complex multiply per sample (BASELINE.json: "NCO mixing"). A per-sample
recurrence is poison for a vector machine, so the TPU form computes the whole
block's phase in closed form from a carried accumulator.

Like classic hardware/C++ NCOs, the accumulator is **fixed-point**: a uint32
counting in 2^-32 turns. That choice is load-bearing for the framework's
"bit-exact block joins" contract (BASELINE.json north_star): uint32 modular
arithmetic makes ``phase[k] = phase0 + k*df`` associative across any block
split, so streaming in blocks of 1, 7, or 2^20 samples produces *identical*
bits — which a float phase carry cannot guarantee. Frequency resolution is
2^-32 cycles/sample (0.23 mHz at 1 Msps), same class as the reference's
accumulator-plus-LUT design.

    phase_u32[k] = phase0 + k * df          (mod 2^32, exact)
    w[k]         = exp(+j * 2*pi * phase_u32[k] * 2^-32)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.types import CF32, F32

TWO_PI = 6.283185307179586
U32 = jnp.uint32
_SCALE = 4294967296.0  # 2^32 turns per wrap
_INV_SCALE = 1.0 / _SCALE


def freq_to_word(freq) -> np.ndarray:
    """Quantize frequency (cycles/sample) to a uint32 tuning word.

    Host-side (numpy float64): tuning words are chain-construction constants,
    quantized once with full precision, never inside jit.
    """
    f = np.asarray(freq, np.float64)
    word = np.round((f - np.floor(f)) * _SCALE) % _SCALE
    return word.astype(np.uint32)


def freq_to_word_traced(freq) -> "jnp.ndarray":
    """Traced (in-graph) u32 tuning word from an f32 frequency — the same
    quantization contract as `freq_to_word`, for loops that retune per
    block (ops.afc). All modular math stays in f32: int64 is unavailable
    without x64 and silently truncates.
    """
    m = jnp.mod(jnp.asarray(freq, F32), F32(1.0))
    return jnp.mod(jnp.round(m * F32(_SCALE)), F32(_SCALE)).astype(jnp.uint32)


class NcoState(NamedTuple):
    """Carried oscillator phase: uint32 in 2^-32 turns. Shape = channel shape."""

    phase: jax.Array  # [...] uint32


def nco_init(channel_shape: tuple = (), phase0: float = 0.0) -> NcoState:
    word = np.uint32(np.round((phase0 % 1.0) * _SCALE) % _SCALE)
    return NcoState(phase=jnp.broadcast_to(jnp.asarray(word), channel_shape))


def nco_phasor(freq_word, state: NcoState, n: int) -> tuple[NcoState, jax.Array]:
    """Generate n samples of exp(+j*2*pi*phase), phase from the u32 accumulator.

    freq_word: uint32 tuning word (use `freq_to_word`), scalar or per-channel
    [...] broadcasting against ``state.phase``. Returns ([...], [..., n]).
    """
    df = jnp.asarray(freq_word, U32)
    k = jnp.arange(n, dtype=U32)
    ph_u32 = state.phase[..., None] + k * df[..., None]  # wraps mod 2^32: exact
    ph = ph_u32.astype(F32) * F32(_INV_SCALE)            # turns in [0, 1)
    w = jnp.exp(1j * (TWO_PI * ph)).astype(CF32)
    new_phase = state.phase + U32(n) * df                # wraps: exact
    return NcoState(phase=new_phase), w


def nco_apply(freq_word, state: NcoState, x: jax.Array) -> tuple[NcoState, jax.Array]:
    """Mix: y = x * exp(+j*2*pi*phase[n]). Frequency-shifts x by +freq."""
    new_state, w = nco_phasor(freq_word, state, x.shape[-1])
    return new_state, (x * w).astype(CF32)
