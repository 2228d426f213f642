"""PSK demodulator chain (SURVEY.md C9; BASELINE.json config 5 per-channel demod).

Reference shape: carrier-recovery loop + slicer as a per-channel C++ object
(BASELINE.json: "FSK/PSK demodulation"). A Costas loop is a per-sample
recurrence; the TPU-native design replaces it with the *feedforward*
Viterbi&Viterbi estimator, which is one power, one reduction and one rotate —
fully vectorized, no scan:

    acc   = forget*acc + sum_k s_k^M * exp(-j*2*pi*off)   (carried, circular)
    phi   = angle(acc) / M                                 (block phase)
    y_k   = s_k * exp(-j*phi)                              (derotate)
    idx_k = round(angle(y_k)*M/(2*pi) - off) mod M         (slice)

Constellation convention (shared with testing.signals.psk_symbols): point m
is exp(j*2*pi*(m+off)/M), off = 0.5 for QPSK (diagonal constellation), 0
otherwise. V&V leaves an inherent M-fold phase ambiguity; resolve it with
differential encoding (`diff_encode`/`diff_decode`) or a pilot.

Chain: NCO mix -> RRC matched filter (+decimate) -> O&M symbol timing ->
V&V carrier recovery -> slicer. Channels = leading state axes (vmap/shard).
"""

from __future__ import annotations

import dataclasses

from typing import NamedTuple

import jax
import jax.numpy as jnp

from srcdsp_tpu.chains.sync import TimingState, timing_estimate, timing_init, timing_sample
from srcdsp_tpu.ops.fir import FirState, fir_apply, fir_init
from srcdsp_tpu.ops.nco import NcoState, TWO_PI, freq_to_word, nco_apply, nco_init
from srcdsp_tpu.ops.window import root_raised_cosine
from srcdsp_tpu.types import CF32, F32


def constellation_offset(order: int) -> float:
    return 0.5 if order == 4 else 0.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PskParams:
    freq_word: jax.Array   # uint32 NCO word(s): shift channel to baseband
    taps: jax.Array        # [T] float32 matched-filter (RRC) taps
    decim: int = dataclasses.field(metadata=dict(static=True))
    sps: int = dataclasses.field(metadata=dict(static=True))   # post-decim samples/symbol
    order: int = dataclasses.field(metadata=dict(static=True))  # M in M-PSK


class PskState(NamedTuple):
    nco: NcoState
    fir: FirState
    timing: TimingState
    cr_acc: jax.Array      # [...] complex64 V&V phase accumulator


def make_psk_params(center_freq: float, decim: int, sps: int, order: int = 4,
                    rrc_beta: float = 0.35, rrc_span: int = 8) -> PskParams:
    """Host-side constructor. RRC is designed at the *input* rate (decim*sps
    samples/symbol) so matched filtering happens before decimation."""
    taps = root_raised_cosine(decim * sps, rrc_span, beta=rrc_beta)
    return PskParams(
        freq_word=jnp.asarray(freq_to_word(-center_freq)),
        taps=jnp.asarray(taps), decim=decim, sps=sps, order=order,
    )


def psk_init(params: PskParams, channel_shape: tuple = ()) -> PskState:
    return PskState(
        nco=nco_init(channel_shape),
        fir=fir_init(int(params.taps.shape[-1]), channel_shape),
        timing=timing_init(params.sps, channel_shape, dtype=CF32),
        cr_acc=jnp.zeros(channel_shape, dtype=CF32),
    )


def vv_phase(acc: jax.Array, sym: jax.Array, order: int, off: float,
             forget: float = 0.5) -> tuple[jax.Array, jax.Array]:
    """Viterbi&Viterbi block phase estimate with carried circular accumulator."""
    powered = sym ** order  # integer power of complex: fine under jit
    rot = jnp.exp(jnp.asarray(-1j * TWO_PI * off)).astype(CF32)
    c = jnp.sum(powered * rot, axis=-1)
    acc = (F32(forget) * acc + c).astype(CF32)
    phi = jnp.angle(acc) / order
    return acc, phi


def psk_slice(y: jax.Array, order: int, off: float) -> jax.Array:
    """Nearest-constellation-point indices for derotated symbols."""
    idx = jnp.round(jnp.angle(y) * (order / TWO_PI) - off).astype(jnp.int32)
    return jnp.mod(idx, order)


def psk_apply(params: PskParams, state: PskState, x: jax.Array,
              ) -> tuple[PskState, tuple[jax.Array, jax.Array]]:
    """Demodulate one block. x: [..., N], N % (decim*sps) == 0.

    Returns (state, (sym_idx [..., Nsym] int32, soft [..., Nsym] complex64))
    where soft is the derotated symbol (unit-circle constellation scale).
    """
    off = constellation_offset(params.order)
    nco_s, mixed = nco_apply(params.freq_word, state.nco, x)
    fir_s, bb = fir_apply(params.taps, state.fir, mixed, decim=params.decim)
    power = (jnp.real(bb) ** 2 + jnp.imag(bb) ** 2).astype(F32)
    acc, tau = timing_estimate(state.timing.acc, power, params.sps)
    t_last, sym = timing_sample(state.timing.last, bb, tau, params.sps)
    # normalize amplitude before V&V so the M-th power doesn't overweight peaks
    scale = jnp.sqrt(jnp.mean(jnp.abs(sym) ** 2, axis=-1, keepdims=True) + 1e-12)
    symn = (sym / scale).astype(CF32)
    cr_acc, phi = vv_phase(state.cr_acc, symn, params.order, off)
    soft = (symn * jnp.exp(-1j * phi[..., None])).astype(CF32)
    idx = psk_slice(soft, params.order, off)
    new_state = PskState(nco=nco_s, fir=fir_s,
                         timing=TimingState(acc=acc, last=t_last), cr_acc=cr_acc)
    return new_state, (idx, soft)


def psk_demod_stream(params: PskParams, x: jax.Array, block: int,
                     channel_shape: tuple = ()) -> tuple[jax.Array, jax.Array]:
    """Whole-capture convenience: scan psk_apply over blocks of `block`.

    x: [..., S] with S % block == 0 and block % (decim*sps) == 0.
    Returns (sym_idx [..., S/(decim*sps)], soft).
    """
    s = x.shape[-1]
    if s % block != 0:
        raise ValueError(f"capture length {s} not divisible by block {block}")
    nb = s // block
    blocks = jnp.moveaxis(x.reshape(*x.shape[:-1], nb, block), -2, 0)

    def step(st, xb):
        st, out = psk_apply(params, st, xb)
        return st, out

    _, (idx, soft) = jax.lax.scan(step, psk_init(params, channel_shape), blocks)
    idx = jnp.moveaxis(idx, 0, -2).reshape(*x.shape[:-1], -1)
    soft = jnp.moveaxis(soft, 0, -2).reshape(*x.shape[:-1], -1)
    return idx, soft


def diff_encode(idx: jax.Array, order: int) -> jax.Array:
    """Differential encoding: tx[k] = cumsum(idx) mod M (resolves V&V ambiguity)."""
    return jnp.mod(jnp.cumsum(idx, axis=-1), order)


def diff_decode(idx: jax.Array, order: int) -> jax.Array:
    """d[k] = idx[k] - idx[k-1] mod M; d[0] uses idx[-1]=0 (first symbol is a ref)."""
    prev = jnp.concatenate([jnp.zeros_like(idx[..., :1]), idx[..., :-1]], axis=-1)
    return jnp.mod(idx - prev, order)
