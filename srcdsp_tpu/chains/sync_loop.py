"""Sequential tracking loops as `lax.scan` (SURVEY.md §3.1c parity).

The feedforward estimators in chains.sync/chains.psk are the TPU-native
defaults (no recurrences). These scan forms exist for the workloads the
reference's per-sample loops actually handle better: *tracking* a drifting
symbol clock or carrier within a block. The recurrence runs per SYMBOL (not
per sample), so the scan length is N/sps — the cheapest granularity that
still tracks.

- `gardner_scan`: Gardner TED + 2nd-order loop on a complex baseband at
  sps samples/symbol; carries (tau, freq) fractional timing state.
- `costas_scan`: decision-directed Costas loop for M-PSK on symbol-rate
  samples; carries (phase, freq).

Both are vmap-able over channels and jit-stable (static trip counts).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from srcdsp_tpu.ops.nco import TWO_PI
from srcdsp_tpu.types import CF32, F32


class GardnerState(NamedTuple):
    tau: jax.Array    # [...] fractional timing offset in samples, [0, sps)
    freq: jax.Array   # [...] timing frequency (samples/symbol drift)


def gardner_init(channel_shape: tuple = (), tau0: float = 0.0) -> GardnerState:
    return GardnerState(
        tau=jnp.full(channel_shape, tau0, F32),
        freq=jnp.zeros(channel_shape, F32),
    )


def _interp(x, t):
    """Linear interpolation of x[..., N] at scalar-per-channel positions t."""
    i0 = jnp.floor(t).astype(jnp.int32)
    frac = (t - i0.astype(F32)).astype(x.dtype if x.dtype == F32 else F32)
    n = x.shape[-1]
    i0 = jnp.clip(i0, 0, n - 2)
    lo = jnp.take_along_axis(x, i0[..., None], axis=-1)[..., 0]
    hi = jnp.take_along_axis(x, (i0 + 1)[..., None], axis=-1)[..., 0]
    return lo * (1.0 - frac) + hi * frac


def gardner_scan(state: GardnerState, x: jax.Array, sps: int,
                 kp: float = 0.5, ki: float = 0.02
                 ) -> tuple[GardnerState, jax.Array]:
    """Track symbol timing through one block. x: [..., N], N % sps == 0.

    Returns (state, symbols [..., N/sps - 1]): one symbol per strobe, the
    final partial strobe carried into tau for the next block. Gardner error
    e = Re{ (y_k - y_{k-1}) * conj(y_mid) } is positive when sampling LATE
    (measured S-curve), so the loop subtracts it. Needs sps >= 2.
    """
    nsym = x.shape[-1] // sps - 1  # last symbol needs the mid+next sample

    def step(carry, k):
        tau, freq, prev = carry
        base = k.astype(F32) * sps
        y = _interp(x, base + tau)
        # midpoint between the PREVIOUS strobe and this one — pairing it
        # with the forward difference is the classic Gardner sign bug
        ymid = _interp(x, base + tau - sps / 2.0)
        e = jnp.real((y - prev) * jnp.conj(ymid))
        freq2 = freq - ki * e
        tau2 = jnp.clip(tau - kp * e + freq2, -sps / 2.0, 1.5 * sps)
        return (tau2, freq2, y), y

    (tau, freq, _), sym = jax.lax.scan(
        step, (state.tau, state.freq, jnp.zeros(state.tau.shape, CF32)),
        jnp.arange(nsym))
    sym = jnp.moveaxis(sym, 0, -1)
    # tau is carried UNwrapped (the per-step clip already bounds it):
    # wrapping mod sps at a block seam would turn a small negative jitter
    # (-0.05) into sps-0.05 — a whole-symbol slip that permanently shears
    # the output stream against the tx sequence
    return GardnerState(tau=tau, freq=freq), sym


class CostasState(NamedTuple):
    phase: jax.Array  # [...] radians
    freq: jax.Array   # [...] radians/symbol


def costas_init(channel_shape: tuple = ()) -> CostasState:
    return CostasState(phase=jnp.zeros(channel_shape, F32),
                       freq=jnp.zeros(channel_shape, F32))


def costas_scan(state: CostasState, sym: jax.Array, order: int,
                kp: float = 0.1, ki: float = 0.01, offset: float = 0.0
                ) -> tuple[CostasState, jax.Array]:
    """Decision-directed carrier tracking over symbol-rate samples.

    sym: [..., K] complex symbols (timing already recovered). Phase error is
    the M-th-power detector e = angle(y^M * e^{-j*2*pi*offset})/M, which
    needs no decisions and tolerates the same M-fold ambiguity as V&V.
    `offset` is the constellation offset (0.5 for diagonal QPSK): without
    the derotation an offset constellation's M-th power sits at angle pi,
    where the detector sign is ambiguous and the loop chatters. Returns
    derotated symbols.
    """
    rot = jnp.exp(jnp.asarray(-1j * TWO_PI * offset)).astype(CF32)

    def step(carry, s):
        ph, fr = carry
        y = s * jnp.exp(-1j * ph).astype(CF32)
        e = jnp.angle((y ** order) * rot) / order
        fr2 = fr + ki * e
        ph2 = ph + kp * e + fr2
        return (ph2, fr2), y

    sym_t = jnp.moveaxis(sym, -1, 0)
    (ph, fr), out = jax.lax.scan(step, (state.phase, state.freq), sym_t)
    return CostasState(phase=jnp.mod(ph, F32(TWO_PI)), freq=fr), \
        jnp.moveaxis(out, 0, -1)
