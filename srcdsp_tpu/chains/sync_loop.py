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


class GardnerFreeState(NamedTuple):
    """Free-running (skip/stuff) timing state: the strobe position is an
    unbounded accumulator, so sustained ppm offsets change the emitted
    symbol COUNT instead of shearing the stream."""

    pos: jax.Array    # [...] next strobe position in buffer coords (the
                      # buffer is [sps carried samples | block]); carried
                      # across blocks as pos - N
    freq: jax.Array   # [...] samples/symbol deviation from nominal sps
    prev: jax.Array   # [...] previous strobe value (Gardner memory)


def gardner_free_init(channel_shape: tuple = (),
                      tau0: float = 0.0) -> GardnerFreeState:
    return GardnerFreeState(
        pos=jnp.full(channel_shape, tau0, F32),
        freq=jnp.zeros(channel_shape, F32),
        prev=jnp.zeros(channel_shape, CF32),
    )


def gardner_free_cap(n: int, sps: int, max_dev: float) -> int:
    """Static output capacity for a block of n samples: the most strobes a
    clock running max_dev fast can emit, plus seam slack."""
    import math
    return int(math.ceil((n + sps) / (sps * (1.0 - max_dev)))) + 2


def gardner_free_scan(state: GardnerFreeState, x: jax.Array, sps: int,
                      kp: float = 0.5, ki: float = 0.02,
                      max_dev: float = 0.05
                      ) -> tuple[GardnerFreeState,
                                 tuple[jax.Array, jax.Array]]:
    """Skip/stuff Gardner tracking: unbounded sustained clock offsets.

    x: [..., sps + N] — the caller prepends its carried sps-sample tail
    (same convention as gardner_scan's input). Returns
    (state, (symbols [..., K], valid [..., K] bool)) with K =
    gardner_free_cap(N, sps, max_dev) a STATIC capacity; masked-off lanes
    hold frozen values. Unlike gardner_scan (fixed N/sps strobes, tau
    clipped to a bounded window), the strobe position free-runs at
    sps + freq samples/strobe: a clock that is 1000 ppm fast simply emits
    ~0.1% more symbols, with no shear and no saturation. The loop freezes
    (no state update) on steps whose strobe falls past the block — those
    steps re-fire at the start of the next block.

    freq is clipped to +-max_dev*sps and the per-strobe advance to
    [0.5, 1.5]*sps, so the scan's static trip count is a true upper bound.
    """
    nbuf = x.shape[-1]
    n = nbuf - sps
    kcap = gardner_free_cap(n, sps, max_dev)
    limit = F32(nbuf - 2)            # last interp-safe strobe position
    fmax = F32(max_dev * sps)

    def step(carry, _):
        pos, freq, prev = carry
        y = _interp(x, pos)
        ymid = _interp(x, pos - (sps + freq) / 2.0)
        e = jnp.real((y - prev) * jnp.conj(ymid))
        valid = pos <= limit
        freq2 = jnp.where(valid, jnp.clip(freq - ki * e, -fmax, fmax), freq)
        adv = jnp.clip(sps + freq2 - kp * e, 0.5 * sps, 1.5 * sps)
        pos2 = jnp.where(valid, pos + adv, pos)
        prev2 = jnp.where(valid, y, prev)
        return (pos2, freq2, prev2), (y, valid)

    (pos, freq, prev), (sym, valid) = jax.lax.scan(
        step, (state.pos, state.freq, state.prev), None, length=kcap)
    sym = jnp.moveaxis(sym, 0, -1)
    valid = jnp.moveaxis(valid, 0, -1)
    # re-base for the next block's buffer (its tail re-covers [n, n+sps))
    return GardnerFreeState(pos=pos - n, freq=freq, prev=prev), (sym, valid)


class CostasState(NamedTuple):
    phase: jax.Array  # [...] radians
    freq: jax.Array   # [...] radians/symbol


def costas_init(channel_shape: tuple = ()) -> CostasState:
    return CostasState(phase=jnp.zeros(channel_shape, F32),
                       freq=jnp.zeros(channel_shape, F32))


def costas_scan(state: CostasState, sym: jax.Array, order: int,
                kp: float = 0.1, ki: float = 0.01, offset: float = 0.0,
                valid: jax.Array | None = None
                ) -> tuple[CostasState, jax.Array]:
    """Decision-directed carrier tracking over symbol-rate samples.

    sym: [..., K] complex symbols (timing already recovered). Phase error is
    the M-th-power detector e = angle(y^M * e^{-j*2*pi*offset})/M, which
    needs no decisions and tolerates the same M-fold ambiguity as V&V.
    `offset` is the constellation offset (0.5 for diagonal QPSK): without
    the derotation an offset constellation's M-th power sits at angle pi,
    where the detector sign is ambiguous and the loop chatters. Returns
    derotated symbols. `valid` ([..., K] bool, from gardner_free_scan)
    freezes the loop on masked strobes so capacity padding never perturbs
    the tracked phase.
    """
    rot = jnp.exp(jnp.asarray(-1j * TWO_PI * offset)).astype(CF32)

    def step(carry, sv):
        ph, fr = carry
        s, v = sv
        y = s * jnp.exp(-1j * ph).astype(CF32)
        e = jnp.angle((y ** order) * rot) / order
        fr2 = jnp.where(v, fr + ki * e, fr)
        ph2 = jnp.where(v, ph + kp * e + fr2, ph)
        return (ph2, fr2), y

    sym_t = jnp.moveaxis(sym, -1, 0)
    v_t = (jnp.ones(sym_t.shape, bool) if valid is None
           else jnp.moveaxis(valid, -1, 0))
    (ph, fr), out = jax.lax.scan(step, (state.phase, state.freq),
                                 (sym_t, v_t))
    return CostasState(phase=jnp.mod(ph, F32(TWO_PI)), freq=fr), \
        jnp.moveaxis(out, 0, -1)
