"""OFDM receive path (beyond-parity component).

The reference family's demods are single-carrier (FSK/PSK, BASELINE.json);
wideband links are OFDM, and OFDM is the most TPU-friendly demodulator
there is — the whole receiver is reshapes, batched FFTs, and elementwise
algebra, with zero sequential state:

- **Symbol framing**: [S*(N+CP)] -> [S, N+CP] is one reshape; CP removal a
  static slice. The batched N-point FFT across all S symbols is one XLA
  `jnp.fft.fft` (or the four-step MXU matmul FFT of ops/fft_planes for the
  restricted backend).
- **Coarse timing (Schmidl–Cox)**: the classic two-identical-halves
  preamble metric P(d) = sum y[d+m] conj(y[d+m+N/2]) over a sliding window
  is two cumulative sums — fully vectorized, no search loop.
- **Fractional CFO from the CP**: angle of the CP-to-tail correlation,
  averaged over symbols — one reduction.
- **Channel estimate + equalizer**: LS one-tap H = Y_p / X_p from a known
  pilot symbol, equalize Y/H — elementwise. QAM slicing reuses
  chains/qam.qam_slice (pure arithmetic Gray slicer).

Subcarrier convention: `active` holds FFT-bin indices (DC = 0, negative
frequencies as N-k); the default layout uses bins +-1..+-n_active/2 (DC
nulled). Modulator included for loopback tests and fixtures.

No reference counterpart (SURVEY §0; BASELINE.json scope is single-
carrier) — verified by loopback through multipath + CFO + noise with SER 0
and by unit checks of each estimator against its closed form.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.chains.qam import qam_constellation, qam_slice
from srcdsp_tpu.types import CF32, F32

I32 = jnp.int32


class OfdmSpec(NamedTuple):
    nfft: int
    cp: int
    active: np.ndarray     # [n_active] FFT-bin indices carrying data
    order: int             # QAM order per subcarrier


def make_ofdm_spec(nfft: int = 64, cp: int = 16, n_active: int = 52,
                   order: int = 16) -> OfdmSpec:
    """Default band layout: bins +-1..+-n_active/2, DC and band edges null."""
    if n_active % 2 or n_active >= nfft:
        raise ValueError("n_active must be even and < nfft")
    half = n_active // 2
    act = np.concatenate([np.arange(1, half + 1),
                          np.arange(nfft - half, nfft)])
    return OfdmSpec(nfft=int(nfft), cp=int(cp), active=act, order=int(order))


def sym_len(spec: OfdmSpec) -> int:
    return spec.nfft + spec.cp


def ofdm_modulate(spec: OfdmSpec, points: jax.Array) -> jax.Array:
    """QAM points [S, n_active] -> time-domain samples [S*(N+CP)].

    Unit average subcarrier power; IFFT scaled by sqrt(N)/n_active-ish is
    left at jnp.fft convention (ifft has 1/N) times sqrt(N) so average
    time-domain power = n_active/N.
    """
    s = points.shape[0]
    grid = jnp.zeros((s, spec.nfft), CF32)
    grid = grid.at[:, jnp.asarray(spec.active, I32)].set(points.astype(CF32))
    td = jnp.fft.ifft(grid, axis=-1) * np.sqrt(spec.nfft)
    with_cp = jnp.concatenate([td[:, -spec.cp:], td], axis=-1)
    return with_cp.reshape(-1).astype(CF32)


def ofdm_modulate_windowed(spec: OfdmSpec, points: jax.Array,
                           window: int) -> jax.Array:
    """WOLA transmit shaping: like ofdm_modulate, but each symbol gets a
    `window`-sample cyclic suffix and raised-cosine edge ramps, overlap-
    added with its neighbors — the standard windowed-CP technique that
    collapses the sinc skirts (out-of-band emission) without touching the
    receiver: the rx FFT window still sees a pure cyclic extension as
    long as window <= the rx timing-bias margin (cp//4 for ofdm_rx).

    points: [S, n_active] -> [S*(N+CP) + window] samples.
    """
    if window <= 0:
        return ofdm_modulate(spec, points)
    if window > spec.cp // 4:
        raise ValueError(f"window {window} exceeds the rx margin cp//4 = "
                         f"{spec.cp // 4}")
    s = points.shape[0]
    grid = jnp.zeros((s, spec.nfft), CF32)
    grid = grid.at[:, jnp.asarray(spec.active, I32)].set(points.astype(CF32))
    td = jnp.fft.ifft(grid, axis=-1) * np.sqrt(spec.nfft)   # [S, N]
    l = spec.nfft + spec.cp
    # extended symbol: [CP | body | cyclic suffix(window)]
    ext = jnp.concatenate([td[:, -spec.cp:], td, td[:, :window]], axis=-1)
    ramp = 0.5 * (1 - jnp.cos(jnp.pi * (jnp.arange(window, dtype=F32) + 0.5)
                              / window))
    taper = jnp.concatenate([ramp, jnp.ones(l - window, F32),
                             ramp[::-1]])                  # [L + window]
    ext = ext * taper
    # overlap-add at stride L: body portion concatenated, each symbol's
    # window-sample tail added onto the next symbol's head
    bodies = ext[:, :l].reshape(-1)                        # [S*L]
    tails = ext[:, l:]                                     # [S, window]
    tails_flat = jnp.pad(tails, ((0, 0), (0, l - window))).reshape(-1)
    out = jnp.concatenate([bodies, jnp.zeros(window, CF32)])
    shifted = jnp.concatenate([jnp.zeros(l, CF32), tails_flat])[: out.shape[0]]
    return (out + shifted).astype(CF32)


def ofdm_tx_frame(spec: OfdmSpec, points: jax.Array, pilot: jax.Array,
                  preamble_key: jax.Array, window: int = 0) -> jax.Array:
    """[S&C preamble | pilot | data] transmit frame, optionally WOLA-
    windowed — the tx-side counterpart of ofdm_rx."""
    sym = jnp.concatenate([pilot[None], points], axis=0)
    body = (ofdm_modulate_windowed(spec, sym, window) if window
            else ofdm_modulate(spec, sym))
    pre = schmidl_cox_preamble(spec, preamble_key)
    return jnp.concatenate([pre, body]).astype(CF32)


def papr_db(x: jax.Array) -> jnp.ndarray:
    p = jnp.abs(x) ** 2
    return 10.0 * jnp.log10(jnp.max(p) / jnp.mean(p))


def papr_reduce(spec: OfdmSpec, x: jax.Array, clip_db: float = 4.0,
                iters: int = 2) -> jnp.ndarray:
    """Iterative clip-and-filter PAPR reduction for an OFDM time stream
    produced by ofdm_modulate (whole CP-extended symbols).

    Each pass soft-clips the envelope at clip_db above the mean power and
    REFILTERS in the frequency domain by zeroing every inactive bin of
    each symbol (clipping splatter lands out of band and on nulls; the
    in-band distortion that remains is the EVM cost). The CP is rebuilt
    from the filtered body so the output stays a valid cyclic-prefixed
    stream. 2 iterations typically buy 3+ dB of PAPR at a few percent
    EVM — the standard transmitter trade.
    """
    l = spec.nfft + spec.cp
    if x.ndim != 1:
        raise ValueError("papr_reduce takes one [S*(N+CP)] stream")
    if x.shape[-1] % l != 0:
        raise ValueError(f"length {x.shape[-1]} is not whole CP-extended "
                         f"symbols of {l} (windowed/preamble frames must "
                         f"be reduced per ofdm_modulate segment)")
    s = x.shape[-1] // l
    act = jnp.zeros((spec.nfft,), F32).at[jnp.asarray(spec.active, I32)
                                          ].set(1.0)
    y = x.reshape(s, l)
    for _ in range(iters):
        p_mean = jnp.mean(jnp.abs(y) ** 2)
        a_max = jnp.sqrt(p_mean * 10.0 ** (clip_db / 10.0))
        mag = jnp.abs(y)
        y = jnp.where(mag > a_max, y * (a_max / (mag + 1e-12)), y)
        body = y[:, spec.cp:]
        f = jnp.fft.fft(body, axis=-1) * act          # refilter to the band
        body = jnp.fft.ifft(f, axis=-1)
        y = jnp.concatenate([body[:, -spec.cp:], body], axis=-1)
    return y.reshape(-1).astype(CF32)


def schmidl_cox_preamble(spec: OfdmSpec, key: jax.Array) -> jax.Array:
    """Two-identical-halves preamble symbol (even bins only), with CP."""
    act_even = spec.active[spec.active % 2 == 0]
    if act_even.size == 0:
        raise ValueError("need at least one even active bin")
    # QPSK on even bins, boosted to keep preamble power = data power
    ang = jax.random.randint(key, (act_even.size,), 0, 4).astype(F32)
    pts = jnp.exp(1j * (2 * jnp.pi) * (ang + 0.5) / 4) * np.sqrt(
        spec.active.size / act_even.size)
    grid = jnp.zeros((spec.nfft,), CF32)
    grid = grid.at[jnp.asarray(act_even, I32)].set(pts.astype(CF32))
    td = jnp.fft.ifft(grid) * np.sqrt(spec.nfft)
    return jnp.concatenate([td[-spec.cp:], td]).astype(CF32)


def _sliding_sum(x: jax.Array, w: int) -> jax.Array:
    """s[d] = sum x[d .. d+w-1], length len(x)-w+1, via one cumsum."""
    c = jnp.cumsum(x)
    zero = jnp.zeros((1,), c.dtype)
    return c[w - 1:] - jnp.concatenate([zero, c[:-w]])


def schmidl_cox_metric(y: jax.Array, nfft: int) -> tuple[jax.Array, jax.Array]:
    """Timing metric M(d) = |P(d)|^2 / R(d)^2 via sliding sums (cumsum).

    P(d) sums the lag-N/2 self-correlation over a window of N/2. R(d) is
    HALF the energy of the full N window (the Minn variant) rather than the
    delayed half-window alone — the delayed-half denominator collapses just
    past the preamble's trailing edge (noise-only branch) and spikes M
    above the true plateau; the full-window form keeps M <= ~1 everywhere.
    Returns (P [D], M [D]) with D = len(y) - nfft; the preamble start is
    the (plateau) argmax of M.
    """
    h = nfft // 2
    d = y.shape[-1] - nfft
    c = y[:-h] * jnp.conj(y[h:])            # lag-N/2 products
    p = _sliding_sum(c, h)[:d]
    r = 0.5 * _sliding_sum(jnp.abs(y) ** 2, nfft)[:d]
    m = (jnp.abs(p) ** 2) / (r ** 2 + 1e-12)
    return p, m


def coarse_start(m: jax.Array, cp: int) -> jax.Array:
    """Plateau-robust start pick: argmax of M smoothed over the CP width.

    The S&C metric plateaus over [s0, s0+cp] (the whole CP'd preamble is
    periodic at N/2); the smoothed argmax returns ~s0, the preamble START
    — at most one sample late, which stays inside every later symbol's CP
    guard and is absorbed by the LS channel estimate as a phase ramp.
    """
    k = jnp.ones((cp,), F32) / cp
    sm = jnp.convolve(m.astype(F32), k, mode="valid")
    return jnp.argmax(sm)


def cfo_from_preamble_p(p_at_start: jax.Array, nfft: int) -> jax.Array:
    """Fractional CFO (in subcarrier spacings) from P at the metric peak.

    Over the half-symbol lag N/2 a CFO of eps spacings rotates by
    -pi*eps: eps = -angle(P)/pi. Unambiguous for |eps| < 1.
    """
    return -jnp.angle(p_at_start) / jnp.pi


def cfo_correct(y: jax.Array, eps: jax.Array, nfft: int) -> jax.Array:
    """Remove CFO of `eps` subcarrier spacings: y * exp(-j 2 pi eps n / N)."""
    n = jnp.arange(y.shape[-1], dtype=F32)
    return (y * jnp.exp(-1j * 2 * jnp.pi * eps * n / nfft)).astype(CF32)


def cfo_estimate_cp(y: jax.Array, spec: OfdmSpec,
                    margin: int | None = None) -> jax.Array:
    """Fractional CFO from CP correlation over all symbols in y [S*(N+CP)].

    Only CP positions >= `margin` (default cp/2) enter the correlation: the
    CP head is corrupted by the previous symbol's delay spread and by any
    deliberate early timing bias (ofdm_rx's guard), and including those
    pairs biases the estimate enough to break the common-phase tracking
    downstream.
    """
    m0 = spec.cp // 2 if margin is None else int(margin)
    l = sym_len(spec)
    s = y.shape[-1] // l
    sym = y[: s * l].reshape(s, l)
    c = jnp.sum(sym[:, m0:spec.cp] *
                jnp.conj(sym[:, spec.nfft + m0: spec.nfft + spec.cp]))
    return -jnp.angle(c) / (2 * jnp.pi)


def ofdm_fft(spec: OfdmSpec, y: jax.Array) -> jax.Array:
    """[S*(N+CP)] aligned samples -> active-bin symbols [S, n_active]."""
    l = sym_len(spec)
    s = y.shape[-1] // l
    sym = y[: s * l].reshape(s, l)[:, spec.cp:]
    grid = jnp.fft.fft(sym, axis=-1) / np.sqrt(spec.nfft)
    return grid[:, jnp.asarray(spec.active, I32)]


def ls_channel_estimate(rx_pilot: jax.Array, tx_pilot: jax.Array) -> jax.Array:
    """One-tap LS estimate H = Y/X per active bin."""
    return (rx_pilot / (tx_pilot + 1e-12)).astype(CF32)


def ofdm_demod(spec: OfdmSpec, y: jax.Array, tx_pilot: jax.Array,
               cpe: bool = True) -> tuple[jax.Array, jax.Array]:
    """Demodulate aligned samples whose FIRST symbol is the known pilot.

    y: [ (1+S)*(N+CP) ] time samples (pilot + S data symbols), CFO already
    removed. Returns (sym_idx [S, n_active] i32, soft [S, n_active] c64).

    `cpe` adds a decision-directed common-phase-error pass: residual CFO of
    eps spacings rotates every subcarrier of symbol s by 2 pi eps s (N+CP)/N
    — a per-symbol scalar. One slice + one LS complex-gain reduction per
    symbol (vectorized over symbols) tracks it without any loop.
    """
    f = ofdm_fft(spec, y)
    h = ls_channel_estimate(f[0], tx_pilot)
    soft = (f[1:] / (h + 1e-12)).astype(CF32)
    if cpe:
        s_hat = qam_constellation(spec.order)[qam_slice(soft, spec.order)]
        num = jnp.sum(soft * jnp.conj(s_hat), axis=-1, keepdims=True)
        den = jnp.sum(jnp.abs(s_hat) ** 2, axis=-1, keepdims=True) + 1e-12
        g = num / den
        soft = (soft * jnp.conj(g) / (jnp.abs(g) + 1e-12)).astype(CF32)
    return qam_slice(soft, spec.order), soft


def ofdm_rx(spec: OfdmSpec, y: jax.Array, preamble_len: int,
            tx_pilot: jax.Array) -> tuple[jax.Array, jax.Array, dict]:
    """Full receive: S&C timing -> CFO (preamble P + CP refine) -> demod.

    y: raw capture containing [garbage][preamble][pilot][data...]. The
    preamble is a two-identical-halves symbol of `preamble_len` samples
    (schmidl_cox_preamble). Returns (idx, soft, info) where info holds the
    estimated start and CFO. The argmax start pick is data-dependent
    (dynamic) — this function is a host-facing driver, not a jit body; jit
    users call the pieces with a known start.
    """
    p, m = schmidl_cox_metric(y, spec.nfft)
    start = int(coarse_start(m, spec.cp))
    eps = float(cfo_from_preamble_p(p[start], spec.nfft))
    # bias the frame slice a quarter-CP EARLY: a late FFT window leaks into
    # the next symbol (ISI), while an early one just circular-shifts within
    # the CP guard — absorbed by the pilot channel estimate as a phase ramp.
    guard = spec.cp // 4
    frame = y[start + preamble_len - guard:]
    y_c = cfo_correct(frame, eps, spec.nfft)
    eps2 = float(cfo_estimate_cp(y_c, spec))
    y_c = cfo_correct(y_c, eps2, spec.nfft)
    idx, soft = ofdm_demod(spec, y_c, tx_pilot)
    return idx, soft, {"start": start, "cfo": eps + eps2}
