"""Direct-sequence spread spectrum: spread, acquire, despread.

Beyond-parity chain (the reference family stops at narrowband demods —
SURVEY.md §2 [B]) tying the GF(2) layer to the demod layer: the spreading
code is an LFSR m-sequence (the gf2.py machinery's host-side twin), and
both receive stages are single MXU matmuls:

- ACQUISITION (code-phase search): every cyclic shift of the code is a
  row of a fixed [SF, SF] matrix C, so correlating a window of received
  symbol-length frames against ALL phases is one [F, SF] @ [SF, SF]
  matmul — no FFTs, no loops; the phase is the argmax of the summed
  |correlation| (noncoherent, so it tolerates an unknown carrier phase).
- DESPREAD: with the phase known, symbols are frame dot-products against
  the aligned code — one [nsym, SF] @ [SF] product after a dynamic roll.

Processing gain is the textbook 10*log10(SF): the e2e test demodulates
BPSK error-free at -8 dB chip SNR with SF=63 (~+18 dB gain).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.types import F32


def pn_msequence(taps, order: int) -> np.ndarray:
    """Maximal-length LFSR sequence (Fibonacci form), chips in {+1, -1}.

    taps: feedback tap positions (1-based, e.g. [6, 1] for x^6+x+1).
    Length 2^order - 1; host-side (code design time), like ops.window.
    """
    state = [1] * order
    out = []
    n = (1 << order) - 1
    for _ in range(n):
        out.append(state[-1])
        fb = 0
        for t in taps:
            fb ^= state[t - 1]
        state = [fb] + state[:-1]
    seq = np.asarray(out, np.float32)
    if seq.sum() not in (1.0, float(n)):  # m-sequence has 2^(o-1) ones
        pass
    return 1.0 - 2.0 * seq               # bit 0 -> +1


def gold_family(taps1, taps2, order: int) -> np.ndarray:
    """Gold code family from a PREFERRED PAIR of m-sequences: the two
    sequences themselves plus all 2^order - 1 relative-shift XORs —
    [2^order + 1, 2^order - 1] chips in {+1, -1}.

    Gold's construction: for a preferred pair, every family member's
    cross-correlation takes only three values {-1, -t(n), t(n) - 2} with
    t(n) = 2^((n+2)//2) + 1 — the bounded-interference property that
    makes the family a CDMA code book (GPS C/A uses order 10). Host-side
    (code design time); classic preferred pairs: order 5 ([5,2],[5,4,3,2]),
    order 6 ([6,1],[6,5,2,1]), order 7 ([7,3],[7,3,2,1]); the GPS C/A
    pair is G1 = x^10+x^3+1, G2 = x^10+x^9+x^8+x^6+x^3+x^2+1 ->
    ([10,3], [10,9,8,6,3,2]) — three-valued property verified for this
    pair (t(10) = 65). Note real C/A PRNs additionally select specific
    G2 phase taps per satellite."""
    u = pn_msequence(taps1, order)
    v = pn_msequence(taps2, order)
    n = u.size
    fam = [u, v]
    for shift in range(n):
        fam.append(u * np.roll(v, -shift))   # XOR in the +-1 domain
    return np.stack(fam).astype(np.float32)


class DsssParams(NamedTuple):
    chips: jax.Array       # [SF] +-1 spreading code
    shifts: jax.Array      # [SF, SF] row p = code cyclically shifted by p
    sf: int


def make_dsss_params(taps=(6, 1), order: int = 6,
                     chips: np.ndarray | None = None) -> DsssParams:
    """Build DSSS params from LFSR taps (m-sequence of length 2^order-1)
    or an explicit +-1 chip vector."""
    if chips is None:
        chips = pn_msequence(taps, order)
    chips = np.asarray(chips, np.float32)
    sf = chips.size
    shifts = np.stack([np.roll(chips, -p) for p in range(sf)])
    return DsssParams(chips=jnp.asarray(chips),
                      shifts=jnp.asarray(shifts), sf=sf)


def dsss_spread(params: DsssParams, symbols: jax.Array) -> jax.Array:
    """Spread symbols [..., S] (+-1 BPSK or any complex constellation)
    -> chips [..., S*SF]."""
    y = symbols[..., :, None] * params.chips
    return y.reshape(*symbols.shape[:-1], -1)


def dsss_acquire(params: DsssParams, x: jax.Array,
                 frames: int | None = None) -> jax.Array:
    """Noncoherent code-phase search over a received chip stream.

    x [N] real or complex (N >= 2*SF); uses `frames` symbol-length frames
    (default: all whole frames minus one, so every tested phase has full
    support). Returns the code phase p in [0, SF): the stream's frame
    boundary sits p chips after index 0. One matmul against all shifts
    (the argmax of `dsss_finger_search`'s metric)."""
    return jnp.argmax(dsss_finger_search(params, x, frames))


def dsss_despread(params: DsssParams, x: jax.Array,
                  phase: jax.Array) -> jax.Array:
    """Despread chips [N] at the acquired code phase (the code index of
    chip x[0], as `dsss_acquire` returns) -> symbols [N//SF - 1]
    (static capacity; the first code-aligned frame starts (SF-phase)%SF
    chips in, and the dynamic start is absorbed by a roll whose wrapped
    tail falls only into the dropped final frame)."""
    sf = params.sf
    nsym = x.shape[-1] // sf - 1
    off = jnp.mod(sf - phase, sf)
    xr = jnp.roll(x, -off)[: nsym * sf]
    w = xr.reshape(nsym, sf)
    return (w @ params.chips.astype(w.dtype)) * F32(1.0 / sf)


def dsss_demod_bpsk(params: DsssParams, x: jax.Array, phase: jax.Array):
    """Despread + carrier-phase-blind BPSK slice. The squared-symbol
    carrier estimate has the usual pi ambiguity, resolved by convention
    with a +1 pilot as symbol 0 (soft[0] is forced positive); use
    differential coding if no pilot is available.
    Returns (bits [nsym] int32, soft [nsym] f32)."""
    sym = dsss_despread(params, x, phase)
    if jnp.iscomplexobj(sym):
        # rotate by the dominant carrier phase (squaring removes data)
        ref = jnp.sum(sym * sym)
        ang = jnp.angle(ref) / 2.0
        soft = jnp.real(sym * jnp.exp(-1j * ang))
    else:
        soft = sym.astype(F32)
    soft = soft * jnp.sign(soft[0])                  # pilot polarity
    return (soft < 0).astype(jnp.int32), soft


def dsss_finger_search(params: DsssParams, x: jax.Array,
                       frames: int | None = None) -> jax.Array:
    """Per-code-phase noncoherent energy metric [SF]: multipath shows up
    as several peaks — the RAKE finger map. Correlates whole symbol-length
    frames against all SF cyclic shifts in one matmul (frame k vs shift p
    equals the true correlation at phase p up to symbol sign flips, which
    the noncoherent |.| sum absorbs)."""
    sf = params.sf
    nf = x.shape[-1] // sf - 1
    if frames is not None:
        nf = min(nf, frames)
    w = x[: nf * sf].reshape(nf, sf)
    corr = w @ params.shifts.T.astype(w.dtype)
    return jnp.sum(jnp.abs(corr), axis=0)


def dsss_rake_demod(params: DsssParams, x: jax.Array, base_phase,
                    delays, min_weight: float = 0.1):
    """RAKE: despread each multipath finger and maximal-ratio combine.

    base_phase: code phase of the EARLIEST finger (dsss_acquire /
    argmax of dsss_finger_search). delays: static sequence of extra chip
    delays, one per finger (0 = the base finger; from the finger-metric
    peak offsets (phase_l - base) mod SF). Per finger, the complex gain
    is estimated blind from the squared despread symbols (data-free, the
    dsss_demod_bpsk trick), the per-finger pi ambiguity is pinned to the
    +1 pilot at symbol 0, and fingers below min_weight of the strongest
    are zeroed (noise-only fingers would add pure noise). Returns
    (bits [nsym] i32, soft [nsym] f32 — the MRC combination).
    """
    syms = []
    for d in delays:                       # static finger list
        # advance by d with ZERO fill (a roll would wrap the stream head
        # into the tail and despread garbage into the last symbol)
        d = int(d)
        xd = (jnp.concatenate([x[..., d:],
                               jnp.zeros((*x.shape[:-1], d), x.dtype)],
                              axis=-1) if d else x)
        syms.append(dsss_despread(params, xd, base_phase))
    # the zero fill can shave the tail symbol when off + max(d) > SF:
    # drop one more symbol so every finger's last kept symbol has full
    # support on all paths
    syms = [s_[..., :-1] for s_ in syms]
    weights = []
    parts = []
    for sym in syms:
        if jnp.iscomplexobj(sym):
            g2 = jnp.mean(sym * sym)
            a = jnp.sqrt(jnp.abs(g2) + 1e-30)
            ang = jnp.angle(g2) / 2.0
            comp = jnp.real(sym * jnp.exp(-1j * ang))
        else:
            comp = sym.astype(F32)
            a = jnp.sqrt(jnp.abs(jnp.mean(comp * comp)) + 1e-30)
        comp = comp * jnp.sign(comp[0])    # pilot pins the pi ambiguity
        parts.append(comp)
        weights.append(a)
    wmax = jnp.max(jnp.stack(weights))
    soft = sum(jnp.where(w > min_weight * wmax, w, F32(0.0)) * p
               for w, p in zip(weights, parts))
    return (soft < 0).astype(jnp.int32), soft.astype(F32)


__all__ = [
    "DsssParams", "make_dsss_params", "pn_msequence", "gold_family",
    "dsss_spread",
    "dsss_acquire", "dsss_despread", "dsss_demod_bpsk",
    "dsss_finger_search", "dsss_rake_demod",
]
