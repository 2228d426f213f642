"""FRESH (FREquency-SHift) filtering — cyclostationarity-exploiting
LMMSE interference rejection (beyond parity; the estimation-side
companion of the FAM spectral-correlation analyzer in ops/cyclo.py).

A stationary (Wiener) filter can only weight FREQUENCIES: two signals
occupying the same band are inseparable. A cyclostationary signal,
though, is CORRELATED with frequency-shifted (and conjugated) copies
of itself at its cycle frequencies — BPSK at baud 1/T and carrier fc
has non-conjugate cycles {0, ±1/T} and conjugate cycles {2fc,
2fc ± 1/T} (the same lines `cyclo.detect_cycles` finds blind). A
FRESH filter is a bank of FIR branches, each fed a frequency-shifted
(optionally conjugated) copy of the input, summed:

    y[n] = sum_b  (h_b * x_b)[n],   x_b[n] = shift(x, alpha_b)[n]
                                     or shift(conj(x), alpha_b)[n]

Because the TARGET's shifted copies are coherent with it while the
interferer's are not (different cycle frequencies), the joint LMMSE
solve can cancel co-channel interference a stationary filter cannot
touch — the classic Gardner result, reproduced by the test on a 100%
spectrally-overlapped BPSK mixture: ~10.6 dB output SINR vs the
Wiener branch's ~2.6 (+8 dB). Physics worth keeping (measured in the
test sweeps): (1) a CANCELLER needs the interferer's cycles too —
with only the target's, the per-frequency equation system is
underdetermined and the gain collapses to ~+1.7 dB; (2) the shift
rotators are part of the filter's time reference — `n0` must carry
the global sample index across blocks or the conjugate branches lose
all coherence (its own regression test); (3) symbol-rate branches
only pay at high excess bandwidth (beta 0.35 -> 0.9 moved them from
irrelevant to +4 dB); (4) the residual floor tracks the LS weight
noise n_coeffs/N_train — train long.

TPU shape: branch regressors form one [N, B*T] tall-skinny matrix;
the design solve is two MXU matmuls (Gram + cross) + a small
Hermitian solve, and `fresh_apply` is the same framing matmul — the
house all-shifts/all-taps pattern (dsss.py, gps.py).

Branches come from `bpsk_branches(fc, baud)` (the textbook set), from
`cyclo.detect_cycles` output (blind operation), or hand-picked.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.types import CF32, F32

__all__ = ["FreshBranch", "FreshFilter", "bpsk_branches",
           "merge_branches", "refine_cycle", "blind_bpsk_branches",
           "fresh_frames", "fresh_design", "fresh_apply"]


class FreshBranch(NamedTuple):
    alpha: float            # frequency shift, cycles/sample
    conj: bool              # feed conj(x) (conjugate-cycle branch)


class FreshFilter(NamedTuple):
    weights: jax.Array      # [B*T] c64 stacked branch taps
    branches: tuple         # tuple[FreshBranch]
    taps: int
    delay: int              # target alignment delay used in design


def bpsk_branches(fc: float, baud: float,
                  harmonics: int = 1) -> tuple:
    """The textbook BPSK cycle set for a target at carrier fc (already
    at complex baseband) and symbol rate `baud`: non-conjugate branches
    at {0, ±k*baud} and conjugate branches at {2fc, 2fc ± k*baud}."""
    br = [FreshBranch(0.0, False)]
    for k in range(1, harmonics + 1):
        br += [FreshBranch(+k * baud, False),
               FreshBranch(-k * baud, False)]
    br.append(FreshBranch(2 * fc, True))
    for k in range(1, harmonics + 1):
        br += [FreshBranch(2 * fc + k * baud, True),
               FreshBranch(2 * fc - k * baud, True)]
    return tuple(br)


def refine_cycle(x: jax.Array, alpha0: float, conj: bool,
                 span: float = 2e-3, points: int = 81) -> float:
    """Refine a coarse cycle-frequency estimate to sub-grid accuracy.

    FRESH branches need their alpha to hold phase over the WHOLE block
    (a 1/2048 FAM-grid error drifts five full cycles across 10k
    samples and kills the branch) — so blind operation refines each
    detected cycle on the cyclic-moment line: C(alpha) =
    |sum_n v[n] e^{-j2pi alpha n}| with v = x^2 for conjugate cycles
    (the BPSK squared-carrier line) or |x|^2 for non-conjugate
    (baud) cycles. Fine grid scan over +-span (step ~1/4 of the 2/N
    mainlobe at the default sizes), then a 3-point parabolic peak fit
    — accuracy ~1e-5 cycles/sample, inside the coherence budget."""
    xv = np.asarray(x)
    v = xv * xv if conj else (xv * np.conj(xv)).real.astype(np.complex64)
    n = v.shape[-1]
    grid = np.linspace(alpha0 - span, alpha0 + span, points)
    # rotators built per grid-CHUNK (a [points, N] outer product would
    # allocate ~2 GB at N=1e6 — review finding); exact f64 frac keeps
    # the phases small before the c64 cast
    idx = np.arange(n, dtype=np.float64)
    c = np.empty(points)
    for lo in range(0, points, 8):
        g = grid[lo: lo + 8]
        fr = np.mod(g[:, None] * idx[None, :], 1.0)
        rot = np.exp(-2j * np.pi * fr).astype(np.complex64)
        c[lo: lo + 8] = np.abs(rot @ v)
    k = int(np.argmax(c))
    if 0 < k < points - 1:
        y0, y1, y2 = c[k - 1], c[k], c[k + 1]
        denom = y0 - 2 * y1 + y2
        off = 0.5 * (y0 - y2) / denom if abs(denom) > 1e-12 else 0.0
    else:
        off = 0.0
    step = grid[1] - grid[0]
    return float(grid[k] + off * step)


def _moment_lines(v: np.ndarray, n_lines: int, min_sep: float,
                  guard: float, fold: bool = False) -> list[float]:
    """Strongest spectral lines of a (cyclic-moment) sequence v:
    FFT magnitude peaks, greedily picked with a min separation and a
    DC guard, each refined later by refine_cycle. fold=True treats
    +-f as ONE line (baud lines come in conjugate pairs — without
    folding, one strong baud eats both picks and the second signal's
    rate is never found)."""
    spec = np.abs(np.fft.fft(v * np.hanning(v.size)))
    freqs = np.fft.fftfreq(v.size)
    order = np.argsort(spec)[::-1]
    out = []
    for k in order:
        f = float(freqs[k])
        if abs(f) < guard:
            continue
        key = abs(f) if fold else f
        if any(abs(key - (abs(g) if fold else g)) < min_sep
               for g in out):
            continue
        out.append(f)
        if len(out) >= n_lines:
            break
    return out


def blind_bpsk_branches(x, n_signals: int = 2,
                        min_sep: float = 5e-3) -> tuple:
    """Blind branch design for a mixture of BPSK-class signals: carrier
    lines from FFT(x^2) (each strong peak is a 2 f_c), baud lines from
    FFT(|x|^2) (symbol-rate peaks away from DC), every line refined by
    `refine_cycle`, then the structured sets composed — alpha = 0,
    +-each baud (non-conjugate), and for every carrier the conjugate
    branches {2fc, 2fc +- each baud} (carrier-baud pairing unknown
    blind, so all pairings are included; surplus branches only cost
    LS weight noise — the reduces-to-Wiener test).

    This BEAT the FAM-detection route in the design experiment (the
    FAM diamond missed the faster baud and the conjugate satellites:
    3.7 dB blind vs 10.6 genie; this estimator reaches genie-grade
    branch sets — see tests/unit/test_fresh.py::test_blind)."""
    xv = np.asarray(x)
    carriers = _moment_lines(xv * xv, n_signals, min_sep, guard=0.0)
    bauds = _moment_lines((xv * np.conj(xv)).real, n_signals, min_sep,
                          guard=2e-2, fold=True)
    carriers = [refine_cycle(x, c, True) for c in carriers]
    bauds = [abs(refine_cycle(x, b, False)) for b in bauds]
    br = [FreshBranch(0.0, False)]
    for b in bauds:
        br += [FreshBranch(+b, False), FreshBranch(-b, False)]
    for c in carriers:
        br.append(FreshBranch(c, True))
        for b in bauds:
            br += [FreshBranch(c + b, True), FreshBranch(c - b, True)]
    return merge_branches(br)


def merge_branches(*sets) -> tuple:
    """Order-preserving union of branch sets (a canceller wants the
    target's AND each interferer's cycles — see the test's physics
    note: with only the target's cycles the per-frequency system stays
    underdetermined and the interferer cannot be nulled)."""
    out = []
    for s in sets:
        for br in s:
            if br not in out:
                out.append(br)
    return tuple(out)


def _shifted(x: jax.Array, branch: FreshBranch, n0: int) -> jax.Array:
    n = x.shape[-1]
    # GLOBAL sample index n0+k: the shift rotators are part of the
    # filter's time reference — restarting them at 0 per block would
    # randomize each branch's phase against the trained weights (the
    # conjugate-cycle branches lose ALL coherent gain; measured: the
    # co-channel test collapses from >13 dB SINR to the Wiener ~3 dB).
    # frac() keeps the f32 phase argument small for long streams.
    idx = np.arange(n, dtype=np.float64) + float(n0)
    fr = np.mod(branch.alpha * idx, 1.0).astype(np.float32)
    ph = jnp.asarray(2.0 * np.pi * fr)
    rot = jax.lax.complex(jnp.cos(ph), jnp.sin(ph)).astype(CF32)
    base = jnp.conj(x) if branch.conj else x
    return base * rot


def fresh_frames(x: jax.Array, branches: Sequence[FreshBranch],
                 taps: int, n0: int = 0) -> jax.Array:
    """[N] -> regressor matrix [N - taps + 1, B*taps]: row n holds
    every branch's `taps`-sample window ending at n + taps - 1.
    n0 = global index of x[0] (phase-continuous block streaming)."""
    cols = []
    nv = x.shape[-1] - taps + 1
    for br in branches:
        xb = _shifted(x, br, n0)
        for t in range(taps):
            cols.append(jax.lax.slice_in_dim(xb, t, t + nv, axis=-1))
    return jnp.stack(cols, axis=-1)


def fresh_design(x: jax.Array, d: jax.Array,
                 branches: Sequence[FreshBranch], taps: int = 16,
                 delay: int | None = None,
                 ridge: float = 1e-4, n0: int = 0) -> FreshFilter:
    """LS design: min_w ||PHI w - d||^2 over a training block.

    x [N] received mixture; d [N] the training target waveform
    (sample-aligned with x). delay centers the window (default
    taps//2). Solved via the normal equations — Gram [BT, BT] and
    cross [BT] are two matmuls; ridge regularizes the (often
    rank-deficient: overlapping branch content) Gram."""
    if delay is None:
        delay = taps // 2
    phi = fresh_frames(x, branches, taps, n0)        # [NV, BT]
    nv = phi.shape[0]
    dv = d[taps - 1 - delay: taps - 1 - delay + nv]
    gram = jnp.conj(phi.T) @ phi
    gram = gram + ridge * jnp.trace(gram).real / gram.shape[0] \
        * jnp.eye(gram.shape[0], dtype=gram.dtype)
    cross = jnp.conj(phi.T) @ dv.astype(phi.dtype)
    w = jnp.linalg.solve(gram, cross)
    return FreshFilter(weights=w, branches=tuple(branches), taps=taps,
                       delay=delay)


def fresh_apply(f: FreshFilter, x: jax.Array, n0: int = 0) -> jax.Array:
    """Filter a block: returns y [N - taps + 1], where y[n] estimates
    d[n0 + n + taps - 1 - delay]. n0 MUST be the global index of x[0]
    so the shift rotators stay phase-continuous with the design."""
    return fresh_frames(x, f.branches, f.taps, n0) @ f.weights
