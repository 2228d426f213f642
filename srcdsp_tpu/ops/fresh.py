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
           "merge_branches", "fresh_frames", "fresh_design",
           "fresh_apply"]


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
