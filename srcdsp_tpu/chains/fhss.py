"""Frequency-hopping spread spectrum: hop, acquire, dehop
(beyond parity; the second spread-spectrum family next to chains/dsss.py).

TPU-native shapes:

- **Hop/dehop** are one reshape + one broadcast multiply: the stream is
  viewed as [K, L] hop segments and each row gets its hop tone (u32-exact
  per-hop phase words built host-side from the hop table; hops are
  phase-discontinuous by convention, as real FH synthesizers are).
- **Acquisition** (hop timing + sequence phase, no data aided): each
  candidate segment's energy at every hop frequency is ONE [K*C, L] x
  [L, H] Goertzel matmul (C = coarse timing candidates); classifying the
  per-segment argmax frequency and circularly correlating the class
  sequence against the known hop pattern gives the sequence phase — the
  all-shifts trick from dsss_acquire applied to hop indices.

The dehopped stream is ordinary narrowband baseband: feed any chain
(the tests run CPFSK through chains.fsk after dehop).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.types import CF32, F32

__all__ = ["FhssParams", "make_fhss_params", "fhss_hop", "fhss_dehop",
           "fhss_acquire"]


class FhssParams(NamedTuple):
    freqs: np.ndarray      # [H] hop frequencies, cycles/sample (host)
    seq: np.ndarray        # [P] hop-frequency indices (host)
    hop_len: int


def make_fhss_params(freqs, seq, hop_len: int) -> FhssParams:
    freqs = np.asarray(freqs, np.float64)
    seq = np.asarray(seq, np.int64)
    if seq.size == 0:
        raise ValueError("empty hop sequence")
    if seq.min() < 0 or seq.max() >= freqs.size:
        raise ValueError("sequence indexes outside the frequency table")
    return FhssParams(freqs=freqs, seq=seq, hop_len=int(hop_len))


def _hop_phasors(params: FhssParams, k: int, seq_phase: int, sign: float
                 ) -> jnp.ndarray:
    """[k, L] per-segment tones at the sequence's frequencies (host-built
    f64 phase, exact; each hop restarts at phase 0)."""
    idx = params.seq[(seq_phase + np.arange(k)) % params.seq.size]
    f = params.freqs[idx][:, None]                         # [k, 1]
    n = np.arange(params.hop_len)[None, :]
    return jnp.asarray(np.exp(2j * np.pi * sign * f * n).astype(np.complex64))


def _mix_hops(params: FhssParams, x: jax.Array, seq_phase: int,
              sign: float) -> jnp.ndarray:
    """Mix every hop segment with its tone, INCLUDING a ragged final
    partial hop (padded to a whole segment and trimmed back, so the
    output length always equals the input length)."""
    l = params.hop_len
    n = x.shape[-1]
    k = -(-n // l)                                   # ceil: partial kept
    pad = k * l - n
    xp = (jnp.concatenate([x, jnp.zeros((*x.shape[:-1], pad), x.dtype)],
                          axis=-1) if pad else x)
    xb = xp.reshape(*x.shape[:-1], k, l)
    y = xb * _hop_phasors(params, k, seq_phase, sign)
    return y.reshape(*x.shape[:-1], k * l)[..., :n].astype(CF32)


def fhss_hop(params: FhssParams, x: jax.Array, seq_phase: int = 0
             ) -> jnp.ndarray:
    """Spread: x [N] baseband -> hopped (same length; a final partial
    hop is mixed too). Segment k is mixed to freqs[seq[(seq_phase+k)%P]]."""
    return _mix_hops(params, x, seq_phase, +1.0)


def fhss_dehop(params: FhssParams, x: jax.Array, seq_phase: int = 0
               ) -> jnp.ndarray:
    """Despread with KNOWN hop timing: x starts exactly at a hop boundary
    whose sequence position is seq_phase (same length out)."""
    return _mix_hops(params, x, seq_phase, -1.0)


def fhss_acquire(params: FhssParams, x: jax.Array, coarse: int = 8
                 ) -> tuple[int, int]:
    """Blind hop-timing + sequence-phase acquisition.

    Tests `coarse` timing offsets per hop (L/coarse-sample granularity —
    refine with a fine pass or a tracking loop downstream). For each
    offset, segments are classified to their strongest hop frequency (one
    Goertzel matmul against all H tones) and the class sequence is
    circularly matched against the known pattern over all P phases.
    Returns (sample_offset, seq_phase) of the best hypothesis.
    """
    l = params.hop_len
    h = params.freqs.size
    p = params.seq.size
    n = np.arange(l)
    tones = jnp.asarray(np.exp(-2j * np.pi * params.freqs[None, :]
                               * n[:, None]).astype(np.complex64))  # [L, H]
    if x.shape[-1] < (p + 1) * l:
        raise ValueError(f"capture too short for acquisition: need >= "
                         f"{(p + 1) * l} samples (P+1 hops), got "
                         f"{x.shape[-1]}")
    best = (-1.0, 0, 0)
    x = jnp.asarray(x)
    for c in range(coarse):
        off = c * l // coarse
        k = (x.shape[-1] - off) // l
        if k < p:
            continue
        xb = x[off:off + k * l].reshape(k, l)
        e = jnp.abs(xb @ tones) ** 2                       # [K, H]
        cls = np.asarray(jnp.argmax(e, axis=-1))           # [K]
        conf = float(jnp.mean(jnp.max(e, axis=-1)
                              / (jnp.sum(e, axis=-1) + 1e-30)))
        # circular sequence match over all P phases
        hits = np.array([np.mean(cls == params.seq[(ph + np.arange(k)) % p])
                         for ph in range(p)])
        ph = int(np.argmax(hits))
        score = float(hits[ph]) * conf
        if score > best[0]:
            best = (score, off, ph)
    return best[1], best[2]
