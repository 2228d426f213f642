"""MIMO spatial-multiplexing detection (beyond parity): ZF / MMSE / ML
detectors for an Nt x Nr flat channel — the spatial dimension next to
array.py's beamforming (which points one beam; MIMO separates Nt
simultaneous streams).

TPU-native shapes:

- ZF/MMSE are batched small linear algebra: one [Nr, Nt] pseudo-inverse /
  regularized solve applied to all symbols at once ([Nt, N] matmul).
- ML detection enumerates the full candidate lattice (M^Nt transmit
  vectors — 256 for 2x2 16-QAM) ONCE into an [C, Nr] expected-rx table,
  then detection is a single |y - H s|^2 distance matrix [N, C] and an
  argmin — the MXU-shaped form of exhaustive ML, exact (no sphere
  pruning needed at these sizes).

Per-subcarrier MIMO-OFDM = vmap these over the subcarrier axis with
per-bin H.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.types import CF32, F32

__all__ = ["zf_detect", "mmse_detect", "make_ml_lattice", "ml_detect"]


def zf_detect(h: jax.Array, y: jax.Array) -> jnp.ndarray:
    """Zero-forcing: x_hat = pinv(H) y. h: [Nr, Nt]; y: [Nr, N] ->
    [Nt, N]. Exact stream separation, noise-enhancing when H is
    ill-conditioned (pinv, not normal equations: finite min-norm answer
    even for rank-deficient H, and no condition-number squaring)."""
    return jnp.linalg.pinv(h.astype(jnp.complex64)) @ y.astype(CF32)


def mmse_detect(h: jax.Array, y: jax.Array, snr: float) -> jnp.ndarray:
    """LMMSE: (H^H H + Nt/snr I)^-1 H^H y — trades residual interference
    against noise enhancement (snr = per-receive-antenna symbol SNR,
    linear)."""
    nt = h.shape[-1]
    hh = jnp.conj(h.T) @ h + (nt / snr) * jnp.eye(nt, dtype=jnp.complex64)
    return jnp.linalg.solve(hh, jnp.conj(h.T) @ y.astype(CF32))


def make_ml_lattice(points: np.ndarray, nt: int) -> tuple[np.ndarray,
                                                          np.ndarray]:
    """(candidates [C, Nt] complex, indices [C, Nt] int) — every transmit
    vector over the constellation, enumerated host-side once."""
    pts = np.asarray(points)
    idx = np.asarray(list(itertools.product(range(pts.size), repeat=nt)),
                     np.int64)
    return pts[idx], idx


def ml_detect(h: jax.Array, y: jax.Array, cands: np.ndarray,
              cand_idx: np.ndarray) -> jnp.ndarray:
    """Exact ML: argmin_s |y - H s|^2 over the full lattice.

    h: [Nr, Nt]; y: [Nr, N]; cands/cand_idx from make_ml_lattice.
    Returns [Nt, N] int32 constellation indices per stream.
    """
    exp = (jnp.asarray(cands.astype(np.complex64))
           @ h.T.astype(jnp.complex64))            # [C, Nr]
    # argmin |y - Hs|^2 = argmin (|Hs|^2 - 2 Re<y, Hs>): one [N, Nr] x
    # [Nr, C] matmul instead of an [N, C, Nr] broadcast tensor (which
    # would OOM at full-lattice sizes like 4x4 16-QAM)
    e2 = jnp.sum(jnp.abs(exp) ** 2, axis=-1)                   # [C]
    cross = jnp.real(y.T.astype(CF32) @ jnp.conj(exp).T)       # [N, C]
    best = jnp.argmin(e2[None, :] - 2.0 * cross, axis=-1)      # [N]
    return jnp.take(jnp.asarray(cand_idx.astype(np.int32)), best,
                    axis=0).T                                  # [Nt, N]
