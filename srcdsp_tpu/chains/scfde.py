"""Single-carrier frequency-domain equalization (SC-FDE, beyond parity).

The third modern wideband PHY next to chains/ofdm.py and chains/dsss.py:
single-carrier blocks with a cyclic prefix, equalized in the frequency
domain — OFDM's one-tap-per-bin math with a single-carrier waveform
(~2-3 dB lower PAPR, asserted in the tests; the standard uplink trade,
cf. LTE SC-FDMA).

Structure (all batched FFT/elementwise — the jnp.fft tier):

- TX: [pilot block | S data blocks], every block CP-extended. The pilot
  is a known constant-amplitude sequence (Zadoff-Chu by default: its flat
  spectrum conditions the LS channel estimate at every bin).
- RX (synchronized form, like chains.msk — compose with framesync/CFO
  estimators for acquisition): strip CPs, LS channel estimate
  H = Y_pilot/X_pilot, then per data block MMSE one-taps
  X_hat = conj(H) Y / (|H|^2 + 1/snr) and an IFFT back to symbols.
  MMSE (not ZF) so spectral nulls don't blow up the noise.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.testing.signals import zadoff_chu
from srcdsp_tpu.types import CF32, F32

__all__ = ["ScfdeSpec", "make_scfde_spec", "scfde_tx", "scfde_rx"]


class ScfdeSpec(NamedTuple):
    n: int                 # block length (FFT size)
    cp: int
    pilot: jax.Array       # [n] known pilot block (unit amplitude)


def make_scfde_spec(n: int = 256, cp: int = 32, root: int = 25) -> ScfdeSpec:
    """Zadoff-Chu pilot needs gcd(root, n) == 1; for power-of-two n any
    odd root works."""
    return ScfdeSpec(n=int(n), cp=int(cp),
                     pilot=jnp.asarray(zadoff_chu(root, n)))


def _add_cp(blocks: jax.Array, cp: int) -> jax.Array:
    return jnp.concatenate([blocks[..., -cp:], blocks], axis=-1)


def scfde_tx(spec: ScfdeSpec, symbols: jax.Array) -> jax.Array:
    """symbols: [S, N] data blocks -> [(S+1)*(N+CP)] samples
    ([pilot | data], every block CP-extended)."""
    blocks = jnp.concatenate([spec.pilot[None], symbols.astype(CF32)],
                             axis=0)
    return _add_cp(blocks, spec.cp).reshape(-1).astype(CF32)


def scfde_rx(spec: ScfdeSpec, y: jax.Array, snr: float = 100.0
             ) -> tuple[jax.Array, jax.Array]:
    """Synchronized receive: y starts at the pilot block's CP.

    Returns (equalized symbols [S, N] complex64, H [N] channel estimate).
    snr: linear symbol SNR for the MMSE regularizer (overestimating it
    degenerates toward ZF; 100 ~ 20 dB is a sane default).
    """
    l = spec.n + spec.cp
    s = y.shape[-1] // l - 1
    blocks = y[: (s + 1) * l].reshape(s + 1, l)[:, spec.cp:]   # strip CPs
    f = jnp.fft.fft(blocks, axis=-1)
    h = f[0] / jnp.fft.fft(spec.pilot)
    w = jnp.conj(h) / (jnp.abs(h) ** 2 + F32(1.0 / snr))
    eq = jnp.fft.ifft(f[1:] * w[None, :], axis=-1)
    return eq.astype(CF32), h.astype(jnp.complex64)
