"""Soft-decision demappers (beyond parity): bit LLRs from noisy symbols.

The glue between the demod chains (which emit equalized complex symbols)
and the soft decoders (fec.viterbi_decode, ldpc.ldpc_decode): per-bit
log-likelihood ratios, positive favoring bit 0 (the convention shared by
srcdsp_tpu.ldpc and srcdsp_tpu.fec).

TPU-native form: exact max-log demapping as ONE [N, M] distance matrix
(symbols x constellation points) followed by two masked min-reductions
per bit — no per-bit loops, no gather; the constellation and its bit
masks are trace-time constants. Works for ANY labeled constellation;
psk/qam helpers bake the framework's conventions (chains.psk phase
offset, chains.qam Gray labeling), so demap(map(bits)) is self-consistent
with the tx mappers in chains/tx.py.

    llr[n, b] = (min_{s: bit_b(s)=1} |y_n - c_s|^2
                 - min_{s: bit_b(s)=0} |y_n - c_s|^2) / sigma2
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.chains.psk import constellation_offset
from srcdsp_tpu.chains.qam import qam_constellation
from srcdsp_tpu.types import F32, F32_BIG

__all__ = ["maxlog_llr", "psk_llr", "qam_llr", "psk_points",
           "apsk_constellation", "qam_llr_planes", "qam_llr_bitplanes"]


def psk_points(order: int) -> jnp.ndarray:
    """[order] M-PSK constellation, index convention of chains.psk
    (point m = exp(j*2*pi*(m+off)/M))."""
    off = constellation_offset(order)
    m = np.arange(order)
    return jnp.asarray(np.exp(2j * np.pi * (m + off) / order)
                       .astype(np.complex64))


def maxlog_llr(y: jax.Array, points: jax.Array, sigma2,
               labels: np.ndarray | None = None) -> jnp.ndarray:
    """Max-log LLRs for an arbitrary labeled constellation.

    y: [..., N] noisy symbols. points: [M] constellation. labels: [M]
    integer label of each point (default: the point index). sigma2: noise
    variance per complex symbol (scalar or broadcastable).
    Returns [..., N, log2(M)] f32, bit 0 = MSB of the label.
    """
    m = points.shape[-1]
    nbits = int(m).bit_length() - 1
    if (1 << nbits) != m:
        raise ValueError(f"constellation size {m} is not a power of two")
    lab = np.arange(m) if labels is None else np.asarray(labels)
    d2 = jnp.abs(y[..., None] - points) ** 2            # [..., N, M]
    big = jnp.asarray(F32_BIG)
    cols = []
    for b in range(nbits):
        bit = (lab >> (nbits - 1 - b)) & 1              # [M], MSB first
        ones = jnp.asarray((bit == 1))
        d1 = jnp.min(jnp.where(ones, d2, big), axis=-1)
        d0 = jnp.min(jnp.where(ones, big, d2), axis=-1)
        cols.append(d1 - d0)
    llr = jnp.stack(cols, axis=-1)                      # [..., N, nbits]
    return (llr / jnp.asarray(sigma2, F32)).astype(F32)


def psk_llr(y: jax.Array, order: int, sigma2) -> jnp.ndarray:
    """LLRs for M-PSK with binary index labels (pair with psk_map +
    fec/ldpc; for differential or Gray PSK pass labels to maxlog_llr)."""
    return maxlog_llr(y, psk_points(order), sigma2)


def qam_llr(y: jax.Array, order: int, sigma2) -> jnp.ndarray:
    """LLRs for square QAM. chains.qam's constellation is INDEXED by the
    Gray symbol label, so index labels already realize Gray demapping
    (adjacent points differ in one bit)."""
    return maxlog_llr(y, qam_constellation(order), sigma2)


def qam_llr_bitplanes(yr: jax.Array, yi: jax.Array, order: int,
                      sigma2=1.0) -> list:
    """Exact max-log square-QAM LLRs as log2(order) separate PLANES —
    the on-chip demap form (no complex dtype, no gather; 2-D elementwise
    ops only, so it runs on the restricted axon op set and inside
    serving pipelines). plane[b] has yr's shape and holds the LLR of
    label bit b (MSB first) for every symbol — concatenate/stack however
    the consumer's layout wants (chains/modem.py concatenates them on
    the codeword axis; qam_llr_planes stacks them minor-most).

    Exactness: chains.qam's Gray labeling splits the symbol index as
    (gi << bits_ax) | gq, so label bits [0, bits_ax) depend ONLY on the I
    level and the rest ONLY on Q. In max-log, the constellation min of
    dI + dQ separates into min_I dI + min_Q dQ; for an I bit the Q term
    is identical under both hypotheses and cancels exactly, leaving the
    1-D PAM LLR per axis (same argument for Q). Equal to qam_llr up to
    f32 rounding of that cancelled term (hard decisions identical off
    exact ties; unit-tested). sigma2 as in qam_llr — decisions under
    normalized min-sum are invariant to it.
    """
    from srcdsp_tpu.chains.qam import _axis_levels, qam_scale
    l = _axis_levels(order)
    bits_ax = l.bit_length() - 1
    s = qam_scale(order)
    # per-axis level for Gray label g: x_g = (2*inv_gray(g) - (l-1)) * s
    inv = np.zeros(l, np.int64)
    for g in range(l):
        b, sh = g, 1
        while sh < l.bit_length():
            b ^= b >> sh
            sh <<= 1
        inv[g] = b
    lev = ((2 * inv - (l - 1)) * s).astype(np.float32)

    inv_s2 = jnp.asarray(1.0 / np.float32(sigma2), F32)

    def axis_cols(y):
        d2 = [(y - F32(lev[g])) ** 2 for g in range(l)]     # l planes
        cols = []
        for b in range(bits_ax):
            ones = [g for g in range(l) if (g >> (bits_ax - 1 - b)) & 1]
            zeros = [g for g in range(l) if g not in ones]
            d1 = functools.reduce(jnp.minimum, [d2[g] for g in ones])
            d0 = functools.reduce(jnp.minimum, [d2[g] for g in zeros])
            cols.append(((d1 - d0) * inv_s2).astype(F32))
        return cols
    return axis_cols(yr) + axis_cols(yi)


def qam_llr_planes(yr: jax.Array, yi: jax.Array, order: int,
                   sigma2=1.0) -> jnp.ndarray:
    """qam_llr_bitplanes stacked minor-most: [..., N, log2(order)] f32,
    bit 0 = label MSB (maxlog_llr's convention and return layout)."""
    return jnp.stack(qam_llr_bitplanes(yr, yi, order, sigma2), axis=-1)


def apsk_constellation(order: int, gamma=None) -> jnp.ndarray:
    """DVB-S2-style APSK constellations, unit average power.

    16APSK: rings of 4 + 12 points (ring ratio gamma ~2.5-3.2 by code
    rate; default 2.7); 32APSK: 4 + 12 + 16 (gammas (2.53, 4.3) default).
    Index = (ring, position) raveled inner-first — pass these points to
    maxlog_llr / mimo.make_ml_lattice / chains.tx mappers like any other
    constellation. APSK trades QAM's amplitude levels for rings, cutting
    PAPR/nonlinearity sensitivity — the satellite-channel constellation.
    """
    if order == 16:
        if gamma is not None and np.ndim(gamma) != 0:
            raise ValueError("16APSK takes a single ring-ratio gamma")
        g = 2.7 if gamma is None else float(gamma)
        counts, radii = (4, 12), (1.0, g)
    elif order == 32:
        if gamma is not None and (np.ndim(gamma) != 1
                                  or len(gamma) != 2):
            raise ValueError("32APSK takes gamma=(g1, g2) ring ratios")
        g1, g2 = (2.53, 4.3) if gamma is None else gamma
        counts, radii = (4, 12, 16), (1.0, g1, g2)
    else:
        raise ValueError("apsk_constellation supports order 16 or 32")
    pts = []
    for c, r, off in zip(counts, radii,
                         (np.pi / 4, np.pi / 12, 0.0)):
        ang = 2 * np.pi * np.arange(c) / c + off
        pts.append(r * np.exp(1j * ang))
    pts = np.concatenate(pts)
    pts = pts / np.sqrt(np.mean(np.abs(pts) ** 2))
    return jnp.asarray(pts.astype(np.complex64))
