"""Cyclostationary spectral correlation via the FFT Accumulation Method
(beyond parity — the reference has no cyclostationary analysis; this
extends chains/blindscan.py's |x|^2 baud-line estimator to the full
spectral correlation function used for modulation classification and
low-SNR signal detection).

FAM in TPU terms: one strided-frame BATCHED FFT (channelizer), a
closed-form down-conversion phase ramp, one big elementwise outer
product over channel pairs, and a second batched FFT over frame index —
all MXU/VPU-shaped dense tensor work, no per-sample loops. Sizes are
the textbook ones (Np channels x P frames -> alpha resolution
1/(P*L) with L = Np/4 hop).

Host/standard tier (jnp.fft + complex64), like ops/spectrum.py — this is
an analysis-time tool, not a serving chain; the Welch/spectrogram module
shows the plane-FFT pattern if an on-chip form is ever needed.

References: Roberts, Brown & Loomis, "Computationally efficient
algorithms for cyclic spectral analysis" (IEEE SP Mag 1991) — the FAM
definition; axes conventions follow that paper with fs = 1.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.types import CF32, F32


class ScfResult(NamedTuple):
    """Dense spectral-correlation estimate on the (f, alpha) bi-frequency
    grid. scf[i] is one (k1, k2, q) point mapped to (freq[i], alpha[i]);
    the grid is the standard FAM diamond (not rectangular)."""

    scf: jax.Array     # [Np, Np, P] complex — S[k1, k2, q]
    freq: jax.Array    # [Np, Np] spectral frequency f per (k1, k2)
    alpha: jax.Array   # [Np, Np, P] cycle frequency per (k1, k2, q)


def _frames(x: jax.Array, np_: int, hop: int, p: int) -> jax.Array:
    """[P, Np] strided frames (gather-free when hop | Np: reshape +
    static shifts; general case uses one take of a [P, Np] index grid)."""
    need = (p - 1) * hop + np_
    if x.shape[-1] < need:
        raise ValueError(f"need {need} samples for Np={np_}, P={p}, "
                         f"hop={hop}; got {x.shape[-1]}")
    if np_ % hop == 0:
        # gather-free: hop-sized rows, frame i = rows [i, i+k) concatenated
        k = np_ // hop
        rows = x[..., : (p + k - 1) * hop].reshape(
            *x.shape[:-1], p + k - 1, hop)
        return jnp.concatenate([rows[..., j: j + p, :] for j in range(k)],
                               axis=-1)
    idx = (np.arange(p)[:, None] * hop + np.arange(np_)[None, :])
    return jnp.take(x, jnp.asarray(idx), axis=-1)


def fam_scf(x: jax.Array, np_: int = 64, p: int = 128,
            conj: bool = False, window: str = "hamming") -> ScfResult:
    """FFT Accumulation Method estimate of the spectral correlation
    function of x ([N] complex, fs = 1).

    np_: number of spectral channels (frequency resolution 1/np_);
    p: frames accumulated (cycle resolution 1/(p*L), L = np_//4);
    conj=False: the (non-conjugate) SCF S_x^alpha(f) — baud-rate cycle
    features; conj=True: the CONJUGATE SCF S_{x x*}^alpha — carrier
    (2 f_c) features (the BPSK-vs-QPSK discriminator).

    Needs N >= (p-1)*np_//4 + np_ samples. Returns the dense diamond
    grid; use `cycle_profile` for the alpha-axis detection statistic.
    """
    ell = np_ // 4
    if window == "hamming":
        w = np.hamming(np_)
    elif window == "hann":
        w = np.hanning(np_)
    else:
        w = np.ones(np_)
    w = (w / np.sqrt(np.sum(w ** 2) / np_)).astype(np.float32)

    fr = _frames(x.astype(CF32), np_, ell, p) * jnp.asarray(w)[None, :]
    cx = jnp.fft.fftshift(jnp.fft.fft(fr, axis=-1), axes=-1)   # [P, Np]
    # down-convert channel k to baseband: e^{-j 2 pi kc (m L) / Np}
    kc = np.fft.fftshift(np.fft.fftfreq(np_)) * np_            # centered k
    m = np.arange(p)
    ph = np.exp(-2j * np.pi * np.outer(m * ell, kc) / np_)
    cx = cx * jnp.asarray(ph.astype(np.complex64))

    if conj:
        d = cx[:, :, None] * cx[:, None, :]                    # x * x
    else:
        d = cx[:, :, None] * jnp.conj(cx)[:, None, :]          # x * x*
    s = jnp.fft.fftshift(jnp.fft.fft(d, axis=0), axes=0) / p   # [P,Np,Np]
    s = jnp.moveaxis(s, 0, -1)                                 # [Np,Np,P]

    f1 = kc / np_                                              # channel f
    q = np.fft.fftshift(np.fft.fftfreq(p)) / ell               # fine alpha
    if conj:
        freq = (f1[:, None] - f1[None, :]) / 2.0
        alpha0 = f1[:, None] + f1[None, :]
    else:
        freq = (f1[:, None] + f1[None, :]) / 2.0
        alpha0 = f1[:, None] - f1[None, :]
    alpha = alpha0[:, :, None] + q[None, None, :]
    return ScfResult(scf=s, freq=jnp.asarray(freq.astype(np.float32)),
                     alpha=jnp.asarray(alpha.astype(np.float32)))


def cycle_profile(res: ScfResult, nbins: int = 512,
                  normalize: bool = True) -> tuple[jax.Array, jax.Array]:
    """Alpha-domain detection statistic: max |SCF| over f per alpha bin.

    Cycle frequency is CYCLIC for a complex signal at fs = 1 (the SCF at
    alpha and alpha + 1 is the same estimator: channels at -0.5 and +0.5
    are adjacent mod 1), so alpha wraps into [-0.5, 0.5) before binning
    into `nbins` uniform bins; each bin takes the max magnitude (one
    segment-max via scatter-free one-hot matmul would be the on-chip
    form; host tier uses np ops). normalize=True divides by the
    alpha = 0 peak (the PSD peak) so thresholds are SNR-free. Returns
    (alpha_axis [nbins], profile [nbins])."""
    a = np.asarray(res.alpha).ravel()
    a = np.mod(a + 0.5, 1.0) - 0.5
    mag = np.abs(np.asarray(res.scf)).ravel()
    bins = np.clip(((a + 0.5) * nbins).astype(np.int64), 0, nbins - 1)
    prof = np.zeros(nbins, np.float32)
    np.maximum.at(prof, bins, mag.astype(np.float32))
    axis = (np.arange(nbins) + 0.5) * (1.0 / nbins) - 0.5
    if normalize:
        # alpha = 0 sits on a bin EDGE (nbins even): the PSD diagonal can
        # land either side of it, so normalize by the max over both
        z0 = int(np.abs(axis).argmin())
        z = float(prof[max(z0 - 1, 0): z0 + 2].max())
        prof = prof / max(z, 1e-30)
    return jnp.asarray(axis.astype(np.float32)), jnp.asarray(prof)


def detect_cycles(res: ScfResult, nbins: int = 512, guard: int = 3,
                  thresh: float = 0.35) -> list[tuple[float, float]]:
    """Peak-pick the normalized cycle profile away from alpha = 0.

    Returns [(alpha, strength)] for local maxima above `thresh` (relative
    to the PSD peak), excluding +-guard bins around alpha = 0. The
    noise-only floor of the max-statistic is ~4.4/sqrt(P) of the PSD
    peak (measured 0.27 at P=256) — scale `thresh` down if you
    accumulate more frames. The
    classic use: a cyclic feature at alpha = baud reveals a linearly
    modulated signal buried in noise; a CONJUGATE feature at
    alpha = 2 f_c separates BPSK (present) from QPSK (absent)."""
    axis, prof = cycle_profile(res, nbins=nbins, normalize=True)
    axis = np.asarray(axis)
    prof = np.asarray(prof).copy()
    z = int(np.abs(axis).argmin())
    prof[max(z - guard, 0): z + guard + 1] = 0.0
    out = []
    for i in range(1, nbins - 1):
        if prof[i] >= thresh and prof[i] >= prof[i - 1] \
                and prof[i] >= prof[i + 1]:
            out.append((float(axis[i]), float(prof[i])))
    out.sort(key=lambda t: -t[1])
    return out
