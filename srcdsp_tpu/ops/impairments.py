"""Front-end impairment estimation & correction (beyond parity).

Every real receiver sits behind an imperfect analog front end; the
reference family (BASELINE.json scope) assumes clean IQ. This module
covers the standard trio, each as streaming-friendly vector reductions
(no sequential loops anywhere — everything is means/outer-products over
the block plus a tiny carried accumulator):

- **IQ imbalance** (image rejection): model y = g_i*I + j*(g_q*Q') with a
  gain mismatch g and quadrature skew phi. Blind estimation from
  circularity statistics (a proper complex baseband signal has
  E[y^2] = 0; imbalance makes it nonzero): theta1 = E[I*Q],
  theta2 = E[I^2] - E[Q^2] give phi and g directly (Moseley & Slump's
  widely used estimator). Correction is a constant 2x2 real matrix on
  (I, Q) — one fused multiply-add per sample.
- **DC offset**: complex mean with an exponential or exact running
  average, removed by subtraction (the ops.iir DC blocker is the
  filter-form alternative; this one estimates the offset explicitly so
  it can be logged/calibrated out).
- **CFO estimators**: Kay's weighted phase-difference estimator (smoothed
  conjugate-product angle — near-ML for a single tone in noise, O(N)
  vector work) and an FFT-peak coarse estimator with 3-point parabolic
  interpolation (resolution far below one bin).
- **SNR estimator**: the M2M4 moments method (blind, works on PSK/const-
  modulus signals without decisions).

All estimators expose (init, update, finalize) streaming accumulators in
the framework's carried-state style, plus one-shot conveniences.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.ops.cfar import ca_cfar
from srcdsp_tpu.types import CF32, F32

__all__ = [
    "MomentState", "moments_init", "moments_update",
    "iq_imbalance_estimate", "iq_imbalance_correct", "iq_imbalance_apply",
    "dc_offset", "cfo_kay", "cfo_fft_peak", "snr_m2m4",
]


# ---------- streaming second/fourth-moment accumulator ----------

class MomentState(NamedTuple):
    """Running sums: n, sum(y), sum(I^2), sum(Q^2), sum(I*Q), sum(|y|^2),
    sum(|y|^4) — enough to finalize every estimator in this module."""

    n: jax.Array       # [] f32 sample count
    s1: jax.Array      # [...] c64 sum of y
    sii: jax.Array     # [...] f32
    sqq: jax.Array     # [...] f32
    siq: jax.Array     # [...] f32
    sm2: jax.Array     # [...] f32 sum |y|^2
    sm4: jax.Array     # [...] f32 sum |y|^4


def moments_init(channel_shape: tuple = ()) -> MomentState:
    z = jnp.zeros(channel_shape, F32)
    return MomentState(n=jnp.zeros((), F32), s1=jnp.zeros(channel_shape, CF32),
                       sii=z, sqq=z, siq=z, sm2=z, sm4=z)


def moments_update(state: MomentState, y: jax.Array) -> MomentState:
    i, q = jnp.real(y).astype(F32), jnp.imag(y).astype(F32)
    m2 = i * i + q * q
    return MomentState(
        n=state.n + F32(y.shape[-1]),
        s1=state.s1 + jnp.sum(y, axis=-1),
        sii=state.sii + jnp.sum(i * i, axis=-1),
        sqq=state.sqq + jnp.sum(q * q, axis=-1),
        siq=state.siq + jnp.sum(i * q, axis=-1),
        sm2=state.sm2 + jnp.sum(m2, axis=-1),
        sm4=state.sm4 + jnp.sum(m2 * m2, axis=-1))


# ---------- IQ imbalance ----------

def iq_imbalance_estimate(state_or_y) -> tuple[jax.Array, jax.Array]:
    """-> (gain g, quadrature skew phi in radians).

    Accepts a MomentState or a raw block. Model (I the reference rail):
      I = I',   Q = g (cos(phi) Q' + sin(phi) I')
    with I', Q' the ideal circular rails (E[I'^2] = E[Q'^2], E[I'Q'] = 0).
    Then exactly:  g sin(phi) = E[I Q]/E[I^2],  g^2 = E[Q^2]/E[I^2]
    (the Moseley-Slump blind estimator).

    Properness caveat (measured): the estimator assumes a CIRCULAR
    input (E[I'Q'] = 0, equal rail powers). A single rect-pulse PSK
    emitter violates this — its symbol-squared sequence is a full-
    power conjugate line that swamps the moments — so calibrate on a
    wideband/noise block and apply the correction to the traffic;
    aggregate multi-carrier traffic is circular and estimates fully
    blind. Precision is ~1/sqrt(N) of the calibration block."""
    st = state_or_y
    if not isinstance(st, MomentState):
        st = moments_update(moments_init(np.shape(state_or_y)[:-1]),
                            state_or_y)
    eii = st.sii / st.n
    eqq = st.sqq / st.n
    eiq = st.siq / st.n
    sin_phi_g = eiq / eii                       # = g sin(phi)
    g2 = eqq / eii                              # = g^2
    g = jnp.sqrt(g2)
    sin_phi = jnp.clip(sin_phi_g / g, -0.999, 0.999)
    return g.astype(F32), jnp.arcsin(sin_phi).astype(F32)


def iq_imbalance_correct(y: jax.Array, g: jax.Array, phi: jax.Array
                         ) -> jax.Array:
    """Invert the imbalance: given measured rails I, Q with
    Q = g (cos phi Q' + sin phi I'), recover the circular signal:
      I' = I
      Q' = (Q / g - I sin phi) / cos phi
    Constant 2x2 real matrix per stream — fuses into neighbors."""
    i, q = jnp.real(y).astype(F32), jnp.imag(y).astype(F32)
    g = g[..., None] if jnp.ndim(g) else g
    phi = phi[..., None] if jnp.ndim(phi) else phi
    qp = (q / g - i * jnp.sin(phi)) / jnp.cos(phi)
    return (i + 1j * qp).astype(CF32)


def iq_imbalance_apply(y: jax.Array, g: float, phi: float) -> jax.Array:
    """Impairment INJECTOR (test fixture): apply gain/skew to clean IQ."""
    i, q = jnp.real(y).astype(F32), jnp.imag(y).astype(F32)
    q2 = g * (jnp.cos(phi) * q + jnp.sin(phi) * i)
    return (i + 1j * q2).astype(CF32)


# ---------- DC offset ----------

def dc_offset(state_or_y) -> jax.Array:
    """Complex mean (exact running average via MomentState, or one-shot)."""
    st = state_or_y
    if not isinstance(st, MomentState):
        st = moments_update(moments_init(np.shape(state_or_y)[:-1]),
                            state_or_y)
    return (st.s1 / st.n).astype(CF32)


# ---------- CFO ----------

def cfo_kay(y: jax.Array) -> jax.Array:
    """Kay's estimator: frequency in cycles/sample of a noisy tone.

    Weighted average of successive phase differences — the parabolic
    window w[k] makes it near-ML at high SNR. O(N) vector ops; wraps only
    when |f| approaches 0.5."""
    d = y[..., 1:] * jnp.conj(y[..., :-1])
    n = d.shape[-1]
    k = jnp.arange(n, dtype=F32)
    w = 1.5 * n / (n * n - 1.0) * (1.0 - ((k - (n - 1) / 2) /
                                          (n / 2)) ** 2)
    ang = jnp.angle(d).astype(F32)
    return (jnp.sum(w * ang, axis=-1) / (2.0 * np.pi)).astype(F32)


def cfo_fft_peak(y: jax.Array, nfft: int | None = None) -> jax.Array:
    """Coarse tone frequency: FFT magnitude argmax + 3-point parabolic
    interpolation (log-magnitude) -> cycles/sample in [-0.5, 0.5)."""
    n = y.shape[-1]
    nfft = nfft or n
    spec = jnp.fft.fft(y, n=nfft, axis=-1)
    mag = jnp.abs(spec) + 1e-30
    k0 = jnp.argmax(mag, axis=-1)
    km = jnp.mod(k0 - 1, nfft)
    kp = jnp.mod(k0 + 1, nfft)
    lm = jnp.log(jnp.take_along_axis(mag, km[..., None], -1))[..., 0]
    l0 = jnp.log(jnp.take_along_axis(mag, k0[..., None], -1))[..., 0]
    lp = jnp.log(jnp.take_along_axis(mag, kp[..., None], -1))[..., 0]
    delta = 0.5 * (lm - lp) / (lm - 2.0 * l0 + lp)
    f = (k0.astype(F32) + delta) / nfft
    return jnp.where(f >= 0.5, f - 1.0, f).astype(F32)


# ---------- SNR ----------

def snr_m2m4(state_or_y, kurtosis_signal: float = 1.0) -> jax.Array:
    """Blind M2M4 SNR estimate (linear ratio; 10*log10 for dB).

    For a constant-modulus signal (PSK: kurtosis 1) in complex AWGN
    (kurtosis 2):  S = sqrt(2 M2^2 - M4),  N = M2 - S,  SNR = S/N.
    `kurtosis_signal` generalizes to other constellations
    (e.g. 16-QAM ~ 1.32)."""
    st = state_or_y
    if not isinstance(st, MomentState):
        st = moments_update(moments_init(np.shape(state_or_y)[:-1]),
                            state_or_y)
    m2 = st.sm2 / st.n
    m4 = st.sm4 / st.n
    ka = float(kurtosis_signal)
    if ka >= 2.0:
        raise ValueError("signal kurtosis must be < 2 (the noise kurtosis)")
    # independent circular signal+noise: M4 = ka S^2 + 2 N^2 + 4 S N and
    # M2 = S + N collapse to M4 = (ka - 2) S^2 + 2 M2^2, hence:
    s = jnp.sqrt(jnp.maximum((2.0 * m2 * m2 - m4) / (2.0 - ka), 0.0))
    noise = jnp.maximum(m2 - s, 1e-12)
    return (s / noise).astype(F32)


def blank_impulses(x: jax.Array, guard: int = 2, train: int = 32,
                   pfa: float = 1e-4) -> tuple[jax.Array, jax.Array]:
    """Impulse-noise blanker: CFAR on |x|^2 marks samples far above the
    LOCAL power floor (robust to slow AGC/fading ripple, unlike a global
    threshold) and zeroes them — pulse blanking, the standard defense
    against ignition/radar/lightning impulses that would otherwise smear
    through the matched filter. Returns (cleaned x, blanked mask)."""
    p = (jnp.real(x) ** 2 + jnp.imag(x) ** 2).astype(F32)
    det, _ = ca_cfar(p, guard=guard, train=train, pfa=pfa)
    return jnp.where(det, jnp.zeros((), x.dtype), x), det
