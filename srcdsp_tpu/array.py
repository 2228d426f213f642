"""Array processing: beamforming and direction finding (beyond parity).

The reference family is single-sensor DSP; multi-element front ends are
the natural next subsystem for a software-radio framework and map well to
the TPU: the hot operation is the sample covariance [E, N] @ [N, E] (one
MXU matmul over arbitrarily long snapshots), and everything downstream
(Bartlett / MVDR / MUSIC spectra over a steering grid) is small dense
linear algebra batched over angles.

Conventions: a uniform linear array of E elements at `spacing` wavelengths;
the steering vector for direction theta (radians from broadside) is
a_e(theta) = exp(-j*2*pi*spacing*e*sin(theta)). Snapshots are [E, N]
(element-major, time minor — the framework's [channel, time] layout).

Tiers: covariance + Bartlett + beamforming are elementwise/matmul (any
backend); MVDR/MUSIC use complex `jnp.linalg` (solve/eigh) and run on the
CPU/standard-TPU tier, like ops.iir's associative scan.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.types import CF32, F32

__all__ = [
    "ula_steering", "sample_covariance", "CovState", "cov_init",
    "cov_update", "cov_finalize", "bartlett_spectrum", "mvdr_weights",
    "mvdr_spectrum", "music_spectrum", "beamform",
]


def ula_steering(num_elements: int, spacing: float, angles) -> jnp.ndarray:
    """[A, E] steering matrix for a ULA. angles: radians from broadside;
    spacing in wavelengths (0.5 = the standard half-wavelength array)."""
    angles = jnp.atleast_1d(jnp.asarray(angles, F32))
    e = jnp.arange(num_elements, dtype=F32)
    ph = spacing * jnp.sin(angles)[:, None] * e[None, :]
    return jnp.exp(-1j * (2.0 * jnp.pi) * ph).astype(CF32)


def sample_covariance(x: jax.Array, loading: float = 0.0) -> jnp.ndarray:
    """R = X X^H / N (+ diagonal loading as a fraction of the mean element
    power). x: [..., E, N] -> [..., E, E]. The [E, N] @ [N, E] product is
    the MXU-heavy step; N can be millions of snapshots."""
    e = x.shape[-2]
    n = x.shape[-1]
    r = jnp.einsum("...en,...fn->...ef", x, jnp.conj(x)) / n
    if loading:
        tr = jnp.real(jnp.trace(r, axis1=-2, axis2=-1))[..., None, None]
        r = r + (loading * tr / e) * jnp.eye(e, dtype=r.dtype)
    return r.astype(jnp.complex64)


class CovState(NamedTuple):
    """Streaming covariance accumulator: unnormalized X X^H and count."""

    acc: jax.Array     # [..., E, E] complex64
    count: jax.Array   # [] or [...] f32 snapshots seen


def cov_init(num_elements: int, channel_shape: tuple = ()) -> CovState:
    return CovState(
        acc=jnp.zeros((*channel_shape, num_elements, num_elements), CF32),
        count=jnp.zeros(channel_shape, F32),
    )


def cov_update(state: CovState, x: jax.Array) -> CovState:
    """Accumulate one [..., E, N] block of snapshots."""
    acc = state.acc + jnp.einsum("...en,...fn->...ef", x, jnp.conj(x))
    return CovState(acc=acc.astype(CF32),
                    count=state.count + F32(x.shape[-1]))


def cov_finalize(state: CovState, loading: float = 0.0) -> jnp.ndarray:
    e = state.acc.shape[-1]
    r = state.acc / jnp.maximum(state.count, 1.0)[..., None, None]
    if loading:
        tr = jnp.real(jnp.trace(r, axis1=-2, axis2=-1))[..., None, None]
        r = r + (loading * tr / e) * jnp.eye(e, dtype=r.dtype)
    return r.astype(jnp.complex64)


def bartlett_spectrum(r: jax.Array, steering: jax.Array) -> jnp.ndarray:
    """Conventional beamformer power a^H R a / E^2 per steering row."""
    e = steering.shape[-1]
    ra = jnp.einsum("...ef,af->...ae", r, steering)
    p = jnp.real(jnp.einsum("...ae,ae->...a", ra, jnp.conj(steering)))
    return (p / (e * e)).astype(F32)


def mvdr_weights(r: jax.Array, a: jax.Array) -> jnp.ndarray:
    """Minimum-variance distortionless weights w = R^-1 a / (a^H R^-1 a).
    a: [E] steering vector of the look direction."""
    ri_a = jnp.linalg.solve(r, a.astype(jnp.complex64))
    denom = jnp.einsum("e,e->", jnp.conj(a), ri_a)
    return (ri_a / denom).astype(CF32)


def mvdr_spectrum(r: jax.Array, steering: jax.Array) -> jnp.ndarray:
    """Capon spectrum 1 / (a^H R^-1 a) per steering row."""
    ri_s = jnp.linalg.solve(r, jnp.swapaxes(steering, -2, -1)
                            .astype(jnp.complex64))        # [E, A]
    q = jnp.real(jnp.einsum("ae,...ea->...a", jnp.conj(steering), ri_s))
    return (1.0 / jnp.maximum(q, 1e-30)).astype(F32)


def music_spectrum(r: jax.Array, steering: jax.Array,
                   num_sources: int) -> jnp.ndarray:
    """MUSIC pseudospectrum 1 / ||En^H a||^2. eigh orders eigenvalues
    ascending, so the noise subspace is the first E - num_sources columns."""
    _, v = jnp.linalg.eigh(r)
    en = v[..., :, : v.shape[-1] - num_sources]             # [E, E-S]
    proj = jnp.einsum("...es,ae->...as", en, jnp.conj(steering))
    q = jnp.sum(jnp.abs(proj) ** 2, axis=-1)
    return (1.0 / jnp.maximum(q, 1e-30)).astype(F32)


def beamform(w: jax.Array, x: jax.Array) -> jnp.ndarray:
    """y[n] = w^H x[:, n]. w: [E], x: [..., E, N] -> [..., N]."""
    return jnp.einsum("e,...en->...n", jnp.conj(w), x).astype(CF32)
