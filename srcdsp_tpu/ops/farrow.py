"""Farrow (cubic-Lagrange) arbitrary-ratio resampler (beyond parity).

`ops.resample` handles small-factor L/M polyphase rates; real radios also
need ARBITRARY ratios (44.1k <-> 48k, ppm-offset matching) where the
polyphase bank would need thousands of phases. The Farrow structure
evaluates a degree-3 interpolating polynomial at ANY fractional position,
so one 4-tap window serves every phase.

TPU-native design:
- Output timing is EXACT integer arithmetic: for out/in rate L/M the m-th
  output sits at input time t_m = (p + m*M)/L with integer phase p carried
  in the state — no float accumulation drift, bit-exact streaming joins
  under any block split (the same philosophy as ops.nco's u32 phase).
- Each block computes every output's 4-sample window index and fractional
  mu as vector int ops, gathers windows [..., capacity, 4] in ONE take,
  and evaluates the cubic as (W @ C) . [1, mu, mu^2, mu^3] — a [4,4]
  matmul against precomputed power-basis coefficients (the literal Farrow
  structure), fully batched.
- Output counts per block vary by +-1 (the skip/stuff reality of rate
  conversion): outputs land in a STATIC capacity with a validity mask —
  the framework's ragged-output pattern (chains.tracking uses the same).

The gather makes this a standard-backend-tier op (axon has no gather),
like ops.iir — the Pallas/restricted path for resampling remains
kernels/resample_pallas.py for MXU-friendly small-L/M ratios.

Exactness properties tested: cubic Lagrange reproduces polynomials up to
degree 3 EXACTLY (a ramp/cubic resamples with zero error), tones live
within the expected interpolation error, streaming equals one-shot
bit-exactly, and a numpy per-output twin matches.

Overflow bound: requires (n_in + 2) * L < 2^31 per block (int32 phase);
reduce L/M by their gcd (make_farrow_ratio does) — e.g. 44100/48000 ->
147/160 keeps blocks of up to ~13 M samples safe.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.types import CF32, F32

I32 = jnp.int32

__all__ = [
    "FarrowState", "farrow_init", "farrow_apply", "farrow_capacity",
    "make_farrow_ratio", "np_farrow", "LAGRANGE_C",
]

# Lagrange basis at support points {-1, 0, 1, 2} expanded in powers of mu:
# l_i(mu) = sum_p C[i, p] mu^p ; y(mu) = sum_i x[n+i-1] l_i(mu)
# (row order: taps at offsets -1, 0, +1, +2)
LAGRANGE_C = np.array([
    [0.0, -1.0 / 3.0, 1.0 / 2.0, -1.0 / 6.0],
    [1.0, -1.0 / 2.0, -1.0, 1.0 / 2.0],
    [0.0, 1.0, 1.0 / 2.0, -1.0 / 2.0],
    [0.0, -1.0 / 6.0, 0.0, 1.0 / 6.0],
], dtype=np.float64)


class FarrowState(NamedTuple):
    """tail: last 3 input samples; p: integer phase numerator — the next
    output's input-time is p/L samples into the coming block (may be
    negative: the interpolation point can sit inside the tail)."""

    tail: jax.Array   # [..., 3]
    p: jax.Array      # [] int32


def make_farrow_ratio(out_rate: int, in_rate: int) -> tuple[int, int]:
    """(L, M) reduced: consume M input samples per L output samples."""
    g = math.gcd(int(out_rate), int(in_rate))
    return int(out_rate) // g, int(in_rate) // g


def farrow_capacity(n_in: int, l_out: int, m_in: int) -> int:
    """Static per-block output capacity: ceil(n_in * L / M) + 1."""
    return -(-n_in * l_out // m_in) + 1


def farrow_init(channel_shape: tuple = (), dtype=CF32) -> FarrowState:
    return FarrowState(tail=jnp.zeros((*channel_shape, 3), dtype),
                       p=jnp.zeros((), I32))


def farrow_apply(state: FarrowState, x: jax.Array, l_out: int, m_in: int
                 ) -> tuple[FarrowState, tuple[jax.Array, jax.Array]]:
    """Resample one block by L/M (outputs per inputs). x: [..., N] ->
    (y [..., capacity], valid [capacity] bool). Valid outputs are a
    PREFIX of y (timing is monotone); invalid lanes hold garbage.
    N * L must stay below 2^31 (see module docstring)."""
    n = x.shape[-1]
    cap = farrow_capacity(n, l_out, m_in)
    xin = jnp.concatenate([state.tail, x], axis=-1)        # [..., N+3]
    m = jnp.arange(cap, dtype=I32)
    t_num = state.p + m * I32(m_in)                        # exact int phase
    base = jnp.floor_divide(t_num, I32(l_out))             # n_m (x coords)
    mu = jnp.mod(t_num, I32(l_out)).astype(F32) / F32(l_out)
    valid = base <= n - 3
    # window x[n-1 .. n+2] -> xin[n+2 .. n+5]
    idx = base[:, None] + jnp.arange(-1, 3, dtype=I32)[None, :] + 3
    idx = jnp.clip(idx, 0, n + 2)
    w = jnp.take(xin, idx, axis=-1)                        # [..., cap, 4]
    c = jnp.asarray(LAGRANGE_C, F32)
    pw = jnp.stack([jnp.ones_like(mu), mu, mu * mu, mu * mu * mu],
                   axis=-1)                                # [cap, 4]
    if jnp.iscomplexobj(xin):
        branches = (jnp.einsum("...ct,tp->...cp", jnp.real(w), c)
                    + 1j * jnp.einsum("...ct,tp->...cp", jnp.imag(w), c))
    else:
        branches = jnp.einsum("...ct,tp->...cp", w, c)
    y = jnp.sum(branches * pw, axis=-1)
    y = y.astype(xin.dtype)
    n_out = jnp.sum(valid.astype(I32))
    new_p = state.p + n_out * I32(m_in) - I32(n * l_out)
    new_tail = xin[..., xin.shape[-1] - 3:]
    return FarrowState(tail=new_tail, p=new_p), (y, valid)


def np_farrow(x: np.ndarray, l_out: int, m_in: int) -> np.ndarray:
    """Per-output sequential twin (double precision, zero initial tail)."""
    x = np.concatenate([np.zeros(3, x.dtype), np.asarray(x)])
    n = x.shape[-1] - 3
    out = []
    p, m = 0, 0
    while True:
        t = p + m * m_in
        base = t // l_out
        if base > n - 3:
            break
        mu = (t % l_out) / l_out
        w = x[base + 2: base + 6].astype(np.complex128)
        pw = np.array([1.0, mu, mu ** 2, mu ** 3])
        out.append(np.dot(w, LAGRANGE_C @ pw))
        m += 1
    return np.asarray(out)
