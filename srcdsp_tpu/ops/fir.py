"""FIR and decimating FIR filters (SURVEY.md C2/C3).

The reference implements these as C++ template classes with a per-sample MAC
loop over an internal delay line (BASELINE.json: "template-per-sample C++
loops", "stateful filter delay lines"). TPU-native form:

- the delay line becomes an explicit carried overlap buffer of the last
  ``num_taps - 1`` input samples (overlap-save), so block-streamed output is
  bit-exact with whole-signal filtering;
- the per-sample MAC loop becomes one `lax.conv_general_dilated` over the
  whole block, which XLA tiles onto the MXU; decimation is the conv window
  stride — filter and decimate are a single fused pass over the input
  (never compute-then-discard);
- complex I/Q is carried as a 2-feature real conv (for complex taps, a
  2x2 feature-mixing kernel), because XLA convs are real-only on TPU.

Semantics (the contract the C++ oracle mirrors): causal direct-form FIR from
zero initial state, y[n] = sum_k h[k] x[n-k]; decimation keeps y[j*M].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.types import CF32, F32

_DIMNUMS = ("NCH", "OIH", "NCH")  # (batch, feature, time) 1-D conv


class FirState(NamedTuple):
    """Carried overlap buffer: the last ``num_taps - 1`` input samples."""

    tail: jax.Array  # [..., num_taps - 1] complex64


def fir_init(num_taps: int, channel_shape: tuple = (), dtype=CF32) -> FirState:
    """Zero state == zero-filled delay line (causal filter from rest)."""
    return FirState(tail=jnp.zeros((*channel_shape, num_taps - 1), dtype=dtype))


def _as_taps(taps) -> jnp.ndarray:
    t = jnp.asarray(taps)
    if t.ndim != 1:
        raise ValueError(f"taps must be 1-D, got shape {t.shape}")
    return t


def complex_conv(xin: jax.Array, taps: jnp.ndarray, stride: int = 1,
                 lhs_dilation: int = 1, padding=((0, 0),),
                 precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Strided/dilated true convolution of complex data with (real|complex) taps.

    y[n] = sum_k h[k] u[n*stride + T-1 - k] where u is xin upsampled by
    `lhs_dilation` (zeros between samples) and padded per `padding` (applied
    in the dilated domain). XLA convs are real-only on TPU, so complex I/Q
    runs as conv features: real taps -> I and Q as extra batch rows (one
    filter); complex taps -> 2x2 feature-mixing kernel.
    """
    taps = _as_taps(taps)
    T = taps.shape[0]
    lead = xin.shape[:-1]
    nin = xin.shape[-1]
    xr = jnp.real(xin).astype(F32).reshape(-1, 1, nin)
    xi = jnp.imag(xin).astype(F32).reshape(-1, 1, nin)
    hrev = taps[::-1]
    conv_kwargs = dict(
        window_strides=(stride,), padding=padding,
        lhs_dilation=(lhs_dilation,), dimension_numbers=_DIMNUMS,
        precision=precision, preferred_element_type=F32)

    if jnp.iscomplexobj(taps):
        # feature-mixing conv: (yr, yi) = [[hr, -hi], [hi, hr]] * (xr, xi)
        hr = jnp.real(hrev).astype(F32)
        hi = jnp.imag(hrev).astype(F32)
        lhs = jnp.concatenate([xr, xi], axis=1)  # [B, 2, Nin]
        rhs = jnp.stack([jnp.stack([hr, -hi]), jnp.stack([hi, hr])])  # [2,2,T]
        out = jax.lax.conv_general_dilated(lhs, rhs, **conv_kwargs)
        yr, yi = out[:, 0, :], out[:, 1, :]
    else:
        # real taps: run I and Q as extra batch rows with a single filter
        lhs = jnp.concatenate([xr, xi], axis=0)  # [2B, 1, Nin]
        rhs = hrev.astype(F32).reshape(1, 1, T)
        out = jax.lax.conv_general_dilated(lhs, rhs, **conv_kwargs)
        b = xr.shape[0]
        yr, yi = out[:b, 0, :], out[b:, 0, :]

    y = (yr + 1j * yi).astype(CF32)
    return y.reshape(*lead, y.shape[-1])


def _conv_valid(xin: jax.Array, taps: jnp.ndarray, stride: int,
                precision) -> jax.Array:
    """Valid-mode y[n] = sum_k h[k] xin[n*stride + T-1 - k]."""
    return complex_conv(xin, taps, stride=stride, precision=precision)


def fir_apply(taps, state: FirState, x: jax.Array, decim: int = 1,
              precision=jax.lax.Precision.HIGHEST) -> tuple[FirState, jax.Array]:
    """Filter one block. x: [..., N] with N % decim == 0 -> y: [..., N//decim].

    Streaming invariant (enforced by tests/props): concatenating the outputs
    of successive blocks equals filtering the concatenated input —
    **bit-exactly when the block size is fixed** (the production streaming
    pattern: identical shapes reuse one compiled conv, so every output's
    reduction order is reproduced), and to ~1 ULP when block sizes vary
    (XLA may re-associate the conv reduction differently per shape). The
    u32-phase NCO and the Pallas kernels are bit-exact under ANY split.
    """
    taps = _as_taps(taps)
    T = taps.shape[0]
    n = x.shape[-1]
    if n % decim != 0:
        raise ValueError(f"block length {n} not divisible by decimation {decim}")
    xin = jnp.concatenate([state.tail, x], axis=-1)  # [..., N + T - 1]
    y = _conv_valid(xin, taps, stride=decim, precision=precision)
    new_tail = jax.lax.slice_in_dim(xin, n, n + T - 1, axis=-1) if T > 1 \
        else state.tail
    return FirState(tail=new_tail), y


def fir_full(taps, x: jax.Array, decim: int = 1,
             precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Whole-signal causal FIR from zero state (one-shot convenience)."""
    taps = _as_taps(taps)
    state = fir_init(taps.shape[0], channel_shape=x.shape[:-1], dtype=x.dtype)
    _, y = fir_apply(taps, state, x, decim=decim, precision=precision)
    return y


def np_fir_full(taps: np.ndarray, x: np.ndarray, decim: int = 1) -> np.ndarray:
    """numpy reference twin of fir_full (float64 accumulate), for tests."""
    T = len(taps)
    xin = np.concatenate([np.zeros(x.shape[:-1] + (T - 1,), dtype=x.dtype), x], axis=-1)
    n = x.shape[-1]
    out = np.stack([
        np.sum(taps[::-1] * xin[..., j * decim: j * decim + T], axis=-1)
        for j in range(n // decim)
    ], axis=-1)
    return out.astype(x.dtype)
