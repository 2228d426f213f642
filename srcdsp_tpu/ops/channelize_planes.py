"""On-chip polyphase channelizer: shifted matmuls on the MXU (SURVEY.md C10).

The complex-path bank (chains.channelizer) gathers overlapped frames and
runs a batched IFFT — neither gather nor FFT exists in the restricted
on-chip op set. This formulation needs only 2-D reshape, row-shifted slices
and matmuls:

With X2 = x reshaped [K, M] (row k = samples kM..kM+M-1) and S_r = X2
shifted down r rows, the fold+DFT collapses into

    Y[k, m] = sum_r ( S_r @ E_r )[k, m],     r = 0..P

where E_r = A_r @ W folds the polyphase coefficients A_r (a one-entry-per-
column placement of h[r*M - c]) into the channel DFT W[p, m] =
exp(+j*2*pi*m*p/M). The E_r are [M, M] complex constants baked at build
time; the runtime is (P+1) complex matmuls of [K, M] @ [M, M] — pure MXU
food, identical math to `chains.channelizer.channelize_apply` (tested to
float32 round-off).

Derivation: v[k, p] = sum_l h[l*M+p] x[(k-l)*M - p]; x[(k-l)M - p] lands in
X2[k-l, 0] for p=0 and X2[k-l-1, M-p] for p>=1, giving the A_r placement
A_r[0, 0] = h[r*M], A_r[c, M-c] = h[r*M - c] (c >= 1).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.types import F32


def make_channelizer_mats(taps, num_channels: int) -> tuple[np.ndarray, np.ndarray]:
    """Baked E_r planes: returns (Er_real, Er_imag), each [P+1, M, M]."""
    m = num_channels
    h = np.asarray(taps, np.float64)
    t = ((len(h) + m - 1) // m) * m
    h = np.pad(h, (0, t - len(h)))
    p = t // m
    w = np.exp(2j * np.pi * np.outer(np.arange(m), np.arange(m)) / m)  # [p, ch]
    ers, eis = [], []
    for r in range(p + 1):
        a = np.zeros((m, m))
        if r * m < t:
            a[0, 0] = h[r * m]
        for c in range(1, m):
            idx = r * m - c
            if 0 <= idx < t:
                a[c, m - c] = h[idx]
        e = a @ w
        ers.append(e.real.astype(np.float32))
        eis.append(e.imag.astype(np.float32))
    return np.stack(ers), np.stack(eis)


def make_channelize_planes(taps, num_channels: int,
                           precision=jax.lax.Precision.HIGHEST):
    """Build the on-chip bank: (xr, xi) [K*M] planes -> (Yr, Yi) [K, M].

    Output Y[k, m] is channel m, frame k — `chains.channelizer` layout
    transposed (frames on rows feed downstream [K, M] matmuls naturally).
    Rows shifted past the start read zeros (causal from rest); streaming
    callers prepend P rows (P*M samples) of history instead.
    """
    er_np, ei_np = make_channelizer_mats(taps, num_channels)
    p1 = er_np.shape[0]
    m = num_channels

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=F32, precision=precision)

    # One wide matmul instead of P+1 skinny ones: stack the shifted copies
    # horizontally ([K, (P+1)*M]) against the vertically-stacked E matrices
    # ([(P+1)*M, M]) — the [*, (P+1)*M] contraction feeds the MXU properly
    # (a lone [K, M] @ [M, M] with M=64 uses half the systolic rows).
    er_stack = jnp.asarray(er_np.reshape(p1 * m, m))
    ei_stack = jnp.asarray(ei_np.reshape(p1 * m, m))

    def bank(xr: jax.Array, xi: jax.Array) -> tuple[jax.Array, jax.Array]:
        k = xr.shape[-1] // m
        x2r = xr.reshape(k, m)
        x2i = xi.reshape(k, m)

        def shifted(x2):
            cols = [x2]
            for r in range(1, p1):
                cols.append(jnp.concatenate(
                    [jnp.zeros((r, m), F32), x2[:k - r]], axis=0))
            return jnp.concatenate(cols, axis=1)      # [K, (P+1)*M]

        sr = shifted(x2r)
        si = shifted(x2i)
        yr = mm(sr, er_stack) - mm(si, ei_stack)
        yi = mm(sr, ei_stack) + mm(si, er_stack)
        return yr, yi

    return bank


def make_synthesizer_mats(taps, num_channels: int) -> tuple[np.ndarray, np.ndarray]:
    """Synthesis E_l[m, q] = e^{+j*2*pi*m*q/M} * h[l*M + q] * M: [P, M, M]."""
    m = num_channels
    h = np.asarray(taps, np.float64)
    t = ((len(h) + m - 1) // m) * m
    h = np.pad(h, (0, t - len(h)))
    p = t // m
    wc = np.exp(2j * np.pi * np.outer(np.arange(m), np.arange(m)) / m)
    ers, eis = [], []
    for l in range(p):
        e = wc * (h[l * m: (l + 1) * m][None, :]) * m
        ers.append(e.real.astype(np.float32))
        eis.append(e.imag.astype(np.float32))
    return np.stack(ers), np.stack(eis)


def make_synthesize_planes(taps, num_channels: int,
                           precision=jax.lax.Precision.HIGHEST):
    """On-chip synthesis bank: (Yr, Yi) [K, M] frames-x-channels -> wideband
    planes ([K*M], [K*M]).

        x[s*M + q] = M * sum_l h[l*M+q] * (Y @ Wc)[s-l, q]

    — the exact mirror of `make_channelize_planes`: shifted frame copies
    against vertically-stacked E_l matrices, one wide matmul. Matches
    chains.channelizer.synthesize_apply from zero state (tested)."""
    er_np, ei_np = make_synthesizer_mats(taps, num_channels)
    p = er_np.shape[0]
    m = num_channels
    er_stack = jnp.asarray(er_np.reshape(p * m, m))
    ei_stack = jnp.asarray(ei_np.reshape(p * m, m))

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=F32, precision=precision)

    def synth(yr: jax.Array, yi: jax.Array) -> tuple[jax.Array, jax.Array]:
        k = yr.shape[0]

        def shifted(y2):
            cols = [y2]
            for r in range(1, p):
                cols.append(jnp.concatenate(
                    [jnp.zeros((r, m), F32), y2[:k - r]], axis=0))
            return jnp.concatenate(cols, axis=1)      # [K, P*M]

        sr = shifted(yr)
        si = shifted(yi)
        xr = mm(sr, er_stack) - mm(si, ei_stack)      # [K, M] phase chunks
        xi = mm(sr, ei_stack) + mm(si, er_stack)
        return xr.reshape(k * m), xi.reshape(k * m)

    return synth
