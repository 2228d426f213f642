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

    # One single matmul for the whole complex bank: shifted copies of BOTH
    # planes stacked horizontally ([K, 2L], L=(P+1)*M) against the combined
    # complex-arithmetic matrix [[Er | Ei], [-Ei | Er]] ([2L, 2M]) — the
    # output [K, 2M] is [Yr | Yi]. 2M columns fill the MXU's 128-wide output
    # for M=64 (four separate [.., M] matmuls each used half), and the wide
    # contraction dim feeds the systolic rows.
    er_s = er_np.reshape(p1 * m, m)
    ei_s = ei_np.reshape(p1 * m, m)
    e_comb = jnp.asarray(np.block([[er_s, ei_s], [-ei_s, er_s]]))

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

        ss = jnp.concatenate([shifted(x2r), shifted(x2i)], axis=1)  # [K, 2L]
        y = mm(ss, e_comb)                                          # [K, 2M]
        return y[:, :m], y[:, m:]

    return bank


def make_channelizer_os2_mats(taps, num_channels: int
                              ) -> tuple[np.ndarray, np.ndarray]:
    """E_r for the 2x-oversampled bank: [R, M/2, M] planes.

    Frames advance hop = M/2 samples, so with X2 = x reshaped [K2, hop],
    sample x[k*hop - (l*M + p)] lands in row k-r, where

        p = 0:          r = 2l,   col 0
        1 <= p < hop:   r = 2l+1, col hop-p
        p = hop:        r = 2l+1, col 0
        hop < p < M:    r = 2l+2, col 2*hop-p

    giving placement matrices A_r[col, p] folded with the channel DFT.
    """
    m = num_channels
    hop = m // 2
    h = np.asarray(taps, np.float64)
    t = ((len(h) + m - 1) // m) * m
    hp = np.pad(h, (0, t - len(h)))
    p_taps = t // m
    w = np.exp(2j * np.pi * np.outer(np.arange(m), np.arange(m)) / m)
    r_max = 2 * p_taps + 1
    ers, eis = [], []
    for r in range(r_max):
        a = np.zeros((hop, m))
        if r % 2 == 0:
            l = r // 2
            if l * m < t:
                a[0, 0] = hp[l * m]
            if r >= 2:
                l2 = (r - 2) // 2
                for c in range(1, hop):
                    k = l2 * m + m - c
                    if 0 <= k < t:
                        a[c, m - c] = hp[k]
        else:
            l = (r - 1) // 2
            k = l * m + hop
            if k < t:
                a[0, hop] = hp[k]
            for c in range(1, hop):
                k = l * m + hop - c
                if 0 <= k < t:
                    a[c, hop - c] = hp[k]
        e = a @ w   # A_r [hop, p] folded with W[p, ch]
        ers.append(e.real.astype(np.float32))
        eis.append(e.imag.astype(np.float32))
    return np.stack(ers), np.stack(eis)


def make_channelize_os2_planes(taps, num_channels: int,
                               precision=jax.lax.Precision.HIGHEST):
    """On-chip 2x-oversampled analysis: (xr, xi) [K2*hop] -> (Yr, Yi) [K2, M]
    with frame rate 2*fs/M. Matches chains.channelizer.channelize_os2_full
    (frames on rows; channel m = column m) including the (-1)^{m*k} parity
    twiddle."""
    er_np, ei_np = make_channelizer_os2_mats(taps, num_channels)
    r_max = er_np.shape[0]
    m = num_channels
    hop = m // 2
    er_stack = jnp.asarray(er_np.reshape(r_max * hop, m))
    ei_stack = jnp.asarray(ei_np.reshape(r_max * hop, m))
    # parity twiddle rows: [2, M] pattern (+1 row, alternate-sign row)
    tw2 = np.ones((2, m), np.float32)
    tw2[1, 1::2] = -1.0
    tw2 = jnp.asarray(tw2)

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=F32, precision=precision)

    def bank(xr: jax.Array, xi: jax.Array) -> tuple[jax.Array, jax.Array]:
        k = xr.shape[-1] // hop
        x2r = xr.reshape(k, hop)
        x2i = xi.reshape(k, hop)

        def shifted(x2):
            cols = [x2]
            for r in range(1, r_max):
                cols.append(jnp.concatenate(
                    [jnp.zeros((r, hop), F32), x2[:k - r]], axis=0))
            return jnp.concatenate(cols, axis=1)

        sr = shifted(x2r)
        si = shifted(x2i)
        yr = mm(sr, er_stack) - mm(si, ei_stack)
        yi = mm(sr, ei_stack) + mm(si, er_stack)
        tw = jnp.tile(tw2, (k // 2, 1))
        return yr * tw, yi * tw

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
