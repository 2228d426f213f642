"""FRESH filtering in plane form — the on-chip serving tier of
ops/fresh.py, as ONE MXU matmul per conj-group plus a phasor epilogue.

Layout lessons measured on hardware (bench/fresh_onchip.py):
  [1, N] shifted-MAC          62 Ms/s  (single-sublane x huge-lane —
                                        the pathological VPU regime)
  framed [NT, stride] MAC     99 Ms/s  (full sublanes, still VPU-bound:
                                        B*taps elementwise FMAs +
                                        B transcendental rotations)
  framed banded MATMUL    774-866 Ms/s (this version: 11-12 TFLOP/s —
                                        the 6-pass f32 HIGHEST matmul
                                        ceiling; chip == CPU, SINR
                                        identical to the complex tier)

The fold: with frames fr[J, r] = x[n0 + J*s + r] and a branch rotator
rot_b[m] = e^{j 2 pi alpha_b m}, the branch output is

    y_b[J*s + k] = rot_b[n0 + J*s] * (fr_xx @ G_b)[J, k],
    G_b[r, k]    = w_b[r - k] * rot_b[r]           (banded, r-k in [0,T))

— the tap window AND the intra-row rotation live in a constant matrix
(the complex-taps trick yet again), leaving only a per-(row, branch)
phasor epilogue. Branches concatenate along columns into one
[span, B*s] operand per conj-group, so the whole filter is 8 real
matmuls + one [NT, B]-phasor combine. Phases split exactly in u32
word arithmetic (rot[n0 + J*s + r] = rot[n0 + J*s] * rot[r]), so the
`n0` phase-continuity contract costs nothing.

stride=128 keeps the band dense-ish (span/stride = 1.25 duplication,
25% zero-pad waste) — the X52 producer-pre-framed geometry applied to
a filter bank. Matches `fresh_apply` up to float association; gated
at equal SINR in tests and chip-vs-CPU in the probe.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.kernels.mixfir_preframed import frame_planes
from srcdsp_tpu.ops.fresh import FreshFilter
from srcdsp_tpu.ops.nco import TWO_PI, _INV_SCALE, freq_to_word
from srcdsp_tpu.types import F32

U32 = jnp.uint32

__all__ = ["make_fresh_planes"]


def make_fresh_planes(f: FreshFilter, stride: int = 128,
                      precision=jax.lax.Precision.HIGHEST):
    """Bake a FreshFilter into the framed matmul apply:

        fn(xr, xi, n0) -> (yr, yi)   planes [1, N + hist] -> [1, N]

    with N % stride == 0 and hist = padded_taps - 1 LOOKAHEAD samples
    appended (y[n] needs x[n .. n+taps-1]); hist must divide stride
    (taps are zero-padded up to that geometry). n0 (static int) is the
    global index of x[0]. Output n estimates d[n0 + n + taps - 1 -
    delay], exactly like `fresh_apply`."""
    if f.taps > stride + 1:
        raise ValueError(f"taps {f.taps} cannot pad to a divisor of "
                         f"stride {stride}; raise stride")
    tp = f.taps
    while (tp - 1) <= 0 or stride % (tp - 1):
        tp += 1
    hist = tp - 1
    span = stride + hist
    nb = len(f.branches)
    w = np.zeros((nb, tp), np.complex64)
    w[:, : f.taps] = np.asarray(f.weights).reshape(nb, f.taps)
    dwords = np.asarray([int(freq_to_word(br.alpha)) & 0xFFFFFFFF
                         for br in f.branches], np.uint64)
    groups = {}
    for flag in (False, True):
        idx = [b for b in range(nb) if f.branches[b].conj == flag]
        if not idx:
            continue
        g = np.zeros((span, len(idx) * stride), np.complex64)
        for j, b in enumerate(idx):
            # intra-row rotator at LOCAL index r (u32-exact phase split)
            ph = 2 * np.pi * ((dwords[b] * np.arange(span, dtype=np.uint64))
                              % (1 << 32)).astype(np.float64) / (1 << 32)
            rot = np.exp(1j * ph)
            for k in range(stride):
                t = np.arange(tp)
                g[k + t, j * stride + k] = w[b] * rot[k + t]
        groups[flag] = (idx, jnp.asarray(g.real.astype(np.float32)),
                        jnp.asarray(g.imag.astype(np.float32)))

    def fn(xr: jax.Array, xi: jax.Array, n0: int = 0):
        n = xr.shape[-1] - hist
        if n % stride:
            raise ValueError(f"N={n} not a multiple of stride {stride}")
        nt = n // stride
        fr_r = frame_planes(xr, stride, span).reshape(nt, span)
        fr_i = frame_planes(xi, stride, span).reshape(nt, span)
        row = jax.lax.broadcasted_iota(U32, (nt, 1), 0)
        accr = jnp.zeros((nt, stride), F32)
        acci = jnp.zeros((nt, stride), F32)
        for flag, (idx, gr, gi) in groups.items():
            sgn = F32(-1.0) if flag else F32(1.0)
            mr = (jnp.dot(fr_r, gr, precision=precision)
                  - sgn * jnp.dot(fr_i, gi, precision=precision))
            mi = (jnp.dot(fr_r, gi, precision=precision)
                  + sgn * jnp.dot(fr_i, gr, precision=precision))
            mr = mr.reshape(nt, len(idx), stride)
            mi = mi.reshape(nt, len(idx), stride)
            # per-(row, branch) phasor at global index n0 + J*stride
            w0 = np.asarray(
                [(int(n0) * int(d)) % (1 << 32) for d in
                 (dwords[b] for b in idx)], np.uint32)[None, :]
            dw = np.asarray([(int(dwords[b]) * stride) % (1 << 32)
                             for b in idx], np.uint32)[None, :]
            ph = (jnp.asarray(w0) + row * jnp.asarray(dw)) \
                .astype(F32) * F32(TWO_PI * _INV_SCALE)
            c, s = jnp.cos(ph)[:, :, None], jnp.sin(ph)[:, :, None]
            accr = accr + jnp.sum(mr * c - mi * s, axis=1)
            acci = acci + jnp.sum(mr * s + mi * c, axis=1)
        return accr.reshape(1, n), acci.reshape(1, n)

    fn.hist = hist          # callers size input as [1, N + fn.hist]
    fn.stride = stride
    fn.taps_padded = tp
    return fn
