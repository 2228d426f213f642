"""On-chip M-PSK demod in plane form (config 5 per-channel demod).

Same restricted-op-set treatment as chains.fsk_planes: matched filter via
the fused Pallas kernel (or any plane source, e.g. the matmul channelizer),
O&M timing from |y|^2, Viterbi&Viterbi carrier phase via repeated complex
squaring + atan2, nearest-offset symbol pick, phase-derotated slicing. No
complex dtype, gather, FFT, or scan anywhere.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.chains.fsk_planes import om_timing_planes
from srcdsp_tpu.ops.nco import TWO_PI
from srcdsp_tpu.types import F32


def _cpow(yr, yi, order: int):
    """(yr + j yi)^order via repeated squaring (order a power of two) or
    repeated multiply. Returns planes."""
    pr, pi = yr, yi
    n = order
    # repeated squaring for powers of two, else linear chain
    if n & (n - 1) == 0:
        while n > 1:
            pr, pi = pr * pr - pi * pi, 2.0 * pr * pi
            n >>= 1
    else:
        br, bi = yr, yi
        for _ in range(order - 1):
            pr, pi = pr * br - pi * bi, pr * bi + pi * br
    return pr, pi


def pick_symbols_c(yr: jax.Array, yi: jax.Array, tau: jax.Array, sps: int,
                   interp: bool = True) -> tuple[jax.Array, jax.Array]:
    """Complex symbol pick at offset tau, gather-free.

    interp=True: linear interpolation between samples floor(tau) and
    floor(tau)+1 (the +1 neighbor comes from a one-sample-left-shifted
    copy, so the symbol-boundary wrap is handled by flat indexing);
    interp=False: nearest-offset one-hot pick.
    """
    c, k = yr.shape
    cols = jnp.asarray(np.arange(sps, dtype=np.float32))[None, None, :]

    def pick(y, off):
        onehot = (cols == off[:, :, None]).astype(F32)
        return jnp.sum(y.reshape(c, k // sps, sps) * onehot, axis=-1)

    if not interp:
        off = jnp.mod(jnp.round(tau), F32(sps))
        return pick(yr, off), pick(yi, off)

    i0 = jnp.floor(tau)
    f = (tau - i0)[:, :]                      # [C, 1]
    i0 = jnp.mod(i0, F32(sps))
    yr1 = jnp.concatenate([yr[:, 1:], yr[:, -1:]], axis=1)
    yi1 = jnp.concatenate([yi[:, 1:], yi[:, -1:]], axis=1)
    sr = (1.0 - f) * pick(yr, i0) + f * pick(yr1, i0)
    si = (1.0 - f) * pick(yi, i0) + f * pick(yi1, i0)
    return sr, si


def psk_demod_bank_stats(yr: jax.Array, yi: jax.Array, stats: jax.Array,
                         sps: int, order: int, offset: float = 0.0,
                         acc=None, interp: bool = True,
                         class_major_b_k: int = 0):
    """Demod tail for the fused bank+stats kernel
    (kernels.bank_pallas.make_bank_psk_kernel).

    yr/yi: [M, K] bank output planes; stats: [G, M, STATS_LANES] in-kernel
    partial sums (timing tone + per-offset V&V). The timing and carrier
    estimates come from the STATS (no full pass over [M, K]); the only
    K-sized work left is the symbol pick + slice. Differences vs
    psk_demod_planes, both intentional: the V&V sum runs over ALL samples
    of the nearest offset class (not interpolated picks), and it is
    unnormalized — a per-channel positive scale cannot move the phase
    angle, only the carried accumulator's inter-block weighting.

    acc: (tim_r, tim_i, cr_r, cr_i) carried accumulators or None. Returns
    (acc, (idx int32 [M, K/sps], (soft_r, soft_i))).
    """
    cch = yr.shape[0]
    if acc is None:
        z = jnp.zeros((cch, 1), F32)
        acc = (z, z, z, z)
    tim_r, tim_i, cr_r, cr_i = acc
    s = jnp.sum(stats, axis=0)                        # [M, STATS_LANES]
    tim_r = F32(0.5) * tim_r + s[:, 0:1]
    tim_i = F32(0.5) * tim_i + s[:, 1:2]
    tau = jnp.mod(-F32(sps / TWO_PI) * jnp.arctan2(tim_i, tim_r), F32(sps))
    # V&V from the nearest offset class's precomputed sums
    o_near = jnp.mod(jnp.round(tau), F32(sps))        # [M, 1]
    cols = jnp.asarray(np.arange(sps, dtype=np.float32))[None, :]
    onehot = (cols == o_near).astype(F32)             # [M, sps]
    vv_r = jnp.sum(s[:, 2:2 + sps] * onehot, axis=-1, keepdims=True)
    vv_i = jnp.sum(s[:, 2 + sps:2 + 2 * sps] * onehot, axis=-1, keepdims=True)
    co = F32(np.cos(-TWO_PI * offset))
    so = F32(np.sin(-TWO_PI * offset))
    cr_r = F32(0.5) * cr_r + (vv_r * co - vv_i * so)
    cr_i = F32(0.5) * cr_i + (vv_r * so + vv_i * co)
    phi = jnp.arctan2(cr_i, cr_r) / order
    if class_major_b_k:
        # the kernel was built with class_major=True and this b_k: each
        # b_k lane block of yr/yi is offset-class-major, so the pick
        # reduces a SECOND-minor sps axis over 128-lane minors — no
        # minor-sps relayout (same trick as kernels.fsk_fused)
        spb = class_major_b_k // sps
        oh = (jnp.asarray(np.arange(sps, dtype=np.float32))[None, :]
              == o_near).astype(F32)[:, None, :, None]   # [M, 1, sps, 1]
        y4r = yr.reshape(cch, -1, sps, spb)
        y4i = yi.reshape(cch, -1, sps, spb)
        sr = jnp.sum(y4r * oh, axis=2).reshape(cch, -1)
        si = jnp.sum(y4i * oh, axis=2).reshape(cch, -1)
    else:
        # interp=False: nearest-offset pick — halves the remaining [M, K]
        # tail (one one-hot reduce instead of two over shifted copies); at
        # sps >= 4 the eye is wide enough that SER stays 0 on the fixtures
        sr, si = pick_symbols_c(yr, yi, tau, sps, interp=interp)
    cp = jnp.cos(phi)
    sp = jnp.sin(phi)
    dr = sr * cp + si * sp          # s * exp(-j phi)
    di = si * cp - sr * sp
    idx = jnp.mod(jnp.round(jnp.arctan2(di, dr) * F32(order / TWO_PI)
                            - F32(offset)), order).astype(jnp.int32)
    return (tim_r, tim_i, cr_r, cr_i), (idx, (dr, di))


def psk_demod_planes(yr: jax.Array, yi: jax.Array, sps: int, order: int,
                     tone_cos, tone_sin, offset: float = 0.0,
                     acc=None):
    """Demodulate matched-filtered baseband planes [C, K] -> indices.

    acc: (tim_r, tim_i, cr_r, cr_i) carried accumulators or None. Returns
    (acc, (idx int32 [C, K/sps], (soft_r, soft_i))).
    """
    cch = yr.shape[0]
    if acc is None:
        z = jnp.zeros((cch, 1), F32)
        acc = (z, z, z, z)
    tim_r, tim_i, cr_r, cr_i = acc
    power = yr * yr + yi * yi
    tau, tim_r, tim_i = om_timing_planes(power, tone_cos, tone_sin,
                                         tim_r, tim_i, sps)
    sr, si = pick_symbols_c(yr, yi, tau, sps)
    # normalize so the M-th power doesn't overweight amplitude outliers
    scale = jnp.sqrt(jnp.mean(sr * sr + si * si, axis=-1, keepdims=True) + 1e-12)
    sr = sr / scale
    si = si / scale
    # V&V: angle(sum s^M * e^{-j 2 pi offset}) / M with carried accumulator
    pr, pi = _cpow(sr, si, order)
    co = F32(np.cos(-TWO_PI * offset))
    so = F32(np.sin(-TWO_PI * offset))
    vr = jnp.sum(pr * co - pi * so, axis=-1, keepdims=True)
    vi = jnp.sum(pr * so + pi * co, axis=-1, keepdims=True)
    cr_r = F32(0.5) * cr_r + vr
    cr_i = F32(0.5) * cr_i + vi
    phi = jnp.arctan2(cr_i, cr_r) / order
    cp = jnp.cos(phi)
    sp = jnp.sin(phi)
    dr = sr * cp + si * sp          # s * exp(-j phi)
    di = si * cp - sr * sp
    idx = jnp.mod(jnp.round(jnp.arctan2(di, dr) * F32(order / TWO_PI)
                            - F32(offset)), order).astype(jnp.int32)
    return (tim_r, tim_i, cr_r, cr_i), (idx, (dr, di))
