"""Square-QAM demodulator chain (beyond-parity component).

BASELINE.json's demod scope is FSK/PSK; links that outgrow PSK move to
16/64/256-QAM, so a complete receiver framework owes the QAM path. The
front end (NCO mix -> RRC matched filter + decimate -> O&M symbol timing)
is shared verbatim with chains/psk.py; only carrier recovery and slicing
differ — and both are chosen for their TPU shape (feedforward, block
reductions + elementwise, no scan):

1. **Coarse carrier: 4th-power estimator.** For an axis-aligned square QAM
   the 4th-moment mean E[s^4] is real NEGATIVE (corner points dominate at
   45 deg), so phi = angle(-sum s^4)/4 recovers the carrier modulo pi/2 —
   the same carried circular accumulator as PSK's V&V, one power + one
   reduction per block.
2. **Fine carrier + gain: one decision-directed pass.** Slice the coarse
   output, least-squares fit ONE complex gain g = <y, s_hat>/<|s_hat|^2>
   against the decisions, derotate/rescale, re-slice. Two extra reductions
   and one elementwise multiply — no loop; corrects both residual phase
   (well inside the slicer's pull-in) and constellation scale (QAM slicing
   needs true amplitude, unlike PSK).
3. **Gray slicing as pure arithmetic.** Per-axis level index
   k = clip(round((y/s + (L-1))/2)), Gray code g = k ^ (k >> 1); symbol
   index packs I bits above Q bits. No tables, no gathers — int ops only.

The remaining pi/2 ambiguity is inherent to any blind QAM estimator;
resolve it with the quadrant-differential helpers (`quad_diff_encode` /
`quad_diff_decode`: each symbol's quadrant advances differentially via the
constellation's 90-degree rotation permutation, so a constant unknown
number of pi/2 slips cancels in the decode) or a pilot. Tests pin the tx
phase inside +-pi/4, which the 4th-power estimator resolves exactly, and
separately verify the helpers under a forced pi/2 slip.

Constellation: unit average power, levels (2k - (L-1)) * s per axis with
s = sqrt(3 / (2 (order - 1))), Gray-mapped per axis, index = (gray_I <<
bits_axis) | gray_Q. `qam_modulate` is the matching generator.
"""

from __future__ import annotations

import dataclasses
import math

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from srcdsp_tpu.chains.sync import TimingState, timing_estimate, timing_init, timing_sample
from srcdsp_tpu.ops.fir import FirState, fir_apply, fir_init
from srcdsp_tpu.ops.nco import NcoState, freq_to_word, nco_apply, nco_init
from srcdsp_tpu.ops.window import root_raised_cosine
from srcdsp_tpu.types import CF32, F32

I32 = jnp.int32


def _axis_levels(order: int) -> int:
    l = math.isqrt(order)
    if l * l != order or l < 2 or (l & (l - 1)):
        raise ValueError("order must be a square power of 4 (4, 16, 64, 256)")
    return l


def qam_scale(order: int) -> float:
    """Per-axis lattice half-step s: levels are (2k-(L-1))*s, unit avg power."""
    return math.sqrt(3.0 / (2.0 * (order - 1)))


def qam_constellation(order: int) -> jnp.ndarray:
    """[order] complex64 points indexed by Gray symbol index."""
    l = _axis_levels(order)
    bits_ax = l.bit_length() - 1
    s = qam_scale(order)
    # inverse Gray: binary b from gray g by prefix-xor
    inv = np.zeros(l, np.int64)
    for g in range(l):
        b = g
        sh = 1
        while sh < l.bit_length():
            b ^= b >> sh
            sh <<= 1
        inv[g] = b
    pts = np.empty(order, np.complex64)
    for idx in range(order):
        gi, gq = idx >> bits_ax, idx & (l - 1)
        ki, kq = inv[gi], inv[gq]
        pts[idx] = ((2 * ki - (l - 1)) + 1j * (2 * kq - (l - 1))) * s
    return jnp.asarray(pts)


def qam_slice(y: jax.Array, order: int) -> jax.Array:
    """Nearest-point Gray symbol indices for unit-avg-power symbols y."""
    l = _axis_levels(order)
    bits_ax = l.bit_length() - 1
    s = qam_scale(order)
    ki = jnp.clip(jnp.round((jnp.real(y) / s + (l - 1)) * 0.5), 0, l - 1)
    kq = jnp.clip(jnp.round((jnp.imag(y) / s + (l - 1)) * 0.5), 0, l - 1)
    ki = ki.astype(I32)
    kq = kq.astype(I32)
    gi = jnp.bitwise_xor(ki, ki >> 1)
    gq = jnp.bitwise_xor(kq, kq >> 1)
    return (gi << bits_ax) | gq


def qam_slice_planes(vr: jax.Array, vi: jax.Array, order: int
                     ) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
    """Plane-form twin of qam_slice for the restricted backend: f32
    (re, im) planes -> (Gray indices i32, (shr, shi) nearest-point
    coordinate planes). The level index IS the point coordinate
    ((2k - (l-1))*scale), so s_hat needs no table lookup — the
    on-chip OFDM/SC-FDE tiers' decision-directed stages use it
    directly. One definition keeps the lattice/Gray convention in a
    single place next to qam_slice."""
    l = _axis_levels(order)
    bits_ax = l.bit_length() - 1
    s = float(qam_scale(order))

    def levels(v):
        return jnp.clip(jnp.round((v / jnp.float32(s)
                                   + jnp.float32(l - 1))
                                  * jnp.float32(0.5)),
                        0.0, jnp.float32(l - 1))

    ki = levels(vr)
    kq = levels(vi)
    shr = (2.0 * ki - jnp.float32(l - 1)) * jnp.float32(s)
    shi = (2.0 * kq - jnp.float32(l - 1)) * jnp.float32(s)
    ki = ki.astype(I32)
    kq = kq.astype(I32)
    gi = jnp.bitwise_xor(ki, ki >> 1)
    gq = jnp.bitwise_xor(kq, kq >> 1)
    return (gi << bits_ax) | gq, (shr, shi)


def qam_modulate(key: jax.Array, nsym: int, order: int,
                 channel_shape: tuple = ()) -> tuple[jax.Array, jax.Array]:
    """Random Gray symbol indices + their constellation points."""
    idx = jax.random.randint(key, (*channel_shape, nsym), 0, order)
    return idx, qam_constellation(order)[idx]


def rotation_map(order: int) -> jnp.ndarray:
    """[order] i32: index of each point after a +90 deg rotation.

    Used by the quadrant-differential helpers: a pi/2 carrier slip permutes
    symbol indices by this map (applied k times for k slips).
    """
    pts = np.asarray(qam_constellation(order))
    rot = pts * 1j
    # nearest-point match (exact: rotation permutes the lattice)
    m = np.empty(order, np.int64)
    for i in range(order):
        m[i] = int(np.argmin(np.abs(pts - rot[i])))
    return jnp.asarray(m, I32)


def _quad_tables(order: int) -> tuple[np.ndarray, np.ndarray]:
    """Per symbol index: (rotation count from its first-quadrant
    representative, that representative's index)."""
    pts = np.asarray(qam_constellation(order))
    rm_np = np.asarray(rotation_map(order))
    quad_of = np.empty(order, np.int64)
    rep_of = np.empty(order, np.int64)
    for r in range(order):
        if not (pts[r].real > 0 and pts[r].imag > 0):
            continue
        j = r
        for q in range(4):
            quad_of[j] = q
            rep_of[j] = r
            j = int(rm_np[j])
    return quad_of, rep_of


def _rot_k(rm: jax.Array, rep: jax.Array, k: jax.Array) -> jax.Array:
    """Apply the 90-degree rotation permutation k (0..3) times."""
    r1 = rm[rep]
    r2 = rm[r1]
    r3 = rm[r2]
    stacked = jnp.stack([rep, r1, r2, r3], axis=-1)
    return jnp.take_along_axis(stacked, k[..., None], axis=-1)[..., 0]


def quad_diff_encode(idx: jax.Array, order: int) -> jax.Array:
    """Make the stream invariant to pi/2 slips.

    tx[k] = R^{q[k]}(rep(data[k])) with q[k] = cumsum(quad(data)) mod 4:
    the data symbol's quadrant advances differentially while its
    first-quadrant representative rides along. A constant unknown number
    of pi/2 slips adds to every q[k] equally and cancels in the decode's
    quadrant difference.
    """
    quad_of, rep_of = _quad_tables(order)
    rm = rotation_map(order)
    q = jnp.mod(jnp.cumsum(jnp.asarray(quad_of, I32)[idx], axis=-1), 4)
    return _rot_k(rm, jnp.asarray(rep_of, I32)[idx], q)


def quad_diff_decode(idx: jax.Array, order: int) -> jax.Array:
    """Invert quad_diff_encode from received indices (slips cancel)."""
    quad_of, rep_of = _quad_tables(order)
    rm = rotation_map(order)
    q = jnp.asarray(quad_of, I32)[idx]
    prev = jnp.concatenate([jnp.zeros_like(q[..., :1]), q[..., :-1]], axis=-1)
    dq = jnp.mod(q - prev, 4)
    return _rot_k(rm, jnp.asarray(rep_of, I32)[idx], dq)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QamParams:
    freq_word: jax.Array
    taps: jax.Array
    decim: int = dataclasses.field(metadata=dict(static=True))
    sps: int = dataclasses.field(metadata=dict(static=True))
    order: int = dataclasses.field(metadata=dict(static=True))


class QamState(NamedTuple):
    nco: NcoState
    fir: FirState
    timing: TimingState
    cr_acc: jax.Array      # [...] complex64 4th-power accumulator


def make_qam_params(center_freq: float, decim: int, sps: int, order: int = 16,
                    rrc_beta: float = 0.35, rrc_span: int = 8) -> QamParams:
    taps = root_raised_cosine(decim * sps, rrc_span, beta=rrc_beta)
    _axis_levels(order)
    return QamParams(freq_word=jnp.asarray(freq_to_word(-center_freq)),
                     taps=jnp.asarray(taps), decim=decim, sps=sps, order=order)


def qam_init(params: QamParams, channel_shape: tuple = ()) -> QamState:
    return QamState(
        nco=nco_init(channel_shape),
        fir=fir_init(int(params.taps.shape[-1]), channel_shape),
        timing=timing_init(params.sps, channel_shape, dtype=CF32),
        cr_acc=jnp.zeros(channel_shape, dtype=CF32),
    )


def qam_apply(params: QamParams, state: QamState, x: jax.Array,
              ) -> tuple[QamState, tuple[jax.Array, jax.Array]]:
    """Demodulate one block. x: [..., N], N % (decim*sps) == 0.

    Returns (state, (sym_idx [..., Nsym] i32, soft [..., Nsym] c64)).
    """
    nco_s, mixed = nco_apply(params.freq_word, state.nco, x)
    fir_s, bb = fir_apply(params.taps, state.fir, mixed, decim=params.decim)
    power = (jnp.real(bb) ** 2 + jnp.imag(bb) ** 2).astype(F32)
    acc, tau = timing_estimate(state.timing.acc, power, params.sps)
    t_last, sym = timing_sample(state.timing.last, bb, tau, params.sps)
    # amplitude normalize to unit average power (QAM slicing needs scale)
    scale = jnp.sqrt(jnp.mean(jnp.abs(sym) ** 2, axis=-1, keepdims=True) + 1e-12)
    symn = (sym / scale).astype(CF32)
    # coarse: 4th power (E[s^4] < 0 for square QAM -> angle of -acc)
    c = jnp.sum(symn ** 4, axis=-1)
    acc_new = (F32(0.5) * state.cr_acc + c).astype(CF32)
    phi = jnp.angle(-acc_new) / 4.0
    y0 = (symn * jnp.exp(-1j * phi[..., None])).astype(CF32)
    # fine: one decision-directed complex-gain pass
    s_hat = qam_constellation(params.order)[qam_slice(y0, params.order)]
    num = jnp.sum(y0 * jnp.conj(s_hat), axis=-1, keepdims=True)
    den = jnp.sum(jnp.abs(s_hat) ** 2, axis=-1, keepdims=True) + 1e-12
    g = (num / den).astype(CF32)            # LS fit y0 ~= g * s_hat
    y = (y0 * jnp.conj(g) /
         (jnp.abs(g) ** 2 + 1e-12)).astype(CF32)       # y = y0 / g
    idx = qam_slice(y, params.order)
    new_state = QamState(nco=nco_s, fir=fir_s,
                         timing=TimingState(acc=acc, last=t_last),
                         cr_acc=acc_new)
    return new_state, (idx, y)


def qam_demod_stream(params: QamParams, x: jax.Array, block: int,
                     channel_shape: tuple = ()) -> tuple[jax.Array, jax.Array]:
    """Whole-capture convenience: scan qam_apply over blocks."""
    s = x.shape[-1]
    if s % block != 0:
        raise ValueError(f"capture length {s} not divisible by block {block}")
    nb = s // block
    blocks = jnp.moveaxis(x.reshape(*x.shape[:-1], nb, block), -2, 0)
    _, (idx, soft) = jax.lax.scan(
        lambda st, xb: qam_apply(params, st, xb),
        qam_init(params, channel_shape), blocks)
    idx = jnp.moveaxis(idx, 0, -2).reshape(*x.shape[:-1], -1)
    soft = jnp.moveaxis(soft, 0, -2).reshape(*x.shape[:-1], -1)
    return idx, soft
