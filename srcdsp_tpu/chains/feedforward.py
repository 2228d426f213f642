"""Feedforward (open-loop) block-parallel tracking: the serving-rate
alternative to the per-symbol closed-loop scans (round-5 verdict item 9).

chains/tracking_planes.py runs Gardner/Costas per SYMBOL inside a
lax.scan — correct under arbitrary dynamics but latency-bound by
construction (8-35 Ms/s aggregate on-chip, three orders below the
stationary-clock kernels). This module is the classic estimate-then-
correct receiver instead: ALL blocks' parameters are estimated in
parallel (one pass of big tensor ops), the per-sample timing/phase
trajectories are interpolated, and the correction is applied as one
batched fractional-delay gather + derotation:

    matched-filtered planes [C, K]
      -> per-block O&M timing DFT          (reshape + two reductions)
      -> unwrap tau across blocks          (tiny scan over NB blocks)
      -> per-symbol tau by linear interp   (elementwise)
      -> fractional symbol pick            (take_along_axis + lerp)
      -> per-block V&V phase, unwrap, per-symbol interp, derotate
      -> slice

Everything is a wide tensor op except two O(NB) unwrap scans (NB =
K/block, typically 10^2) — the sequential depth collapses from K/sps
symbol steps to NB block steps. The tradeoff is the standard open-loop
one: the clock/phase must be quasi-static over one `block` (bandwidth
~1/(2*block) vs the loop's ~loop-bw/symbol); for faster dynamics,
shrink `block` (estimator noise grows) or fall back to the closed-loop
tier. Gathers in the correction are fence-green on the chip
(GATHER_FENCE_r05: take_along_axis green to 16384 lanes).

Ambiguities: timing is estimated mod sps and unwrapped by nearest-wrap
across blocks; phase mod 2*pi/order likewise. A residual CFO appears
as a phase ramp the per-block V&V track absorbs (within the same
quasi-static limit); coarse CFO removal belongs upstream (ops/afc.py).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.ops.nco import TWO_PI
from srcdsp_tpu.types import F32

__all__ = ["ff_psk_demod_planes"]


def _unwrap_blocks(vals: jax.Array, period: float) -> jax.Array:
    """[C, NB] wrapped block estimates -> unwrapped (nearest-wrap
    continuation, cumulative via a tiny scan over the block axis)."""
    p = F32(period)
    d = vals[:, 1:] - vals[:, :-1]
    d = d - p * jnp.round(d / p)

    def step(carry, dv):
        carry = carry + dv
        return carry, carry

    _, cums = jax.lax.scan(step, jnp.zeros(vals.shape[0], F32), d.T)
    return jnp.concatenate([vals[:, :1], vals[:, :1] + cums.T], axis=1)


def _interp_at(traj: jax.Array, centers_step: float, pos: jax.Array
               ) -> jax.Array:
    """Linearly interpolate per-block trajectory traj [C, NB] (samples at
    block centers spaced `centers_step`, first at centers_step/2) at
    positions pos [C, M] (samples), clamped at the ends."""
    nb = traj.shape[1]
    f = pos / F32(centers_step) - F32(0.5)
    f = jnp.clip(f, 0.0, nb - 1.0)
    i0 = jnp.floor(f)
    frac = f - i0
    i0 = i0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, nb - 1)
    lo = jnp.take_along_axis(traj, i0, axis=-1)
    hi = jnp.take_along_axis(traj, i1, axis=-1)
    return lo * (1.0 - frac) + hi * frac


def ff_psk_demod_planes(yr: jax.Array, yi: jax.Array, sps: int,
                        order: int, block: int = 512,
                        offset: float = 0.0):
    """Open-loop tracked M-PSK demod of matched-filtered planes.

    yr/yi: [C, K] with K % block == 0, block % sps == 0. Returns
    (idx [C, K//sps] int32, (dr, di) derotated soft symbols,
    diag dict with tau/phi block trajectories). `offset` is the
    constellation offset convention of chains.psk.
    """
    c, k = yr.shape
    if k % block or block % sps:
        raise ValueError(f"K={k} % block={block} or block % sps={sps}")
    nb = k // block
    spb = block // sps                    # symbols per block

    # --- per-block O&M timing (all blocks at once)
    power = (yr * yr + yi * yi).reshape(c, nb, block)
    n = np.arange(block)
    tc = jnp.asarray(np.cos(TWO_PI * (n % sps) / sps).astype(np.float32))
    ts = jnp.asarray((-np.sin(TWO_PI * (n % sps) / sps)).astype(np.float32))
    cr = jnp.sum(power * tc, axis=-1)
    ci = jnp.sum(power * ts, axis=-1)
    tau_b = jnp.mod(-F32(sps / TWO_PI) * jnp.arctan2(ci, cr), F32(sps))
    tau_u = _unwrap_blocks(tau_b, float(sps))          # [C, NB]

    # --- per-symbol timing: positions k*sps + tau interpolated there
    ks = jnp.asarray((np.arange(k // sps) * sps).astype(np.float32))
    pos0 = jnp.broadcast_to(ks[None, :], (c, k // sps))
    tau_k = _interp_at(tau_u, float(block), pos0)
    p = pos0 + tau_k
    i0 = jnp.clip(jnp.floor(p), 0.0, k - 2.0).astype(jnp.int32)
    frac = p - i0.astype(F32)
    i1 = i0 + 1

    def lerp(y):
        lo = jnp.take_along_axis(y, i0, axis=-1)
        hi = jnp.take_along_axis(y, i1, axis=-1)
        return lo * (1.0 - frac) + hi * frac

    sr, si = lerp(yr), lerp(yi)                        # [C, K/sps]

    # --- per-block V&V carrier phase on normalized symbols
    sb_r = sr.reshape(c, nb, spb)
    sb_i = si.reshape(c, nb, spb)
    scale = jnp.sqrt(jnp.mean(sb_r * sb_r + sb_i * sb_i, axis=-1,
                              keepdims=True) + 1e-12)
    nr, ni = sb_r / scale, sb_i / scale
    pr, pi_ = nr, ni
    m = order
    if m & (m - 1) == 0:
        while m > 1:
            pr, pi_ = pr * pr - pi_ * pi_, 2.0 * pr * pi_
            m >>= 1
    else:
        br, bi = nr, ni
        for _ in range(order - 1):
            pr, pi_ = pr * br - pi_ * bi, pr * bi + pi_ * br
    co = F32(np.cos(-TWO_PI * offset))
    so = F32(np.sin(-TWO_PI * offset))
    vr = jnp.sum(pr * co - pi_ * so, axis=-1)
    vi = jnp.sum(pr * so + pi_ * co, axis=-1)
    phi_b = jnp.arctan2(vi, vr) / order                # [C, NB]
    phi_u = _unwrap_blocks(phi_b, float(TWO_PI / order))

    # --- per-symbol phase and derotation
    phi_k = _interp_at(phi_u, float(block), p)
    cp, sp_ = jnp.cos(phi_k), jnp.sin(phi_k)
    dr = sr * cp + si * sp_                            # s * e^{-j phi}
    di = si * cp - sr * sp_
    idx = jnp.mod(jnp.round(jnp.arctan2(di, dr) * F32(order / TWO_PI)
                            - F32(offset)), order).astype(jnp.int32)
    diag = {"tau_blocks": tau_u, "phi_blocks": phi_u}
    return idx, (dr, di), diag
