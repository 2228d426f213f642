"""Feedforward (open-loop) block-parallel tracking: the serving-rate
alternative to the per-symbol closed-loop scans (round-5 verdict item 9).

chains/tracking_planes.py runs Gardner/Costas per SYMBOL inside a
lax.scan — correct under arbitrary dynamics but latency-bound by
construction (8-35 Ms/s aggregate on-chip, three orders below the
stationary-clock kernels). This module is the classic estimate-then-
correct receiver instead: ALL blocks' parameters are estimated in
parallel (one pass of big tensor ops), the per-symbol timing/phase
trajectories are interpolated, and the correction is applied as one
batched windowed select + derotation:

    matched-filtered planes [C, K]
      -> per-block O&M timing DFT          (reshape + two reductions)
      -> unwrap tau across blocks          (one triangular-matmul cumsum)
      -> per-symbol tau by linear interp   (shifted copies, static
                                            per-slot weights)
      -> fractional symbol pick            (windowed one-hot + lerp)
      -> per-block V&V phase, unwrap, per-symbol interp, derotate
      -> slice

GATHER-FREE BY DESIGN: the first cut used take_along_axis for the pick
and the trajectory interps — measured ~17 ms per gather pair at
[8, 512K] on the chip (lane-axis gathers at wide lanes are pathological;
elementwise on the same shape is 0.43 ms). Every data-dependent access
is now a bounded-window one-hot select (the timing trajectory is
near-diagonal: each symbol's sample lies within a static window `w` of
its nominal slot), and the prefix sums run as one upper-triangular
matmul (cumsum is unimplemented on the axon backend anyway; a lax.scan
over NB blocks costs ~10 us/step through this stack).

Sequential depth: zero scans — two matmul cumsums + wide tensor ops.

Limits (the standard open-loop ones, documented not hidden):
- clock/phase quasi-static over one `block` (estimator bandwidth
  ~1/(2*block) vs the loop's per-symbol bandwidth);
- the BOUNDED forms require the total unwrapped timing excursion within
  one call to fit the static window: |tau - min(tau)| < w - sps samples
  (default w = 4*sps covers ~3 symbol periods of drift). A net ppm
  offset over a long capture needs `ff_psk_demod_ragged` below (per-
  block integer relabeling + validity mask, still zero scans) or the
  ragged closed-loop tier;
- phase is interpolated on the nominal symbol grid (the tau-shifted
  evaluation differs by CFO*tau ~ 1e-3 rad at 100 ppm-class CFOs).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.ops.nco import TWO_PI
from srcdsp_tpu.types import F32

__all__ = ["ff_psk_demod_planes", "ff_fsk_demod_planes",
           "ff_psk_demod_ragged", "ff_fsk_demod_ragged"]


def _unwrap_blocks(vals: jax.Array, period: float) -> jax.Array:
    """[C, NB] wrapped block estimates -> unwrapped (nearest-wrap
    continuation; prefix sum as ONE upper-triangular matmul — the
    supported/fast form of cumsum on this backend)."""
    p = F32(period)
    d = vals[:, 1:] - vals[:, :-1]
    d = d - p * jnp.round(d / p)
    nb1 = d.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb1, nb1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nb1, nb1), 1)
    tri = (rows <= cols).astype(F32)
    cums = jnp.dot(d, tri, precision=jax.lax.Precision.HIGHEST)
    return jnp.concatenate([vals[:, :1], vals[:, :1] + cums], axis=1)


def _interp_to_slots(traj: jax.Array, spb: int) -> jax.Array:
    """Per-block trajectory [C, NB] (values at block centers) -> per-
    symbol values [C, NB*spb] by exact linear interpolation, GATHER-FREE:
    symbol slot s of block b sits at fraction (s + 0.5)/spb of the block,
    i.e. between centers (b-1, b) for the first half and (b, b+1) for
    the second — +-1 shifted copies of the trajectory with STATIC
    per-slot weights (edges clamped)."""
    c, nb = traj.shape
    prev = jnp.concatenate([traj[:, :1], traj[:, :-1]], axis=1)
    nxt = jnp.concatenate([traj[:, 1:], traj[:, -1:]], axis=1)
    # slot fraction relative to the block center, in block units
    f = (np.arange(spb, dtype=np.float32) + 0.5) / spb - 0.5   # [-.5, .5)
    w_prev = np.where(f < 0, -f, 0.0).astype(np.float32)
    w_next = np.where(f > 0, f, 0.0).astype(np.float32)
    w_cur = (1.0 - w_prev - w_next).astype(np.float32)
    out = (prev[:, :, None] * jnp.asarray(w_prev)
           + traj[:, :, None] * jnp.asarray(w_cur)
           + nxt[:, :, None] * jnp.asarray(w_next))            # [C,NB,spb]
    return out.reshape(c, nb * spb)


def _windows(y: jax.Array, sps: int, w: int) -> jax.Array:
    """[C, K] -> [C, K/sps, w]: symbol slot k's window
    y[k*sps : k*sps + w], gather-free (w/sps shifted reshapes)."""
    c, k = y.shape
    ns = k // sps
    m = w // sps
    ypad = jnp.concatenate([y, jnp.zeros((c, w), y.dtype)], axis=-1)
    parts = [ypad[:, i * sps: i * sps + k].reshape(c, ns, sps)
             for i in range(m)]
    return jnp.concatenate(parts, axis=-1)


def ff_fsk_demod_planes(d: jax.Array, sps: int, block: int = 512,
                        window_syms: int = 4):
    """Open-loop tracked binary-FSK slicer on discriminator planes.

    The noncoherent sibling of ff_psk_demod_planes: the timing metric is
    the squared discriminator (the O&M tone survives the square for
    square-pulse FSK; for smooth CPM use longer blocks — the
    timing_forget caveat in the verify skill applies here as block
    choice), there is no carrier stage, and the decision is the sign.

    d: [C, K] discriminator output (cycles/sample, e.g. the fsk_fused /
    fsk_ctaps kernel's d planes or chains/fsk's soft stream BEFORE the
    symbol pick). Returns (bits [C, K//sps] int32, soft [C, K//sps],
    diag). Same gather-free machinery and open-loop limits as the PSK
    form."""
    c, k = d.shape
    if k % block or block % sps:
        raise ValueError(f"K={k} % block={block} or block % sps={sps}")
    nb = k // block
    spb = block // sps
    w = window_syms * sps

    met = (d * d).reshape(c, nb, block)
    n = np.arange(block)
    tc = jnp.asarray(np.cos(TWO_PI * (n % sps) / sps).astype(np.float32))
    ts = jnp.asarray((-np.sin(TWO_PI * (n % sps) / sps)).astype(np.float32))
    cr = jnp.sum(met * tc, axis=-1)
    ci = jnp.sum(met * ts, axis=-1)
    tau_b = jnp.mod(-F32(sps / TWO_PI) * jnp.arctan2(ci, cr), F32(sps))
    tau_u = _unwrap_blocks(tau_b, float(sps))

    base = F32(sps) * jnp.floor(
        jnp.min(tau_u, axis=-1, keepdims=True) / F32(sps))
    tau_k = _interp_to_slots(tau_u, spb) - base
    j = jnp.clip(jnp.floor(tau_k), 0.0, w - 2.0)
    frac = jnp.clip(tau_k - j, 0.0, 1.0)
    ji = j.astype(jnp.int32)
    wd = _windows(d, sps, w)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)
    oh0 = (lane == ji[:, :, None]).astype(F32)
    oh1 = (lane == (ji + 1)[:, :, None]).astype(F32)
    lo = jnp.sum(wd * oh0, axis=-1)
    hi = jnp.sum(wd * oh1, axis=-1)
    soft = lo * (1.0 - frac) + hi * frac
    bits = (soft > 0).astype(jnp.int32)
    return bits, soft, {"tau_blocks": tau_u}


def ff_psk_demod_planes(yr: jax.Array, yi: jax.Array, sps: int,
                        order: int, block: int = 512,
                        offset: float = 0.0, window_syms: int = 4):
    """Open-loop tracked M-PSK demod of matched-filtered planes.

    yr/yi: [C, K] with K % block == 0, block % sps == 0. Returns
    (idx [C, K//sps] int32, (dr, di) derotated soft symbols,
    diag dict with tau/phi block trajectories). `offset` is the
    constellation offset convention of chains.psk; `window_syms` sets
    the pick window w = window_syms*sps (see module-docstring limits).
    """
    c, k = yr.shape
    if k % block or block % sps:
        raise ValueError(f"K={k} % block={block} or block % sps={sps}")
    nb = k // block
    spb = block // sps                    # symbols per block
    w = window_syms * sps

    # --- per-block O&M timing (all blocks at once)
    power = (yr * yr + yi * yi).reshape(c, nb, block)
    n = np.arange(block)
    tc = jnp.asarray(np.cos(TWO_PI * (n % sps) / sps).astype(np.float32))
    ts = jnp.asarray((-np.sin(TWO_PI * (n % sps) / sps)).astype(np.float32))
    cr = jnp.sum(power * tc, axis=-1)
    ci = jnp.sum(power * ts, axis=-1)
    tau_b = jnp.mod(-F32(sps / TWO_PI) * jnp.arctan2(ci, cr), F32(sps))
    tau_u = _unwrap_blocks(tau_b, float(sps))          # [C, NB]

    # --- per-symbol tau on the nominal grid; rebase so the windowed
    # pick sees tau' in [0, w-1). The shift must be a whole number of
    # SYMBOL periods (shifting by arbitrary samples would move the pick
    # off the symbol instants): base = sps * floor(min/sps) relabels
    # symbols by an integer count and nothing else.
    base = F32(sps) * jnp.floor(
        jnp.min(tau_u, axis=-1, keepdims=True) / F32(sps))     # [C, 1]
    tau_k = _interp_to_slots(tau_u, spb) - base        # [C, NS]
    j = jnp.clip(jnp.floor(tau_k), 0.0, w - 2.0)
    frac = jnp.clip(tau_k - j, 0.0, 1.0)
    ji = j.astype(jnp.int32)

    wr = _windows(yr, sps, w)
    wi = _windows(yi, sps, w)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)
    oh0 = (lane == ji[:, :, None]).astype(F32)
    oh1 = (lane == (ji + 1)[:, :, None]).astype(F32)

    def pick(wv):
        lo = jnp.sum(wv * oh0, axis=-1)
        hi = jnp.sum(wv * oh1, axis=-1)
        return lo * (1.0 - frac) + hi * frac

    sr, si = pick(wr), pick(wi)                        # [C, K/sps]

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

    # --- per-symbol phase (nominal grid) and derotation
    phi_k = _interp_to_slots(phi_u, spb)
    cp, sp_ = jnp.cos(phi_k), jnp.sin(phi_k)
    dr = sr * cp + si * sp_                            # s * e^{-j phi}
    di = si * cp - sr * sp_
    idx = jnp.mod(jnp.round(jnp.arctan2(di, dr) * F32(order / TWO_PI)
                            - F32(offset)), order).astype(jnp.int32)
    diag = {"tau_blocks": tau_u, "phi_blocks": phi_u}
    return idx, (dr, di), diag


# ---------------------------------------------------------------------------
# Ragged feedforward: unbounded net-ppm clocks at tensor rates (round 5).
#
# The bounded forms above require the total unwrapped timing excursion to
# fit the static pick window. A sustained clock-rate offset (the 3000-ppm
# fixture class that motivated the closed-loop skip/stuff tier) violates
# that within one serving call. The open-loop fix needs NO skip/stuff
# logic at all: the whole unwrapped trajectory tau(t) is known up front,
# so the number of symbols each block contains (e_b) and the integer
# index of its first symbol (n_b = ceil((b*block - tau_edge_b)/sps)) are
# computed IN ADVANCE, each block's picks are rebased to its own local
# origin (bounded window again), and the output is a static-capacity
# grid [C, NB, spb+extra] with a validity mask i < e_b — exactly the
# tracking.compact_ragged contract the closed-loop ragged tier uses.
# Everything stays gather-free: block slabs with a static lookahead are
# two shifted reshapes, windows are sps-shifted reshapes of the slab,
# picks are bounded one-hot selects.
# ---------------------------------------------------------------------------


def _interp_capacity(traj: jax.Array, spb_cap: int, sps: int,
                     block: int) -> jax.Array:
    """[C, NB] block-center values -> [C, NB, spb_cap] at capacity slot
    centers (block fraction g = (i+0.5)*sps/block - 0.5, clamped to
    [-0.5, 1.0]: slots past the block end reuse the next-center value —
    error bounded by one slot of drift)."""
    prev = jnp.concatenate([traj[:, :1], traj[:, :-1]], axis=1)
    nxt = jnp.concatenate([traj[:, 1:], traj[:, -1:]], axis=1)
    g = (np.arange(spb_cap, dtype=np.float64) + 0.5) * sps / block - 0.5
    g = np.clip(g, -0.5, 1.0).astype(np.float32)
    w_prev = np.where(g < 0, -g, 0.0).astype(np.float32)
    w_next = np.where(g > 0, g, 0.0).astype(np.float32)
    w_cur = (1.0 - w_prev - w_next).astype(np.float32)
    return (prev[:, :, None] * jnp.asarray(w_prev)
            + traj[:, :, None] * jnp.asarray(w_cur)
            + nxt[:, :, None] * jnp.asarray(w_next))


def _block_windows(y: jax.Array, block: int, sps: int, spb_cap: int,
                   w: int) -> jax.Array:
    """[C, K] -> [C, NB, spb_cap, w]: slot i of block b sees
    y[b*block + i*sps : +w], gather-free (block reshape + one-block
    lookahead + sps-shifted reshapes). Requires the lookahead
    L = (spb_cap*sps - block) + w <= block."""
    c, k = y.shape
    nb = k // block
    lk = spb_cap * sps - block + w
    if lk > block:
        raise ValueError(f"lookahead {lk} > block {block}")
    ypad = jnp.concatenate([y[:, block:], jnp.zeros((c, block), y.dtype)],
                           axis=-1)
    base = y.reshape(c, nb, block)
    look = ypad.reshape(c, nb, block)[:, :, :lk]
    slab = jnp.concatenate([base, look], axis=-1)      # [C, NB, block+lk]
    parts = [slab[:, :, r * sps: r * sps + spb_cap * sps]
             .reshape(c, nb, spb_cap, sps) for r in range(w // sps)]
    return jnp.concatenate(parts, axis=-1)


def _ragged_relabel(met: jax.Array, sps: int, block: int, spb_cap: int,
                    w: int):
    """Shared core of the ragged demods (PSK and FSK twins): per-block
    O&M on the timing-metric planes met [C, NB, block] -> unwrapped
    trajectory tau_u [C, NB], per-block emission counts e_b (from the
    block-EDGE trajectory, all known in advance — open loop), bounded
    per-slot pick offsets (ji, frac) [C, NB, spb_cap], and the
    in-count/in-data validity mask."""
    c, nb, block_ = met.shape
    k = nb * block_
    n = np.arange(block_)
    tc = jnp.asarray(np.cos(TWO_PI * (n % sps) / sps).astype(np.float32))
    ts = jnp.asarray((-np.sin(TWO_PI * (n % sps) / sps)).astype(np.float32))
    cr = jnp.sum(met * tc, axis=-1)
    ci = jnp.sum(met * ts, axis=-1)
    tau_b = jnp.mod(-F32(sps / TWO_PI) * jnp.arctan2(ci, cr), F32(sps))
    tau_u = _unwrap_blocks(tau_b, float(sps))

    mid = 0.5 * (tau_u[:, :-1] + tau_u[:, 1:])
    first = (1.5 * tau_u[:, :1] - 0.5 * tau_u[:, 1:2]) if nb > 1 \
        else tau_u[:, :1]
    last = (1.5 * tau_u[:, -1:] - 0.5 * tau_u[:, -2:-1]) if nb > 1 \
        else tau_u[:, -1:]
    t_edge = jnp.concatenate([first, mid, last], axis=1)
    bpos = jnp.asarray((np.arange(nb + 1) * block_).astype(np.float32))
    n_edge = jnp.ceil((bpos[None, :] - t_edge) / F32(sps)).astype(jnp.int32)
    e_b = n_edge[:, 1:] - n_edge[:, :-1]

    tau_cap = _interp_capacity(tau_u, spb_cap, sps, block_)
    db = (n_edge[:, :-1].astype(F32) * F32(sps)
          - jnp.asarray((np.arange(nb) * block_).astype(np.float32))[None, :])
    delta = db[:, :, None] + tau_cap
    j = jnp.clip(jnp.floor(delta), 0.0, w - 2.0)
    frac = jnp.clip(delta - j, 0.0, 1.0)
    ji = j.astype(jnp.int32)

    slot = jax.lax.broadcasted_iota(jnp.int32, (1, nb, spb_cap), 2)
    in_count = slot < e_b[:, :, None]
    gpos = (np.arange(nb)[:, None] * block_
            + np.arange(spb_cap)[None, :] * sps + w)
    in_data = jnp.asarray(gpos <= k)[None, :, :]
    valid = jnp.logical_and(in_count, in_data)
    return tau_u, n_edge, ji, frac, valid


def ff_psk_demod_ragged(yr: jax.Array, yi: jax.Array, sps: int,
                        order: int, block: int = 512, offset: float = 0.0,
                        window_syms: int = 4, capacity_extra: int = 2):
    """Open-loop M-PSK demod under UNBOUNDED sustained clock offsets.

    yr/yi: [C, K] matched-filtered planes, K % block == 0,
    block % sps == 0. Returns (idx [C, NB*spb_cap] int32, (dr, di) soft,
    valid [C, NB*spb_cap] bool, diag). Feed (idx, valid) to
    tracking.compact_ragged — the emitted count per channel follows the
    ACTUAL symbol clock (e.g. +24 symbols at 3000 ppm over 32K samples),
    like the closed-loop skip/stuff tier but with zero scans.

    capacity_extra bounds the per-block surplus: needs
    capacity_extra >= ceil(block*|ppm|_max / sps) + 1 (default 2 covers
    3000 ppm at block <= ~2*sps/3e-3 samples).
    """
    c, k = yr.shape
    if k % block or block % sps:
        raise ValueError(f"K={k} % block={block} or block % sps={sps}")
    nb = k // block
    spb = block // sps
    spb_cap = spb + capacity_extra
    w = window_syms * sps

    # shared core: per-block O&M -> relabeled bounded picks + validity
    # (slot i of block b is global symbol u = n_b + i at sample
    # u*sps + tau, i.e. local position i*sps + delta with
    # delta = n_b*sps - b*block + tau in [0, sps + intra-block drift))
    tau_u, n_edge, ji, frac, valid = _ragged_relabel(
        (yr * yr + yi * yi).reshape(c, nb, block), sps, block, spb_cap, w)

    wr = _block_windows(yr, block, sps, spb_cap, w)
    wi = _block_windows(yi, block, sps, spb_cap, w)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, w), 3)
    oh0 = (lane == ji[:, :, :, None]).astype(F32)
    oh1 = (lane == (ji + 1)[:, :, :, None]).astype(F32)

    def pick(wv):
        lo = jnp.sum(wv * oh0, axis=-1)
        hi = jnp.sum(wv * oh1, axis=-1)
        return lo * (1.0 - frac) + hi * frac

    sr, si = pick(wr), pick(wi)                            # [C, NB, cap]
    maskf = valid.astype(F32)

    # --- per-block V&V carrier phase on masked normalized symbols
    cnt = jnp.sum(maskf, axis=-1, keepdims=True) + F32(1e-6)
    pw = (sr * sr + si * si) * maskf
    scale = jnp.sqrt(jnp.sum(pw, axis=-1, keepdims=True) / cnt + 1e-12)
    nr, ni = sr / scale, si / scale
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
    vr = jnp.sum((pr * co - pi_ * so) * maskf, axis=-1)
    vi = jnp.sum((pr * so + pi_ * co) * maskf, axis=-1)
    phi_b = jnp.arctan2(vi, vr) / order
    phi_u = _unwrap_blocks(phi_b, float(TWO_PI / order))

    phi_cap = _interp_capacity(phi_u, spb_cap, sps, block)
    cp, sp_ = jnp.cos(phi_cap), jnp.sin(phi_cap)
    dr = sr * cp + si * sp_
    di = si * cp - sr * sp_
    idx = jnp.mod(jnp.round(jnp.arctan2(di, dr) * F32(order / TWO_PI)
                            - F32(offset)), order).astype(jnp.int32)
    ns = nb * spb_cap
    diag = {"tau_blocks": tau_u, "phi_blocks": phi_u,
            "count": n_edge[:, -1] - n_edge[:, 0]}
    return (idx.reshape(c, ns), (dr.reshape(c, ns), di.reshape(c, ns)),
            valid.reshape(c, ns), diag)


def ff_fsk_demod_ragged(d: jax.Array, sps: int, block: int = 512,
                        window_syms: int = 4, capacity_extra: int = 2):
    """Open-loop binary-FSK slicer under UNBOUNDED sustained clock
    offsets — the noncoherent twin of ff_psk_demod_ragged (same
    per-block integer relabeling, same compact_ragged contract; the
    timing metric is the squared discriminator and the decision is the
    sign — no carrier stage).

    d: [C, K] discriminator planes. Returns (bits [C, NB*cap] int32,
    soft, valid, diag)."""
    c, k = d.shape
    if k % block or block % sps:
        raise ValueError(f"K={k} % block={block} or block % sps={sps}")
    nb = k // block
    spb = block // sps
    spb_cap = spb + capacity_extra
    w = window_syms * sps

    tau_u, n_edge, ji, frac, valid = _ragged_relabel(
        (d * d).reshape(c, nb, block), sps, block, spb_cap, w)

    wd = _block_windows(d, block, sps, spb_cap, w)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, w), 3)
    oh0 = (lane == ji[:, :, :, None]).astype(F32)
    oh1 = (lane == (ji + 1)[:, :, :, None]).astype(F32)
    lo = jnp.sum(wd * oh0, axis=-1)
    hi = jnp.sum(wd * oh1, axis=-1)
    soft = lo * (1.0 - frac) + hi * frac
    bits = (soft > 0).astype(jnp.int32)
    ns = nb * spb_cap
    diag = {"tau_blocks": tau_u, "count": n_edge[:, -1] - n_edge[:, 0]}
    return (bits.reshape(c, ns), soft.reshape(c, ns),
            valid.reshape(c, ns), diag)
