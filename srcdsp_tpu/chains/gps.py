"""GPS C/A code generation + acquisition (beyond parity — builds on the
Gold-code machinery of chains/dsss.py X47; SURVEY.md C7/X15 class).

The C/A coarse-acquisition problem is a 2-D search (code phase x
Doppler) that maps perfectly onto the MXU: every Doppler hypothesis is
a derotation of the same millisecond blocks, and ALL code phases at
once are one matmul against the sampled-code all-shifts matrix (the
dsss_acquire trick at N = 1023*sps). Noncoherent accumulation over
milliseconds makes the metric immune to the 50-bps nav-data sign flips;
fine Doppler comes from the phase slope of the per-ms coherent
correlators (squared first, so bit flips cancel), fine code phase from
parabolic interpolation of the metric peak.

Code generator: the published C/A construction — G1 = x^10 + x^3 + 1
(output tap 10), G2 = x^10 + x^9 + x^8 + x^6 + x^3 + x^2 + 1 with the
per-PRN two-tap phase selector; chips in {+1, -1}, period 1023. The
generator is an independent bit-loop twin of the gf2/dsss LFSR
machinery (deliberately NOT built on pn_msequence, so the family
property test cross-checks two implementations).

Analysis tier (host/standard backend, like blindscan and ops.cyclo):
acquisition is a capture-analysis stage, not the 30 Gs/s serving path.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["ca_code", "sample_ca", "GpsAcq", "make_gps_acq",
           "acquire_ca", "acquire_ca_planes", "fine_acquire",
           "track_ca", "nav_preamble_detect", "NAV_PREAMBLE"]

# Per-PRN G2 phase-select taps (1-based), PRN 1..32 — the published
# C/A assignment table.
_G2_TAPS = {
    1: (2, 6), 2: (3, 7), 3: (4, 8), 4: (5, 9), 5: (1, 9), 6: (2, 10),
    7: (1, 8), 8: (2, 9), 9: (3, 10), 10: (2, 3), 11: (3, 4),
    12: (5, 6), 13: (6, 7), 14: (7, 8), 15: (8, 9), 16: (9, 10),
    17: (1, 4), 18: (2, 5), 19: (3, 6), 20: (4, 7), 21: (5, 8),
    22: (6, 9), 23: (1, 3), 24: (4, 6), 25: (5, 7), 26: (6, 8),
    27: (7, 9), 28: (8, 10), 29: (1, 6), 30: (2, 7), 31: (3, 8),
    32: (4, 9),
}


def ca_code(prn: int) -> np.ndarray:
    """C/A code for PRN 1..32: [1023] chips in {+1.0, -1.0}
    (bit 0 -> +1, bit 1 -> -1, the dsss sign convention)."""
    if prn not in _G2_TAPS:
        raise ValueError(f"PRN must be 1..32, got {prn}")
    t1, t2 = _G2_TAPS[prn]
    g1 = [1] * 10
    g2 = [1] * 10
    out = []
    for _ in range(1023):
        out.append(g1[9] ^ (g2[t1 - 1] ^ g2[t2 - 1]))
        f1 = g1[2] ^ g1[9]                        # x^10 + x^3 + 1
        f2 = (g2[1] ^ g2[2] ^ g2[5] ^ g2[7]       # x^10+x^9+x^8+x^6
              ^ g2[8] ^ g2[9])                    # +x^3+x^2+1
        g1 = [f1] + g1[:9]
        g2 = [f2] + g2[:9]
    return (1.0 - 2.0 * np.asarray(out, np.float32)).astype(np.float32)


def sample_ca(code: np.ndarray, sps: int) -> np.ndarray:
    """[1023] chips -> [1023*sps] sample-rate replica (integer samples
    per chip; rectangular chip pulse)."""
    return np.repeat(np.asarray(code, np.float32), sps)


class GpsAcq(NamedTuple):
    shifts_t: jax.Array     # [N, N] column p = replica delayed p samples
    n: int                  # 1023 * sps
    sps: int
    prn: int


def make_gps_acq(prn: int, sps: int = 2) -> GpsAcq:
    """Build the all-shifts acquisition operator for one PRN.

    Column p of shifts_t is the sampled replica delayed by p samples, so
    (x_block @ shifts_t)[p] is the coherent correlation against a signal
    whose code period starts p samples into the block."""
    cs = sample_ca(ca_code(prn), sps)
    n = cs.size
    sh = np.stack([np.roll(cs, p) for p in range(n)], axis=1)
    return GpsAcq(shifts_t=jnp.asarray(sh), n=n, sps=sps, prn=prn)


def acquire_ca(acq: GpsAcq, x: jax.Array, dopplers) -> dict:
    """2-D C/A search: noncoherent-over-ms, all code phases per matmul.

    x: [NB*N] complex baseband (NB whole code periods; NB >= 2
    recommended). dopplers: array of normalized frequencies
    (cycles/sample) to test. Returns dict with:
      metric   [D, N] noncoherent power sums,
      peak     (d_idx, p_idx), ratio peak/median (detection statistic),
      corr     [NB] complex per-ms correlators at the peak cell (feed to
               fine_acquire).
    """
    n = acq.n
    nb = x.shape[-1] // n
    xb = x[: nb * n].reshape(nb, n)
    dop = jnp.asarray(np.asarray(dopplers, np.float32))
    t = jnp.arange(n, dtype=jnp.float32)
    # block-coherent phase must be continuous across blocks: e^{-j2pi f
    # (b*N + t)} factors into a per-block constant that |.|^2 kills, so
    # the in-block ramp alone is exact for the noncoherent metric
    rot = jnp.exp(-2j * jnp.pi * dop[:, None] * t[None, :])
    z = (xb[None, :, :] * rot[:, None, :].astype(jnp.complex64)
         ) @ acq.shifts_t.astype(jnp.complex64)          # [D, NB, N]
    metric = jnp.sum(jnp.abs(z) ** 2, axis=1)            # [D, N]
    flat = jnp.argmax(metric)
    d_idx = flat // n
    p_idx = flat % n
    ratio = metric[d_idx, p_idx] / jnp.median(metric)
    return {"metric": metric, "d_idx": d_idx, "p_idx": p_idx,
            "ratio": ratio, "corr": z[d_idx, :, p_idx],
            "doppler": dop[d_idx]}


def fine_acquire(acq: GpsAcq, res: dict) -> dict:
    """Refine the coarse cell: sub-sample code phase by parabolic
    interpolation of the metric row, fine Doppler from the per-ms
    correlator phase slope (products squared first, so 50-bps nav-bit
    sign flips between milliseconds cancel; the /2 halves the angle
    back). The measured phase gives the TRUE Doppler modulo 1/(2N)
    cycles/sample; the hypothesis phase 2*pi*f_hyp*N is subtracted mod
    pi before unwrapping, so ANY doppler grid works (on- or off- the
    1/(2N) bin lattice) — the residual must just be within +-1/(4N)
    of the winning hypothesis (half a 500 Hz bin at 1 ms blocks)."""
    n = acq.n
    m = res["metric"][res["d_idx"]]
    p = res["p_idx"]
    ym = m[(p - 1) % n]
    y0 = m[p]
    yp = m[(p + 1) % n]
    denom = ym - 2 * y0 + yp
    frac = jnp.where(jnp.abs(denom) > 1e-20,
                     0.5 * (ym - yp) / denom, 0.0)
    if "corr" in res:
        z = res["corr"]
    else:                                  # plane-tier result
        zr, zi = res["corr_planes"]
        z = zr + 1j * zi
    prod = (z[1:] * jnp.conj(z[:-1])) ** 2
    # angle/2 = 2*pi*f_true*N mod pi; subtract the hypothesis phase and
    # wrap the residual to (-pi/2, pi/2]
    ph = jnp.angle(jnp.sum(prod)) / 2.0
    hyp = 2.0 * jnp.pi * res["doppler"] * n
    derr = jnp.mod(ph - hyp + jnp.pi / 2, jnp.pi) - jnp.pi / 2
    return {"code_phase": (res["p_idx"].astype(jnp.float32) + frac),
            "doppler": res["doppler"] + derr / (2 * jnp.pi * n)}


def acquire_ca_planes(acq: GpsAcq, xr: jax.Array, xi: jax.Array,
                      dopplers) -> dict:
    """Plane-form 2-D search (the ON-CHIP tier): identical math to
    acquire_ca with no complex dtype anywhere — the replica shifts
    matrix is REAL, so each Doppler hypothesis is one derotation
    (4 elementwise products) and the correlation is TWO real matmuls
    [D*NB, N] @ [N, N]. Runs on the restricted TPU backend; peak cell
    matches acquire_ca exactly (probe-gated).

    xr/xi: [NB*N] f32 planes. Returns the acquire_ca dict with the
    per-ms correlators as a plane pair under "corr_planes";
    fine_acquire accepts either form (it assembles the complex
    correlators host-side — fine refinement is analysis-tier)."""
    n = acq.n
    nb = xr.shape[-1] // n
    xbr = xr[: nb * n].reshape(1, nb, n)
    xbi = xi[: nb * n].reshape(1, nb, n)
    dop = jnp.asarray(np.asarray(dopplers, np.float32))
    d = dop.shape[0]
    t = jnp.arange(n, dtype=jnp.float32)
    ang = 2.0 * jnp.pi * dop[:, None] * t[None, :]
    c = jnp.cos(ang)[:, None, :]               # [D, 1, N]
    s = jnp.sin(ang)[:, None, :]
    # (xr + j xi) * e^{-j ang}
    dr = (xbr * c + xbi * s).reshape(d * nb, n)
    di = (xbi * c - xbr * s).reshape(d * nb, n)
    sh = acq.shifts_t
    zr = jnp.dot(dr, sh, precision=jax.lax.Precision.DEFAULT)
    zi = jnp.dot(di, sh, precision=jax.lax.Precision.DEFAULT)
    metric = jnp.sum((zr * zr + zi * zi).reshape(d, nb, n), axis=1)
    flat = jnp.argmax(metric)
    d_idx = flat // n
    p_idx = flat % n
    ratio = metric[d_idx, p_idx] / jnp.median(metric)
    zr3 = zr.reshape(d, nb, n)
    zi3 = zi.reshape(d, nb, n)
    return {"metric": metric, "d_idx": d_idx, "p_idx": p_idx,
            "ratio": ratio, "doppler": dop[d_idx],
            "corr_planes": (zr3[d_idx, :, p_idx], zi3[d_idx, :, p_idx])}


def track_ca(acq: GpsAcq, x: jax.Array, res: dict, fine: dict,
             nav_rate_ms: int = 20, code_doppler: float = 0.0) -> dict:
    """Feedforward post-acquisition tracking + nav-bit extraction.

    Open-loop (the chains/feedforward.py philosophy): with the
    acquisition's code phase and fine Doppler in hand, every
    millisecond's prompt correlator is computed AT ONCE — wipe the
    carrier with the fine-Doppler ramp, correlate each ms block against
    the code-phase-rolled replica (one [NB, N] x [N] product sum), then
    rotate out the residual per-block phase slope (LS fit on the
    squared correlators, nav-immune like fine_acquire) and slice
    50-bps nav bits by majority vote over nav_rate_ms blocks with the
    bit boundary chosen by transition energy.

    code_doppler: code-phase drift in SAMPLES PER BLOCK (the carrier
    Doppler coupled through the chip clock: f_d/f_L1 * N per block —
    ~0.003 samples/block per kHz of L1 Doppler at sps=2, so the default
    0 is fine below ~100 ms captures; longer captures pass the coupled
    value and the replica is re-rolled per block at build time).

    Returns {prompt [NB] complex, bits [NB//nav_rate_ms] int, bit_phase,
    cn0_est}. Bits carry the usual BPSK polarity ambiguity (resolved
    upstream by the TLM preamble, e.g. nav_preamble_detect)."""
    n = acq.n
    nb = x.shape[-1] // n
    xb = x[: nb * n].reshape(nb, n)
    t = jnp.arange(n, dtype=jnp.float32)
    blk = jnp.arange(nb, dtype=jnp.float32)[:, None]
    f = fine["doppler"]
    # full phase ramp, continuous ACROSS blocks (unlike the coarse
    # search, the tracker needs the inter-block phase too)
    ph = 2.0 * jnp.pi * f * (blk * n + t[None, :])
    rot = (jnp.cos(ph) - 1j * jnp.sin(ph)).astype(jnp.complex64)
    # code replica at the acquired (integer) phase; with code_doppler
    # the per-block integer slip is applied by rolling at BUILD time
    # (numpy — zero runtime cost, the shifts are static per call)
    cs = sample_ca(ca_code(acq.prn), acq.sps)
    p0 = int(res["p_idx"])
    if code_doppler:
        shifts = np.round(np.arange(nb) * code_doppler).astype(int)
        rep = jnp.asarray(np.stack(
            [np.roll(cs, p0 + int(sh)) for sh in shifts]))
    else:
        rep = jnp.asarray(np.roll(cs, p0))[None, :]
    z = jnp.sum(xb * rot * rep, axis=-1)                   # [NB] prompt
    # residual common rotation per block: squared-prompt phase slope
    # (squaring cancels the nav bits), halved back and unwrapped as a
    # constant rate — the leftover after fine_acquire is < 1/(4N)
    resid = jnp.angle(jnp.sum((z[1:] * jnp.conj(z[:-1])) ** 2)) / 2.0
    derot = jnp.exp(-1j * resid * jnp.arange(nb))
    zc = z * derot
    # constant-phase alignment: the slope derotation leaves an
    # arbitrary common rotation phi0; half the angle of sum(zc^2)
    # estimates it nav-immune (the pi ambiguity is the declared BPSK
    # polarity ambiguity)
    phi0 = jnp.angle(jnp.sum(zc * zc)) / 2.0
    zc = zc * jnp.exp(-1j * phi0)
    # bit sync: transition energy at each candidate boundary residue —
    # ONE padded reshape + sum per residue class, single host argmax
    s = jnp.real(zc)
    diffs = jnp.abs(s[1:] - s[:-1])
    pad = (-diffs.shape[0]) % nav_rate_ms
    dpad = jnp.concatenate([diffs, jnp.zeros((pad,), diffs.dtype)])
    energy = jnp.sum(dpad.reshape(-1, nav_rate_ms), axis=0)
    best = int(jnp.argmax(energy))
    # diffs[i] spans blocks (i, i+1): a transition at residue p means
    # bits START at block (p + 1) mod nav_rate_ms
    start = (best + 1) % nav_rate_ms
    sb = s[start: start + ((nb - start) // nav_rate_ms) * nav_rate_ms]
    sums = jnp.sum(sb.reshape(-1, nav_rate_ms), axis=-1)
    bits = (sums < 0).astype(jnp.int32)
    pwr = jnp.mean(jnp.abs(zc) ** 2)
    nvar = jnp.var(jnp.imag(zc))
    cn0 = 10.0 * jnp.log10(jnp.maximum(pwr / (2 * nvar + 1e-12), 1e-9)
                           * 1000.0)
    return {"prompt": zc, "bits": bits, "bit_phase": start,
            "cn0_db_hz": cn0}


NAV_PREAMBLE = np.asarray([1, 0, 0, 0, 1, 0, 1, 1], np.int32)


def nav_preamble_detect(bits: np.ndarray) -> list[tuple[int, int]]:
    """Find the TLM preamble (10001011) in a nav bit stream, either
    polarity: [(index, polarity)] with polarity +1 (as-is) or -1
    (inverted stream)."""
    b = np.asarray(bits, np.int32)
    if b.size < 8:
        return []
    win = np.lib.stride_tricks.sliding_window_view(b, 8)
    hits = []
    for pol, pat in ((1, NAV_PREAMBLE), (-1, 1 - NAV_PREAMBLE)):
        for i in np.flatnonzero((win == pat).all(axis=1)):
            hits.append((int(i), pol))
    return sorted(hits)
