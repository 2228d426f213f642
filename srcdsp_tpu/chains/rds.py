"""RDS (Radio Data System, EN 50067) — the fourth real protocol
composed from framework layers (beyond parity; joins BLE X46, ADS-B
X48, AIS X49).

Physical layer: BPSK on the 57 kHz subcarrier of the FM stereo MPX
(exactly 3x the 19 kHz pilot), 1187.5 bps (= 57000/48) with BIPHASE
(Manchester) symbol coding and differential data encoding. The receiver
reuses the stereo decoder's PLL-free trick (`chains/analog.py`
fm_stereo_apply): the analytic pilot's unit phasor CUBED is the exact
57 kHz reference (e^{j theta} -> e^{j 3 theta} triples frequency AND
phase), so demodulation is one complex bandpass, one derotation, and a
boxcar matched filter. Timing is a block energy pick over the biphase
correlator's bit-grid phases; differential decoding makes the whole
chain immune to carrier/polarity sign flips.

Block layer: groups of 4 x 26-bit blocks; each block = 16 info bits +
10 check bits of the (26, 16) shortened cyclic code with
g(x) = x^10 + x^8 + x^7 + x^5 + x^4 + x^3 + 1, plus a per-position
OFFSET WORD (A, B, C, C', D) added to the checkword. Because
c(x) = m(x)*x^10 mod g(x), the syndrome of an error-free received
block equals its offset word exactly — block identification and sync
ARE the syndrome computation, done for every bit position at once as
ONE [W, 26] x [26, 10] GF(2) matmul (the gf2.py trick). Single-bit
errors are corrected from a 26-entry syndrome table.

Offline conformance: published generator/offset constants plus
independent long-division loop twins in tests, and the full
MPX(stereo + RDS) -> FM channel -> demod -> group decode round trip.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.ops.fir import fir_full
from srcdsp_tpu.ops.window import lowpass
from srcdsp_tpu.types import F32

__all__ = ["rds_checkword", "rds_encode_group", "rds_syndromes",
           "rds_sync_decode", "rds_baseband", "rds_inject_mpx",
           "rds_demod_mpx", "OFFSETS"]

_G = 0x1B9          # g(x) minus the x^10 term, MSB = x^9 coefficient
_DEG = 10
# Offset words (10 bits, MSB first), EN 50067 annex: A, B, C, C', D
OFFSETS = {"A": 0x0FC, "B": 0x198, "C": 0x168, "Cp": 0x350, "D": 0x1B4}


def _mod_g(poly_bits: np.ndarray) -> np.ndarray:
    """Long-division remainder of a MSB-first bit vector mod g(x) —
    the loop twin the matrix forms are tested against."""
    r = 0
    for b in np.asarray(poly_bits, int):
        r = (r << 1) | int(b)
        if r & (1 << _DEG):
            r ^= (1 << _DEG) | _G
    return np.asarray([(r >> (9 - i)) & 1 for i in range(10)], np.int32)


def _xpow_mod_g(k: int) -> np.ndarray:
    """x^k mod g(x) as 10 MSB-first bits."""
    v = np.zeros(k + 1, np.int32)
    v[0] = 1
    return _mod_g(v)


# [26, 10] syndrome matrix: row i = x^(25-i) mod g — syndrome of a
# received 26-bit block r (MSB first) is r @ S mod 2
_S = np.stack([_xpow_mod_g(25 - i) for i in range(26)])
# [16, 10] checkword generator: c = m @ G mod 2 (m(x) * x^10 mod g)
_GEN = _S[:16]
def _bits_to_int(bits: np.ndarray) -> np.ndarray:
    w = (1 << np.arange(bits.shape[-1] - 1, -1, -1)).astype(np.int64)
    return (np.asarray(bits, np.int64) @ w)


# single-bit error syndromes: syndrome value -> bit position (MSB first)
_E1 = {int(_bits_to_int(_S[i])): i for i in range(26)}


def rds_checkword(info: int) -> int:
    """10-bit checkword of a 16-bit info word (before offset)."""
    m = np.asarray([(info >> (15 - i)) & 1 for i in range(16)], np.int32)
    c = (m @ _GEN) % 2
    return int(_bits_to_int(c))


def rds_encode_group(words, version: str = "A") -> np.ndarray:
    """4 x 16-bit info words -> 104 air bits (MSB first per block).
    version 'A' uses offsets A,B,C,D; 'B' uses A,B,C',D."""
    seq = ["A", "B", "C" if version == "A" else "Cp", "D"]
    out = []
    for w, off in zip(words, seq):
        c = rds_checkword(int(w)) ^ OFFSETS[off]
        for i in range(16):
            out.append((int(w) >> (15 - i)) & 1)
        for i in range(10):
            out.append((c >> (9 - i)) & 1)
    return np.asarray(out, np.int32)


def rds_syndromes(bits: np.ndarray) -> np.ndarray:
    """All sliding 26-bit window syndromes at once: [N-25] ints in
    [0, 1024) — one [W, 26] x [26, 10] GF(2) matmul (f32 MXU + mod 2,
    the gf2.py representation)."""
    b = np.asarray(bits, np.float32)
    if b.size < 26:
        return np.zeros((0,), np.int64)
    win = np.lib.stride_tricks.sliding_window_view(b, 26)
    syn = np.asarray(
        jnp.mod(jnp.dot(jnp.asarray(win), jnp.asarray(_S, jnp.float32),
                        precision=jax.lax.Precision.HIGHEST), 2.0))
    return _bits_to_int(syn.astype(np.int64))


def _try_block(bits26: np.ndarray, offset: int):
    """-> (info16 or None, corrected_bits count)."""
    syn = int(_bits_to_int((np.asarray(bits26, np.int64) @ _S) % 2))
    e = syn ^ offset
    if e == 0:
        return int(_bits_to_int(bits26[:16])), 0
    pos = _E1.get(e)
    if pos is not None:
        fixed = np.asarray(bits26, np.int32).copy()
        fixed[pos] ^= 1
        return int(_bits_to_int(fixed[:16])), 1
    return None, 0


def rds_sync_decode(bits: np.ndarray, max_groups: int | None = None):
    """Bit stream -> decoded groups. Finds block sync by syndrome ==
    offset-A over every position (one matmul), then walks B, C/C', D at
    26-bit spacing with single-bit correction per block.

    Returns a list of dicts {start, version, words [4], corrected}.
    """
    bits = np.asarray(bits, np.int32)
    syn = rds_syndromes(bits)
    groups = []
    pos = 0
    limit = bits.size - 104 + 1
    ea = syn[:max(0, limit)] ^ OFFSETS["A"]
    ok = np.array([0] + sorted(_E1), np.int64)
    starts = np.flatnonzero(np.isin(ea, ok))   # exact or 1-bit-off A
    for p in starts:
        if p < pos:
            continue
        wa = bits[p: p + 26]
        a, ca = _try_block(wa, OFFSETS["A"])
        if a is None:
            continue
        b, cb = _try_block(bits[p + 26: p + 52], OFFSETS["B"])
        if b is None:
            continue
        c, cc = _try_block(bits[p + 52: p + 78], OFFSETS["C"])
        version = "A"
        if c is None:
            c, cc = _try_block(bits[p + 52: p + 78], OFFSETS["Cp"])
            version = "B"
        d, cd = _try_block(bits[p + 78: p + 104], OFFSETS["D"])
        if None in (a, c, d):
            continue
        groups.append({"start": int(p), "version": version,
                       "words": [a, b, c, d],
                       "corrected": ca + cb + cc + cd})
        pos = p + 104
        if max_groups and len(groups) >= max_groups:
            break
    return groups


# ---------------------------------------------------------------------------
# Physical layer
# ---------------------------------------------------------------------------


def rds_baseband(bits, sps_half: int) -> np.ndarray:
    """Air bits -> real biphase baseband at sps_half samples per
    half-bit: differential encode (d_k = b_k xor d_{k-1}), then each
    coded bit becomes a (+,-) or (-,+) half pair."""
    b = np.asarray(bits, np.int32)
    d = np.bitwise_xor.accumulate(b) % 2      # differential (d_{-1}=0)
    lv = 1.0 - 2.0 * d
    halves = np.stack([lv, -lv], axis=1).reshape(-1)
    return np.repeat(halves.astype(np.float32), sps_half)


def rds_inject_mpx(mpx: np.ndarray, bits, f_pilot: float, sps_half: int,
                   level: float = 0.06) -> np.ndarray:
    """Add the RDS subcarrier to a composite MPX fixture: biphase
    baseband BPSK on cos(2*pi*3*f_pilot*n), pilot-phase-coherent (the
    broadcast convention, same as fm_stereo_mpx's 38 kHz)."""
    bb = rds_baseband(bits, sps_half)
    n = min(len(mpx), len(bb))
    t = np.arange(n)
    out = np.asarray(mpx, np.float64).copy()
    out[:n] += level * bb[:n] * np.cos(2 * np.pi * 3 * f_pilot * t)
    return out.astype(np.float32)


def rds_demod_mpx(mpx: jax.Array, f_pilot: float, sps_half: int,
                  ntaps: int = 257, bw_frac: float = 1.2) -> np.ndarray:
    """MPX -> RDS air bits (polarity-immune; delay = filter group
    delay + timing phase, absorbed by block sync).

    One-sided complex bandpasses extract the analytic pilot and the
    analytic 57 kHz band; carrier = (pilot / |pilot|)^3; derotate,
    boxcar-match each half-bit, form the biphase correlator
    z[k] = h0[k] - h1[k], pick the bit-grid phase with maximal |z|
    energy, slice, differentially decode."""
    x = jnp.asarray(mpx).astype(jnp.complex64)
    nn = np.arange(ntaps) - (ntaps - 1) / 2.0
    proto_p = lowpass(ntaps, f_pilot * 0.1)
    pil_taps = jnp.asarray((np.asarray(proto_p)
                            * np.exp(2j * np.pi * f_pilot * nn)
                            ).astype(np.complex64))
    bw = bw_frac / (2.0 * sps_half)           # biphase main lobe
    proto_r = lowpass(ntaps, bw)
    rds_taps = jnp.asarray((np.asarray(proto_r)
                            * np.exp(2j * np.pi * 3 * f_pilot * nn)
                            ).astype(np.complex64))
    pil = fir_full(pil_taps, x)
    sub = fir_full(rds_taps, x)
    u = pil / (jnp.abs(pil) + F32(1e-12))
    c57 = u * u * u                           # e^{j 3 theta}
    bb = jnp.real(sub * jnp.conj(c57))        # baseband biphase
    # boxcar matched filter over one half-bit
    box = jnp.ones((sps_half,), F32) / F32(sps_half)
    mf = fir_full(box, bb)
    y = np.asarray(mf)
    sb = 2 * sps_half                         # samples per air bit
    nbit = (y.size - sps_half) // sb - 1
    if nbit < 26:
        raise ValueError("capture too short for RDS")
    # biphase correlator for every sample phase
    z = y[: nbit * sb] - y[sps_half: sps_half + nbit * sb]
    zg = z.reshape(nbit, sb)
    metric = np.abs(zg).sum(axis=0)           # [sb] per-phase energy
    p = int(np.argmax(metric))
    d = (zg[:, p] < 0).astype(np.int32)       # coded bits (either pol.)
    bits = np.bitwise_xor(d[1:], d[:-1])      # differential decode
    return bits.astype(np.int32)
