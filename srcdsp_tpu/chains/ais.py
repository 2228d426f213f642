"""AIS (ITU-R M.1371) frame layer (beyond parity): the third real
protocol composed from framework layers — GMSK BT=0.4 at 9600 bd
(testing.signals.gmsk_baseband / the chains.fsk discriminator), NRZI
line coding (vectorized: a cumulative XOR, no scans), HDLC flags + bit
stuffing (srcdsp_tpu.hdlc), and the X-25/HDLC FCS (CRC-16, poly 0x1021
reflected, init/xorout 0xFFFF) via the gf2 machine.

Air order: bytes LSB-first; FCS appended LSB-first of the 16-bit value;
NRZI-S (a 0 bit toggles the line level, a 1 holds it), so the decode is
insensitive to a global demod polarity flip — only transitions matter.

Like chains/ble.py: offline environment, so conformance rests on
independent loop twins in the tests plus the full modulate -> impaired
channel -> demodulate -> deframe -> FCS round trip.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from srcdsp_tpu.gf2 import (bytes_to_bits, crc_init, crc_update, crc_value,
                            make_crc)
from srcdsp_tpu.hdlc import (FLAG, compact_bits, destuff_bits, find_flags,
                             stuff_bits)

_FCS = make_crc(0x1021, 16, init=0xFFFF, xorout=0xFFFF, reflect=True)

TRAINING = np.tile([0, 1], 12).astype(np.int32)       # 24-bit preamble


def ais_fcs(bits) -> int:
    """X-25 FCS over air bits (LSB-first per byte)."""
    s = crc_init(_FCS)
    s = crc_update(_FCS, s, jnp.asarray(np.asarray(bits, np.int32)))
    return int(np.asarray(crc_value(_FCS, s)))


def nrzi_encode(bits, level0: int = 0) -> np.ndarray:
    """NRZI-S: a 0 toggles the level, a 1 holds it. Vectorized as a
    cumulative XOR (mod-2 cumsum of the toggles) — no per-bit loop."""
    bits = np.asarray(bits, np.int32)
    toggles = 1 - bits
    lvl = (level0 + np.cumsum(toggles)) % 2
    return lvl.astype(np.int32)


def nrzi_decode(levels) -> np.ndarray:
    """Levels -> bits: 1 where the level held, 0 where it toggled. The
    first bit needs the pre-stream level; AIS preamble absorbs it."""
    lv = np.asarray(levels, np.int32)
    d = np.concatenate([[lv[0]], lv])
    return (1 - (d[1:] ^ d[:-1])).astype(np.int32)


def build_hdlc_air_bits(payload: bytes) -> np.ndarray:
    """Payload bytes -> PRE-NRZI air bits: flag | stuffed(payload +
    X-25 FCS) | flag. Shared by AIS (which prepends its 0101 training)
    and AX.25 (which prepends idle flags) — one place owns the
    flag/stuff/FCS construction."""
    pb = bytes_to_bits(payload, lsb_first=True)
    fcs = ais_fcs(pb)
    fcs_bits = ((fcs >> np.arange(16)) & 1).astype(np.int32)
    body = np.concatenate([pb, fcs_bits])
    ob, vb, _ = stuff_bits(jnp.asarray(body))
    stuffed = compact_bits(ob, vb)
    return np.concatenate([FLAG, stuffed, FLAG]).astype(np.int32)


def build_ais_frame(payload: bytes, level0: int = 0) -> np.ndarray:
    """Payload bytes -> NRZI line LEVELS ready for gmsk_baseband:
    training | flag | stuffed(payload + FCS) | flag, NRZI-encoded."""
    air = np.concatenate([TRAINING, build_hdlc_air_bits(payload)])
    return nrzi_encode(air.astype(np.int32), level0)


def decode_ais_frame(levels, max_ends_per_start: int | None = None):
    """Demodulated line levels -> (payload bytes | None, fcs_ok,
    flag_index). Host-side sink: NRZI-decode, then try EVERY candidate
    flag pair (random padding/noise produces spurious 01111110 patterns
    ~once per ~64 noise bits, so anchoring on the first hit would abort
    intact frames — round-4 review finding); the first FCS-clean decode
    wins, else the best-formed failed attempt is reported.

    max_ends_per_start optionally bounds the end-flag candidates tried
    per start (cost control for pathological captures); default None =
    unbounded, so a long noise tail full of spurious flags cannot mask
    the true closing flag (round-5 advisor finding — the FCS check
    rejects wrong pairings cheaply)."""
    bits = nrzi_decode(levels)
    hits = np.flatnonzero(np.asarray(find_flags(jnp.asarray(bits))))
    if hits.size < 2:
        return None, False, -1
    best = (None, False, int(hits[0]))
    for start in (int(h) for h in hits):
        ends = hits[hits > start + 8]
        if ends.size == 0:
            continue
        if max_ends_per_start is not None:
            ends = ends[:max_ends_per_start]
        for end in (int(e) for e in ends):
            span = bits[start + 8: end]
            if span.size < 24:
                continue
            ob, vb, _ = destuff_bits(jnp.asarray(span))
            body = compact_bits(ob, vb)
            if body.size < 24 or (body.size - 16) % 8:
                continue
            pb, fcs_bits = body[:-16], body[-16:]
            fcs_rx = int((fcs_bits * (1 << np.arange(16))).sum())
            payload = np.packbits(pb.reshape(-1, 8)[:, ::-1]).tobytes()
            if ais_fcs(pb) == fcs_rx:
                return payload, True, start
            if best[0] is None:
                best = (payload, False, start)
    return best


def decode_all_ais_frames(levels, max_ends_per_start: int | None = None
                          ) -> list[tuple[bytes, int]]:
    """Greedy multi-frame stream decode: every FCS-clean frame in the
    capture, in stream order, as [(payload bytes, start_flag_index)].

    Same candidate-flag-pair logic as decode_ais_frame, scanning left to
    right; after accepting a frame the scan resumes AT its closing flag
    (back-to-back AIS shares one flag between frames, so the closing
    flag may open the next). Within one start, candidate ends are tried
    nearest-first and the first FCS-clean pairing wins — the greedy
    shortest-valid-frame rule of HDLC framing."""
    bits = nrzi_decode(levels)
    hits = np.flatnonzero(np.asarray(find_flags(jnp.asarray(bits))))
    out: list[tuple[bytes, int]] = []
    hi = 0
    while hi < hits.size:
        start = int(hits[hi])
        ends = hits[hits > start + 8]
        if max_ends_per_start is not None:
            ends = ends[:max_ends_per_start]
        matched = False
        for end in (int(e) for e in ends):
            span = bits[start + 8: end]
            if span.size < 24:
                continue
            ob, vb, _ = destuff_bits(jnp.asarray(span))
            body = compact_bits(ob, vb)
            if body.size < 24 or (body.size - 16) % 8:
                continue
            pb, fcs_bits = body[:-16], body[-16:]
            fcs_rx = int((fcs_bits * (1 << np.arange(16))).sum())
            if ais_fcs(pb) == fcs_rx:
                out.append((np.packbits(
                    pb.reshape(-1, 8)[:, ::-1]).tobytes(), start))
                # resume at the closing flag (shared-flag back-to-back)
                hi = int(np.searchsorted(hits, end))
                matched = True
                break
        if not matched:
            hi += 1
    return out


__all__ = ["TRAINING", "ais_fcs", "nrzi_encode", "nrzi_decode",
           "build_ais_frame", "decode_ais_frame", "decode_all_ais_frames"]
