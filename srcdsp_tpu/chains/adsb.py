"""Mode S / ADS-B downlink (beyond parity): PULSE-POSITION modulation —
a modulation family none of the other chains cover — plus the Mode S
CRC-24, built on the framework's layers (gf2 machine for the CRC,
magnitude-domain correlation for the preamble, reshape-compare PPM
slicing; no per-sample loops).

Format (Mode S downlink, 1090 MHz): 8 us preamble of four 0.5 us pulses
at 0, 1.0, 3.5, 4.5 us, then 56 (short) or 112 (extended squitter /
ADS-B) data bits at 1 Mb/s, PPM: a pulse in the FIRST half of the 1 us
bit cell is a 1, in the second half a 0. Bits transmit MSB-first; the
last 24 bits are the parity field — remainder of the message times x^24
modulo G(x) = x^24 + x^23 + ... (0x1FFF409), so a clean frame's full
112-bit CRC remainder is zero. (DF11/DF17 address overlays on the
parity field are out of scope here — this is the waveform + integrity
layer; see decode_frame's docstring.)

Works on MAGNITUDE samples (the classic rtl-sdr 2 Msps pipeline:
|IQ| -> this module), any integer samples-per-half-bit.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from srcdsp_tpu.gf2 import crc_init, crc_update, crc_value, make_crc

# preamble pulse positions in half-bit (0.5 us) units, 16 halves total
_PREAMBLE_HALVES = (0, 2, 7, 9)
_PREAMBLE_LEN = 16

_CRC = make_crc(0x00FFF409, 24, init=0)


def modes_crc(bits) -> int:
    """Mode S CRC-24 of a bit sequence (MSB-first air order)."""
    s = crc_init(_CRC)
    s = crc_update(_CRC, s, jnp.asarray(np.asarray(bits, np.int32)))
    return int(np.asarray(crc_value(_CRC, s)))


def build_frame(payload_bits) -> np.ndarray:
    """88 (or 32) message bits -> full 112 (56) air bits with the
    24-bit parity appended (remainder of payload * x^24 mod G), so
    `modes_crc(frame) == 0`."""
    payload_bits = np.asarray(payload_bits, np.int32)
    if payload_bits.size not in (32, 88):
        raise ValueError("Mode S payload is 32 or 88 bits")
    rem = modes_crc(payload_bits)
    par = ((rem >> (23 - np.arange(24))) & 1).astype(np.int32)
    return np.concatenate([payload_bits, par])


def modulate(frame_bits, sps_half: int = 1,
             amplitude: float = 1.0) -> np.ndarray:
    """Air bits -> magnitude waveform (preamble + PPM), [N] f32.
    sps_half = samples per 0.5 us half-bit (1 at the classic 2 Msps)."""
    frame_bits = np.asarray(frame_bits, np.int32)
    halves = np.zeros(_PREAMBLE_LEN + 2 * frame_bits.size, np.float32)
    for h in _PREAMBLE_HALVES:
        halves[h] = amplitude
    for i, b in enumerate(frame_bits):
        halves[_PREAMBLE_LEN + 2 * i + (0 if b else 1)] = amplitude
    return np.repeat(halves, sps_half).astype(np.float32)


def _half_sums(mag, sps_half):
    n = mag.size // sps_half
    return mag[: n * sps_half].reshape(n, sps_half).sum(axis=1)


def detect_preambles(mag, sps_half: int = 1, thresh: float = 3.0
                     ) -> np.ndarray:
    """Candidate frame starts (sample indices) by preamble correlation
    on half-bit sums: score = sum(pulse halves) - sum(quiet halves),
    normalized by the capture's median level; local maxima above
    `thresh`. Every SAMPLE phase is searched (half-bit sums are formed
    at each of the sps_half grid offsets — a frame's arrival phase is
    arbitrary in a real capture), and candidates are returned strongest
    first so decode_frame tries the best alignment first."""
    mag = np.asarray(mag, np.float64)
    quiet = sorted(set(range(_PREAMBLE_LEN)) - set(_PREAMBLE_HALVES))
    cands: list[tuple[float, int]] = []
    for ph in range(sps_half):
        hs = _half_sums(mag[ph:], sps_half)
        if hs.size < _PREAMBLE_LEN + 4:
            continue
        # per-phase floor: at larger sps_half a pulse-aligned phase has a
        # different half-bit-sum distribution than phase 0, so a shared
        # floor would bias thresholds between phases (round-5 advisor fix)
        floor = np.median(hs) + 1e-12
        n = hs.size - _PREAMBLE_LEN
        idx = np.arange(n)
        on = sum(hs[idx + h] for h in _PREAMBLE_HALVES) \
            / len(_PREAMBLE_HALVES)
        off = sum(hs[idx + h] for h in quiet) / len(quiet)
        score = (on - off) / floor
        # edge-safe local-max test (no wraparound: pad with -inf)
        pad = np.concatenate([[-np.inf], score, [-np.inf]])
        peaks = np.where((score > thresh)
                         & (score >= pad[:-2])
                         & (score >= pad[2:]))[0]
        cands.extend((float(score[p]), ph + int(p) * sps_half)
                     for p in peaks)
    cands.sort(reverse=True)
    return np.asarray([c[1] for c in cands], np.int64)


def slice_bits(mag, start: int, nbits: int = 112,
               sps_half: int = 1) -> np.ndarray | None:
    """PPM-slice `nbits` from the magnitude stream; `start` = preamble
    start sample (from detect_preambles). Returns bits or None if the
    stream is too short."""
    mag = np.asarray(mag, np.float64)
    d0 = start + _PREAMBLE_LEN * sps_half
    need = d0 + 2 * nbits * sps_half
    if mag.size < need:
        return None
    hs = mag[d0: need].reshape(nbits, 2, sps_half).sum(axis=2)
    return (hs[:, 0] > hs[:, 1]).astype(np.int32)


def decode_frame(mag, sps_half: int = 1, nbits: int = 112,
                 thresh: float = 3.0):
    """Find and decode one Mode S frame from a magnitude capture.

    Returns (bits [nbits] | None, crc_ok, start_sample). crc_ok checks
    the full-frame remainder == 0 — valid for frames whose parity field
    is the plain CRC (build_frame's convention; real DF11/DF17 overlay
    the ICAO address on the parity — XOR it off before checking)."""
    starts = detect_preambles(mag, sps_half, thresh)
    best = (None, False, -1)
    for s in starts:
        bits = slice_bits(mag, int(s), nbits, sps_half)
        if bits is None:
            continue
        ok = modes_crc(bits) == 0
        if ok:
            return bits, True, int(s)
        if best[0] is None:
            best = (bits, False, int(s))
    return best


def decode_all_frames(mag, sps_half: int = 1, nbits: int = 112,
                      thresh: float = 3.0) -> list[tuple[np.ndarray, int]]:
    """All CRC-clean frames in a magnitude capture: [(bits, start)],
    de-duplicated (one frame per preamble neighborhood — candidates
    within half a frame of an accepted start are the same burst)."""
    starts = detect_preambles(mag, sps_half, thresh)
    span = (2 * nbits + _PREAMBLE_LEN) * sps_half // 2
    out: list[tuple[np.ndarray, int]] = []
    taken: list[int] = []
    for s in starts:
        s = int(s)
        if any(abs(s - t) < span for t in taken):
            continue
        bits = slice_bits(mag, s, nbits, sps_half)
        if bits is not None and modes_crc(bits) == 0:
            out.append((bits, s))
            taken.append(s)
    out.sort(key=lambda t: t[1])
    return out


__all__ = ["modes_crc", "build_frame", "modulate", "detect_preambles",
           "slice_bits", "decode_frame", "decode_all_frames"]
