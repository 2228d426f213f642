"""DCF77 time-signal decoding — the ELEVENTH real protocol (and the
first time-transfer one): the 77.5 kHz German long-wave standard whose
amplitude drops to 15% at the start of every second for 100 ms (bit 0)
or 200 ms (bit 1); second 59 has NO drop, marking the minute.

Frame (published layout, one bit per second):
    0      always 0 (minute start)
    1-19   civil/announcement bits (carried through unparsed)
    20     always 1 (start of encoded time)
    21-27  minute, BCD (1,2,4,8,10,20,40);  28 even parity over 21-27
    29-34  hour, BCD (1..20);               35 even parity over 29-34
    36-41  day of month, BCD
    42-44  day of week (1=Mon..7=Sun)
    45-49  month, BCD
    50-57  year in century, BCD (1..80)
    58     even parity over 36-57

The receive chain is framework-native: AM envelope (|x| of the complex
baseband capture) -> per-second pulse-width classification on a
threshold crossing grid -> minute-gap framing -> BCD + parity decode.
The encoder (`dcf77_modulate`) is the test's signal source; round
trips run through AWGN + arbitrary start offset in
tests/e2e/test_dcf77.py (offline-conformance policy as everywhere:
published constants, self round trip, independent field twins)."""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

__all__ = ["Dcf77Time", "dcf77_encode_minute", "dcf77_decode_minute",
           "dcf77_modulate", "dcf77_envelope_bits", "dcf77_decode"]


class Dcf77Time(NamedTuple):
    minute: int
    hour: int
    day: int
    weekday: int
    month: int
    year2: int              # year in century, 0-99
    cest: bool              # summer time flag (bit 17)


def _bcd(v: int, nbits: int) -> list[int]:
    code = (v % 10) | ((v // 10) << 4)
    return [(code >> i) & 1 for i in range(nbits)]


def _unbcd(bits) -> int:
    code = sum(int(b) << i for i, b in enumerate(bits))
    return (code & 0xF) + 10 * (code >> 4)


def dcf77_encode_minute(t: Dcf77Time) -> np.ndarray:
    """Time -> the 59 transmitted bits of one minute (bit 59 is the
    missing marker, not included)."""
    b = np.zeros(59, np.int64)
    b[17] = int(t.cest)
    b[18] = int(not t.cest)
    b[20] = 1
    b[21:28] = _bcd(t.minute, 7)
    b[28] = b[21:28].sum() % 2
    b[29:35] = _bcd(t.hour, 6)
    b[35] = b[29:35].sum() % 2
    b[36:42] = _bcd(t.day, 6)
    b[42:45] = [(t.weekday >> i) & 1 for i in range(3)]
    b[45:50] = _bcd(t.month, 5)
    b[50:58] = _bcd(t.year2, 8)
    b[58] = b[36:58].sum() % 2
    return b


def dcf77_decode_minute(bits) -> Dcf77Time | None:
    """59 bits -> Dcf77Time, or None if the structure/parity fails."""
    b = np.asarray(bits, np.int64)
    if b.size != 59 or b[0] != 0 or b[20] != 1:
        return None
    if b[21:28].sum() % 2 != b[28] or b[29:35].sum() % 2 != b[35]:
        return None
    if b[36:58].sum() % 2 != b[58]:
        return None
    return Dcf77Time(
        minute=_unbcd(b[21:28]), hour=_unbcd(b[29:35]),
        day=_unbcd(b[36:42]),
        weekday=int(sum(int(v) << i for i, v in enumerate(b[42:45]))),
        month=_unbcd(b[45:50]), year2=_unbcd(b[50:58]),
        cest=bool(b[17]))


def dcf77_modulate(bits_minutes, fs: float = 1000.0,
                   low: float = 0.15) -> np.ndarray:
    """Bit minutes (list of [59] arrays) -> AM envelope at complex
    baseband (real f32 amplitude; multiply by a phasor for a carrier).
    Each second: `low` amplitude for 100 ms (0) / 200 ms (1), then
    full; second 59 stays at full amplitude."""
    sps = int(round(fs))
    out = []
    for bits in bits_minutes:
        bits = np.asarray(bits, np.int64)
        if bits.size != 59:
            raise ValueError("each minute must carry 59 bits")
        for b in bits:
            sec = np.full(sps, 1.0, np.float32)
            sec[: int((0.2 if b else 0.1) * fs)] = low
            out.append(sec)
        out.append(np.full(sps, 1.0, np.float32))     # second 59
    return np.concatenate(out)


def dcf77_envelope_bits(env: np.ndarray, fs: float = 1000.0):
    """AM envelope -> (bit values [K], second-start times [K] in
    samples, minute_marks [indices into K where a >=1.8 s gap
    precedes]). Threshold = midpoint of the envelope's low/high
    levels; a drop >= 150 ms is a 1, shorter is a 0."""
    env = np.asarray(env, np.float64)
    lo, hi = np.percentile(env, 5), np.percentile(env, 95)
    if hi - lo < 0.2 * hi:
        return np.zeros(0, np.int64), np.zeros(0, np.int64), []
    th = 0.5 * (lo + hi)
    low = env < th
    # falling edges = second starts (full -> reduced)
    edges = np.flatnonzero(low[1:] & ~low[:-1]) + 1
    vals, starts = [], []
    w = int(0.30 * fs)
    last = -10 ** 9
    for e in edges:
        if e - last < 0.8 * fs:
            continue                      # spike inside this second's
        # classify by TOTAL low time in the 300 ms window (not the
        # first contiguous run): a single above-threshold noise sample
        # inside a 200 ms drop would split the run and turn one '1'
        # into two '0's, losing the whole minute (review finding)
        tot = int(low[e: e + w].sum())
        if tot < 0.05 * fs or tot > 0.28 * fs:
            continue                      # glitch, not a second mark
        vals.append(1 if tot >= 0.15 * fs else 0)
        starts.append(e)
        last = e
    vals = np.asarray(vals, np.int64)
    starts = np.asarray(starts, np.int64)
    marks = [i for i in range(1, starts.size)
             if starts[i] - starts[i - 1] > 1.8 * fs]
    # a capture can begin mid-gap (receiver keyed during the minute
    # mark): also try the first second as a minute start — the frame
    # structure + three parity bits gate any false candidate
    if starts.size:
        marks = [0] + marks
    return vals, starts, marks


def dcf77_decode(env: np.ndarray, fs: float = 1000.0):
    """AM envelope -> list of decoded Dcf77Time (one per complete,
    parity-clean minute found)."""
    vals, starts, marks = dcf77_envelope_bits(env, fs)
    out = []
    for m in marks:
        if m + 59 > vals.size:
            continue
        t = dcf77_decode_minute(vals[m: m + 59])
        if t is not None:
            out.append(t)
    return out
