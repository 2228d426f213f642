"""DCF77: field codec vs an independent BCD twin, and the envelope
round trip with noise and arbitrary start offset."""

import numpy as np

from srcdsp_tpu.chains import dcf77


def _bcd_twin(v):
    return [int(c) for c in f"{v % 10:04b}"[::-1]] \
        + [int(c) for c in f"{v // 10:04b}"[::-1]]


def test_minute_codec_round_trip_and_twin():
    t = dcf77.Dcf77Time(minute=47, hour=13, day=21, weekday=5,
                        month=8, year2=26, cest=True)
    bits = dcf77.dcf77_encode_minute(t)
    assert bits.size == 59 and bits[0] == 0 and bits[20] == 1
    # independent BCD twin for the minute field (bits 21-27)
    assert list(bits[21:28]) == _bcd_twin(47)[:7]
    assert dcf77.dcf77_decode_minute(bits) == t
    # each parity bit catches a flip in its span
    for pos, par in ((23, 28), (30, 35), (40, 58)):
        bad = bits.copy()
        bad[pos] ^= 1
        assert dcf77.dcf77_decode_minute(bad) is None, pos


def test_envelope_round_trip_noise_and_offset(rng):
    fs = 1000.0
    times = [dcf77.Dcf77Time(58, 23, 31, 7, 12, 99, False),
             dcf77.Dcf77Time(59, 23, 31, 7, 12, 99, False)]
    env = dcf77.dcf77_modulate(
        [dcf77.dcf77_encode_minute(t) for t in times], fs)
    # lead-in at full carrier, noise, arbitrary offset
    x = np.concatenate([np.full(1234, 1.0, np.float32), env,
                        np.full(800, 1.0, np.float32)])
    x = x + 0.05 * rng.standard_normal(x.size).astype(np.float32)
    got = dcf77.dcf77_decode(x, fs)
    # first minute needs the gap BEFORE it: only the second minute has
    # one inside the capture... the lead-in full-carrier stretch also
    # creates a >1.8 s gap before minute 1's first second, so both
    # minutes decode
    assert times[0] in got and times[1] in got


def test_noise_rejected(rng):
    x = np.abs(rng.standard_normal(120000)).astype(np.float32)
    assert dcf77.dcf77_decode(x, 1000.0) == []


def test_spike_inside_drop_does_not_split_bit(rng):
    """Regression (review finding): a single above-threshold sample
    inside a 200 ms drop must not split one '1' into two '0's."""
    fs = 1000.0
    t = dcf77.Dcf77Time(47, 13, 21, 5, 8, 26, True)
    env = dcf77.dcf77_modulate([dcf77.dcf77_encode_minute(t)], fs)
    # place a full-amplitude spike mid-drop of second 21 (a '1' bit in
    # the minute field for minute=47)
    bits = dcf77.dcf77_encode_minute(t)
    assert bits[21] == 1
    env = env.copy()
    env[int(21 * fs + 0.1 * fs)] = 1.0
    got = dcf77.dcf77_decode(
        np.concatenate([np.full(2200, 1.0, np.float32), env]), fs)
    assert t in got
