"""Mode S / ADS-B PPM chain: independent CRC loop twin, pinned known
remainder behavior, and the magnitude-domain detect/slice/CRC round trip
under noise and offset."""

import numpy as np

from srcdsp_tpu.chains.adsb import (build_frame, decode_frame, modes_crc,
                                    modulate, slice_bits)


def _crc_loop_twin(bits):
    """Mode S CRC-24 long-division, written independently: G =
    0x1FFF409, MSB-first, zero preset."""
    g = 0x1FFF409
    reg = 0
    for b in bits:
        reg = ((reg << 1) | int(b)) & 0x1FFFFFF
        if reg & 0x1000000:
            reg ^= g
    # flush 24 zero bits (remainder of bits * x^24)
    for _ in range(24):
        reg = (reg << 1) & 0x1FFFFFF
        if reg & 0x1000000:
            reg ^= g
    return reg


def test_crc_matches_independent_division():
    rng = np.random.default_rng(0)
    for n in (32, 88, 112):
        bits = rng.integers(0, 2, n).astype(np.int32)
        # the gf2 register form is the premultiplied-by-x^24 CRC, which
        # equals the twin's flushed long division
        assert modes_crc(bits) == _crc_loop_twin(bits), n


def test_build_frame_zero_remainder_and_corruption_detected():
    rng = np.random.default_rng(1)
    payload = rng.integers(0, 2, 88).astype(np.int32)
    frame = build_frame(payload)
    assert frame.size == 112
    assert modes_crc(frame) == 0
    bad = frame.copy()
    bad[17] ^= 1
    assert modes_crc(bad) != 0


def test_ppm_roundtrip_clean():
    rng = np.random.default_rng(2)
    frame = build_frame(rng.integers(0, 2, 88).astype(np.int32))
    for sps in (1, 2, 4):
        mag = modulate(frame, sps_half=sps)
        bits = slice_bits(mag, 0, 112, sps)
        assert np.array_equal(bits, frame), sps


def test_decode_from_noisy_offset_capture():
    """Frame buried at an unknown offset in a noisy magnitude stream:
    preamble detection + PPM slicing + CRC recover it exactly; an
    empty stream yields no CRC-clean frame."""
    rng = np.random.default_rng(3)
    sps = 2
    frame = build_frame(rng.integers(0, 2, 88).astype(np.int32))
    wave = modulate(frame, sps_half=sps, amplitude=1.0)
    noise_floor = 0.08
    cap = noise_floor * rng.rayleigh(1.0, 6000).astype(np.float32)
    off = 1234
    cap[off: off + wave.size] += wave
    bits, ok, start = decode_frame(cap, sps_half=sps)
    assert ok and start == off
    assert np.array_equal(bits, frame)

    cap2 = noise_floor * rng.rayleigh(1.0, 6000).astype(np.float32)
    _, ok2, _ = decode_frame(cap2, sps_half=sps)
    assert not ok2


def test_decode_at_every_arrival_phase():
    """Arrival phase is arbitrary in a real capture: the detector must
    find frames at sample offsets NOT on the sps_half grid."""
    rng = np.random.default_rng(5)
    sps = 4
    frame = build_frame(rng.integers(0, 2, 88).astype(np.int32))
    wave = modulate(frame, sps_half=sps)
    for off in (1000, 1001, 1002, 1003):
        cap = 0.08 * rng.rayleigh(1.0, 4000).astype(np.float32)
        cap[off: off + wave.size] += wave
        bits, ok, start = decode_frame(cap, sps_half=sps)
        assert ok and start == off, (off, ok, start)
        assert np.array_equal(bits, frame), off
