"""BLE-style GFSK advertising link: independent bit-level twins for the
whitening LFSR and CRC-24, and the full modulate -> impaired channel ->
FSK-chain demod -> frame decode round trip."""

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.chains.ble import (ADV_ACCESS_ADDRESS, access_address_bits,
                                   build_adv_frame, crc24, decode_adv_frame,
                                   preamble_bits, whiten_bits)


def _whiten_loop_twin(bits, channel):
    """Published BLE whitening recurrence (Galois form of x^7 + x^4 + 1),
    written independently as a per-bit integer loop: register [b6..b0],
    b6 preset to 1, b5..b0 = channel; per step out = b6, then
    b4' = b3 ^ b6, b0' = b6, everything else shifts down."""
    b6, b5, b4, b3, b2, b1, b0 = [1] + [(channel >> (5 - i)) & 1
                                        for i in range(6)]
    out = []
    for u in bits:
        out.append(int(u) ^ b6)
        b6, b5, b4, b3, b2, b1, b0 = b5, b4, b3 ^ b6, b2, b1, b0, b6
    return np.asarray(out, np.int32)


def _crc24_loop_twin(bits):
    """CRC-24 long-division loop, written independently of gf2.py."""
    poly = 0x00065B
    reg = 0x555555
    for b in bits:
        fb = ((reg >> 23) & 1) ^ int(b)
        reg = (reg << 1) & 0xFFFFFF
        if fb:
            reg ^= poly
    return ((reg >> np.arange(24)) & 1).astype(np.int32)


def test_whitening_matches_independent_loop_and_self_inverts():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 200).astype(np.int32)
    for ch in (37, 38, 39, 5):
        w = whiten_bits(bits, ch)
        assert np.array_equal(w, _whiten_loop_twin(bits, ch)), ch
        assert np.array_equal(whiten_bits(w, ch), bits)        # involution
        assert not np.array_equal(w, bits)


def test_crc24_matches_independent_loop():
    rng = np.random.default_rng(1)
    for n in (16, 80, 303):
        bits = rng.integers(0, 2, n).astype(np.int32)
        assert np.array_equal(crc24(bits), _crc24_loop_twin(bits)), n


def test_frame_roundtrip_bits_only():
    payload = b"srcdsp_tpu adv!"
    frame = build_adv_frame(payload, channel=38)
    assert frame.size == 8 + 32 + (2 + len(payload) + 3) * 8
    # preamble alternates into the AA's first bit
    pa = np.concatenate([preamble_bits(), access_address_bits()[:1]])
    assert np.all(np.abs(np.diff(pa)) == 1)
    got, ok, idx = decode_adv_frame(frame, channel=38)
    assert ok and got == payload and idx == 40

    # one flipped payload bit must fail the CRC
    bad = frame.copy()
    bad[60] ^= 1
    got2, ok2, _ = decode_adv_frame(bad, channel=38)
    assert not ok2


def test_ble_adv_e2e_over_impaired_channel():
    """Full link: GFSK BT=0.5 modulate, unknown delay + CFO + AWGN,
    FSK-chain demod (timing_forget for the smooth CPM timing tone),
    AA correlation + de-whiten + CRC — payload recovered, CRC ok."""
    from srcdsp_tpu.chains.fsk import fsk_apply, fsk_init, make_fsk_params
    from srcdsp_tpu.testing.signals import gmsk_baseband, tone

    payload = bytes(range(32))
    channel = 37
    frame = build_adv_frame(payload, channel=channel)
    decim, sps = 2, 4
    spb = decim * sps
    rng = np.random.default_rng(2)
    # pad with random bits so the frame sits at an unknown bit offset
    pre = rng.integers(0, 2, 64)
    post = rng.integers(0, 2, 64)
    airbits = np.concatenate([pre, frame, post])
    x = np.asarray(gmsk_baseband(airbits, spb, bt=0.5))
    cfo = 0.004
    x = x * np.asarray(tone(x.size, cfo))
    x = x + 0.05 * (rng.standard_normal(x.size)
                    + 1j * rng.standard_normal(x.size))
    x = x.astype(np.complex64)

    params = make_fsk_params(cfo, 64, 0.45 / decim, decim=decim, sps=sps,
                             dev=0.25 / sps, timing_forget=0.95)
    n = (x.size // (decim * sps)) * decim * sps
    st = fsk_init(params)
    st, (bits_hat, _) = jax.jit(
        lambda s, v: fsk_apply(params, s, v))(st, jnp.asarray(x[:n]))
    bits_hat = np.asarray(bits_hat)[0] if bits_hat.ndim > 1 \
        else np.asarray(bits_hat)

    got, ok, idx = decode_adv_frame(bits_hat, channel=channel)
    assert ok, "CRC failed through the impaired channel"
    assert got == payload
