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
    """Published BLE whitening recurrence as the well-known integer
    register walk (independent of gf2.py): whit = 0x40 | channel; per
    bit out = whit & 1, whit >>= 1, and if out the taps 0x44 fold in."""
    whit = 0x40 | channel
    out = []
    for u in bits:
        o = whit & 1
        whit >>= 1
        if o:
            whit ^= 0x44
        out.append(int(u) ^ o)
    return np.asarray(out, np.int32)


def _crc24_loop_twin(bits):
    """CRC-24 long-division loop, written independently of gf2.py;
    emission order = register bit 23 first (the published direction)."""
    poly = 0x00065B
    reg = 0x555555
    for b in bits:
        fb = ((reg >> 23) & 1) ^ int(b)
        reg = (reg << 1) & 0xFFFFFF
        if fb:
            reg ^= poly
    return ((reg >> (23 - np.arange(24))) & 1).astype(np.int32)


def test_whitening_matches_independent_loop_and_self_inverts():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 200).astype(np.int32)
    # pinned keystream head for channel 37 (the published register walk)
    ks37 = whiten_bits(np.zeros(8, np.int32), 37)
    assert np.array_equal(ks37, [1, 0, 1, 1, 0, 0, 0, 1]), ks37
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
