"""BLE-style GFSK advertising link (beyond parity): a full published
air-interface exercised end-to-end through the framework's own layers —
GFSK BT=0.5 h=1/2 modulation (testing.signals.gmsk_baseband), the FSK
discriminator chain for demod, gf2.py machines for whitening and CRC-24,
and access-address correlation for frame sync.

Format (Bluetooth LE 1M uncoded PHY, advertising channel):

    preamble (8 alternating bits) | access address (32 bits, LSB-first
    0x8E89BED6) | PDU header (2 bytes: type, length) | payload | CRC-24
    — header+payload+CRC whitened by the x^7 + x^4 + 1 LFSR seeded from
    the channel index; every byte is transmitted LSB-first; CRC-24 poly
    x^24+x^10+x^9+x^6+x^4+x^3+x+1, register preset 0x555555.

Verification honesty: this environment has no network and no recorded
BLE captures, so conformance is established by (a) independent bit-level
LFSR/CRC loop twins in the tests (different code, same published
recurrences — incl. the pinned channel-37 keystream head 10110001 from
the 0x40|ch register walk), (b) the CRC emission order pinned to
register-bit-23-first per the published figure, and (c) the full
modulate -> channel -> demodulate -> de-whiten -> CRC round trip. A
round-4 adversarial review caught and fixed a reversed whitening seed
and CRC emission order that the self-consistent round trip alone could
not detect.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from srcdsp_tpu.gf2 import (Gf2Machine, bytes_to_bits, crc_init, crc_update,
                            crc_value, gf2_init, make_crc, scramble)

ADV_ACCESS_ADDRESS = 0x8E89BED6
ADV_CHANNELS = (37, 38, 39)

_CRC24 = make_crc(0x00065B, 24, init=0x555555)


def _whiten_machine() -> Gf2Machine:
    """The BLE whitening register in its published Galois form
    (x^7 + x^4 + 1), integer-register semantics `whit = 0x40 | channel;
    out = whit & 1; whit >>= 1; if out: whit ^= 0x44`: state
    s = [r0, r1, ..., r6] (register LSB first); per step out = r0, then
    r2' = r3 ^ r0, r6' = r0, everything else shifts down — expressed as
    a gf2.Gf2Machine (block state-space over GF(2)), so whitening whole
    blocks is the same exact-matrix machinery as the scramblers/CRCs.
    Keystream for channel 37 starts 10110001... (matches the published
    register walk — round-4 review finding fixed the seed order)."""
    a = np.zeros((7, 7), np.uint8)
    a[0, 1] = 1                 # r0' = r1
    a[1, 2] = 1                 # r1' = r2
    a[2, 3] = 1                 # r2' = r3 ^ r0 (the 0x44 tap at bit 2)
    a[2, 0] = 1
    a[3, 4] = 1                 # r3' = r4
    a[4, 5] = 1                 # r4' = r5
    a[5, 6] = 1                 # r5' = r6
    a[6, 0] = 1                 # r6' = r0 (the 0x44 tap at bit 6)
    c = np.zeros(7, np.uint8)
    c[0] = 1                    # output = r0 (register LSB)
    return Gf2Machine(a, np.zeros(7, np.uint8), c, 0, 512)


_WHITEN = _whiten_machine()


def access_address_bits(aa: int = ADV_ACCESS_ADDRESS) -> np.ndarray:
    """The 32 air bits of an access address (little-endian bytes, each
    LSB-first == plain LSB-first of the 32-bit value)."""
    return ((np.uint32(aa) >> np.arange(32, dtype=np.uint32)) & 1
            ).astype(np.int32)


def preamble_bits(aa: int = ADV_ACCESS_ADDRESS) -> np.ndarray:
    """8 alternating bits whose last bit differs from AA air-bit 0 (the
    published rule: the preamble continues the alternation into the
    access address)."""
    first_aa = aa & 1
    last = 1 - first_aa
    seq = [(last if (7 - i) % 2 == 0 else 1 - last) for i in range(8)]
    return np.asarray(seq, np.int32)


def whiten_bits(bits, channel: int):
    """Whiten (or de-whiten: self-inverse) air bits with the BLE LFSR.

    Register seed: 0x40 | channel (bit 6 = 1, bits 5..0 = the channel
    index), stored LSB-first to match the machine's state order."""
    seed = [(channel >> i) & 1 for i in range(6)] + [1]
    s = gf2_init(_WHITEN, seed)
    _s, out = scramble(_WHITEN, s, jnp.asarray(np.asarray(bits, np.int32)))
    return np.asarray(out, np.int32)


def crc24(pdu_bits) -> np.ndarray:
    """CRC-24 over PDU air bits -> 24 air bits, MOST significant register
    bit (LFSR position 23) first — the published emission order (unlike
    the payload's LSB-first bytes; round-4 review finding fixed the
    direction)."""
    s = crc_init(_CRC24)
    s = crc_update(_CRC24, s, jnp.asarray(np.asarray(pdu_bits, np.int32)))
    val = int(np.asarray(crc_value(_CRC24, s)))
    return ((val >> (23 - np.arange(24))) & 1).astype(np.int32)


def build_adv_frame(payload: bytes, channel: int = 37,
                    pdu_type: int = 0x02,
                    aa: int = ADV_ACCESS_ADDRESS) -> np.ndarray:
    """Assemble the air-bit stream of one advertising packet.

    pdu_type 0x02 = ADV_NONCONN_IND. Returns [8 + 32 + (2 + len + 3)*8]
    bits in transmission order (feed to gmsk_baseband at bt=0.5)."""
    if len(payload) > 255:
        raise ValueError("payload too long")
    header = bytes([pdu_type & 0xFF, len(payload)])
    pdu = bytes_to_bits(header + payload, lsb_first=True)
    pdu = np.concatenate([pdu, crc24(pdu)])
    return np.concatenate([preamble_bits(aa), access_address_bits(aa),
                           whiten_bits(pdu, channel)]).astype(np.int32)


def decode_adv_frame(bits, channel: int = 37,
                     aa: int = ADV_ACCESS_ADDRESS,
                     max_aa_errors: int = 0):
    """Host-side sink: recover the payload from demodulated hard bits.

    bits: [N] 0/1 from any demod (the FSK chain's output). Correlates
    the access-address pattern over all offsets and tries every
    candidate above the error threshold in descending correlation
    order — the first CRC-clean decode wins (same candidate-anchoring
    fix as decode_ais_frame: a spurious stronger correlation elsewhere
    in the capture must not mask the real frame). Returns
    (payload bytes | None, crc_ok, aa_index) — aa_index = offset of the
    first PDU bit; None payload if no AA match within max_aa_errors."""
    bits = np.asarray(bits, np.int32).ravel()
    pat = 1.0 - 2.0 * access_address_bits(aa).astype(np.float64)
    sig = 1.0 - 2.0 * bits.astype(np.float64)
    if sig.size < pat.size + 40:
        return None, False, -1
    corr = np.correlate(sig, pat, mode="valid")
    thresh = 32 - 2 * max_aa_errors
    cand = np.flatnonzero(corr >= thresh)
    if cand.size == 0:
        return None, False, -1
    cand = cand[np.argsort(corr[cand])[::-1]]  # best correlation first

    def _try(idx):
        start = idx + 32
        avail = bits.size - start
        if avail < 40:
            return None, False, start
        # de-whiten enough for the header, read the length, then the rest
        w = whiten_bits(bits[start: start + avail], channel)
        length = int(np.packbits(w[8:16][::-1])[0])
        need = (2 + length + 3) * 8
        if avail < need:
            return None, False, start
        pdu = w[: (2 + length) * 8]
        crc_rx = w[(2 + length) * 8: need]
        ok = bool(np.array_equal(crc24(pdu), crc_rx))
        payload = np.packbits(
            w[16: (2 + length) * 8].reshape(-1, 8)[:, ::-1]).tobytes()
        return payload, ok, start

    best = None
    for idx in cand:
        payload, ok, start = _try(int(idx))
        if ok:
            return payload, ok, start
        if best is None:
            best = (payload, ok, start)  # argmax fallback when none pass CRC
    return best


__all__ = ["ADV_ACCESS_ADDRESS", "ADV_CHANNELS", "access_address_bits",
           "preamble_bits", "whiten_bits", "crc24", "build_adv_frame",
           "decode_adv_frame"]
