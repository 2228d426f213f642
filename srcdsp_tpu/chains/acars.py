"""ACARS (aircraft datalink) over MSK audio — the NINTH real protocol
from framework layers (BLE X46, ADS-B X48, AIS X49, RDS X57, POCSAG
X59, AX.25 X64, CSS X65, APT X66).

Physical layer (published): 2400 bd MSK on a VHF AM voice channel —
tones at 1200 Hz (bit '1': half a cycle per bit) and 2400 Hz (bit '0':
one full cycle), i.e. CPFSK with h = 0.5 centered at 1800 Hz. The
receive trick is the AX.25 one (chains/ax25.py): complexify the audio
and run the standard chains.fsk demodulator centered between the tones
— but unlike AX.25 there is NO NRZI, so the discriminator's sign maps
to bits directly (below center = 1200 Hz = '1').

Character layer (published): 8-bit characters transmitted LSB first,
bit 8 = ODD parity over the low 7 bits. Frame structure: pre-key
(all-'1' bits = steady 1200 Hz), bit-sync '+' '*', character-sync
SYN SYN (0x16 0x16), SOH (0x01), then the ARINC header — mode (1),
aircraft address (7), technical ack (1), label (2), block id (1) —
STX (0x02), free text, ETX (0x03, or ETB for multi-block), a 16-bit
block check sequence, and the DEL (0x7F) suffix.

BCS convention (re-derived, validated by self round trip +
independent loop twin — recorded-capture conformance pending, same
policy as BLE/AIS): CRC-16 poly 0x1021 in REFLECTED (LSB-first) form
with zero init, computed over the on-air bytes (parity bit included)
from the character after SOH through the ETX/ETB inclusive, and
transmitted LSB-first like every character.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.gf2 import crc_init, crc_update, crc_value, make_crc

__all__ = ["char_bits", "bits_chars", "acars_bcs",
           "build_acars_frame", "parse_acars_chars",
           "acars_modulate", "demod_acars_bits", "decode_acars_audio",
           "SOH", "STX", "ETX", "ETB", "DEL", "SYN"]

SOH, STX, ETX, ETB, DEL, SYN = 0x01, 0x02, 0x03, 0x17, 0x7F, 0x16
_SYNC_CHARS = (ord("+"), ord("*"), SYN, SYN)


def _with_parity(c: int) -> int:
    """7-bit char -> 8-bit on-air byte with ODD parity in bit 8."""
    c &= 0x7F
    ones = bin(c).count("1")
    return c | (0x80 if ones % 2 == 0 else 0)


def char_bits(chars) -> np.ndarray:
    """On-air bytes -> bit stream, LSB first (8 bits/char)."""
    ch = np.asarray(list(chars), np.int64)
    return ((ch[:, None] >> np.arange(8)) & 1).reshape(-1).astype(
        np.int32)


def bits_chars(bits: np.ndarray) -> np.ndarray:
    """Bit stream (len % 8 == 0) -> on-air bytes, LSB first."""
    b = np.asarray(bits, np.int64).reshape(-1, 8)
    return (b @ (1 << np.arange(8))).astype(np.int64)


_BCS = make_crc(0x1021, 16, init=0, xorout=0, reflect=True)


def acars_bcs(chars) -> int:
    """Block check sequence: reflected CRC-16 (poly 0x1021, LSB-first
    bit order, zero init — CRC-16/KERMIT) over the on-air bytes, via
    the house gf2 engine (the AIS X-25 FCS is the same reflected family
    with init/xorout 0xFFFF)."""
    s = crc_update(_BCS, crc_init(_BCS),
                   jnp.asarray(char_bits(chars), jnp.int32))
    return int(np.asarray(crc_value(_BCS, s)))


def build_acars_frame(text: bytes, mode: str = "2",
                      address: str = ".N12345", tak: int = 0x15,
                      label: str = "H1", bid: str = "1",
                      prekey_bits: int = 128) -> np.ndarray:
    """Downlink block -> on-air bit stream (int32 0/1).

    address is the 7-char registration field; tak 0x15 (NAK) is the
    no-ack convention; label is the 2-char message type."""
    if len(address) != 7 or len(label) != 2 or len(mode) != 1 \
            or len(bid) != 1:
        raise ValueError("mode/address/label/bid must be 1/7/2/1 chars")
    body7 = ([ord(mode)] + [ord(c) for c in address] + [tak]
             + [ord(c) for c in label] + [ord(bid)] + [STX]
             + list(text) + [ETX])
    body = [_with_parity(c) for c in body7]
    bcs = acars_bcs(body)
    head = [_with_parity(c) for c in _SYNC_CHARS] + [_with_parity(SOH)]
    bits = np.concatenate([
        np.ones(prekey_bits, np.int32),
        char_bits(head),
        char_bits(body),
        ((bcs >> np.arange(16)) & 1).astype(np.int32),   # LSB first
        char_bits([_with_parity(DEL)]),
    ])
    return bits


def parse_acars_chars(chars: np.ndarray) -> dict | None:
    """On-air bytes (starting at the char AFTER SOH) -> parsed block
    dict, or None. Locates ETX/ETB, verifies parity per char and the
    BCS that follows the terminator."""
    ch = np.asarray(chars, np.int64)
    term = None
    for i, c in enumerate(ch[:512]):
        if (c & 0x7F) in (ETX, ETB):
            term = i
            break
    if term is None or term + 3 > ch.size or term < 13:
        return None
    if int(ch[12]) & 0x7F != STX:
        # not a text block (or a bit error moved the terminator): the
        # fixed-offset header parse below would slice garbage fields
        return None
    body = ch[: term + 1]
    par_bad = int(sum(1 for c in body if bin(int(c)).count("1") % 2 == 0))
    # the 16 BCS bits are LSB-first on air, so char 0 is the low byte
    bcs_rx = int(ch[term + 1]) | (int(ch[term + 2]) << 8)
    ok = acars_bcs(body) == bcs_rx and par_bad == 0
    low = [int(c) & 0x7F for c in body]
    return {
        "mode": chr(low[0]), "address": "".join(map(chr, low[1:8])),
        "tak": low[8], "label": "".join(map(chr, low[9:11])),
        "bid": chr(low[11]),
        "text": bytes(low[13:term]).decode(errors="replace"),
        "parity_errors": par_bad, "bcs_ok": bool(ok),
    }


def acars_modulate(bits, sps: int, fs: float = 48000.0) -> np.ndarray:
    """Bit stream -> real MSK audio, continuous phase: '1' = 1200 Hz,
    '0' = 2400 Hz, sps = fs/2400 samples per bit."""
    b = np.asarray(bits, np.int32)
    freqs = np.where(b == 1, 1200.0 / fs, 2400.0 / fs)
    inst = np.repeat(freqs, sps)
    phase = 2 * np.pi * np.cumsum(inst)
    return np.cos(phase).astype(np.float32)


def demod_acars_bits(audio, sps: int, fs: float = 48000.0,
                     num_taps: int = 64) -> np.ndarray:
    """Real audio -> hard bits: complexify, standard FSK chain centered
    at 1800 Hz, discriminator sign -> '1' below center (1200 Hz)."""
    from srcdsp_tpu.chains.fsk import fsk_apply, fsk_init, make_fsk_params

    fc, dev = 1800.0 / fs, 600.0 / fs
    x = np.asarray(audio, np.float32).astype(np.complex64)
    # channel cutoff ~0.75x the 2400 bd bit rate: h=0.5 MSK spectrum
    # (Carson ~ +-1800 Hz) clips badly at the AX.25-style 1.6*dev
    params = make_fsk_params(fc, num_taps, 0.75 * 2400.0 / fs, decim=1,
                             sps=sps, dev=dev)
    n = (x.size // sps) * sps
    st = fsk_init(params)
    _, (lv_hat, _) = jax.jit(
        lambda s, v: fsk_apply(params, s, v))(st, jnp.asarray(x[:n]))
    # fsk_apply's level 1 = positive discriminator = ABOVE center =
    # 2400 Hz = bit '0'; flip to the ACARS orientation
    return (1 - np.asarray(lv_hat).reshape(-1)).astype(np.int32)


def decode_acars_audio(audio, sps: int, fs: float = 48000.0,
                       max_blocks: int = 16) -> list[dict]:
    """Real audio -> parsed ACARS blocks: demod, correlate the 40-bit
    sync+SOH signature at every bit offset, parse each hit."""
    bits = demod_acars_bits(audio, sps, fs)
    sig = char_bits([_with_parity(c) for c in _SYNC_CHARS]
                    + [_with_parity(SOH)])
    pm = 1.0 - 2.0 * bits.astype(np.float32)
    tpl = 1.0 - 2.0 * sig.astype(np.float32)
    if bits.size < sig.size + 8:
        return []
    corr = np.correlate(pm, tpl, mode="valid")
    hits = np.where(corr >= sig.size - 2 * 2)[0]   # <= 2 bit errors
    out = []
    last = -40
    for h in hits:
        if h - last < 40:                          # one hit per frame
            continue
        start = h + sig.size
        rest = bits[start:]
        nch = rest.size // 8
        if nch < 16:
            continue
        rec = parse_acars_chars(bits_chars(rest[: nch * 8]))
        if rec is not None:
            rec["start_bit"] = int(h)
            out.append(rec)
            last = h
            if len(out) >= max_blocks:
                break
    return out
