"""POCSAG pager protocol (ITU-R M.584) — the FIFTH real protocol from
framework layers (BLE X46, ADS-B X48, AIS X49, RDS X57): 2-FSK NRZ at
512/1200/2400 bps carrying 32-bit codewords of BCH(31,21) t=2
(`srcdsp_tpu.bch`) plus an even parity bit.

Transmission structure: >=576 bits of 1010... preamble, then batches of
[FSC | 8 frames x 2 codewords]. The frame-sync codeword
FSC = 0x7CD215D8 and the idle word 0x7A89C197 are themselves valid
BCH+parity codewords — the unit tests verify BOTH published constants
against this module's independently-built code, which cross-validates
the generator (0x769), the bit ordering, and the parity convention in
one shot.

Address codewords (flag 0): the 21-bit RIC's high 18 bits + 2 function
bits, with the low 3 RIC bits IMPLICIT in the frame position (the
power-saving trick: a pager only wakes for its own frame). Message
codewords (flag 1): 20 data bits, belonging to the nearest preceding
address. Numeric payloads are BCD nibbles (helpers included).

The air interface is the existing FSK machinery: `pocsag_baseband`
feeds testing.signals.fsk_baseband and chains.fsk demodulates — the e2e
test runs encode -> FSK -> AWGN -> demod -> decode.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from srcdsp_tpu.bch import bch_decode, bch_encode, make_bch_code

__all__ = ["FSC", "IDLE", "make_codeword", "address_codeword",
           "message_codeword", "encode_transmission",
           "decode_transmission", "encode_numeric", "decode_numeric",
           "encode_alpha", "decode_alpha"]

FSC = 0x7CD215D8
IDLE = 0x7A89C197

_CODE = make_bch_code(5, 2)          # (31, 21) t=2, generator 0x769

_BCD = "0123456789*U -)("            # POCSAG numeric character set


def _int_to_bits(v: int, width: int) -> np.ndarray:
    return np.asarray([(v >> (width - 1 - i)) & 1 for i in range(width)],
                      np.int32)


def _bits_to_int(bits) -> int:
    v = 0
    for b in np.asarray(bits, int):
        v = (v << 1) | int(b)
    return v


def make_codeword(info21: np.ndarray) -> np.ndarray:
    """21 info bits -> 32-bit codeword (BCH parity + even parity)."""
    cw31 = np.asarray(bch_encode(_CODE, jnp.asarray(
        np.asarray(info21, np.int32)[None])))[0]
    par = int(cw31.sum()) % 2
    return np.concatenate([cw31, [par]]).astype(np.int32)


def address_codeword(ric: int, func: int = 0) -> np.ndarray:
    """RIC (21-bit receiver identity) + 2-bit function -> 32 bits.
    Only the high 18 RIC bits are transmitted; the low 3 select the
    frame this word must be placed in (ric & 7)."""
    info = np.concatenate([[0], _int_to_bits(ric >> 3, 18),
                           _int_to_bits(func, 2)])
    return make_codeword(info)


def message_codeword(data20: int) -> np.ndarray:
    info = np.concatenate([[1], _int_to_bits(data20, 20)])
    return make_codeword(info)


def encode_numeric(digits: str) -> list[int]:
    """Numeric message -> 20-bit data words (5 BCD nibbles per word,
    padded with spaces)."""
    nibs = [_BCD.index(ch) for ch in digits]
    while len(nibs) % 5:
        nibs.append(_BCD.index(" "))
    return [_bits_to_int(np.concatenate(
        [_int_to_bits(nb, 4) for nb in nibs[i: i + 5]]))
        for i in range(0, len(nibs), 5)]


def decode_numeric(words: list[int]) -> str:
    out = []
    for w in words:
        for j in range(5):
            out.append(_BCD[(w >> (16 - 4 * j)) & 0xF])
    return "".join(out).rstrip()


def encode_transmission(pages, preamble_bits: int = 576) -> np.ndarray:
    """pages: list of (ric, func, [data20, ...]) -> air bits.

    Each page's address goes in frame ric & 7 of a batch; its message
    words follow in subsequent slots (spilling into the next batch if
    needed); unused slots carry IDLE. One page per batch region here
    (the codec layer; schedulers can pack tighter)."""
    batches = []
    slots: list[np.ndarray] = []

    def flush():
        nonlocal slots
        while len(slots) % 16:
            slots.append(_int_to_bits(IDLE, 32))
        for i in range(0, len(slots), 16):
            batches.append(np.concatenate(
                [_int_to_bits(FSC, 32)] + slots[i: i + 16]))
        slots = []

    for ric, func, datas in pages:
        frame = ric & 7
        start = 2 * frame
        cur = len(slots) % 16
        pad = (start - cur) % 16
        slots.extend(_int_to_bits(IDLE, 32) for _ in range(pad))
        slots.append(address_codeword(ric, func))
        slots.extend(message_codeword(d) for d in datas)
    flush()
    pre = np.tile([1, 0], preamble_bits // 2).astype(np.int32)
    return np.concatenate([pre] + batches).astype(np.int32)


def _correct_word(bits32: np.ndarray):
    """-> (info21 | None, corrected count). BCH-corrects <=2 errors in
    the first 31 bits; the even-parity bit then serves two roles: a
    parity mismatch on an already-t-error word means >=t+1 total errors
    (likely a miscorrection — REJECT), while a mismatch on a cleaner
    word is the parity bit's own single error (accept, count it)."""
    msg, ok = bch_decode(_CODE, jnp.asarray(
        np.asarray(bits32[:31], np.int32)[None]))
    if not bool(np.asarray(ok)[0]):
        return None, 0
    info = np.asarray(msg)[0]
    cw31 = np.asarray(bch_encode(_CODE, jnp.asarray(info[None])))[0]
    nerr = int((cw31 != bits32[:31]).sum())
    par_ok = int(cw31.sum() + bits32[31]) % 2 == 0
    if not par_ok:
        if nerr >= _CODE.t:
            return None, 0               # >= t+1 total: distrust
        nerr += 1                        # the parity bit itself flipped
    return info, nerr


def decode_transmission(bits: np.ndarray, max_sync_err: int = 2):
    """Air bits -> list of pages {ric, func, data: [int, ...],
    corrected}. Locates FSC by Hamming correlation (<= max_sync_err
    flips), then walks 17-word batches, BCH-correcting every word."""
    bits = np.asarray(bits, np.int32)
    fsc = _int_to_bits(FSC, 32)
    n = bits.size
    if n < 32 * 17:
        return []
    win = np.lib.stride_tricks.sliding_window_view(bits, 32)
    dist = (win != fsc).sum(axis=1)
    cands = np.flatnonzero(dist <= max_sync_err)
    for start in cands:
        pages = _walk_batches(bits, int(start), fsc, max_sync_err)
        if pages:
            return pages
    return []


def _walk_batches(bits: np.ndarray, p: int, fsc: np.ndarray,
                  max_sync_err: int):
    n = bits.size
    pages = []
    cur = None
    while p + 32 * 17 <= n:
        # confirm batch alignment: this window must be (close to) FSC
        if (bits[p: p + 32] != fsc).sum() > max_sync_err:
            break
        for slot in range(16):
            q = p + 32 * (1 + slot)
            info, nerr = _correct_word(bits[q: q + 32])
            if info is None:
                continue
            word = _bits_to_int(info)
            if word == (IDLE >> 11):     # idle info bits
                continue
            if info[0] == 0:             # address
                ric = (_bits_to_int(info[1:19]) << 3) | (slot // 2)
                cur = {"ric": ric, "func": _bits_to_int(info[19:21]),
                       "data": [], "corrected": nerr}
                pages.append(cur)
            elif cur is not None:        # message
                cur["data"].append(_bits_to_int(info[1:21]))
                cur["corrected"] += nerr
        p += 32 * 17
    return pages


def pocsag_baseband(bits, sps: int, dev: float = 0.1):
    """Air bits -> complex 2-FSK baseband via the framework modulator
    (NRZ: bit value selects the tone; POCSAG polarity conventions vary
    by network — decode is polarity-checked by FSC, try inverted bits
    if sync fails)."""
    from srcdsp_tpu.testing.signals import fsk_baseband
    return fsk_baseband(jnp.asarray(np.asarray(bits, np.int32)), sps, dev)


def encode_alpha(text: str) -> list[int]:
    """Alphanumeric message -> 20-bit data words: 7-bit ASCII, each
    character LSB-first, packed contiguously across the 20-bit fields
    (the published alpha convention); padded with EOT (0x04)."""
    bits: list[int] = []
    for c in text:
        bits.extend((ord(c) & 0x7F) >> i & 1 for i in range(7))  # LSB 1st
    # pad ONLY the final partial word with EOT chars (truncating the
    # last pad char at the word boundary — the conventional encoding)
    target = -(-len(bits) // 20) * 20
    while len(bits) < target:
        bits.extend(0x04 >> i & 1 for i in range(7))
    bits = bits[:target]
    return [_bits_to_int(bits[i: i + 20]) for i in range(0, len(bits), 20)]


def decode_alpha(words: list[int]) -> str:
    """Inverse of encode_alpha; stops at the first EOT/NUL."""
    bits: list[int] = []
    for w in words:
        bits.extend(_int_to_bits(w, 20).tolist())
    out = []
    for i in range(0, len(bits) - 6, 7):
        c = 0
        for j in range(7):
            c |= bits[i + j] << j                        # LSB first
        if c in (0x00, 0x04):
            break
        out.append(chr(c))
    return "".join(out)
