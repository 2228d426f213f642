"""SAME / EAS (Specific Area Message Encoding, the US Emergency Alert
System header) — the FOURTEENTH real protocol: AFSK at 520.83 Bd
(exactly 1/3 of the 1562.5 Hz space tone), mark 2083.3 Hz = 4/3
space, each bit exactly one mark-tone... the published tone relation
is mark = 2083 1/3 Hz (4 cycles/bit), space = 1562.5 Hz (3
cycles/bit) — bytes LSB-first, no start/stop bits (synchronous
bytes), framed by a 16-byte 0xAB preamble.

Header text (published): 'ZCZC-ORG-EEE-PSSCCC+TTTT-JJJHHMM-LLLLLLLL-'
(originator, event code, FIPS location(s), purge time, julian
day/time, sender), transmitted THREE times for voting; the
end-of-message burst is preamble + 'NNNN'.

Receive chain: the standard chains.fsk discriminator centered between
the tones (the AX.25/ACARS complexify trick for real audio), byte
alignment by correlating the known 0xAB preamble pattern over all 8
bit phases, 2-of-3 character voting across the repeated bursts, then
field parsing. Offline conformance policy as everywhere: published
constants + self round trip; the tone frequencies and byte conventions
are the published ones."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["PREAMBLE", "same_build", "same_parse", "same_bytes_bits",
           "same_modulate", "decode_same_audio"]

PREAMBLE = 0xAB
BAUD = 520.8333333
F_MARK, F_SPACE = 2083.3333333, 1562.5


def same_build(org: str, event: str, fips, purge: str, ts: str,
               sender: str) -> str:
    """Compose the SAME header string (single-location form takes one
    FIPS code string, multi-location a list)."""
    if isinstance(fips, str):
        fips = [fips]
    loc = "-".join(fips)
    return f"ZCZC-{org}-{event}-{loc}+{purge}-{ts}-{sender}-"


def same_parse(text: str) -> dict | None:
    """Header string -> fields, or None."""
    i = text.find("ZCZC-")
    if i < 0:
        return None
    body = text[i + 5:]
    plus = body.find("+")
    if plus < 0:
        return None
    head = body[:plus].split("-")
    if len(head) < 3:
        return None
    tail = body[plus + 1:].split("-")
    if len(tail) < 3:
        return None
    return {"org": head[0], "event": head[1], "fips": head[2:],
            "purge": tail[0], "timestamp": tail[1],
            "sender": tail[2]}


def same_bytes_bits(data: bytes, n_preamble: int = 16) -> np.ndarray:
    """Message bytes -> bit stream (LSB-first per byte, synchronous,
    no start/stop bits) with the 0xAB preamble run prepended."""
    raw = bytes([PREAMBLE] * n_preamble) + data
    b = np.frombuffer(raw, np.uint8)
    return ((b[:, None] >> np.arange(8)) & 1).reshape(-1).astype(
        np.int32)


def same_modulate(bits, fs: float = 12500.0) -> np.ndarray:
    """Bits -> real AFSK audio: mark (1) = 2083.33 Hz (4 cycles/bit),
    space (0) = 1562.5 Hz (3 cycles/bit), continuous phase. fs must
    give an integer samples/bit (default 12500/520.83 = 24)."""
    sps = fs / BAUD
    if abs(sps - round(sps)) > 1e-6:
        raise ValueError(f"fs {fs} is not an integer multiple of the "
                         f"520.83 Bd bit rate")
    sps = int(round(sps))
    b = np.asarray(bits, np.int32)
    freqs = np.where(b == 1, F_MARK / fs, F_SPACE / fs)
    inst = np.repeat(freqs, sps)
    phase = 2 * np.pi * np.mod(np.cumsum(inst), 1.0)
    return np.cos(phase).astype(np.float32)


def _demod_bits(audio, fs: float, num_taps: int = 64) -> np.ndarray:
    from srcdsp_tpu.chains.fsk import fsk_apply, fsk_init, make_fsk_params

    sps = int(round(fs / BAUD))
    fc = 0.5 * (F_MARK + F_SPACE) / fs
    dev = 0.5 * (F_MARK - F_SPACE) / fs
    x = np.asarray(audio, np.float32).astype(np.complex64)
    params = make_fsk_params(fc, num_taps, 0.8 * BAUD * 2 / fs, decim=1,
                             sps=sps, dev=dev)
    n = (x.size // sps) * sps
    st = fsk_init(params)
    _, (lv, _) = jax.jit(
        lambda s, v: fsk_apply(params, s, v))(st, jnp.asarray(x[:n]))
    return np.asarray(lv).reshape(-1)


def decode_same_audio(audio, fs: float = 12500.0,
                      max_len: int = 268) -> list[str]:
    """Real audio -> decoded header strings (one per burst found).

    Byte alignment: correlate the 8-bit preamble pattern (0xAB
    LSB-first = 11010101) over the stream, fold scores modulo 8 to
    pick the bit phase, then split on preamble runs and read bytes
    until the text stops looking like ASCII."""
    bits = _demod_bits(audio, fs)
    if bits.size < 64:
        return []
    pat = ((PREAMBLE >> np.arange(8)) & 1).astype(np.float64)
    pm = 1.0 - 2.0 * bits.astype(np.float64)
    tp = 1.0 - 2.0 * pat
    corr = np.correlate(pm, tp, mode="valid")
    hits = np.flatnonzero(corr >= 7.5)          # exact preamble bytes
    out = []
    used = -1
    for h in hits:
        if h <= used:
            continue
        # walk forward past the preamble run
        p = h
        while p + 16 <= bits.size and float(
                pm[p: p + 8] @ tp) >= 7.5:
            p += 8
        # read ASCII bytes until a non-printable or max_len
        chars = []
        q = p
        while q + 8 <= bits.size and len(chars) < max_len:
            v = int((bits[q: q + 8] * (1 << np.arange(8))).sum())
            if not (32 <= v < 127):
                break
            chars.append(chr(v))
            q += 8
        text = "".join(chars)
        if "ZCZC-" in text or text.startswith("NNNN"):
            out.append(text)
            used = q
    return out
