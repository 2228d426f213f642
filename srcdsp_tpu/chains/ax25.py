"""AX.25 / APRS over Bell-202 AFSK — the SIXTH real protocol from
framework layers (BLE X46, ADS-B X48, AIS X49, RDS X57, POCSAG X59).

The amateur packet-radio stack is almost entirely the AIS stack: the
HDLC framing, bit stuffing, X-25 FCS (CRC-16 LSB-first) and NRZI line
coding are IDENTICAL, so the whole link layer reuses chains/ais.py's
machinery verbatim (`decode_all_ais_frames` is the shared HDLC stream
decoder — only the preamble differs: AX.25 idles on repeated flags).
New here:

- the AX.25 ADDRESS layer: callsigns ASCII<<1 + SSID bytes with the
  HDLC extension bit, dest/src/up-to-8 digipeaters, UI frames
  (control 0x03, PID 0xF0 — the APRS convention);
- the Bell-202 PHYSICAL layer on REAL audio: mark 1200 Hz / space
  2200 Hz at 1200 baud. The receive trick: complexify the audio and
  hand it to the standard chains.fsk demodulator centered at 1700 Hz —
  the FSK chain's own mix+lowpass IS the analytic band select (the
  negative-frequency image lands 3.4 kHz away and dies in the channel
  filter), the discriminator sign splits mark/space, and NRZI-S makes
  the result polarity-immune, so the mark/space-to-bit orientation
  never needs resolving.

Offline conformance: independent address-codec loop twin in the tests
plus the full text -> AX.25/UI -> AFSK audio -> noise -> demod ->
deframe -> FCS -> parse round trip.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.chains.ais import (build_hdlc_air_bits,
                                   decode_all_ais_frames, nrzi_encode)
from srcdsp_tpu.hdlc import FLAG

__all__ = ["encode_address", "decode_address", "build_ax25_frame",
           "parse_ax25", "afsk_modulate", "decode_ax25_audio",
           "build_aprs_frame"]

_CTRL_UI = 0x03
_PID_NONE = 0xF0


def encode_address(call: str, ssid: int = 0, last: bool = False,
                   command: bool = False) -> bytes:
    """Callsign (<= 6 chars) + SSID -> the 7-byte AX.25 address field:
    ASCII shifted left one bit; byte 7 = 0b011_SSID_E with E the
    extension bit (1 only on the LAST address)."""
    call = call.upper().ljust(6)[:6]
    b = bytes((ord(c) << 1) & 0xFF for c in call)
    ss = 0x60 | ((ssid & 0xF) << 1) | (1 if last else 0)
    if command:
        ss |= 0x80
    return b + bytes([ss])


def decode_address(b: bytes) -> tuple[str, int, bool]:
    """7 bytes -> (callsign, ssid, last)."""
    call = "".join(chr(v >> 1) for v in b[:6]).rstrip()
    return call, (b[6] >> 1) & 0xF, bool(b[6] & 1)


def build_ax25_frame(dest: str, src: str, info: bytes,
                     path: tuple = (), dest_ssid: int = 0,
                     src_ssid: int = 0, n_preamble_flags: int = 8
                     ) -> np.ndarray:
    """UI frame -> NRZI line levels ready for afsk_modulate.

    path: optional digipeater (callsign, ssid) pairs. The HDLC layer
    (flags, stuffing, FCS) comes from the shared AIS machinery; AX.25
    idles on repeated flags, so the preamble is n_preamble_flags copies
    of 01111110 prepended to the framed bits."""
    # dest carries C=1, src C=0 — the AX.25 2.x command-frame marking
    # every modern APRS stack emits
    addrs = [encode_address(dest, dest_ssid, command=True),
             encode_address(src, src_ssid, last=not path)]
    for i, (c, s) in enumerate(path):
        addrs.append(encode_address(c, s, last=(i == len(path) - 1)))
    payload = b"".join(addrs) + bytes([_CTRL_UI, _PID_NONE]) + bytes(info)
    air = build_hdlc_air_bits(payload)
    pre = np.tile(FLAG, n_preamble_flags).astype(np.int32)
    return nrzi_encode(np.concatenate([pre, air]))


def parse_ax25(payload: bytes) -> dict | None:
    """FCS-clean frame bytes -> {dest, src, path, control, pid, info}
    (None if the address chain is malformed)."""
    if len(payload) < 16:
        return None
    dest = decode_address(payload[0:7])
    src = decode_address(payload[7:14])
    path = []
    off = 14
    last = src[2]
    while not last:
        if off + 7 > len(payload) or len(path) >= 8:
            return None
        a = decode_address(payload[off: off + 7])
        path.append((a[0], a[1]))
        last = a[2]
        off += 7
    if off + 2 > len(payload):
        return None
    return {"dest": (dest[0], dest[1]), "src": (src[0], src[1]),
            "path": tuple(path), "control": payload[off],
            "pid": payload[off + 1], "info": payload[off + 2:]}


def build_aprs_frame(src: str, text: str, dest: str = "APRS",
                     path: tuple = (("WIDE1", 1),)) -> np.ndarray:
    """APRS convenience: a UI text frame via the standard path."""
    return build_ax25_frame(dest, src, text.encode(), path=path)


def afsk_modulate(levels, sps: int, f_mark: float, f_space: float
                  ) -> np.ndarray:
    """NRZI line levels -> real Bell-202 audio, continuous phase.

    f_mark/f_space in cycles/sample (1200/fs, 2200/fs); sps = fs/1200
    samples per bit. Level 1 -> mark. Host-side fixture (like the other
    protocol modulators)."""
    lv = np.asarray(levels, np.int32)
    freqs = np.where(lv == 1, f_mark, f_space)
    inst = np.repeat(freqs, sps)
    phase = 2 * np.pi * np.cumsum(inst)
    return np.cos(phase).astype(np.float32)


def decode_ax25_audio(audio, sps: int, f_mark: float, f_space: float,
                      num_taps: int = 64) -> list[dict]:
    """Real audio -> parsed AX.25 frames.

    Complexify, run the standard FSK chain centered between the tones
    (its mix+lowpass is the analytic band select), NRZI-immune HDLC
    stream decode (shared with AIS), FCS gate, address parse."""
    from srcdsp_tpu.chains.fsk import fsk_apply, fsk_init, make_fsk_params

    fc = 0.5 * (f_mark + f_space)
    dev = 0.5 * (f_space - f_mark)
    x = np.asarray(audio, np.float32).astype(np.complex64)
    params = make_fsk_params(fc, num_taps, 1.6 * dev, decim=1, sps=sps,
                             dev=dev)
    n = (x.size // sps) * sps
    st = fsk_init(params)
    _, (lv_hat, _) = jax.jit(
        lambda s, v: fsk_apply(params, s, v))(st, jnp.asarray(x[:n]))
    levels = np.asarray(lv_hat).reshape(-1)
    frames = decode_all_ais_frames(levels)
    out = []
    for payload, start in frames:
        rec = parse_ax25(payload)
        if rec is not None:
            rec["start_bit"] = int(start)
            out.append(rec)
    return out
