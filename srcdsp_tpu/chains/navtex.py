"""NAVTEX / SITOR-B (FEC broadcast telex) — the TWELFTH real protocol:
the 518 kHz maritime safety broadcast. Published STRUCTURE implemented
throughout; the character-to-codeword TABLE is a documented repo
convention (see below), the same offline policy as the BLE-style link.

Physical layer (published): FSK at 100 Bd, 170 Hz shift (mark 85 Hz
below center at 518 kHz convention — here mark/space are +-85 Hz at
complex baseband through the standard chains.fsk demodulator).

Code layer (published structure): CCIR 476 7-bit CONSTANT-WEIGHT
codes — every valid character has exactly 4 mark bits and 3 space
bits, so ANY odd number of bit errors (and most even patterns) is
detectable per character with no parity overhead; 35 codewords exist,
covering the ITA2 alphabet in letters/figures shift plus control
characters (alpha, rep, shifts). Which 7-bit pattern maps to which
character: repo-derived canonical assignment (`_build_table`) — the
weight-4 codewords in ascending numeric order assigned to the
character roster in a fixed documented order. Interop with off-air
NAVTEX would need the published CCIR 476 table dropped into
`_TABLE_ROSTER` — the machinery is table-driven precisely for that.

FEC layer (published): SITOR-B time diversity — every character is
transmitted twice, the DX (first) copy followed by the RX (repeat)
copy FIVE character slots later (tx stream interleaves DX(n) with
RX(n-5)). The receiver takes whichever copy passes the 4/3 weight
check; both failing marks an erasure ('*' by convention). Phasing:
the idle/phasing sequence alternates rep/alpha so the receiver can
find both the character boundary and the DX/RX lane parity.

Message layer (published): 'ZCZC B1B2B3B4' header (station + type +
serial) and 'NNNN' terminator.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["CW_TABLE", "code_to_char", "ALPHA", "REP",
           "LTRS", "FIGS", "sitor_b_encode", "sitor_b_decode",
           "navtex_build", "navtex_parse", "navtex_modulate",
           "decode_navtex_audio"]


def _weight4_codes() -> list[int]:
    return [c for c in range(128) if bin(c).count("1") == 4]   # 35


# Character roster in the canonical assignment order (repo convention;
# control characters first, then ITA2 letters, then the figures used
# by NAVTEX traffic). len == 35 == number of weight-4 codewords.
_TABLE_ROSTER = (
    ["<alpha>", "<rep>", "<ltrs>", "<figs>", " ", "\r", "\n"]
    + list("ABCDEFGHIJKLMNOPQRSTUVWXYZ")
    + ["?", "/"]
)

CW_TABLE = dict(zip(_TABLE_ROSTER, _weight4_codes()))
_INV = {v: k for k, v in CW_TABLE.items()}
ALPHA, REP = CW_TABLE["<alpha>"], CW_TABLE["<rep>"]
LTRS, FIGS = CW_TABLE["<ltrs>"], CW_TABLE["<figs>"]

# figures-shift mapping for the digits NAVTEX headers need (ITA2
# figures ride the letter codewords under the FIGS shift state)
_FIGS_MAP = dict(zip("QWERTYUIOP", "1234567890"))
_FIGS_INV = {v: k for k, v in _FIGS_MAP.items()}


def code_to_char(code: int, figs: bool) -> str:
    ch = _INV.get(code)
    if ch is None:
        return "*"
    if figs and ch in _FIGS_MAP:
        return _FIGS_MAP[ch]
    return ch


def _text_codes(text: str) -> list[int]:
    """Text -> codewords with automatic LTRS/FIGS shift insertion
    (only the shift-sensitive letters — the digit row — force a LTRS
    downshift; everything else is shift-neutral here)."""
    out = []
    figs = False
    for ch in text.upper():
        if ch in _FIGS_INV:                       # digit: FIGS state
            if not figs:
                out.append(FIGS)
                figs = True
            out.append(CW_TABLE[_FIGS_INV[ch]])
        elif ch in CW_TABLE:
            if figs and ch in _FIGS_MAP:          # shift-sensitive
                out.append(LTRS)
                figs = False
            out.append(CW_TABLE[ch])
        else:
            raise ValueError(f"unmapped character {ch!r}")
    return out


def sitor_b_encode(codes, n_phasing: int = 14) -> np.ndarray:
    """Codewords -> the SITOR-B diversity stream: tx slot 2k carries
    DX(k), slot 2k+1 carries RX(k-5) (alpha fill while k < 5 and for
    the 5-slot drain); preceded by the rep/alpha phasing sequence."""
    codes = list(codes)
    n = len(codes)
    tx = []
    for k in range(n + 5):
        tx.append(codes[k] if k < n else ALPHA)            # DX lane
        tx.append(codes[k - 5] if 0 <= k - 5 < n else REP)  # RX lane
    phasing = []
    for _ in range(n_phasing):
        phasing += [ALPHA, REP]     # alpha on the DX lane, rep on RX —
    return np.asarray(phasing + tx, np.int64)   # REP is RX-lane-only


def sitor_b_decode(stream) -> tuple[str, int]:
    """Received codeword stream (ints, any alignment) -> (text,
    n_erasures). Finds the phasing alignment (rep/alpha alternation
    fixes both the slot parity and the lane assignment), then per
    character takes DX if weight-4, else RX, else '*'."""
    s = np.asarray(stream, np.int64)
    # lane parity: REP lives only on the RX lane (phasing + drain
    # fill), so the parity with more REP codewords is RX
    rep0 = int((s[0::2] == REP).sum())
    rep1 = int((s[1::2] == REP).sum())
    dx_off = 1 if rep0 > rep1 else 0
    dx = s[dx_off::2]
    rx = s[1 - dx_off::2]
    # lane lag: slot 2k is DX(k), slot 2k+1 is RX(k-5); a stream cut
    # at an RX slot (dx_off == 1) shifts the repeat one further out
    lag = 5 + dx_off
    out = []
    erase = 0
    figs = False
    started = False           # suppress erasures in the phasing/fill
    n = dx.size               # head — a corrupted fill slot carries no
    for k in range(n):        # message information (review finding)
        c_dx = int(dx[k])
        c_rx = int(rx[k + lag]) if k + lag < rx.size else -1
        if bin(c_dx).count("1") == 4:
            c = c_dx
        elif c_rx >= 0 and bin(c_rx).count("1") == 4:
            c = c_rx
        else:
            if started:
                out.append("*")
                erase += 1
            continue
        if c == LTRS:
            figs = False
            continue
        if c == FIGS:
            figs = True
            continue
        if c in (ALPHA, REP):
            continue
        started = True
        out.append(code_to_char(c, figs))
    return "".join(out), erase


def navtex_build(station: str, msg_type: str, serial: str,
                 body: str) -> str:
    """Compose a NAVTEX message: ZCZC B1B2B3B4 <body> NNNN."""
    if len(station) != 1 or len(msg_type) != 1 or len(serial) != 2:
        raise ValueError("station/type = 1 char each, serial = 2 digits")
    return f"ZCZC {station}{msg_type}{serial}\r\n{body}\r\nNNNN"


def navtex_parse(text: str) -> dict | None:
    """Decoded text -> {'station','type','serial','body'} or None."""
    i = text.find("ZCZC ")
    j = text.find("NNNN", i + 5) if i >= 0 else -1
    if i < 0 or j < 0 or j <= i + 9:
        return None
    head = text[i + 5: i + 9]
    body = text[i + 9: j].strip("\r\n *")
    return {"station": head[0], "type": head[1], "serial": head[2:4],
            "body": body}


def navtex_modulate(codes: np.ndarray, sps: int,
                    dev: float) -> np.ndarray:
    """Codeword stream -> complex baseband FSK: 7 bits per char LSB
    first, mark (1) = +dev, space (0) = -dev cycles/sample,
    continuous phase, sps samples/bit (100 Bd => sps = fs/100).
    Synthesis = the shared testing.signals.fsk_baseband (mod-1-safe
    phase; the hand-rolled cumsum copies were deduplicated on review)."""
    from srcdsp_tpu.testing.signals import fsk_baseband
    codes = np.asarray(codes, np.int64)
    bits = ((codes[:, None] >> np.arange(7)) & 1).reshape(-1)
    return np.asarray(fsk_baseband(jnp.asarray(bits.astype(np.float32)),
                                   sps, dev)).astype(np.complex64)


def decode_navtex_audio(x, sps: int, dev: float,
                        num_taps: int = 64) -> tuple[str, int]:
    """Complex baseband -> (text, erasures): standard FSK chain at
    center 0 -> bits -> 7-bit char framing via the phasing alternation
    (the rep/alpha pattern has period 14 bits; correlate to find the
    bit offset) -> SITOR-B decode."""
    from srcdsp_tpu.chains.fsk import fsk_apply, fsk_init, make_fsk_params

    params = make_fsk_params(0.0, num_taps, 1.6 * dev, decim=1,
                             sps=sps, dev=dev)
    xx = np.asarray(x).astype(np.complex64)
    n = (xx.size // sps) * sps
    st = fsk_init(params)
    _, (lv, _) = jax.jit(
        lambda s, v: fsk_apply(params, s, v))(st, jnp.asarray(xx[:n]))
    bits = np.asarray(lv).reshape(-1)
    # frame: the phasing prefix repeats [rep, alpha] = a fixed 14-bit
    # pattern; correlate all 14 offsets over the stream head
    pat = ((np.asarray([ALPHA, REP], np.int64)[:, None]
            >> np.arange(7)) & 1).reshape(-1)
    pm = 1.0 - 2.0 * bits[: min(bits.size, 14 * 40)].astype(np.float64)
    tp = (1.0 - 2.0 * pat.astype(np.float64))
    best, best_off = None, 0
    for off in range(14):
        seg = pm[off:]
        nrep = seg.size // 14
        if nrep < 3:
            break
        sc = float(seg[: nrep * 14].reshape(nrep, 14).sum(0) @ tp)
        if best is None or sc > best:
            best, best_off = sc, off
    bits = bits[best_off:]
    nch = bits.size // 7
    codes = (bits[: nch * 7].reshape(nch, 7)
             @ (1 << np.arange(7))).astype(np.int64)
    return sitor_b_decode(codes)
