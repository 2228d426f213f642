"""RTTY (Baudot/ITA2 radioteletype) + the generic ASYNC START/STOP
deframer — the THIRTEENTH real protocol, and the zoo's first
asynchronous (UART-style) framing machinery (everything so far was
synchronous: HDLC flags, SITOR phasing, preambles).

Physical layer (published structure): 45.45 Bd FSK, 170 Hz shift
(amateur convention: MARK = the higher RF tone = logic 1 = idle).
Character framing is ASYNC serial: idle at mark; each character is
1 START bit (space), 5 data bits LSB-first, and >= 1.5 STOP bits
(mark). The receiver needs no clock recovery loop — each character
re-synchronizes on its own start edge, the classic UART trick, which
`uart_deframe` implements generically (any data width / stop length;
usable for any async line protocol).

Code layer: ITA2 5-bit alphabet with LTRS (0x1F) / FIGS (0x1B) shift
states — the shift codewords and the NUL/SPACE/CR/LF positions are the
published ITA2 control points; the letter/figure assignments use the
published ITA2 table as transcribed in `_ITA2_LTRS`/`_ITA2_FIGS`
(offline policy: self round trip + independent spot values in tests;
off-air interop would validate the full table against a recorded
capture)."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["uart_frame", "uart_deframe", "LTRS", "FIGS",
           "ita2_encode", "ita2_decode", "rtty_modulate",
           "decode_rtty"]

LTRS, FIGS = 0x1F, 0x1B

# ITA2 (US-TTY flavor) — index = 5-bit code, LSB-first on the wire.
_ITA2_LTRS = [
    "\x00", "E", "\n", "A", " ", "S", "I", "U",
    "\r", "D", "R", "J", "N", "F", "C", "K",
    "T", "Z", "L", "W", "H", "Y", "P", "Q",
    "O", "B", "G", "<figs>", "M", "X", "V", "<ltrs>",
]
_ITA2_FIGS = [
    "\x00", "3", "\n", "-", " ", "'", "8", "7",
    "\r", "$", "4", "\x07", ",", "!", ":", "(",
    "5", '"', ")", "2", "#", "6", "0", "1",
    "9", "?", "&", "<figs>", ".", "/", ";", "<ltrs>",
]
_INV_LTRS = {c: i for i, c in enumerate(_ITA2_LTRS)
             if c not in ("<figs>", "<ltrs>")}
_INV_FIGS = {c: i for i, c in enumerate(_ITA2_FIGS)
             if c not in ("<figs>", "<ltrs>")}


# ---------------------------------------------------------------------------
# generic async start/stop framing (bit level)
# ---------------------------------------------------------------------------

def uart_frame(chars, data_bits: int = 5, stop_bits: float = 1.5,
               lead_idle: int = 8) -> np.ndarray:
    """Character codes -> line levels (1 = mark/idle, 0 = space) at
    TWICE the baud rate (half-bit granularity carries the 1.5-stop
    convention exactly)."""
    out = [1] * (2 * lead_idle)
    nstop = int(round(2 * stop_bits))
    for c in chars:
        out += [0, 0]                                  # start bit
        for b in range(data_bits):
            v = (int(c) >> b) & 1
            out += [v, v]
        out += [1] * nstop
    return np.asarray(out, np.int32)


def uart_deframe(levels, data_bits: int = 5, stop_bits: float = 1.5,
                 max_chars: int = 10000) -> np.ndarray:
    """Half-bit line levels -> character codes. Each character self-
    synchronizes: scan for a mark->space transition (idle -> start),
    sample each data bit at its CENTER half-cell, verify the stop bit
    is mark (else it was a hit on data — resync by sliding one
    half-cell). The generic async-serial receiver."""
    lv = np.asarray(levels, np.int32)
    out = []
    i = 1
    n = lv.size
    nstop = int(round(2 * stop_bits))
    # a character needs start(2) + data(2*db) + ONE stop half-cell in
    # view (the rest of the stop run may fall off the stream end)
    while i <= n - (2 + 2 * data_bits + 1) and len(out) < max_chars:
        if not (lv[i - 1] == 1 and lv[i] == 0):
            i += 1
            continue
        # start-bit center check (half-cell i+1 should still be space)
        if lv[i + 1] != 0:
            i += 1
            continue
        # sample each data bit at its SECOND half-cell (settled value)
        bits = [int(lv[i + 2 + 2 * b + 1]) for b in range(data_bits)]
        stop = lv[i + 2 + 2 * data_bits]
        if stop != 1:
            i += 1
            continue
        out.append(sum(b << k for k, b in enumerate(bits)))
        i += 2 + 2 * data_bits + nstop
    return np.asarray(out, np.int64)


# ---------------------------------------------------------------------------
# ITA2 text layer
# ---------------------------------------------------------------------------

def ita2_encode(text: str) -> list[int]:
    """Text -> ITA2 codes with automatic shift insertion (starts in
    LTRS; emits the shift character on every state change)."""
    out = [LTRS]
    figs = False
    for ch in text.upper():
        if ch in _INV_LTRS and ch in _INV_FIGS \
                and _INV_LTRS[ch] == _INV_FIGS[ch]:
            out.append(_INV_LTRS[ch])        # shift-neutral (space/CR/LF)
            continue
        if ch in _INV_LTRS:
            if figs:
                out.append(LTRS)
                figs = False
            out.append(_INV_LTRS[ch])
        elif ch in _INV_FIGS:
            if not figs:
                out.append(FIGS)
                figs = True
            out.append(_INV_FIGS[ch])
        else:
            raise ValueError(f"unmapped character {ch!r}")
    return out


def ita2_decode(codes) -> str:
    out = []
    figs = False
    for c in codes:
        c = int(c) & 0x1F
        if c == LTRS:
            figs = False
            continue
        if c == FIGS:
            figs = True
            continue
        out.append((_ITA2_FIGS if figs else _ITA2_LTRS)[c])
    return "".join(out)


# ---------------------------------------------------------------------------
# FSK link
# ---------------------------------------------------------------------------

def rtty_modulate(levels, sps_half: int, dev: float) -> np.ndarray:
    """Half-bit levels -> complex baseband FSK (mark = +dev,
    space = -dev cycles/sample), continuous phase; sps_half samples
    per HALF bit (baud rate = fs / (2 * sps_half)). Synthesis = the
    shared testing.signals.fsk_baseband (dedup, review finding)."""
    from srcdsp_tpu.testing.signals import fsk_baseband
    lv = np.asarray(levels, np.float32)
    return np.asarray(fsk_baseband(jnp.asarray(lv), sps_half, dev)
                      ).astype(np.complex64)


def decode_rtty(x, sps_half: int, dev: float,
                num_taps: int = 64) -> str:
    """Complex baseband -> text: standard FSK chain at half-bit rate
    -> async deframe -> ITA2."""
    from srcdsp_tpu.chains.fsk import fsk_apply, fsk_init, make_fsk_params

    params = make_fsk_params(0.0, num_taps, 1.6 * dev, decim=1,
                             sps=sps_half, dev=dev)
    xx = np.asarray(x).astype(np.complex64)
    n = (xx.size // sps_half) * sps_half
    st = fsk_init(params)
    _, (lv, _) = jax.jit(
        lambda s, v: fsk_apply(params, s, v))(st, jnp.asarray(xx[:n]))
    return ita2_decode(uart_deframe(np.asarray(lv).reshape(-1)))
