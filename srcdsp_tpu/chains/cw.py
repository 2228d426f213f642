"""CW (Morse) keying — the FIFTEENTH real protocol, and the oldest:
on-off keyed carrier, decoded fully blind (unknown tone frequency,
unknown speed).

Receive chain: FFT peak finds the tone -> mix down + lowpass ->
envelope -> percentile threshold with hysteresis -> run-length
extraction -> ADAPTIVE element classification. The dit length is
estimated from the on-run durations themselves (the median of the
short cluster after a 2-means split), so any speed within the capture
works and drifting fists still classify: on-runs split dit/dah at
2x dit; gaps split element/character/word at 2x and 5x dit (the
standard 1/3/7 structure with margins). The code table is the ITU
alphabet (letters, digits, common punctuation + prosigns).

The encoder is the test fixture: text -> timing -> OOK tone; round
trips run at multiple WPM through noise and frequency offset in
tests/e2e/test_cw.py."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.ops.window import lowpass

__all__ = ["MORSE", "morse_encode_timing", "cw_modulate", "decode_cw"]

MORSE = {
    "A": ".-", "B": "-...", "C": "-.-.", "D": "-..", "E": ".",
    "F": "..-.", "G": "--.", "H": "....", "I": "..", "J": ".---",
    "K": "-.-", "L": ".-..", "M": "--", "N": "-.", "O": "---",
    "P": ".--.", "Q": "--.-", "R": ".-.", "S": "...", "T": "-",
    "U": "..-", "V": "...-", "W": ".--", "X": "-..-", "Y": "-.--",
    "Z": "--..",
    "0": "-----", "1": ".----", "2": "..---", "3": "...--",
    "4": "....-", "5": ".....", "6": "-....", "7": "--...",
    "8": "---..", "9": "----.",
    ".": ".-.-.-", ",": "--..--", "?": "..--..", "/": "-..-.",
    "=": "-...-", "+": ".-.-.", "-": "-....-", "@": ".--.-.",
}
_INV = {v: k for k, v in MORSE.items()}


def morse_encode_timing(text: str) -> list[tuple[int, int]]:
    """Text -> [(on, dits)] run list in dit units: dit=1, dah=3,
    element gap=1, char gap=3, word gap=7."""
    runs = []
    first_el = True
    for word in text.upper().split():
        if runs:
            runs.append((0, 7))
        first_ch = True
        for ch in word:
            code = MORSE.get(ch)
            if code is None:
                raise ValueError(f"no morse for {ch!r}")
            if not first_ch:
                runs.append((0, 3))
            first_ch = False
            first_el = True
            for el in code:
                if not first_el:
                    runs.append((0, 1))
                first_el = False
                runs.append((1, 1 if el == "." else 3))
    return runs


def cw_modulate(text: str, wpm: float, fs: float, tone_hz: float,
                rise_ms: float = 3.0) -> np.ndarray:
    """Text -> real keyed audio. Dit length = 1.2/wpm seconds (the
    PARIS convention); edges get a raised-cosine rise to bound key
    clicks."""
    dit_s = 1.2 / wpm
    runs = morse_encode_timing(text)
    env = []
    for on, dits in runs:
        env.append(np.full(int(round(dits * dit_s * fs)),
                           1.0 if on else 0.0, np.float64))
    env = np.concatenate(env) if env else np.zeros(0)
    # raised-cosine edge shaping (bounded key clicks): smooth the
    # keying envelope with a short Hann window
    nr = max(2, int(rise_ms * 1e-3 * fs))
    w = np.hanning(2 * nr + 1)
    sh = np.convolve(env, w / w.sum(), "same")
    t = np.arange(env.size)
    return (sh * np.cos(2 * np.pi * tone_hz / fs * t)).astype(
        np.float32)


def _runs(mask: np.ndarray):
    """Boolean mask -> [(value, length)] run-length encoding."""
    if mask.size == 0:
        return []
    change = np.flatnonzero(np.diff(mask.astype(np.int8))) + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [mask.size]])
    return [(bool(mask[s]), int(e - s)) for s, e in zip(starts, ends)]


def decode_cw(audio, fs: float) -> dict:
    """Real audio (or complex baseband) -> {'text', 'wpm', 'tone_hz'}.
    Fully blind: tone from the spectrum peak, speed from the on-run
    duration statistics."""
    x = np.asarray(audio)
    n = x.size
    spec = np.abs(np.fft.rfft(x.real if np.iscomplexobj(x) else x))
    spec[0] = 0.0
    tone = float(np.argmax(spec)) * fs / (2 * (spec.size - 1)) \
        if not np.iscomplexobj(x) else None
    if np.iscomplexobj(x):
        full = np.abs(np.fft.fft(x))
        tone = float(np.fft.fftfreq(n, 1.0 / fs)[int(np.argmax(full))])
    # mix down + envelope
    ph = 2 * np.pi * np.mod(tone / fs * np.arange(n, dtype=np.float64),
                            1.0)
    z = (x.astype(np.complex128)
         * np.exp(-1j * ph))
    h = np.asarray(lowpass(101, min(0.4, 120.0 / fs)), np.float64)
    env = np.abs(np.convolve(z, h, "same"))
    hi = np.percentile(env, 95)
    if hi <= 0:
        return {"text": "", "wpm": 0.0, "tone_hz": tone}
    on = env > 0.5 * hi
    runs = _runs(on)
    # strip lead/tail silence
    if runs and not runs[0][0]:
        runs = runs[1:]
    if runs and not runs[-1][0]:
        runs = runs[:-1]
    on_lens = np.asarray([l for v, l in runs if v], np.float64)
    if on_lens.size < 2:
        return {"text": "", "wpm": 0.0, "tone_hz": tone}
    # adaptive dit: 2-means-style split of the on durations
    thr = 2.0 * on_lens.min()
    for _ in range(8):
        short = on_lens[on_lens < thr]
        long_ = on_lens[on_lens >= thr]
        m0 = short.mean() if short.size else on_lens.min()
        m1 = long_.mean() if long_.size else 3 * m0
        new = 0.5 * (m0 + m1)
        if abs(new - thr) < 0.5:
            break
        thr = new
    dit = float(short.mean()) if short.size else float(on_lens.min())
    text = []
    sym = []
    for v, l in runs:
        if v:
            sym.append("." if l < 2.0 * dit else "-")
        else:
            if l < 2.0 * dit:
                continue                      # element gap
            text.append(_INV.get("".join(sym), "*"))
            sym = []
            if l >= 5.0 * dit:
                text.append(" ")
    if sym:
        text.append(_INV.get("".join(sym), "*"))
    wpm = 1.2 / (dit / fs)
    return {"text": "".join(text), "wpm": float(wpm),
            "tone_hz": float(tone)}
