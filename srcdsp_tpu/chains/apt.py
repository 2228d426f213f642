"""NOAA APT (Automatic Picture Transmission) weather-satellite imagery
— the eighth real protocol composed from framework layers (beyond
parity; joins BLE X46, ADS-B X48, AIS X49, RDS X57, POCSAG X59,
AX.25 X64, CSS X65), and the first IMAGE transport.

Physical layer: the 137 MHz downlink is wideband FM; the baseband is a
2400 Hz subcarrier AMPLITUDE-modulated by the video signal at 4160
words/s (two image lines per second, 2080 words per line). The receive
chain is framework-native end to end:

    FM IQ -> chains.analog fm_apply (discriminator)  -> MPX f32
    MPX   -> complex mix at 2400 Hz + lowpass         -> analytic
             subcarrier; envelope = 2*|z| (phase-blind AM detection)
    env   -> integrate-and-dump over sps samples      -> 4160 Hz words
    words -> sync-A correlation (zero-mean template)  -> line start
    lines -> [L, 2080] image matrix (A+B channels)

Line format (2080 words): | sync A 39 | space A 47 | video A 909 |
telemetry A 45 | sync B 39 | space B 47 | video B 909 | telemetry B
45 |. Sync A is a 1040 Hz square train (7 cycles of 2-on/2-off at
word rate after a 4-word low lead-in); sync B is 7 pulses at 832 pps
(3-on/2-off). These trains and the layout widths are the published
APT frame constants; the luminance mapping (amplitude a = lo +
(hi-lo)*lum) is a repo convention — absolute calibration on real
captures would use the telemetry wedges, which `apt_build_lines`
emits as graduated constants for that purpose.

The modulator (`apt_build_lines`/`apt_modulate`) is the test's signal
source: synthesized image -> full FM IQ -> receiver -> pixel-exact
(>= 50 dB) recovery, the same offline-conformance pattern as RDS.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.ops.window import lowpass
from srcdsp_tpu.types import F32

__all__ = ["AptParams", "make_apt_params", "apt_line_layout",
           "apt_sync_a", "apt_sync_b", "apt_build_lines",
           "apt_modulate", "apt_envelope", "apt_words",
           "apt_find_sync", "apt_decode_lines", "apt_decode_mpx"]

WORDS_PER_LINE = 2080
WORD_RATE = 4160.0
SUBCARRIER_HZ = 2400.0

# (name, width) in words — the published APT line layout
_LAYOUT = (("sync_a", 39), ("space_a", 47), ("video_a", 909),
           ("telemetry_a", 45), ("sync_b", 39), ("space_b", 47),
           ("video_b", 909), ("telemetry_b", 45))


def apt_line_layout() -> dict:
    """{name: (start, width)} word offsets of each line segment."""
    out, off = {}, 0
    for name, w in _LAYOUT:
        out[name] = (off, w)
        off += w
    assert off == WORDS_PER_LINE
    return out


def apt_sync_a() -> np.ndarray:
    """[39] sync-A train: 4 low, then 7 cycles of (2 high, 2 low) —
    a 1040 Hz square burst at the 4160 Hz word rate — then 7 low."""
    out = np.zeros(39, np.float32)
    for c in range(7):
        out[4 + 4 * c: 4 + 4 * c + 2] = 1.0
    return out


def apt_sync_b() -> np.ndarray:
    """[39] sync-B train: 4 low, then 7 pulses of (3 high, 2 low) —
    832 pps."""
    out = np.zeros(39, np.float32)
    for c in range(7):
        out[4 + 5 * c: 4 + 5 * c + 3] = 1.0
    return out


class AptParams(NamedTuple):
    fs: float               # MPX sample rate
    sps: float              # samples per word = fs / 4160 (integer)
    lo: float               # subcarrier amplitude at luminance 0
    hi: float               # subcarrier amplitude at luminance 1
    lp_taps: np.ndarray     # envelope lowpass (host constant)


def make_apt_params(fs: float = 20800.0, lo: float = 0.1,
                    hi: float = 0.95, taps: int = 127) -> AptParams:
    """fs must be an integer multiple of 4160 (default 5 samples/word).
    The envelope lowpass passes the video (~word_rate/2) and rejects
    the 2x-subcarrier image at 4800 Hz."""
    sps = fs / WORD_RATE
    if abs(sps - round(sps)) > 1e-9:
        raise ValueError(f"fs {fs} not a multiple of the 4160 word rate")
    cut = 0.6 * (WORD_RATE / fs)     # ~2500 Hz at the default fs
    return AptParams(fs=float(fs), sps=float(round(sps)), lo=lo, hi=hi,
                     lp_taps=np.asarray(lowpass(taps, cut), np.float32))


def apt_build_lines(image: np.ndarray, image_b: np.ndarray | None = None
                    ) -> np.ndarray:
    """Image rows [L, 909] in [0, 1] -> word lines [L, 2080].

    Channel B carries image_b (default: inverted A, like the IR pair).
    Space A is black with sync-rate minute markers omitted; space B is
    white; telemetry wedges step through 8 graduated levels per frame
    (the real calibration staircase, repeated)."""
    img = np.asarray(image, np.float32)
    if img.ndim != 2 or img.shape[1] != 909:
        raise ValueError(f"image must be [L, 909], got {img.shape}")
    imgb = (1.0 - img if image_b is None
            else np.asarray(image_b, np.float32))
    lay = apt_line_layout()
    nl = img.shape[0]
    lines = np.zeros((nl, WORDS_PER_LINE), np.float32)
    for row in range(nl):
        wedge = ((row // 8) % 8 + 1) / 8.0
        seg = {
            "sync_a": apt_sync_a(), "space_a": np.zeros(47, np.float32),
            "video_a": img[row], "telemetry_a": np.full(45, wedge,
                                                        np.float32),
            "sync_b": apt_sync_b(), "space_b": np.ones(47, np.float32),
            "video_b": imgb[row], "telemetry_b": np.full(45, wedge,
                                                         np.float32),
        }
        for name, (off, w) in lay.items():
            lines[row, off: off + w] = seg[name]
    return lines


def apt_modulate(params: AptParams, lines: np.ndarray) -> np.ndarray:
    """Word lines [L, 2080] -> MPX f32 [L*2080*sps]: each word held for
    sps samples, amplitude lo + (hi-lo)*word on the 2400 Hz cosine."""
    sps = int(params.sps)
    words = np.asarray(lines, np.float32).reshape(-1)
    amp = params.lo + (params.hi - params.lo) * np.repeat(words, sps)
    n = amp.size
    t = np.arange(n) / params.fs
    return (amp * np.cos(2 * np.pi * SUBCARRIER_HZ * t)).astype(
        np.float32)


def apt_envelope(params: AptParams, mpx: jax.Array) -> jax.Array:
    """MPX f32 [N] -> video envelope [N]: complex mix at 2400 Hz +
    lowpass + 2*|z| (phase-blind; a frequency-offset subcarrier only
    rotates z, the magnitude is untouched)."""
    x = jnp.asarray(mpx, F32)
    n = int(x.shape[-1])
    # exact f64 frac phase, host-built (n is static under jit): an
    # unwrapped f32 ramp hits ~0.5 rad ULP jitter by sample 16M — a
    # full 13-min APT pass — washing out the late image lines (review
    # finding; every streaming chain uses u32 words for this reason)
    fr = np.mod((SUBCARRIER_HZ / params.fs)
                * np.arange(n, dtype=np.float64), 1.0)
    ph = jnp.asarray((2 * np.pi * fr).astype(np.float32))
    z = x * jax.lax.complex(jnp.cos(ph), -jnp.sin(ph))
    h = jnp.asarray(params.lp_taps)
    zr = jnp.convolve(jnp.real(z), h, mode="same")
    zi = jnp.convolve(jnp.imag(z), h, mode="same")
    return 2.0 * jnp.sqrt(zr * zr + zi * zi)


def apt_words(params: AptParams, env: jax.Array) -> jax.Array:
    """Envelope [N] -> word stream [N//sps] by integrate-and-dump,
    mapped back to luminance via the (lo, hi) convention."""
    sps = int(params.sps)
    nw = env.shape[-1] // sps
    w = jnp.mean(env[: nw * sps].reshape(nw, sps), axis=-1)
    return (w - params.lo) / (params.hi - params.lo)


def apt_find_sync(words: np.ndarray) -> tuple[int, float]:
    """Word stream -> (offset of the first full line, score). Zero-mean
    sync-A template correlated at every offset, scores folded modulo
    the line length so every line votes; the winner is the start-of-
    line phase (parity with the RDS/ADS-B host-side control pattern)."""
    w = np.asarray(words, np.float32)
    tpl = apt_sync_a()
    tpl = tpl - tpl.mean()
    corr = np.correlate(w, tpl, mode="valid")
    if corr.size < WORDS_PER_LINE:
        return 0, 0.0
    nl = corr.size // WORDS_PER_LINE
    folded = corr[: nl * WORDS_PER_LINE].reshape(nl, WORDS_PER_LINE)
    score = folded.sum(axis=0)
    off = int(np.argmax(score))
    return off, float(score[off] / max(nl, 1))


def apt_decode_lines(params: AptParams, words: np.ndarray) -> dict:
    """Word stream -> {'lines' [L, 2080], 'video_a' [L, 909],
    'video_b', 'offset', 'score'}."""
    off, score = apt_find_sync(words)
    w = np.asarray(words, np.float32)[off:]
    nl = w.size // WORDS_PER_LINE
    lines = w[: nl * WORDS_PER_LINE].reshape(nl, WORDS_PER_LINE)
    lay = apt_line_layout()
    a0, aw = lay["video_a"]
    b0, bw = lay["video_b"]
    return {"lines": lines, "video_a": lines[:, a0: a0 + aw],
            "video_b": lines[:, b0: b0 + bw],
            "offset": off, "score": score}


def apt_decode_mpx(params: AptParams, mpx) -> dict:
    """MPX f32 -> decoded image dict (envelope + I&D + sync + slice)."""
    env = apt_envelope(params, jnp.asarray(mpx, F32))
    words = np.asarray(apt_words(params, env))
    return apt_decode_lines(params, words)
