"""SSTV (slow-scan television), Martin M1 — the TENTH real protocol
and second IMAGE transport (APT X66 is the first; joins BLE, ADS-B,
AIS, RDS, POCSAG, AX.25, CSS, ACARS).

Physical layer (published amateur convention): an audio FM signal
where instantaneous FREQUENCY encodes luminance — 1500 Hz is black,
2300 Hz is white, 1200 Hz marks sync. A transmission is:

    calibration header: 1900 Hz 300 ms, 1200 Hz 10 ms, 1900 Hz 300 ms
    VIS code: 1200 Hz start 30 ms, 7 data bits LSB-first 30 ms each
              (1100 Hz = '1', 1300 Hz = '0'), even-parity bit, 1200 Hz
              stop 30 ms.  Martin M1's VIS is 44 (0x2C).
    256 lines, each: 1200 Hz sync 4.862 ms, 1500 Hz porch 0.572 ms,
              then GREEN, BLUE, RED scans (the Martin color order) of
              146.432 ms each over 320 px, a 1500 Hz 0.572 ms
              separator after each scan.

The receiver is framework-native: complexify the audio at a 1900 Hz
center (the AX.25/ACARS trick — mix + lowpass is the analytic band
select), instantaneous frequency from the one-sample discriminator,
then pure schedule arithmetic — the VIS gate anchors absolute time,
and each line re-anchors on its own 1200 Hz sync dip (searched in a
+-2 ms window, so modest clock drift accumulates nowhere). Pixels are
averaged over their time slot (integrate-and-dump on the float time
grid, matching the synthesizer).

The modulator is the test's signal source: image -> audio ->
AWGN -> decoded RGB, pixel-accurate in tests/e2e/test_sstv.py (same
offline-conformance policy as APT/BLE: published constants, no
recorded captures in-image)."""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from srcdsp_tpu.ops.window import lowpass
from srcdsp_tpu.types import F32

__all__ = ["SstvParams", "make_sstv_params", "MARTIN_M1_VIS",
           "sstv_schedule", "sstv_modulate", "sstv_inst_freq",
           "sstv_decode_vis", "sstv_decode"]

MARTIN_M1_VIS = 44
_F_BLACK, _F_WHITE, _F_SYNC = 1500.0, 2300.0, 1200.0
_F_LEADER = 1900.0
_BIT1, _BIT0 = 1100.0, 1300.0
_LINE_SYNC_S = 4.862e-3
_PORCH_S = 0.572e-3
_SCAN_S = 146.432e-3
_WIDTH, _HEIGHT = 320, 256


class SstvParams(NamedTuple):
    fs: float
    width: int
    height: int
    lp_taps: np.ndarray      # analytic-select lowpass (host constant)


def make_sstv_params(fs: float = 11025.0, width: int = _WIDTH,
                     height: int = _HEIGHT, taps: int = 127
                     ) -> SstvParams:
    """fs: audio rate, > 5400 Hz so the +-800 Hz channel select around
    the 1900 Hz center (1100..2700 — covers VIS tones and the video
    deviation with transition margin) stays below Nyquist; raises
    otherwise (review finding: the old docstring promised 'any' fs and
    quoted +-700)."""
    if fs <= 5400.0:
        raise ValueError(f"fs {fs} too low for the 1100..2700 Hz band")
    return SstvParams(fs=float(fs), width=int(width), height=int(height),
                      lp_taps=np.asarray(lowpass(taps, 800.0 / fs),
                                         np.float32))


def _vis_bits(code: int) -> list[int]:
    b = [(code >> i) & 1 for i in range(7)]
    return b + [sum(b) % 2]           # even parity


def sstv_schedule(params: SstvParams, image: np.ndarray,
                  vis: int = MARTIN_M1_VIS):
    """Image [H, W, 3] in [0, 1] -> [(freq_hz, duration_s)] segments.
    The Martin scan order per line is G, B, R."""
    img = np.asarray(image, np.float64)
    if img.shape != (params.height, params.width, 3):
        raise ValueError(f"image must be [{params.height}, "
                         f"{params.width}, 3], got {img.shape}")
    seg = [(_F_LEADER, 0.300), (_F_SYNC, 0.010), (_F_LEADER, 0.300),
           (_F_SYNC, 0.030)]
    for b in _vis_bits(vis):
        seg.append((_BIT1 if b else _BIT0, 0.030))
    seg.append((_F_SYNC, 0.030))
    px = _SCAN_S / params.width
    for row in range(params.height):
        seg.append((_F_SYNC, _LINE_SYNC_S))
        seg.append((_F_BLACK, _PORCH_S))
        for ch in (1, 2, 0):                      # G, B, R
            for v in img[row, :, ch]:
                seg.append((_F_BLACK + (_F_WHITE - _F_BLACK)
                            * float(v), px))
            seg.append((_F_BLACK, _PORCH_S))
    return seg


def sstv_modulate(params: SstvParams, image: np.ndarray,
                  vis: int = MARTIN_M1_VIS) -> np.ndarray:
    """Image -> real audio f32 (continuous phase; each segment rounds
    to the sample grid by CUMULATIVE time, so rounding never drifts)."""
    seg = sstv_schedule(params, image, vis)
    fs = params.fs
    freqs = np.asarray([f for f, _ in seg])
    durs = np.asarray([d for _, d in seg])
    ends = np.round(np.cumsum(durs) * fs).astype(np.int64)
    starts = np.concatenate([[0], ends[:-1]])
    n = int(ends[-1])
    inst = np.empty(n)
    for (f, _), s0, s1 in zip(seg, starts, ends):
        inst[s0:s1] = f / fs
    phase = 2 * np.pi * np.mod(np.cumsum(inst), 1.0)
    return np.cos(phase).astype(np.float32)


def sstv_inst_freq(params: SstvParams, audio) -> np.ndarray:
    """Real audio -> instantaneous frequency in Hz [N]: complexify at
    the 1900 Hz center (mix + lowpass = analytic band select), then the
    one-sample discriminator."""
    x = jnp.asarray(np.asarray(audio, np.float32))
    n = int(x.shape[-1])
    fr = np.mod((_F_LEADER / params.fs)
                * np.arange(n, dtype=np.float64), 1.0)
    ph = jnp.asarray((2 * np.pi * fr).astype(np.float32))
    z = x * jax.lax.complex(jnp.cos(ph), -jnp.sin(ph))
    h = jnp.asarray(params.lp_taps)
    zr = jnp.convolve(jnp.real(z), h, mode="same")
    zi = jnp.convolve(jnp.imag(z), h, mode="same")
    z = jax.lax.complex(zr, zi)
    d = z[1:] * jnp.conj(z[:-1])
    f = jnp.angle(d) * F32(params.fs / (2 * np.pi)) + F32(_F_LEADER)
    f = jnp.concatenate([f[:1], f])
    return np.asarray(f)


def _seg_mean(f: np.ndarray, t0: float, dur: float, fs: float) -> float:
    s0 = int(round(t0 * fs))
    s1 = max(s0 + 1, int(round((t0 + dur) * fs)))
    s0 = max(0, min(s0, f.size - 1))
    s1 = min(s1, f.size)
    return float(f[s0:s1].mean())


def sstv_decode_vis(params: SstvParams, f: np.ndarray):
    """Instantaneous-frequency stream -> (vis code | None, t_end):
    locate the 300/10/300 ms leader by correlation against its
    band-sign signature, then read the 30 ms VIS slots. t_end = time
    where image lines begin."""
    fs = params.fs
    # leader detect: find the first long 1900 Hz run followed 310 ms
    # later by a 1200 Hz 30 ms start bit
    near19 = np.abs(f - _F_LEADER) < 120.0
    # smooth over 10 ms so the 10 ms 1200 Hz break doesn't split it
    k = int(0.010 * fs)
    box = np.convolve(near19.astype(np.float64),
                      np.ones(2 * k + 1) / (2 * k + 1), mode="same")
    long_run = box > 0.7
    idx = np.flatnonzero(long_run)
    if idx.size == 0:
        return None, 0.0
    t0 = idx[0] / fs                      # leader start (approx)
    # scan candidate VIS start times over the leader tail
    for dt in np.arange(0.55, 0.75, 0.005):
        ts = t0 + dt
        if abs(_seg_mean(f, ts + 0.005, 0.020, fs) - _F_SYNC) > 80:
            continue
        bits = []
        for i in range(8):
            fb = _seg_mean(f, ts + 0.030 * (i + 1) + 0.005, 0.020, fs)
            if abs(fb - _BIT1) < 80:
                bits.append(1)
            elif abs(fb - _BIT0) < 80:
                bits.append(0)
            else:
                bits = None
                break
        if bits is None:
            continue
        stop = _seg_mean(f, ts + 0.030 * 9 + 0.005, 0.020, fs)
        if abs(stop - _F_SYNC) > 80:
            continue
        if sum(bits[:7]) % 2 != bits[7]:
            continue
        code = sum(b << i for i, b in enumerate(bits[:7]))
        return code, ts + 0.030 * 10
    return None, 0.0


def sstv_decode(params: SstvParams, audio, vis_required: bool = True):
    """Real audio -> {'image' [H, W, 3], 'vis', 'ok'}. Schedule-driven
    with per-line sync re-anchoring (each line's 1200 Hz dip searched
    in a +-2 ms window around its expected time)."""
    f = sstv_inst_freq(params, audio)
    fs = params.fs
    vis, t = sstv_decode_vis(params, f)
    if vis is None:
        if vis_required:
            return {"image": None, "vis": None, "ok": False}
        t = 0.0
    img = np.zeros((params.height, params.width, 3), np.float32)
    px = _SCAN_S / params.width
    line_s = _LINE_SYNC_S + _PORCH_S + 3 * (_SCAN_S + _PORCH_S)
    ns_h = int(0.002 * fs)                # last 2 ms of the sync dip
    np_p = max(1, int(_PORCH_S * fs))
    for row in range(params.height):
        # re-anchor on the sync FALLING EDGE (1200 -> porch): the first
        # line's sync merges with the VIS stop bit (both 1200 Hz), so a
        # plain min|f-1200| window locks ~5 ms early — the edge metric
        # (sync behind, porch ahead) is unambiguous there and sharper
        # everywhere. Line 0 gets a wide window (the VIS-derived time
        # is only ~5 ms accurate); later lines re-anchor within +-2 ms.
        win = int((0.008 if row == 0 else 0.002) * fs)
        s_exp = int(round((t + _LINE_SYNC_S) * fs))   # expected edge
        best, best_s = None, s_exp
        for s in range(max(ns_h, s_exp - win), s_exp + win + 1):
            if s + np_p > f.size:
                break
            m = (float(np.abs(f[s - ns_h: s] - _F_SYNC).mean())
                 + float(np.abs(f[s: s + np_p] - _F_BLACK).mean()))
            if best is None or m < best:
                best, best_s = m, s
        t_line = best_s / fs - _LINE_SYNC_S
        for ci, ch in enumerate((1, 2, 0)):       # G, B, R scans
            t_scan = (t_line + _LINE_SYNC_S + _PORCH_S
                      + ci * (_SCAN_S + _PORCH_S))
            # vectorized integrate-and-dump: one reduceat over the
            # pixel boundary grid replaces 320 Python slice-means per
            # scan (~100x on the 256-line CLI path; review finding)
            edges = np.round((t_scan + np.arange(params.width + 1)
                              * px) * fs).astype(np.int64)
            edges = np.clip(edges, 0, f.size - 1)
            sums = np.add.reduceat(f, edges[:-1])
            cnt = np.maximum(np.diff(edges), 1)
            img[row, :, ch] = ((sums / cnt - _F_BLACK)
                               / (_F_WHITE - _F_BLACK))
        t = t_line + line_s
    return {"image": np.clip(img, 0.0, 1.0), "vis": vis, "ok": True}
