"""ctypes bindings for the C++ golden oracle (SURVEY.md N1).

Builds cpp/oracle on first use (g++ via make; pybind11 is not available in
this environment, so the ABI is plain C + ctypes). All complex buffers are
numpy complex64, marshalled as interleaved float32 views without copies.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC_DIR = os.path.join(_ROOT, "cpp", "oracle")
_LIB_PATH = os.path.join(_SRC_DIR, "build", "liboracle.so")

_lib_handle = None

_f32p = ctypes.POINTER(ctypes.c_float)
_i16p = ctypes.POINTER(ctypes.c_int16)
_u32p = ctypes.POINTER(ctypes.c_uint32)


def build(force: bool = False) -> str:
    src = os.path.join(_SRC_DIR, "oracle.cc")
    if force or not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)):
        subprocess.run(["make", "-C", _SRC_DIR], check=True,
                       capture_output=True)
    return _LIB_PATH


def _lib() -> ctypes.CDLL:
    global _lib_handle
    if _lib_handle is None:
        _lib_handle = ctypes.CDLL(build())
    return _lib_handle


def _cf(x: np.ndarray) -> np.ndarray:
    x = np.ascontiguousarray(x, np.complex64)
    return x


def _fp(x: np.ndarray):
    return x.ctypes.data_as(_f32p)


def i16_to_f32(x: np.ndarray, scale: float = 32767.0) -> np.ndarray:
    x = np.ascontiguousarray(x, np.int16)
    out = np.empty(x.shape, np.float32)
    _lib().orc_i16_to_f32(x.ctypes.data_as(_i16p), _fp(out),
                          ctypes.c_long(x.size), ctypes.c_float(scale))
    return out


def f32_to_i16(x: np.ndarray, scale: float = 32767.0) -> np.ndarray:
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty(x.shape, np.int16)
    _lib().orc_f32_to_i16(_fp(x), out.ctypes.data_as(_i16p),
                          ctypes.c_long(x.size), ctypes.c_float(scale))
    return out


def fir(x: np.ndarray, taps: np.ndarray, decim: int = 1) -> np.ndarray:
    x = _cf(x)
    taps = np.asarray(taps)
    nout = x.size // decim
    out = np.empty(nout, np.complex64)
    if np.iscomplexobj(taps):
        taps = np.ascontiguousarray(taps, np.complex64)
        _lib().orc_fir_c(_fp(x.view(np.float32)), ctypes.c_long(x.size),
                         _fp(taps.view(np.float32)), ctypes.c_long(taps.size),
                         ctypes.c_int(decim), _fp(out.view(np.float32)))
    else:
        taps = np.ascontiguousarray(taps, np.float32)
        _lib().orc_fir(_fp(x.view(np.float32)), ctypes.c_long(x.size),
                       _fp(taps), ctypes.c_long(taps.size),
                       ctypes.c_int(decim), _fp(out.view(np.float32)))
    return out


def nco_phasor(word0: int, dword: int, n: int) -> np.ndarray:
    out = np.empty(n, np.complex64)
    _lib().orc_nco_phasor(ctypes.c_uint32(word0), ctypes.c_uint32(dword),
                          ctypes.c_long(n), _fp(out.view(np.float32)))
    return out


def nco_mix(x: np.ndarray, word0: int, dword: int) -> tuple[np.ndarray, int]:
    x = _cf(x)
    out = np.empty(x.size, np.complex64)
    end = ctypes.c_uint32(0)
    _lib().orc_nco_mix(_fp(x.view(np.float32)), ctypes.c_long(x.size),
                       ctypes.c_uint32(word0), ctypes.c_uint32(dword),
                       _fp(out.view(np.float32)), ctypes.byref(end))
    return out, int(end.value)


def resample(x: np.ndarray, taps: np.ndarray, up: int, down: int) -> np.ndarray:
    x = _cf(x)
    taps = np.ascontiguousarray(taps, np.float32)
    nout = (x.size * up) // down
    out = np.empty(nout, np.complex64)
    _lib().orc_resample(_fp(x.view(np.float32)), ctypes.c_long(x.size),
                        _fp(taps), ctypes.c_long(taps.size),
                        ctypes.c_int(up), ctypes.c_int(down),
                        _fp(out.view(np.float32)))
    return out


def fft(x: np.ndarray, inverse: bool = False) -> np.ndarray:
    x = _cf(x)
    n = x.size
    if n & (n - 1):
        raise ValueError(f"oracle fft needs power-of-two length, got {n}")
    out = np.empty(n, np.complex64)
    _lib().orc_fft(_fp(x.view(np.float32)), _fp(out.view(np.float32)),
                   ctypes.c_long(n), ctypes.c_int(1 if inverse else 0))
    return out


def discriminate(x: np.ndarray) -> np.ndarray:
    x = _cf(x)
    out = np.empty(x.size, np.float32)
    _lib().orc_discriminate(_fp(x.view(np.float32)), ctypes.c_long(x.size),
                            _fp(out))
    return out


def timing_estimate(metric: np.ndarray, sps: int, acc: complex = 0.0,
                    forget: float = 0.5) -> tuple[complex, float]:
    metric = np.ascontiguousarray(metric, np.float32)
    acc_io = np.asarray([acc.real, acc.imag], np.float32)
    tau = ctypes.c_float(0.0)
    _lib().orc_timing_estimate(_fp(metric), ctypes.c_long(metric.size),
                               ctypes.c_int(sps), ctypes.c_float(forget),
                               _fp(acc_io), ctypes.byref(tau))
    return complex(acc_io[0], acc_io[1]), float(tau.value)


def timing_sample(last: np.ndarray, x: np.ndarray, tau: float,
                  sps: int) -> np.ndarray:
    last = _cf(last)
    x = _cf(x)
    assert last.size == sps + 1
    out = np.empty(x.size // sps, np.complex64)
    _lib().orc_timing_sample_c(_fp(last.view(np.float32)),
                               _fp(x.view(np.float32)),
                               ctypes.c_long(x.size), ctypes.c_int(sps),
                               ctypes.c_float(tau),
                               _fp(out.view(np.float32)))
    return out


def channelize(x: np.ndarray, proto: np.ndarray, m: int) -> np.ndarray:
    x = _cf(x)
    proto = np.ascontiguousarray(proto, np.float32)
    k = x.size // m
    out = np.empty((m, k), np.complex64)
    _lib().orc_channelize(_fp(x.view(np.float32)), ctypes.c_long(x.size),
                          _fp(proto), ctypes.c_long(proto.size),
                          ctypes.c_int(m), _fp(out.view(np.float32)))
    return out


def fir_stream(x: np.ndarray, taps: np.ndarray, hist: np.ndarray,
               decim: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Streaming FIR with a carried delay line (C++ twin of fir_apply).

    hist: [T-1] complex64 tail (zeros at stream start). Returns
    (y [N/decim], new_hist). Concatenated block outputs == one fir() call.
    """
    x = _cf(x)
    taps = np.ascontiguousarray(taps, np.float32)
    hist = np.ascontiguousarray(hist, np.complex64).copy()
    assert hist.size == taps.size - 1
    out = np.empty(x.size // decim, np.complex64)
    _lib().orc_fir_stream(_fp(x.view(np.float32)), ctypes.c_long(x.size),
                          _fp(taps), ctypes.c_long(taps.size),
                          ctypes.c_int(decim), _fp(hist.view(np.float32)),
                          _fp(out.view(np.float32)))
    return out, hist


def channelize_stream(x: np.ndarray, proto: np.ndarray, m: int,
                      hist: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Streaming analysis bank with a carried tail (C++ twin of
    channelize_apply). hist: [T-1] complex64 (T = prototype padded to a
    multiple of m). Returns (y [m, N/m], new_hist)."""
    x = _cf(x)
    proto = np.ascontiguousarray(proto, np.float32)
    t = ((proto.size + m - 1) // m) * m
    hist = np.ascontiguousarray(hist, np.complex64).copy()
    assert hist.size == t - 1, (hist.size, t - 1)
    k = x.size // m
    out = np.empty((m, k), np.complex64)
    _lib().orc_channelize_stream(_fp(x.view(np.float32)),
                                 ctypes.c_long(x.size), _fp(proto),
                                 ctypes.c_long(proto.size), ctypes.c_int(m),
                                 _fp(hist.view(np.float32)),
                                 _fp(out.view(np.float32)))
    return out, hist


def channelize_os2(x: np.ndarray, proto: np.ndarray, m: int) -> np.ndarray:
    """2x-oversampled analysis bank from rest (twin of channelize_os2_apply):
    frames advance by m/2, per-frame twiddle (-1)^{ch*k}."""
    x = _cf(x)
    proto = np.ascontiguousarray(proto, np.float32)
    k = x.size // (m // 2)
    out = np.empty((m, k), np.complex64)
    _lib().orc_channelize_os2(_fp(x.view(np.float32)), ctypes.c_long(x.size),
                              _fp(proto), ctypes.c_long(proto.size),
                              ctypes.c_int(m), _fp(out.view(np.float32)))
    return out


def synthesize_os2(y: np.ndarray, proto: np.ndarray, m: int) -> np.ndarray:
    """2x-oversampled synthesis bank from rest (twin of
    synthesize_os2_apply). y: [m, K] -> x: [K*m/2] wideband."""
    y = np.ascontiguousarray(y, np.complex64)
    proto = np.ascontiguousarray(proto, np.float32)
    mm, k = y.shape
    assert mm == m
    out = np.empty(k * (m // 2), np.complex64)
    _lib().orc_synthesize_os2(_fp(y.view(np.float32)), ctypes.c_int(m),
                              ctypes.c_long(k), _fp(proto),
                              ctypes.c_long(proto.size),
                              _fp(out.view(np.float32)))
    return out


def resample_stream(x: np.ndarray, taps: np.ndarray, up: int, down: int,
                    hist: np.ndarray, offset: int
                    ) -> tuple[np.ndarray, np.ndarray, int]:
    """Streaming rational resampler with carried input tail + output phase.

    hist: [ceil((T-1)/up)] complex64 (zeros at start); offset: global input
    samples consumed so far (0 at start). Returns (y, new_hist,
    new_offset); outputs concatenated over blocks == one resample() call.
    """
    x = _cf(x)
    taps = np.ascontiguousarray(taps, np.float32)
    h = (taps.size - 1 + up - 1) // up
    hist = np.ascontiguousarray(hist, np.complex64).copy()
    assert hist.size == h, (hist.size, h)
    j0 = (offset * up) // down
    jend = ((offset + x.size) * up) // down
    out = np.empty(jend - j0, np.complex64)
    off = ctypes.c_long(offset)
    _lib().orc_resample_stream(_fp(x.view(np.float32)), ctypes.c_long(x.size),
                               _fp(taps), ctypes.c_long(taps.size),
                               ctypes.c_int(up), ctypes.c_int(down),
                               _fp(hist.view(np.float32)), ctypes.byref(off),
                               _fp(out.view(np.float32)))
    return out, hist, int(off.value)


def synthesize(y: np.ndarray, proto: np.ndarray, m: int) -> np.ndarray:
    """Polyphase synthesis bank from rest (twin of synthesize_apply).

    y: [m, K] channel streams -> x: [K*m] wideband.
    """
    y = np.ascontiguousarray(y, np.complex64)
    proto = np.ascontiguousarray(proto, np.float32)
    mm, k = y.shape
    assert mm == m
    out = np.empty(k * m, np.complex64)
    _lib().orc_synthesize(_fp(y.view(np.float32)), ctypes.c_int(m),
                          ctypes.c_long(k), _fp(proto),
                          ctypes.c_long(proto.size),
                          _fp(out.view(np.float32)))
    return out


def psk_demod(x: np.ndarray, center_freq: float, taps: np.ndarray,
              decim: int, sps: int, order: int) -> np.ndarray:
    """Full M-PSK chain from oracle primitives (mirrors chains.psk.psk_apply):
    mix -> matched filter(+decim) -> O&M timing -> V&V carrier -> slicer.
    Returns symbol indices (M-fold phase ambiguity, as the V&V chain)."""
    word = int(np.round(((-center_freq) % 1.0) * 4294967296.0) % 4294967296.0)
    mixed, _ = nco_mix(x, 0, word)
    bb = fir(mixed, taps, decim=decim)
    power = (bb.real ** 2 + bb.imag ** 2).astype(np.float32)
    _, tau = timing_estimate(power, sps)
    sym = timing_sample(np.zeros(sps + 1, np.complex64), bb, tau, sps)
    scale = np.sqrt(np.mean(np.abs(sym) ** 2) + 1e-12)
    s = sym / scale
    off = 0.5 if order == 4 else 0.0
    acc = np.sum(s ** order * np.exp(-2j * np.pi * off))
    phi = np.angle(acc) / order
    y = s * np.exp(-1j * phi)
    return np.mod(np.round(np.angle(y) * order / (2 * np.pi) - off),
                  order).astype(np.int32)


def fsk_demod(x: np.ndarray, center_freq: float, taps: np.ndarray,
              decim: int, sps: int) -> np.ndarray:
    """Full FSK chain from oracle primitives (mirrors chains.fsk.fsk_apply)."""
    word = int(np.round(((-center_freq) % 1.0) * 4294967296.0) % 4294967296.0)
    mixed, _ = nco_mix(x, 0, word)
    bb = fir(mixed, taps, decim=decim)
    d = discriminate(bb)
    _, tau = timing_estimate(d * d, sps)
    soft = timing_sample(np.zeros(sps + 1, np.complex64),
                         d.astype(np.complex64), tau, sps)
    return (soft.real > 0).astype(np.int32)


def iir_stream(x: np.ndarray, b: np.ndarray, a: np.ndarray,
               z: np.ndarray | None = None
               ) -> tuple[np.ndarray, np.ndarray]:
    """Streaming IIR (direct-form-II-transposed, double accumulate).

    Twin of ops.iir.iir_apply (same filter semantics; the C++ state is the
    DF2T delay z [p] complex64, zeros at stream start). Returns (y, new_z);
    outputs concatenated over blocks == one whole-signal run.
    """
    x = _cf(x)
    b = np.asarray(b, np.float64)
    a = np.asarray(a, np.float64)
    b = b / a[0]
    a = a / a[0]
    p = max(a.size, b.size) - 1
    b = np.concatenate([b, np.zeros(p + 1 - b.size)])
    a = np.concatenate([a, np.zeros(p + 1 - a.size)])
    z = (np.zeros(p, np.complex64) if z is None
         else np.ascontiguousarray(z, np.complex64).copy())
    assert z.size == p
    out = np.empty(x.size, np.complex64)
    dp = ctypes.POINTER(ctypes.c_double)
    _lib().orc_iir_stream(_fp(x.view(np.float32)), ctypes.c_long(x.size),
                          b.ctypes.data_as(dp), a.ctypes.data_as(dp),
                          ctypes.c_long(p), _fp(z.view(np.float32)),
                          _fp(out.view(np.float32)))
    return out, z


def cpm_tx(bits: np.ndarray, words: np.ndarray, sps: int,
           phase0: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """CPM transmitter twin (chains/tx.py cpm_tx_apply): per-sample C++
    loop over the SAME int32 phase-increment words. Returns
    (baseband complex64 [nsym*sps], phase_words int32 [nsym*sps]); the
    word stream is bit-identical to the JAX path (two's-complement
    arithmetic), the waveform matches to float rounding.
    """
    bits = np.ascontiguousarray(bits, np.uint8)
    words = np.ascontiguousarray(words, np.int32)
    nspan = words.shape[0]
    assert words.shape[1] == sps
    n = bits.size * sps
    ph = np.empty(n, np.int32)
    re = np.empty(n, np.float32)
    im = np.empty(n, np.float32)
    _lib().orc_cpm_tx(bits.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
                      ctypes.c_long(bits.size),
                      words.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                      ctypes.c_int(nspan), ctypes.c_int(sps),
                      ctypes.c_int32(phase0),
                      ph.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                      _fp(re), _fp(im))
    return (re + 1j * im).astype(np.complex64), ph
