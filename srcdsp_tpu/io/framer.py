"""ctypes bindings for the native ingest framer (cpp/ingest/framer.cc)
— the production producer for the pre-framed serving kernels
(kernels/mixfir_preframed.py and friends): one C++ pass converts a
ci16 capture and emits [NT, span] frame planes (f32 or bf16), so the
chip does zero window work and Python does zero per-row work.

Bit-exactness contracts (tested): frames == frame_planes on the
converted stream; the bf16 path matches jnp.astype(bfloat16)
round-to-nearest-even bit for bit.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC_DIR = os.path.join(_ROOT, "cpp", "ingest")
_LIB_PATH = os.path.join(_SRC_DIR, "build", "libframer.so")

_lib_handle = None


def build(force: bool = False) -> str:
    src = os.path.join(_SRC_DIR, "framer.cc")
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


def _check(nt: int, what: str):
    if nt < 0:
        raise ValueError(f"bad framer geometry for {what} (need "
                         f"span-stride=hist, hist | stride, N % stride)")
    return nt


def frame_ci16(iq: np.ndarray, hist: int, stride: int, span: int,
               scale: float = 32767.0, bf16: bool = False,
               threads: int = 1):
    """Interleaved int16 IQ [2*(hist+N)] (or [hist+N, 2]) -> framed
    plane pair [NT, span] (f32, or uint16 bf16 storage when bf16=True;
    view as jnp.bfloat16 at device_put)."""
    iq = np.ascontiguousarray(iq, np.int16).reshape(-1)
    n_total = iq.size // 2
    nt_max = (n_total - hist) // stride
    i16p = ctypes.POINTER(ctypes.c_int16)
    if bf16:
        out_r = np.empty((nt_max, span), np.uint16)
        out_i = np.empty((nt_max, span), np.uint16)
        u16p = ctypes.POINTER(ctypes.c_uint16)
        nt = _lib().ing_frame_ci16_bf16_mt(
            iq.ctypes.data_as(i16p), ctypes.c_long(n_total),
            ctypes.c_long(hist), ctypes.c_long(stride),
            ctypes.c_long(span), ctypes.c_float(scale),
            out_r.ctypes.data_as(u16p), out_i.ctypes.data_as(u16p),
            ctypes.c_int(threads))
    else:
        out_r = np.empty((nt_max, span), np.float32)
        out_i = np.empty((nt_max, span), np.float32)
        f32p = ctypes.POINTER(ctypes.c_float)
        nt = _lib().ing_frame_ci16_f32_mt(
            iq.ctypes.data_as(i16p), ctypes.c_long(n_total),
            ctypes.c_long(hist), ctypes.c_long(stride),
            ctypes.c_long(span), ctypes.c_float(scale),
            out_r.ctypes.data_as(f32p), out_i.ctypes.data_as(f32p),
            ctypes.c_int(threads))
    _check(nt, "frame_ci16")
    return out_r, out_i


def frame_f32(planes: np.ndarray, hist: int, stride: int, span: int):
    """f32 planes [2, hist+N] -> framed plane pair [NT, span] f32."""
    planes = np.ascontiguousarray(planes, np.float32)
    n_total = planes.shape[-1]
    nt_max = (n_total - hist) // stride
    out_r = np.empty((nt_max, span), np.float32)
    out_i = np.empty((nt_max, span), np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    nt = _lib().ing_frame_f32(
        planes[0].ctypes.data_as(f32p), planes[1].ctypes.data_as(f32p),
        ctypes.c_long(n_total), ctypes.c_long(hist),
        ctypes.c_long(stride), ctypes.c_long(span),
        out_r.ctypes.data_as(f32p), out_i.ctypes.data_as(f32p))
    _check(nt, "frame_f32")
    return out_r, out_i


def frame_cu8(iq: np.ndarray, hist: int, stride: int, span: int,
              threads: int = 1):
    """rtl-sdr cu8 interleaved bytes [2*(hist+N)] -> framed f32 plane
    pair [NT, span] ((b - 127.5)/127.5, io/capture.py's formula)."""
    iq = np.ascontiguousarray(iq, np.uint8).reshape(-1)
    return _frame_bytes(iq, hist, stride, span, threads,
                        "ing_frame_cu8_f32_mt", ctypes.c_uint8)


def frame_ci8(iq: np.ndarray, hist: int, stride: int, span: int,
              threads: int = 1):
    """HackRF ci8 interleaved bytes -> framed f32 plane pair (b/127)."""
    iq = np.ascontiguousarray(iq, np.int8).reshape(-1)
    return _frame_bytes(iq, hist, stride, span, threads,
                        "ing_frame_ci8_f32_mt", ctypes.c_int8)


def _frame_bytes(iq, hist, stride, span, threads, sym, ctype):
    n_total = iq.size // 2
    nt_max = (n_total - hist) // stride
    out_r = np.empty((nt_max, span), np.float32)
    out_i = np.empty((nt_max, span), np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    nt = getattr(_lib(), sym)(
        iq.ctypes.data_as(ctypes.POINTER(ctype)),
        ctypes.c_long(n_total), ctypes.c_long(hist),
        ctypes.c_long(stride), ctypes.c_long(span),
        out_r.ctypes.data_as(f32p), out_i.ctypes.data_as(f32p),
        ctypes.c_int(threads))
    _check(nt, sym)
    return out_r, out_i
